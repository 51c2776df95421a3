"""Driver-hash exposure of STREAMING vector-index ingestion
(streaming/vector_ingest.py — the last query-shaped pytest-only family
after r16's release exposure; rides ``vector_extra`` as the ``vstream``
shape).

What the hash pins: a deterministic 3-batch ingest (with heavy
redelivery — batch 2 redelivers all of batch 1, batch 3 redelivers
everything) runs through the REAL ``VectorIngestSink`` foreachBatch
consumer against the snapshot's frozen quantizers, and the SHIPPED
index tables (vectors, per-set LSH buckets, IVF inverted-list
assignment) are read back from parquet and aggregated per table:
row counts, key sums, and a 60-bit md5 multiset checksum. The DuckDB
oracle recomputes every aggregate from the ONE-SHOT derivation — the
synthesized batch union encoded inline against a quantizer trained
from scratch on the base corpus — so the hash pins the sink's central
property end to end: exactly-once ingestion against frozen quantizers
equals one-shot encoding, down to the bytes on disk. (The PQ / IVF-PQ
code tables ride the same sink but stay pytest-pinned,
tests/test_vector_ingest.py — their oracle halves would re-train the
PQ codebooks inline a second time inside the already
training-heaviest oracle in the registry.)

The ingested vectors are a deterministic slice of the embeddings
table, id-offset so they never collide with the base corpus:
``vec_id % {_VS_MOD} = {_VS_RES}`` offset by {_VS_OFF} — mirrored
literally by the oracle, the cosine_topk fixed-query-set pattern.

Scale: the sink is O(|batch|) per batch with KB-sized broadcast
quantizers and dynamic-partition-overwrite exactly-once (see
streaming/vector_ingest.py); the exposure reads the shipped tables —
the read path a search service actually pays.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.embed_ops import (
    _ANN_SETS,
    _IVF_ITERS,
    _bucket_mix,
    _ivf_cent0_sql,
    _ivf_cent_next_sql,
    _ivf_ex_sql,
    _ivf_meta_cte,
    _ivf_ranked_sql,
)
from monday_etl_automation_spark.sources.tables import register_views

_VS_MOD = 7
_VS_RES = 3
_VS_OFF = 200000
_CK_MOD = 1_000_000_000_000

_SYNTH = (
    f"SELECT vec_id + {_VS_OFF} AS vec_id, embedding, label"
    f" FROM embeddings WHERE vec_id % {_VS_MOD} = {_VS_RES}"
)


def _ck(dialect: str, key: str) -> str:
    """60-bit md5 multiset checksum term (mod 1e12, summed per table)."""
    if dialect == "spark":
        return (
            f"pmod(CAST(conv(substr(md5({key}), 1, 15), 16, 10) AS BIGINT),"
            f" {_CK_MOD})"
        )
    return f"CAST('0x' || substr(md5({key}), 1, 15) AS BIGINT) % {_CK_MOD}"


def _key(dialect: str, parts: list[str]) -> str:
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    casted = [f"CAST({p} AS {cast})" for p in parts]
    if dialect == "spark":
        return "concat(" + ", ':', ".join(casted) + ")"
    return " || ':' || ".join(casted)


# --- Spark side ---------------------------------------------------------------

_VS_DIRS: set[str] = set()


def _drop_vs_dir(entry) -> None:
    if isinstance(entry, tuple) and entry and isinstance(entry[0], str):
        _VS_DIRS.discard(entry[0])
        shutil.rmtree(entry[0], ignore_errors=True)


@atexit.register
def _drop_all_vs_dirs() -> None:
    for path in list(_VS_DIRS):
        shutil.rmtree(path, ignore_errors=True)
    _VS_DIRS.clear()


def _ingest_artifact(spark: SparkSession, sf_dir: str):
    """(base_path, sink) — the 3-batch ingest, run ONCE per (session,
    embeddings snapshot); superseded snapshots' directories rmtree on
    eviction. The REAL sink runs: its anti-join skip, deterministic
    dirty-batch pick, and dynamic-partition-overwrite writes are all
    on the path the hash then verifies."""
    from monday_etl_automation_spark.sources.tables import (
        session_artifact_cache,
        snapshot_key,
    )
    from monday_etl_automation_spark.streaming.vector_ingest import VectorIngestSink

    register_views(spark, sf_dir)
    cache = session_artifact_cache(spark, "vstream_ingest", on_evict=_drop_vs_dir)
    key = (snapshot_key(sf_dir, "embeddings"),)
    hit = cache.get(key)
    if hit is not None:
        return hit
    base = tempfile.mkdtemp(prefix="vstream_ingest_")
    _VS_DIRS.add(base)
    sink = VectorIngestSink(spark, sf_dir, base)
    synth = spark.sql(_SYNTH).localCheckpoint(eager=True)
    sink.process_batch(synth.where("vec_id % 3 = 0"), 1)
    # batch 2 REDELIVERS all of batch 1 alongside its fresh rows; batch
    # 3 redelivers everything — the anti-join must skip every repeat
    sink.process_batch(synth.where("vec_id % 3 <= 1"), 2)
    sink.process_batch(synth, 3)
    hit = (base, sink)
    cache[key] = hit
    return hit


def vstream_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table aggregates of the SHIPPED ingest state (read back from
    the sink's parquet): (part, n, key_sum, checksum)."""
    _, sink = _ingest_artifact(spark, sf_dir)
    vec = sink.vectors().select(
        F.lit("vec").alias("part"),
        F.lit(1).alias("one"),
        F.col("vec_id").cast("bigint").alias("ksum"),
        F.expr(
            _ck("spark", _key("spark", ["'vv'", "vec_id", "label"]))
        ).alias("ck"),
    )
    buck = sink.buckets().select(
        F.concat(F.lit("b"), F.col("s").cast("string")).alias("part"),
        F.lit(1).alias("one"),
        F.col("bucket").cast("bigint").alias("ksum"),
        F.expr(
            _ck("spark", _key("spark", ["'vb'", "vec_id", "s", "bucket"]))
        ).alias("ck"),
    )
    ivf = sink.ivf_assignment().select(
        F.lit("ivf").alias("part"),
        F.lit(1).alias("one"),
        F.col("cid").cast("bigint").alias("ksum"),
        F.expr(
            _ck("spark", _key("spark", ["'vi'", "vec_id", "cid"]))
        ).alias("ck"),
    )
    return (
        vec.unionByName(buck)
        .unionByName(ivf)
        .groupBy("part")
        .agg(
            F.sum("one").cast("bigint").alias("n"),
            F.sum("ksum").cast("bigint").alias("key_sum"),
            F.sum("ck").cast("bigint").alias("checksum"),
        )
    )


# --- DuckDB oracle ------------------------------------------------------------


def vstream_oracle_body() -> str:
    """The one-shot twin: synthesize the SAME batch union, bucket it
    row-locally (full-width mix planes), and assign it against a coarse
    quantizer trained from scratch on the base corpus — the exact
    derivation the sink's frozen quantizers came from."""
    d = "duckdb"
    bucket_union = "\nUNION ALL\n".join(
        f"  SELECT vec_id, {s} AS s,"
        f" ({_bucket_mix(d, 'embedding', s)}) AS bucket FROM synth"
        for s in range(1, _ANN_SETS + 1)
    )
    rounds = ",\n".join(
        f"""{_ivf_ranked_sql(d, 'ex', f'cent{k}', str(k))},
asg{k} AS (SELECT vec_id, cid FROM ranked{k} WHERE rc = 1),
cent{k + 1} AS ({_ivf_cent_next_sql('ex', f'asg{k}')})"""
        for k in range(_IVF_ITERS)
    )
    bex = _ivf_ex_sql(d).replace("FROM embeddings", "FROM synth")
    fin = _IVF_ITERS
    vv = _ck(d, _key(d, ["'vv'", "vec_id", "label"]))
    vb = _ck(d, _key(d, ["'vb'", "vec_id", "s", "bucket"]))
    vi = _ck(d, _key(d, ["'vi'", "vec_id", "cid"]))
    return f"""
WITH synth AS ({_SYNTH}),
{_ivf_meta_cte(d)},
ex AS ({_ivf_ex_sql(d)}),
cent0 AS ({_ivf_cent0_sql(d, "(SELECT step FROM meta)", ncent="(SELECT ncent FROM meta)")}),
{rounds},
bex AS ({bex}),
{_ivf_ranked_sql(d, 'bex', f'cent{fin}', 'b')},
basg AS (SELECT vec_id, cid FROM rankedb WHERE rc = 1),
vbuck AS (
{bucket_union}
)
SELECT 'vec' AS part, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vec_id) AS BIGINT) AS key_sum,
       CAST(sum({vv}) AS BIGINT) AS checksum
FROM synth
UNION ALL
SELECT 'b' || CAST(s AS VARCHAR), CAST(count(*) AS BIGINT),
       CAST(sum(bucket) AS BIGINT), CAST(sum({vb}) AS BIGINT)
FROM vbuck GROUP BY s
UNION ALL
SELECT 'ivf', CAST(count(*) AS BIGINT),
       CAST(sum(cid) AS BIGINT), CAST(sum({vi}) AS BIGINT)
FROM basg
""".strip()
