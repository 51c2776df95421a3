"""vector_extra — the round-8 retrieval/monitoring families under the
driver's hard correctness oracle (SURVEY.md §2.12).

PQ/ADC search, IVF-PQ search, BM25 ranked retrieval, and the snapshot
drift monitor each have full DuckDB twins, but lived outside the
driver's 50-entry correctness window as pytest-only twins. This module
rides the whole family in ONE union-tagged relation (the ``tpch_extra``
pattern, plans/relational_extra.py): disjoint shapes, per-shape NULL
columns lose nothing, and the driver's rows+schema+hash compare covers
the whole family under a single registry slot.

Shapes:
  - ``pq``    — PQ/ADC top-k (plans/pq_ops.py)
  - ``ivfpq`` — IVF-PQ composite-ADC top-k (plans/ivfpq_ops.py)
  - ``bm25``  — BM25 top-k over the persisted posting list
                (plans/search_ops.py)
  - ``rrf``   — hybrid retrieval: reciprocal-rank fusion of the BM25
                and IVF-ANN result lists for the paired hybrid queries
                (plans/search_ops.py:hybrid_rrf_topk) — integer-exact
                floor(1e9/(K+rank)) scores, so the hash compare holds
  - ``bm25i`` — incremental posting-list maintenance: base snapshot
                postings (indexed once) ∪ one O(|batch|) ingest pass,
                scored by the shared BM25 tail; the oracle is the
                FULL-corpus rebuild, so "incremental == rebuild" is
                the hashed property (plans/search_ops.py)
  - ``drift`` — per-source drift between the documents snapshot and a
                deterministic "next snapshot" (every doc_id % 40 == 3
                row dropped — thins one residue class of the % 20
                source assignment, so exactly one source shows a real
                share delta and every other source's share RISES;
                appearing/vanishing-source handling stays covered by
                tests/test_drift.py)
  - ``relr`` / ``pack`` / ``tokp`` — the packing → tokenized-shard →
                release family (plans/release_extra.py, r16): the
                release run report, per-shard FFD conservation +
                theorem flags, and the shipped tokenized-shard
                round-trip vs the oracle's BPE recomputation
  - ``vstream`` — streaming vector-index ingestion
                (plans/vstream_extra.py, r16): the REAL
                VectorIngestSink's shipped index tables after a
                3-batch redelivery-heavy ingest, vs the oracle's
                one-shot inline encode — exactly-once against frozen
                quantizers == one-shot, down to the bytes on disk
  - ``eperm`` — the epoch-shuffled split writer
                (plans/eperm_extra.py, r17): two epochs of the train
                split written through the REAL writer, per-file
                (count, min/max shuffle-key, multiset checksum,
                one-file-per-dir flag) read back from the shipped
                parquet vs the oracle's inline key+bucket re-derivation

The DuckDB oracle wraps each family's one-shot twin (full training
included) in its own derived table, so the per-family CTE namespaces
(both PQ twins name ``ex``/``cent0``/``lut``/``cand``) never collide.

Spark-side cost: the searches run against the snapshot-persisted
codebooks/codes/postings (sources/tables.py:session_artifact_cache),
so this entry prices per-query work, not training — the same posture
a 100 TB deployment has, where training is the rare job and search is
the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.drift_ops import _drift_sql
from monday_etl_automation_spark.plans.eperm_extra import eperm_oracle_body
from monday_etl_automation_spark.plans.release_extra import (
    PACK_ORACLE_BODY,
    _report_sql,
    _tokp_oracle_body,
)
from monday_etl_automation_spark.plans.vstream_extra import (
    _IV_PREFIX,
    _PQ_PREFIX,
    vstream_oracle_body,
)
from monday_etl_automation_spark.plans.ivfpq_ops import (
    ivfpq_search_body,
    ivfpq_topk,
    ivfpq_train_ctes,
)
from monday_etl_automation_spark.plans.pq_ops import (
    pq_search_body,
    pq_topk,
    pq_train_ctes,
)
from monday_etl_automation_spark.plans.search_ops import (
    _bm25_sql,
    _hybrid_sql,
    bm25_incremental_topk,
    bm25_topk,
    hybrid_rrf_topk,
)
from monday_etl_automation_spark.sources.tables import register_views

# the simulated next snapshot: drop one residue class of doc_id % 40.
# Sources are assigned by doc_id % 20 (TESTDATA.md), so % 40 == 3
# halves exactly one source's doc population — a real single-source
# drift signal, not a uniform shrink (memory: a % 5 predicate would
# thin every source equally and show ~zero share delta).
_SNAP_B = "(SELECT * FROM documents WHERE doc_id % 40 <> 3) snapb"

_B = lambda: F.lit(None).cast("bigint")  # noqa: E731
_D = lambda: F.lit(None).cast("double")  # noqa: E731


def _topk_shape(df: DataFrame, tag: str, qid: str, item: str, score: str) -> DataFrame:
    return df.select(
        F.lit(tag).alias("shape"),
        F.col(qid).cast("string").alias("qid"),
        F.col(item).cast("bigint").alias("i1"),
        _B().alias("i2"),
        _B().alias("i3"),
        _B().alias("i4"),
        _B().alias("i5"),
        _B().alias("i6"),
        _B().alias("i7"),
        F.col(score).cast("double").alias("score"),
        F.col("rk").cast("bigint").alias("rk"),
    )


def vector_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four shapes union-tagged under one oracle hash. The plan is
    memoized per (session, table snapshots) like tpch_extra: the union
    analysis is pure driver-side Catalyst work, DataFrames are
    immutable logical plans, and every underlying index is itself
    snapshot-keyed — re-serving the plan is free and safe."""
    from monday_etl_automation_spark.sources.tables import (
        session_artifact_cache,
        snapshot_key,
    )

    cache = session_artifact_cache(spark, "vector_extra_plan")
    key = (snapshot_key(sf_dir, "documents"), snapshot_key(sf_dir, "embeddings"))
    hit = cache.get(key)
    if hit is None:
        hit = _build_vector_extra(spark, sf_dir)
        cache[key] = hit
    return hit


def _build_vector_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    pq = _topk_shape(pq_topk(spark, sf_dir), "pq", "query_id", "neighbor_id", "cosine")
    ipq = _topk_shape(
        ivfpq_topk(spark, sf_dir), "ivfpq", "query_id", "neighbor_id", "cosine"
    )
    bm = _topk_shape(bm25_topk(spark, sf_dir), "bm25", "qid", "doc_id", "bm25")
    bmi = _topk_shape(
        bm25_incremental_topk(spark, sf_dir), "bm25i", "qid", "doc_id", "bm25"
    )
    rrf = hybrid_rrf_topk(spark, sf_dir).select(
        F.lit("rrf").alias("shape"),
        F.col("qid").cast("string").alias("qid"),
        F.col("doc_id").cast("bigint").alias("i1"),
        F.col("rrf_nano").cast("bigint").alias("i2"),
        F.col("bm_rk").cast("bigint").alias("i3"),
        F.col("ann_rk").cast("bigint").alias("i4"),
        _B().alias("i5"),
        _B().alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        F.col("rk").cast("bigint").alias("rk"),
    )
    drift = spark.sql(_drift_sql("spark", "documents", _SNAP_B)).select(
        F.lit("drift").alias("shape"),
        F.col("source").cast("string").alias("qid"),
        F.col("docs_a").alias("i1"),
        F.col("docs_b").alias("i2"),
        F.col("tokens_a").alias("i3"),
        F.col("tokens_b").alias("i4"),
        F.col("share_ppm_a").alias("i5"),
        F.col("share_ppm_b").alias("i6"),
        F.col("abs_delta_ppm").alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    from monday_etl_automation_spark.plans.release_extra import (
        pack_summary,
        release_report,
        tokp_summary,
    )

    relr = release_report(spark, sf_dir).select(
        F.lit("relr").alias("shape"),
        F.col("stage").alias("qid"),
        F.col("n").alias("i1"),
        _B().alias("i2"),
        _B().alias("i3"),
        _B().alias("i4"),
        _B().alias("i5"),
        _B().alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    pack = pack_summary(spark, sf_dir).select(
        F.lit("pack").alias("shape"),
        F.col("shard").cast("string").alias("qid"),
        F.col("n_chunks").alias("i1"),
        F.col("sum_tokens").alias("i2"),
        F.col("checksum").alias("i3"),
        F.col("lb_seqs").alias("i4"),
        F.col("budget_ok").alias("i5"),
        F.col("halffill_ok").alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    from monday_etl_automation_spark.plans.eperm_extra import eperm_summary

    eperm = eperm_summary(spark, sf_dir).select(
        F.lit("eperm").alias("shape"),
        F.col("part").alias("qid"),
        F.col("n").alias("i1"),
        F.col("min_key").alias("i2"),
        F.col("max_key").alias("i3"),
        F.col("checksum").alias("i4"),
        F.col("files_ok").alias("i5"),
        _B().alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    from monday_etl_automation_spark.plans.vstream_extra import vstream_summary

    vstream = vstream_summary(spark, sf_dir).select(
        F.lit("vstream").alias("shape"),
        F.col("part").alias("qid"),
        F.col("n").alias("i1"),
        F.col("key_sum").alias("i2"),
        F.col("checksum").alias("i3"),
        _B().alias("i4"),
        _B().alias("i5"),
        _B().alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    tokp = tokp_summary(spark, sf_dir).select(
        F.lit("tokp").alias("shape"),
        F.col("shard").cast("string").alias("qid"),
        F.col("tok_total").alias("i1"),
        F.col("ids_total").alias("i2"),
        F.col("span_total").alias("i3"),
        F.col("ids_sum").alias("i4"),
        F.col("eod_total").alias("i5"),
        F.col("files_ok").alias("i6"),
        _B().alias("i7"),
        _D().alias("score"),
        _B().alias("rk"),
    )
    return (
        pq.unionByName(ipq)
        .unionByName(bm)
        .unionByName(bmi)
        .unionByName(rrf)
        .unionByName(drift)
        .unionByName(relr)
        .unionByName(pack)
        .unionByName(tokp)
        .unionByName(vstream)
        .unionByName(eperm)
        .orderBy("shape", "qid", "rk", "i1")
    )


_NULLS = ", ".join(
    f"CAST(NULL AS BIGINT) AS i{k}" for k in range(2, 8)
)

# r17 (r16 verdict item 3): the pq/ivfpq TRAINER chains are hoisted
# here ONCE (prefixed) and shared by the pq/ivfpq search branches AND
# the vstream branch's encode sections, and the whole oracle goes
# through materialize_ctes — this container's DuckDB 1.0 INLINES CTEs
# (the ivfpq twin alone re-evaluated its Lloyd chain to 61.7s at
# sf0.001; forced AS MATERIALIZED: 0.9s, identical rows), so both the
# share and the hint are required for the single-training oracle.
# Net: the sink's PQ / IVF-PQ code tables ride the hash AND the
# oracle got cheaper (measured: BENCH_NOTES_r17.md).
VECTOR_EXTRA_ORACLE = f"""
WITH {pq_train_ctes("duckdb", _PQ_PREFIX)},
{ivfpq_train_ctes("duckdb", _IV_PREFIX)}
SELECT 'pq' AS shape, CAST(query_id AS VARCHAR) AS qid,
       CAST(neighbor_id AS BIGINT) AS i1, {_NULLS},
       cosine AS score, CAST(rk AS BIGINT) AS rk
FROM (WITH {pq_search_body("duckdb", _PQ_PREFIX)}) pqr
UNION ALL
SELECT 'ivfpq', CAST(query_id AS VARCHAR),
       CAST(neighbor_id AS BIGINT), NULL, NULL, NULL, NULL, NULL, NULL,
       cosine, CAST(rk AS BIGINT)
FROM (WITH {ivfpq_search_body("duckdb", _IV_PREFIX)}) ipqr
UNION ALL
SELECT 'bm25', qid,
       CAST(doc_id AS BIGINT), NULL, NULL, NULL, NULL, NULL, NULL,
       bm25, CAST(rk AS BIGINT)
FROM ({_bm25_sql("duckdb")}) bmr
UNION ALL
SELECT 'bm25i', qid,
       CAST(doc_id AS BIGINT), NULL, NULL, NULL, NULL, NULL, NULL,
       bm25, CAST(rk AS BIGINT)
FROM ({_bm25_sql("duckdb")}) bmir
UNION ALL
SELECT 'rrf', qid,
       CAST(doc_id AS BIGINT), rrf_nano, bm_rk, ann_rk, NULL, NULL, NULL,
       CAST(NULL AS DOUBLE), CAST(rk AS BIGINT)
FROM ({_hybrid_sql("duckdb")}) rrfr
UNION ALL
SELECT 'drift', source,
       docs_a, docs_b, tokens_a, tokens_b,
       share_ppm_a, share_ppm_b, abs_delta_ppm,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({_drift_sql("duckdb", "documents", _SNAP_B)}) drr
UNION ALL
SELECT 'relr', stage,
       n, NULL, NULL, NULL, NULL, NULL, NULL,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({_report_sql("duckdb")}) rlr
UNION ALL
SELECT 'pack', CAST(shard AS VARCHAR),
       n_chunks, sum_tokens, checksum, lb_seqs, budget_ok, halffill_ok, NULL,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({PACK_ORACLE_BODY}) pko
UNION ALL
SELECT 'tokp', CAST(shard AS VARCHAR),
       tok_total, ids_total, span_total, ids_sum, eod_total, files_ok, NULL,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({_tokp_oracle_body()}) tko
UNION ALL
SELECT 'vstream', part,
       n, key_sum, checksum, NULL, NULL, NULL, NULL,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({vstream_oracle_body(include_trainers=False)}) vst
UNION ALL
SELECT 'eperm', part,
       n, min_key, max_key, checksum, files_ok, NULL, NULL,
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT)
FROM ({eperm_oracle_body()}) epm
ORDER BY shape, qid, rk, i1
""".strip()

from monday_etl_automation_spark.plans.sqltext import materialize_ctes  # noqa: E402

VECTOR_EXTRA_ORACLE = materialize_ctes(VECTOR_EXTRA_ORACLE)


QUERIES: dict[str, tuple] = {
    "vector_extra": (vector_extra, VECTOR_EXTRA_ORACLE),
}
