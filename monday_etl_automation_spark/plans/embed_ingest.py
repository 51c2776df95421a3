"""Incremental embedding-index ingestion (SURVEY.md §2.12).

Production ANN indexes are not retrained per batch: the quantizer
(LSH planes / IVF centroids / PQ codebooks) is FROZEN at training
time, and an incoming vector batch is ENCODED against it and appended
to the index tables — O(|batch|) work, zero corpus rescans, exactly
the posture of the incremental text-dedup path
(`plans/dedup_ops.py:dedup_exact_incremental`). This module is that
maintenance surface for all three approximate-search indexes:

- ``ann_assign_batch``  — LSH: the batch's (s, bucket) rows, same
  single-projection stack as the persisted bucket index.
- ``ivf_assign_batch``  — IVF: owning centroid + probe set per batch
  vector against the persisted coarse quantizer.
- ``pq_encode_batch``   — PQ: the batch's (sub, code) rows against
  the persisted codebooks.
- ``pq_search_batch``   — search NEW queries against the EXISTING
  corpus via ADC over the persisted codes + exact re-rank (the
  "query vectors arrive later" path; corpus vectors are touched only
  in the candidate re-rank join).
- ``embed_near_dup_batch`` — near-dup screen of the batch against the
  corpus via the persisted bucketed element index (the embedding twin
  of ``dedup_ops.near_dup_incremental``): bucket-collision candidates
  only, exact scaled-long cosine, nearest match per batch vector.

Frozen-quantizer invariant (pinned in tests/test_embed_ingest.py): a
batch vector identical to a corpus vector encodes to IDENTICAL index
rows (buckets / centroid / codes) — encoding depends only on the
persisted quantizer, never on the batch's company or a retrain.

Batch DataFrames carry the ``embeddings`` schema
(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monday_etl_automation_spark.plans.embed_ops import (
    _NEARDUP_COS,
    _PLANT_OFFSET,
    _ann_buckets_sql_spark,
    _ivf_ex_sql,
    _ivf_ranked_sql,
    _nd_bucket_sql,
    _nd_ex_index,
    _train_ivf,
)
from monday_etl_automation_spark.plans.pq_ops import (
    _pq_codes_sql,
    _pq_ex_sql,
    _pq_search_sql,
    _train_pq,
)
from monday_etl_automation_spark.sources.tables import register_views


def _batch_view(spark: SparkSession, new_vecs: DataFrame, name: str) -> None:
    new_vecs.createOrReplaceTempView(name)


def ann_assign_batch(spark: SparkSession, sf_dir: str, new_vecs: DataFrame) -> DataFrame:
    """(vec_id, s, bucket) rows for the batch — the delta a bucket-index
    maintenance job appends. One projection over the batch, no corpus
    access at all (the planes are compile-time constants)."""
    register_views(spark, sf_dir)
    _batch_view(spark, new_vecs, "_ing_batch")
    return spark.sql(
        _ann_buckets_sql_spark().replace("FROM embeddings", "FROM _ing_batch")
    )


def ivf_assign_batch(spark: SparkSession, sf_dir: str, new_vecs: DataFrame) -> DataFrame:
    """(vec_id, cid, rc) for the batch against the persisted coarse
    quantizer: rc=1 is the owning inverted list (the append target),
    rc<=nprobe the probe set a batch-side query would use.

    The centroids come from the CACHED FRAME, not the `_ivf_cent` temp
    view — the view is rebound whenever another snapshot trains in
    this session, and resolving it here would silently encode the
    batch against the wrong quantizer."""
    register_views(spark, sf_dir)
    # nprobe is the snapshot's cached ladder value (travels WITH the
    # quantizer handles — the nd-divisor coupling rule)
    _, cent, _, nprobe = _train_ivf(spark, sf_dir)
    cent.createOrReplaceTempView("_ing_ivf_cent")
    _batch_view(spark, new_vecs, "_ing_batch")
    bex = _ivf_ex_sql("spark").replace("FROM embeddings", "FROM _ing_batch")
    return spark.sql(
        f"""
WITH bex AS ({bex}),
{_ivf_ranked_sql('spark', 'bex', '_ing_ivf_cent', 'b')}
SELECT vec_id, cid, rc FROM rankedb WHERE rc <= {nprobe}
ORDER BY vec_id, rc
""".strip()
    )


def pq_encode_batch(spark: SparkSession, sf_dir: str, new_vecs: DataFrame) -> DataFrame:
    """(vec_id, sub, code) for the batch against the persisted PQ
    codebooks — the rows a codes-table maintenance job appends."""
    register_views(spark, sf_dir)
    _, cent = _train_pq(spark, sf_dir)
    cent.createOrReplaceTempView("_ing_pq_cent")
    _batch_view(spark, new_vecs, "_ing_batch")
    bex = _pq_ex_sql("spark").replace("FROM embeddings", "FROM _ing_batch")
    return spark.sql(
        f"""
WITH bex AS ({bex}),
{_pq_codes_sql('spark', 'bex', '_ing_pq_cent', 'b')}
SELECT vec_id, sub, code FROM codesb ORDER BY vec_id, sub
""".strip()
    )


def embed_near_dup_batch(spark: SparkSession, sf_dir: str, new_vecs: DataFrame) -> DataFrame:
    """Near-duplicate screen for a vector batch against the corpus:
    batch vectors are bucketed with the SAME persisted LSH planes, and
    only bucket-collision candidates pay an exact scaled-long cosine —
    the embedding twin of ``dedup_ops.near_dup_incremental``. Per-batch
    cost is O(|batch|) projections + a band equi-join against the
    persisted element index; no batch x corpus cross product.

    Returns one row per batch vector:
    (vec_id, has_near_dup, nearest_corpus_vec_id, cosine)."""
    register_views(spark, sf_dir)
    ndex, nd_d = _nd_ex_index(spark, sf_dir)
    ndex.createOrReplaceTempView("_ing_nd_ex")
    _batch_view(spark, new_vecs, "_ing_batch")
    # batch buckets use the EXACT divisor the persisted nd_ex index was
    # built with (cached alongside the index handle) — re-deriving it
    # from the live embeddings view could silently misalign the
    # equi-join keys after a test view-override or mid-session data
    # change (r13 ADVICE)
    bucket = _nd_bucket_sql("spark")
    return spark.sql(
        f"""
WITH bex0 AS (
  SELECT vec_id, bucket_full, posexplode(embedding) AS (dim, x)
  FROM (SELECT vec_id, embedding, {bucket} AS bucket_full FROM _ing_batch)
),
bex AS (
  SELECT vec_id, bucket_full DIV {nd_d} AS bucket, dim,
         CAST(floor(CAST(x AS DOUBLE) * 100000000) AS BIGINT) AS xd
  FROM bex0
),
cex AS (SELECT * FROM _ing_nd_ex WHERE vec_id < {_PLANT_OFFSET}),
bnorm AS (SELECT vec_id, sqrt(CAST(sum(xd * xd) AS DOUBLE)) AS norm FROM bex GROUP BY vec_id),
cnorm AS (SELECT vec_id, sqrt(CAST(sum(xd * xd) AS DOUBLE)) AS norm FROM cex GROUP BY vec_id),
dots AS (
  SELECT b.vec_id AS batch_vec_id, c.vec_id AS corpus_vec_id,
         CAST(sum(b.xd * c.xd) AS DOUBLE) AS dot
  FROM bex b JOIN cex c ON b.bucket = c.bucket AND b.dim = c.dim
  GROUP BY b.vec_id, c.vec_id
),
near AS (
  SELECT d.batch_vec_id, d.corpus_vec_id,
         round(d.dot / (bn.norm * cn.norm), 6) AS cosine
  FROM dots d
  JOIN bnorm bn ON d.batch_vec_id = bn.vec_id
  JOIN cnorm cn ON d.corpus_vec_id = cn.vec_id
  WHERE d.dot / (bn.norm * cn.norm) >= {_NEARDUP_COS}
),
best AS (
  SELECT batch_vec_id, corpus_vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY batch_vec_id
           ORDER BY cosine DESC, corpus_vec_id ASC) AS rn
  FROM near
)
SELECT s.vec_id,
       CAST(CASE WHEN b.corpus_vec_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS has_near_dup,
       b.corpus_vec_id AS nearest_corpus_vec_id,
       b.cosine
FROM _ing_batch s
LEFT JOIN best b ON s.vec_id = b.batch_vec_id AND b.rn = 1
ORDER BY s.vec_id
""".strip()
    )


def ivfpq_encode_batch(
    spark: SparkSession,
    sf_dir: str,
    new_vecs: DataFrame,
    asg: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, cid, sub, code) for the batch against the FROZEN IVF
    centroids and residual codebooks — the rows an IVF-PQ index
    maintenance job appends (same layout as the persisted ``vparts``
    relation). Frozen-quantizer invariant holds here too: a cloned
    corpus vector encodes to identical (cid, codes). ``asg`` lets a
    caller that already computed ivf_assign_batch for this batch
    (VectorIngestSink does, for its IVF output) pass the (vec_id, cid,
    rc) frame instead of scoring the batch against the centroids a
    second time."""
    from monday_etl_automation_spark.plans.ivfpq_ops import (
        _e6_sql,
        _rex_sql,
        _train_ivfpq,
    )

    register_views(spark, sf_dir)
    _, rcb, _ = _train_ivfpq(spark, sf_dir)
    _, cent, _, _ = _train_ivf(spark, sf_dir)
    rcb.createOrReplaceTempView("_ing_ipq_rcb")
    cent.createOrReplaceTempView("_ing_ipq_cent")
    if asg is None:
        asg = ivf_assign_batch(spark, sf_dir, new_vecs)  # registers _ing_batch
    else:
        _batch_view(spark, new_vecs, "_ing_batch")
    basg = asg.where("rc = 1").drop("rc").localCheckpoint(eager=True)
    basg.createOrReplaceTempView("_ing_ipq_asg")
    be6 = _e6_sql("spark").replace("FROM embeddings", "FROM _ing_batch")
    return spark.sql(
        f"""
WITH be6 AS ({be6}),
brex AS ({_rex_sql('spark', 'be6', '_ing_ipq_asg', '_ing_ipq_cent')}),
{_pq_codes_sql('spark', 'brex', '_ing_ipq_rcb', 'b')}
SELECT a.vec_id, a.cid, k.sub, k.code
FROM _ing_ipq_asg a JOIN codesb k ON a.vec_id = k.vec_id
ORDER BY a.vec_id, k.sub
""".strip()
    )


def ivfpq_search_batch(spark: SparkSession, sf_dir: str, queries: DataFrame) -> DataFrame:
    """IVF-PQ search for NEW query vectors against the persisted
    index: probe pick = the frozen-centroid ranking ivf_assign_batch
    already computes, then the shared composite-ADC tail
    (ivfpq_ops._ivfpq_tail_sql) with the batch as the query side —
    corpus vectors touched only in the exact re-rank."""
    from monday_etl_automation_spark.plans.ivfpq_ops import (
        _e6_sql,
        _ivfpq_tail_sql,
        _train_ivfpq,
    )

    register_views(spark, sf_dir)
    _, rcb, vparts = _train_ivfpq(spark, sf_dir)
    # the snapshot's ladder nprobe — the same value ivf_assign_batch
    # truncated at, so the batch probe budget can never diverge from
    # the corpus path's
    _, cent, _, nprobe = _train_ivf(spark, sf_dir)
    rcb.createOrReplaceTempView("_ing_ipq_rcb")
    cent.createOrReplaceTempView("_ing_ipq_cent")
    vparts.createOrReplaceTempView("_ing_ipq_vparts")
    qpick = (
        ivf_assign_batch(spark, sf_dir, queries)  # registers _ing_batch
        .where(f"rc <= {nprobe}")
        .drop("rc")
        .localCheckpoint(eager=True)
    )
    qpick.createOrReplaceTempView("_ing_ipq_qpick")
    bq6 = _e6_sql("spark").replace("FROM embeddings", "FROM _ing_batch")
    return spark.sql(
        "WITH "
        + _ivfpq_tail_sql(
            "spark",
            ranked="_unused_",
            cent="_ing_ipq_cent",
            rcb="_ing_ipq_rcb",
            vparts="_ing_ipq_vparts",
            e6="_unused_",
            qpick="SELECT vec_id, cid FROM _ing_ipq_qpick",
            q6=f"SELECT vec_id, dim, xd6 FROM ({bq6}) b6",
            qsrc="_ing_batch",
            exclude_self=False,
        )
    )


def pq_search_batch(spark: SparkSession, sf_dir: str, queries: DataFrame) -> DataFrame:
    """Top-{_TOPK} corpus neighbors for NEW query vectors: ADC over the
    persisted codes (corpus embeddings untouched) + exact cosine
    re-rank of the top-{_CAND} candidates (the only stage reading full
    corpus vectors, and only candidate rows)."""
    register_views(spark, sf_dir)
    codes, cent = _train_pq(spark, sf_dir)
    codes.createOrReplaceTempView("_ing_pq_codes")
    cent.createOrReplaceTempView("_ing_pq_cent")
    _batch_view(spark, queries, "_ing_batch")
    qex = _pq_ex_sql("spark").replace("FROM embeddings", "FROM _ing_batch")
    # ONE shared scoring body (pq_ops._pq_search_sql): only the query
    # relation, re-rank sources, and self-exclusion differ from the
    # corpus search — a scoring fix lands in both paths at once
    return spark.sql(
        "WITH "
        + _pq_search_sql(
            "spark",
            ex="",  # unused: qex overrides the query relation
            codes="_ing_pq_codes",
            cent="_ing_pq_cent",
            qex=qex,
            qsrc="_ing_batch",
            vsrc="embeddings",
            exclude_self=False,
        )
    )
