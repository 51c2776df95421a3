"""Similarity search over the ``embeddings`` table (SURVEY.md §2.12).

- cosine_topk      — brute-force exact top-k: broadcast the (small)
                     query set against all vectors; per-pair cosine is
                     a row-local zip_with/aggregate fold (JVM, no
                     Python). The baseline every ANN variant is
                     measured against.
- ann_lsh_topk     — the scale path: random-hyperplane LSH buckets
                     (sign bits of two fixed projections); the search
                     join only touches same-bucket pairs, so cost is
                     O(n * bucket_fraction) instead of O(n * queries).

Float policy for oracle parity: all arithmetic in DOUBLE with
identical left-fold order in both engines (Spark ``aggregate`` and
DuckDB ``reduce`` are both left folds; float->double widening is
exact), so cosine values match bit-for-bit before the final round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monday_etl_automation_spark.sources.tables import register_views

_DIM = 64
_TOPK = 5
_QUERY_MOD = 50  # vec_id % 50 == 0 -> query set (1/50th of the table)


def _dot(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return (
        f"reduce([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) for i in range(1, {_DIM + 1})],"
        " (acc, v) -> acc + v)"
    )


def _norm(dialect: str, a: str) -> str:
    return f"sqrt({_dot(dialect, a, a)})"


def _cosine_topk_sql(dialect: str) -> str:
    dot = _dot(dialect, "q.embedding", "v.embedding")
    rn = "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {c} DESC, v.vec_id ASC)"
    cos = f"({dot}) / (q.norm * v.norm)"
    return f"""
WITH base AS (
  SELECT vec_id, label, embedding, {_norm(dialect, 'embedding')} AS norm FROM embeddings
),
q AS (SELECT * FROM base WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT
    q.vec_id AS query_id,
    v.vec_id AS neighbor_id,
    v.label AS neighbor_label,
    round({cos}, 6) AS cosine,
    CAST({rn.format(c=cos)} AS INT) AS rk
  FROM q JOIN base v ON q.vec_id <> v.vec_id
)
SELECT query_id, neighbor_id, neighbor_label, cosine, rk
FROM scored WHERE rk <= {_TOPK}
ORDER BY query_id, rk
""".strip()


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_cosine_topk_sql("spark"))


# ---------------------------------------------------------------------------
# ann_lsh_topk — random-hyperplane bucketing
# ---------------------------------------------------------------------------

# Fixed pseudo-random hyperplanes; component j of plane p is a
# deterministic small integer in [-3, 3] (identical in both engines).
# Plane vectors repeat with period 7 in p (31 mod 7), so a single
# plane family supports at most 7 independent planes — the near-dup
# multi-probe sets below use their own family (_PLANE_ND, period 11).
_PLANE = "((({p} * 31 + {j} * 17) % 7) - 3)"
_ANN_PLANES = 4  # 16 buckets: candidate join ~ n^2/16, not n^2/4
# IVF probes the query's 2 nearest centroids: recall misses at
# nprobe=1 are queries sitting on a Voronoi boundary, and probing the
# runner-up centroid covers them for 2x scan cost (the standard
# recall/cost dial — raise with label count at scale)
_IVF_NPROBE = 2


def _ann_lsh_sql(dialect: str) -> str:
    """Multi-probe LSH top-k over {2**_ANN_PLANES} sign buckets.

    Each query probes its own bucket PLUS every Hamming-1 neighbor
    bucket (flip one of the k sign bits): the closest true neighbors a
    single-probe search misses are overwhelmingly the ones one
    hyperplane barely splits, so probing the k adjacent buckets buys
    most of the missing recall for (k+1)/2^k of the corpus per query
    instead of all of it (measured here: recall@5 0.20 single-probe →
    see tests/test_ann_recall.py floor). Corpus vectors keep exactly
    one bucket, so a (query, candidate) pair joins at most once — no
    dedup step. At 100 TB: raise k with corpus size, keep probes at
    1+k (or widen to Hamming-2 for recall-critical queries); the plan
    stays one equi-join."""
    dot = _dot(dialect, "q.embedding", "v.embedding")
    cos = f"({dot}) / (q.norm * v.norm)"
    rn = f"ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, v.vec_id ASC)"
    flips = ", ".join(str(2**i) for i in range(_ANN_PLANES))
    if dialect == "spark":
        probes = f"explode(concat(array(0), array({flips})))"
        probe_src = f"SELECT b.*, b.bucket ^ flip AS probe FROM (SELECT *, {probes} AS flip FROM base WHERE vec_id % {_QUERY_MOD} = 0) b"
    else:
        probes = f"unnest([0, {flips}])"
        probe_src = f"SELECT b.*, xor(b.bucket, flip) AS probe FROM (SELECT *, {probes} AS flip FROM base WHERE vec_id % {_QUERY_MOD} = 0) b"
    return f"""
WITH base AS (
  SELECT vec_id, label, embedding, {_norm(dialect, 'embedding')} AS norm,
         {_bucket_k(dialect, 'embedding', _ANN_PLANES)} AS bucket
  FROM embeddings
),
q AS ({probe_src}),
scored AS (
  SELECT
    q.vec_id AS query_id,
    v.vec_id AS neighbor_id,
    round({cos}, 6) AS cosine,
    CAST({rn} AS INT) AS rk
  FROM q JOIN base v ON q.probe = v.bucket AND q.vec_id <> v.vec_id
)
SELECT query_id, neighbor_id, cosine, rk
FROM scored WHERE rk <= {_TOPK}
ORDER BY query_id, rk
""".strip()


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ann_lsh_sql("spark"))


# ---------------------------------------------------------------------------
# embedding_centroids — per-label mean vector (the IVF coarse step)
# ---------------------------------------------------------------------------


def _centroid_sql(dialect: str) -> str:
    """Per-label centroid; output (label, dim index, rounded mean) rows
    so the oracle compare is scalar. Elements are cast to
    DECIMAL(18,9) before SUM, making the aggregation exact and
    order-insensitive (float sums would drift between engines'
    reduction orders)."""
    if dialect == "spark":
        ex = "SELECT label, posexplode(embedding) AS (dim, x) FROM embeddings"
        xs = "CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))"
    else:
        ex = (
            "SELECT label, i - 1 AS dim, embedding[i] AS x"
            f" FROM embeddings, (SELECT unnest(generate_series(1, {_DIM})) AS i)"
        )
        xs = "CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))"
    return f"""
WITH ex AS ({ex})
SELECT label, CAST(dim AS INT) AS dim,
       round(CAST(sum({xs}) AS DOUBLE) / count(*), 6) AS mean_x,
       CAST(count(*) AS BIGINT) AS n_vectors
FROM ex
GROUP BY label, dim
ORDER BY label, dim
""".strip()


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_centroid_sql("spark"))


# ---------------------------------------------------------------------------
# embed_near_dup — embedding-cosine near-duplicate PAIRS via LSH buckets
# ---------------------------------------------------------------------------

_NEARDUP_PLANES = 4  # 16 buckets per probe set: candidates ~ n^2/16 each
_NEARDUP_SETS = 2  # OR'd independent plane sets (multi-probe recall)
_NEARDUP_COS = 0.90
_PLANT_OFFSET = 10_000_000  # planted near-dup ids = original + offset

# Near-dup plane family: period 11 in p (37 mod 11 = 4, coprime), so
# p = 1..8 yields 8 pairwise-distinct planes — enough for 2 independent
# 4-plane probe sets. The ANN family (_PLANE) has period 7 and could
# not supply 8 distinct planes.
_PLANE_ND = "((({p} * 37 + {j} * 23) % 11) - 5)"


def _bucket_k(
    dialect: str, emb: str, n_planes: int, formula: str = _PLANE, start: int = 1
) -> str:
    """n_planes-bit sign-bucket id from planes start..start+n_planes-1
    of the given plane family."""
    bits = []
    for i, p in enumerate(range(start, start + n_planes)):
        if dialect == "spark":
            proj = (
                f"aggregate(zip_with({emb}, sequence(0, {_DIM - 1}),"
                f" (x, j) -> CAST(x AS DOUBLE) * {formula.format(p=p, j='j')}),"
                " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        else:
            proj = (
                f"reduce([CAST({emb}[i] AS DOUBLE) * {formula.format(p=p, j='(i - 1)')}"
                f" for i in range(1, {_DIM + 1})], (acc, v) -> acc + v)"
            )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2 ** i} ELSE 0 END)")
    return " + ".join(bits)


def _near_dup_sql(dialect: str) -> str:
    """All vector pairs in the same LSH bucket with cosine >= 0.90.

    The bucket equi-join keeps the pair generation at ~n^2/2^k instead
    of n^2; at 100 TB you raise k (and OR together a few independent
    plane sets for recall) — the plan shape is unchanged. Pairs missed
    because the planes split them are inherent to LSH; the oracle runs
    the identical algorithm so the check is exact.

    Dot products here go through explode -> (bucket, dim) equi-join ->
    hash agg over SCALED-INT64 elements (floor(x * 1e8); |x| < 1 so
    pair products < 1e16 and 64-dim sums < 6.4e17 — no overflow):
    fully whole-stage-codegen with plain long arithmetic (the per-pair
    higher-order fold is interpreted, and decimal accumulation is
    ~128-bit — both measurably slower), and exact/order-insensitive so
    both engines agree bit-for-bit before the final double division.

    The synthetic embeddings are near-orthogonal, so at small SF no
    natural pair reaches cosine 0.90 and the check would pass
    vacuously (round-1 finding). ``aug`` therefore plants one
    engineered near-duplicate per query vector — a deterministic
    small per-dimension perturbation, identical in both dialects — so
    the pipeline provably finds the planted pairs (and only them)."""
    if dialect == "spark":
        aug = (
            "SELECT vec_id, label, transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
            " FROM embeddings"
            " UNION ALL"
            f" SELECT vec_id + {_PLANT_OFFSET}, label,"
            " zip_with(embedding, sequence(0, 63),"
            " (x, j) -> CAST(x AS DOUBLE) + ((j % 5) - 2) * 0.001)"
            f" FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0"
        )
        ex = (
            "SELECT vec_id, label, bucket, posexplode(embedding) AS (dim, x)"
            " FROM (SELECT vec_id, label, embedding,"
            f" {_bucket_k('spark', 'embedding', _NEARDUP_PLANES)} AS bucket FROM aug)"
        )
    else:
        aug = (
            f"SELECT vec_id, label, [CAST(embedding[i] AS DOUBLE) for i in range(1, {_DIM + 1})]"
            " AS embedding FROM embeddings"
            " UNION ALL"
            f" SELECT vec_id + {_PLANT_OFFSET}, label,"
            f" [CAST(embedding[i] AS DOUBLE) + (((i - 1) % 5) - 2) * 0.001 for i in range(1, {_DIM + 1})]"
            f" FROM embeddings WHERE vec_id % {_QUERY_MOD} = 0"
        )
        ex = (
            "SELECT vec_id, label, bucket, i - 1 AS dim, embedding[i] AS x"
            " FROM (SELECT vec_id, label, embedding,"
            f" {_bucket_k('duckdb', 'embedding', _NEARDUP_PLANES)} AS bucket FROM aug),"
            f" (SELECT unnest(generate_series(1, {_DIM})) AS i)"
        )
    xd = "CAST(floor(CAST(x AS DOUBLE) * 100000000) AS BIGINT)"
    return f"""
WITH aug AS ({aug}),
ex0 AS ({ex}),
ex AS (SELECT vec_id, label, bucket, dim, {xd} AS xd FROM ex0),
norms AS (
  SELECT vec_id, {"any_value(label)" if dialect == "duckdb" else "first(label)"} AS label,
         sqrt(CAST(sum(xd * xd) AS DOUBLE)) AS norm
  FROM ex GROUP BY vec_id
),
-- norms/dots are in the 1e8-scaled integer space; the scale cancels in
-- dot / (norm_a * norm_b), so cosine is unchanged up to quantization
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, CAST(sum(a.xd * b.xd) AS DOUBLE) AS dot
  FROM ex a JOIN ex b ON a.bucket = b.bucket AND a.dim = b.dim AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
),
pairs AS (
  SELECT
    d.vec_id_a, d.vec_id_b,
    CAST(CASE WHEN na.label = nb.label THEN 1 ELSE 0 END AS INT) AS same_label,
    round(d.dot / (na.norm * nb.norm), 6) AS cosine
  FROM dots d
  JOIN norms na ON d.vec_id_a = na.vec_id
  JOIN norms nb ON d.vec_id_b = nb.vec_id
)
SELECT vec_id_a, vec_id_b, same_label, cosine
FROM pairs WHERE cosine >= {_NEARDUP_COS}
ORDER BY vec_id_a, vec_id_b
""".strip()


def embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_near_dup_sql("spark"))


# ---------------------------------------------------------------------------
# ivf_topk — IVF-style search: coarse-quantize by learned centroids
# (per-label means), probe only the nearest centroid's inverted list
# ---------------------------------------------------------------------------


def _ivf_sql(dialect: str) -> str:
    """IVF with nprobe=1: score each query against the per-label
    centroids, pick the nearest, then run exact cosine top-k only
    inside that label's list. At scale the probe join touches
    1/n_labels of the corpus instead of all of it.

    Numeric policy: centroid means are rounded to 6 decimals and kept
    as DECIMAL(12,6); query elements as DECIMAL(18,9). All sums in the
    coarse stage are therefore exact and order-insensitive in both
    engines; only the final division/sqrt/round are double (identical
    one-shot operations)."""
    if dialect == "spark":
        ex = "SELECT vec_id, label, posexplode(embedding) AS (dim, x) FROM embeddings"
        qex = (
            "SELECT vec_id, posexplode(embedding) AS (dim, x) FROM embeddings"
            f" WHERE vec_id % {_QUERY_MOD} = 0"
        )
    else:
        ex = (
            "SELECT vec_id, label, i - 1 AS dim, embedding[i] AS x"
            f" FROM embeddings, (SELECT unnest(generate_series(1, {_DIM})) AS i)"
        )
        qex = (
            "SELECT vec_id, i - 1 AS dim, embedding[i] AS x"
            f" FROM embeddings, (SELECT unnest(generate_series(1, {_DIM})) AS i)"
            f" WHERE vec_id % {_QUERY_MOD} = 0"
        )
    xd = "CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))"
    dot = _dot(dialect, "q.embedding", "v.embedding")
    cos = f"({dot}) / (q.norm * v.norm)"
    rn = f"ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, v.vec_id ASC)"
    return f"""
WITH ex AS ({ex}),
cent AS (
  SELECT label, dim,
         CAST(round(CAST(sum({xd}) AS DOUBLE) / count(*), 6) AS DECIMAL(12,6)) AS md
  FROM ex GROUP BY label, dim
),
cnorm AS (SELECT label, sqrt(CAST(sum(md * md) AS DOUBLE)) AS cn FROM cent GROUP BY label),
qex AS ({qex}),
qscore AS (
  SELECT qx.vec_id, c.label, CAST(sum({xd.replace('x', 'qx.x')} * c.md) AS DOUBLE) AS dot
  FROM qex qx JOIN cent c ON qx.dim = c.dim
  GROUP BY qx.vec_id, c.label
),
qpick AS (
  SELECT vec_id, label FROM (
    SELECT s.vec_id, s.label,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY s.dot / n.cn DESC, s.label ASC) AS rc
    FROM qscore s JOIN cnorm n ON s.label = n.label
  ) ranked WHERE rc <= {_IVF_NPROBE}
),
base AS (
  SELECT vec_id, label, embedding, {_norm(dialect, 'embedding')} AS norm FROM embeddings
),
q AS (SELECT * FROM base WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT
    q.vec_id AS query_id,
    p.label AS probe_label,
    v.vec_id AS neighbor_id,
    round({cos}, 6) AS cosine,
    CAST({rn} AS INT) AS rk
  FROM q
  JOIN qpick p ON q.vec_id = p.vec_id
  JOIN base v ON v.label = p.label AND v.vec_id <> q.vec_id
)
SELECT query_id, probe_label, neighbor_id, cosine, rk
FROM scored WHERE rk <= {_TOPK}
ORDER BY query_id, rk
""".strip()


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_ivf_sql("spark"))


QUERIES: dict[str, tuple] = {
    "cosine_topk": (cosine_topk, _cosine_topk_sql("duckdb")),
    "ann_lsh_topk": (ann_lsh_topk, _ann_lsh_sql("duckdb")),
    "embedding_centroids": (embedding_centroids, _centroid_sql("duckdb")),
    "ivf_topk": (ivf_topk, _ivf_sql("duckdb")),
    "embed_near_dup": (embed_near_dup, _near_dup_sql("duckdb")),
}
