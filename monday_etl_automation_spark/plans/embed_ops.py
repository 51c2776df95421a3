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

# Two fixed pseudo-random hyperplanes; component j of plane p is a
# deterministic small integer in [-3, 3] (identical in both engines).
_PLANE = "((({p} * 31 + {j} * 17) % 7) - 3)"


def _bucket(dialect: str, emb: str) -> str:
    """2-bit bucket id from the sign of dot(embedding, plane_p)."""
    bits = []
    for p in (1, 2):
        if dialect == "spark":
            proj = (
                f"aggregate(zip_with({emb}, sequence(0, {_DIM - 1}),"
                f" (x, j) -> CAST(x AS DOUBLE) * {_PLANE.format(p=p, j='j')}),"
                " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            )
        else:
            proj = (
                f"reduce([CAST({emb}[i] AS DOUBLE) * {_PLANE.format(p=p, j='(i - 1)')}"
                f" for i in range(1, {_DIM + 1})], (acc, v) -> acc + v)"
            )
        bits.append(f"(CASE WHEN {proj} > 0 THEN {2 ** (p - 1)} ELSE 0 END)")
    return " + ".join(bits)


def _ann_lsh_sql(dialect: str) -> str:
    dot = _dot(dialect, "q.embedding", "v.embedding")
    cos = f"({dot}) / (q.norm * v.norm)"
    rn = f"ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {cos} DESC, v.vec_id ASC)"
    return f"""
WITH base AS (
  SELECT vec_id, label, embedding, {_norm(dialect, 'embedding')} AS norm,
         {_bucket(dialect, 'embedding')} AS bucket
  FROM embeddings
),
q AS (SELECT * FROM base WHERE vec_id % {_QUERY_MOD} = 0),
scored AS (
  SELECT
    q.vec_id AS query_id,
    v.vec_id AS neighbor_id,
    round({cos}, 6) AS cosine,
    CAST({rn} AS INT) AS rk
  FROM q JOIN base v ON q.bucket = v.bucket AND q.vec_id <> v.vec_id
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


QUERIES: dict[str, tuple] = {
    "cosine_topk": (cosine_topk, _cosine_topk_sql("duckdb")),
    "ann_lsh_topk": (ann_lsh_topk, _ann_lsh_sql("duckdb")),
    "embedding_centroids": (embedding_centroids, _centroid_sql("duckdb")),
}
