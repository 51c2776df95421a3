"""BM25 ranked retrieval over the ``documents`` table (SURVEY.md §2.12).

Full-text search is the retrieval half of a training-data pipeline
(eval-set mining, targeted corpus slicing, nearest-document lookup by
keyword): given a set of term queries, return the top-K documents per
query under BM25 (k1 = 1.2, b = 0.75).

Scale shape: ONE corpus scan builds the exploded term relation; the
query set rides along as a per-row parameter table (broadcast literal
— the CLAUDE.md one-scan-not-N-branches rule), so 1 query or 10 000
queries cost the same corpus pass. tf is computed only for documents
sharing >= 1 query term (an equi-join against the distinct query
terms prunes the agg input before it shuffles); df/N/avgdl are
corpus-global aggregates of the same scan. At 100 TB the term
relation is the posting list you'd materialize once per corpus
snapshot and the per-query work is a broadcast-join + hash agg.

Cross-engine exactness (the tfidf lesson, `text_ops.py:234`): no
``ln`` — libm last-ulp drift across engines would flake the strict
hash compare. Instead:

- idf is the RATIONAL Robertson–Spärck-Jones core
  (N - df + 0.5) / (df + 0.5) = (2N - 2df + 1) / (2df + 1) — the
  argument of Lucene's ``ln(1 + ...)``, monotone in it, so rankings
  agree with log-BM25 whenever per-term scores aren't summed across
  terms with wildly different idf magnitudes (documented variant).
- the tf saturation term is cleared of floats by multiplying through
  by 10·S (S = corpus token count):
  tf·(k1+1) / (tf + k1·(1-b+b·dl·N/S))
    = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)  — all BIGINT.
- each per-term score is ONE double division of two exact BIGINTs,
  scaled to micros and floored (floor semantics identical in both
  engines), and the per-(query, doc) total is a BIGINT sum — exact
  and order-insensitive, so the strict value compare holds.

Bounds (sf0.1): numerator (2N+1)·22·tf·S < 1e12, denominator < 1e11 —
far inside BIGINT; at petabyte scale the micros-quantized sum still
fits (score_micro < ~1e13 per term pair).

Pytest-only (driver registry capped at 50 per CLAUDE.md); the DuckDB
twin runs under tests/oracle_compare.assert_matches_oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from monday_etl_automation_spark.plans.text_ops import _DUCK_TOKS, _SPARK_TOKS
from monday_etl_automation_spark.sources.tables import register_views

_TOPK = 10

# per-row query parameters: (query_id, term). 'dup' is the one rare
# term in the synthetic vocabulary (df 25/500) — q1 pins that BM25
# actually discriminates by idf, not just tf.
_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_dup_scan", "dup"),
    ("q_dup_scan", "scan"),
    ("q_vector_ops", "vector"),
    ("q_vector_ops", "merge"),
    ("q_vector_ops", "window"),
    ("q_engine", "spark"),
    ("q_engine", "fast"),
)


def _qterms_sql(dialect: str, queries: tuple[tuple[str, str], ...] = _QUERIES) -> str:
    rows = ", ".join(f"('{q}', '{t}')" for q, t in queries)
    if dialect == "spark":
        return f"SELECT * FROM VALUES {rows} AS t(qid, term)"
    return f"SELECT * FROM (VALUES {rows}) AS t(qid, term)"


def _postings_sql(dialect: str) -> str:
    """The posting-list relation: (doc_id, term, c) term counts — ONE
    tokenize+explode pass over the corpus. Everything downstream (dl,
    N, S, tf, df) is an aggregate or filter of THIS relation, so the
    Spark executor materializes it once per (session, data snapshot)
    — Spark inlines CTEs, and the one-shot form would re-expand the
    corpus tokenization per reference (4+ scans; the same flaw the r7
    verdict flagged in the ANN bucket build). At 100 TB this is the
    posting-list table a snapshot job maintains."""
    toks = _SPARK_TOKS if dialect == "spark" else _DUCK_TOKS
    if dialect == "spark":
        ex = f"SELECT doc_id, explode({toks}) AS term FROM documents"
    else:
        ex = f"SELECT doc_id, unnest({toks}) AS term FROM documents"
    return (
        f"SELECT doc_id, lower(term) AS term, CAST(count(*) AS BIGINT) AS c"
        f" FROM ({ex}) ex0 GROUP BY doc_id, lower(term)"
    )


def _bm25_tail_sql(dialect: str, rel: str, qterms: str | None = None) -> str:
    """Scoring over a posting-list relation ``rel(doc_id, term, c)``;
    ``qterms`` overrides the query-term relation SQL (default: the
    module's fixed parameter table)."""
    return f"""qterms AS ({qterms or _qterms_sql(dialect)}),
dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dl FROM {rel} GROUP BY doc_id),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl
),
tf AS (
  SELECT e.doc_id, e.term, CAST(e.c AS BIGINT) AS tf
  FROM {rel} e JOIN (SELECT DISTINCT term FROM qterms) qt ON e.term = qt.term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored_terms AS (
  SELECT q.qid, t.doc_id,
         CAST(floor(
           CAST((2 * m.n - 2 * f.df + 1) * 22 * t.tf * m.s AS DOUBLE)
           / CAST((2 * f.df + 1) * (10 * t.tf * m.s + 3 * m.s + 9 * d.dl * m.n) AS DOUBLE)
           * 1000000
         ) AS BIGINT) AS st
  FROM qterms q
  JOIN tf t ON t.term = q.term
  JOIN df f ON f.term = q.term
  JOIN dl d ON d.doc_id = t.doc_id
  CROSS JOIN meta m
),
agg AS (
  SELECT qid, doc_id, CAST(sum(st) AS BIGINT) AS score_micro
  FROM scored_terms GROUP BY qid, doc_id
),
ranked AS (
  SELECT qid, doc_id, score_micro,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY qid ORDER BY score_micro DESC, doc_id ASC
         ) AS INT) AS rk
  FROM agg
)
SELECT qid, doc_id, CAST(score_micro AS DOUBLE) / 1000000 AS bm25, rk
FROM ranked WHERE rk <= {_TOPK}
ORDER BY qid, rk"""


def _bm25_sql(dialect: str) -> str:
    """One-shot form — what the DuckDB oracle runs (DuckDB
    materializes multiply-referenced CTEs, so the repeated ``po``
    references cost nothing there)."""
    return f"""
WITH po AS ({_postings_sql(dialect)}),
{_bm25_tail_sql(dialect, 'po')}
""".strip()


def _postings_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list relation, built once per (session, data snapshot)
    — the same persistence scheme as the ANN/IVF/dedup indexes."""
    from monday_etl_automation_spark.sources.tables import (
        bind_table,
        session_artifact_cache,
        snapshot_key,
    )

    bind_table(spark, sf_dir, "documents")  # direct-call poisoning guard
    cache = session_artifact_cache(spark, "bm25_postings")
    key = snapshot_key(sf_dir, "documents")
    hit = cache.get(key)
    if hit is None:
        hit = spark.sql(_postings_sql("spark")).localCheckpoint(eager=True)
        cache[key] = hit
    return hit


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    _postings_index(spark, sf_dir).createOrReplaceTempView("_bm25_po")
    return spark.sql(f"WITH {_bm25_tail_sql('spark', '_bm25_po')}")


def bm25_search(
    spark: SparkSession,
    sf_dir: str,
    queries: dict[str, list[str]] | DataFrame,
) -> DataFrame:
    """BM25 over CALLER-supplied queries — ``{query_id: [terms]}`` or a
    (qid, term) DataFrame. The per-row parameter-table shape means any
    number of queries rides ONE pass over the persisted posting list;
    terms are lowercased to match the postings' normalization."""
    register_views(spark, sf_dir)
    _postings_index(spark, sf_dir).createOrReplaceTempView("_bm25_po")
    if isinstance(queries, DataFrame):
        queries.selectExpr("qid", "lower(term) AS term").createOrReplaceTempView(
            "_bm25_q"
        )
    else:
        # validate PER QUERY: a term-less query would otherwise vanish
        # from the output silently, indistinguishable from "no hits"
        empty = sorted(q for q, terms in queries.items() if not terms)
        if empty or not queries:
            raise ValueError(f"bm25_search queries without terms: {empty or '(none)'}")
        pairs = [(q, t.lower()) for q, terms in queries.items() for t in terms]
        spark.createDataFrame(pairs, "qid STRING, term STRING").createOrReplaceTempView(
            "_bm25_q"
        )
    return spark.sql(
        f"WITH {_bm25_tail_sql('spark', '_bm25_po', qterms='SELECT qid, term FROM _bm25_q')}"
    )


# pytest-only twins (registry capped at 50): consumed by tests/test_search.py
PYTEST_QUERIES: dict[str, tuple] = {
    "bm25_topk": (bm25_topk, _bm25_sql("duckdb")),
}
