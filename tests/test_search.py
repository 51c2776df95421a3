"""BM25 retrieval: DuckDB twin parity + relevance sanity pins."""

from __future__ import annotations

from monday_etl_automation_spark.plans.search_ops import _TOPK, _bm25_sql, bm25_topk
from tests.oracle_compare import assert_matches_oracle

_SF001 = "/root/testdata/sf0.01"


def test_bm25_matches_oracle(spark, sf_dir):
    assert_matches_oracle(bm25_topk(spark, sf_dir), _bm25_sql("duckdb"), sf_dir)


def test_bm25_matches_oracle_sf001(spark):
    assert_matches_oracle(bm25_topk(spark, _SF001), _bm25_sql("duckdb"), _SF001)


def test_bm25_idf_discriminates(spark):
    """q_dup_scan pairs the rare term 'dup' (df ~25/500) with the
    ubiquitous 'scan' (df ~398/500): if idf weighting works, every
    top-ranked hit must actually contain 'dup' — a pure-tf ranking
    would instead surface high-'scan' documents."""
    import duckdb

    rows = bm25_topk(spark, _SF001).collect()
    top = [r.doc_id for r in rows if r.qid == "q_dup_scan" and r.rk <= 5]
    assert len(top) == 5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{_SF001}/documents.parquet'"
    )
    with_dup = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE text LIKE '%dup%'"
        ).fetchall()
    }
    con.close()
    assert set(top) <= with_dup, f"top docs {top} must all contain the rare term"


def test_bm25_shape(spark, sf_dir):
    rows = bm25_topk(spark, sf_dir).collect()
    per_q: dict[str, list[int]] = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r.rk)
    assert set(per_q) == {"q_dup_scan", "q_vector_ops", "q_engine"}
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= _TOPK
    # scores are non-increasing in rank within a query
    by_rk = {(r.qid, r.rk): r.bm25 for r in rows}
    for q, rks in per_q.items():
        vals = [by_rk[(q, k)] for k in sorted(rks)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_bm25_search_reads_postings_not_corpus(spark, sf_dir):
    """After the one-time postings build, a BM25 query plan must read
    the materialized posting list only — never re-tokenize the corpus
    (Spark inlines CTEs; the one-shot form paid 4+ corpus scans)."""
    from monday_etl_automation_spark.plans.search_ops import _postings_index

    _postings_index(spark, sf_dir)  # ensure the index exists
    plan = bm25_topk(spark, sf_dir)._jdf.queryExecution().toString()
    assert "Scan parquet" not in plan, f"bm25 rescans the corpus:\n{plan[:600]}"


def test_bm25_search_arbitrary_queries(spark, sf_dir):
    """Caller-supplied queries must agree exactly with the fixed
    parameter-table path for the same (qid, term) pairs, and scale to
    extra queries in the same single pass."""
    from monday_etl_automation_spark.plans.search_ops import _QUERIES, bm25_search

    fixed: dict[str, list[str]] = {}
    for q, t in _QUERIES:
        fixed.setdefault(q, []).append(t)
    got = sorted(map(tuple, bm25_search(spark, sf_dir, fixed).collect()))
    want = sorted(map(tuple, bm25_topk(spark, sf_dir).collect()))
    assert got == want
    # extra queries ride the same pass; casing is normalized
    more = dict(fixed, q_extra=["DUP", "Merge"])
    rows = bm25_search(spark, sf_dir, more).collect()
    per_q = {r.qid for r in rows}
    assert per_q == set(more)
    extra_top = [r for r in rows if r.qid == "q_extra" and r.rk == 1]
    assert extra_top and extra_top[0].bm25 > 0


def test_bm25_matches_log_bm25_shadow(spark):
    """The r8 verdict's fidelity ask: pin the registered scorer against
    TRUE log-BM25. The shadow scorer computes Lucene-form
    ln(1 + (N-df+0.5)/(df+0.5)) idf in double precision; the
    registered scorer uses the exact fixed-point log2 idf (a positive
    global factor of ln2 — rank-invariant). Asserts identical top-k
    ordering wherever the shadow scores are not ties; within a shadow
    tie group the doc sets must still agree."""
    import duckdb

    from monday_etl_automation_spark.plans.search_ops import (
        _bm25_sql,
        _postings_sql,
        _qterms_sql,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
        )
        got = con.execute(_bm25_sql("duckdb")).fetchall()
        shadow_sql = f"""
WITH po AS ({_postings_sql("duckdb")}),
qterms AS ({_qterms_sql("duckdb")}),
dl AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS dl FROM po GROUP BY doc_id),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl),
tf AS (SELECT e.doc_id, e.term, CAST(e.c AS BIGINT) AS tf
  FROM po e JOIN (SELECT DISTINCT term FROM qterms) qt ON e.term = qt.term),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored_terms AS (
  SELECT q.qid, t.doc_id,
    ln(1 + (CAST(m.n AS DOUBLE) - f.df + 0.5) / (f.df + 0.5))
    * (t.tf * 2.2)
    / (t.tf + 1.2 * (0.25 + 0.75 * d.dl * m.n / CAST(m.s AS DOUBLE))) AS st
  FROM qterms q JOIN tf t ON t.term = q.term JOIN df f ON f.term = q.term
  JOIN dl d ON d.doc_id = t.doc_id CROSS JOIN meta m),
agg AS (SELECT qid, doc_id, sum(st) AS score FROM scored_terms GROUP BY qid, doc_id),
ranked AS (SELECT qid, doc_id, score,
  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rk FROM agg)
SELECT qid, doc_id, score, rk FROM ranked WHERE rk <= {_TOPK} ORDER BY qid, rk
"""
        shadow = con.execute(shadow_sql).fetchall()
        con.close()
        got_by_q: dict[str, list[int]] = {}
        for qid, doc, _s, rk in got:
            got_by_q.setdefault(qid, []).append(doc)
        sh_by_q: dict[str, list[tuple[int, float]]] = {}
        for qid, doc, s, rk in shadow:
            sh_by_q.setdefault(qid, []).append((doc, s))
        assert set(got_by_q) == set(sh_by_q)
        for qid, sh in sh_by_q.items():
            docs = got_by_q[qid]
            assert len(docs) == len(sh)
            # identical order except inside shadow-score tie groups
            i = 0
            while i < len(sh):
                j = i
                while j + 1 < len(sh) and abs(sh[j + 1][1] - sh[i][1]) < 1e-9:
                    j += 1
                assert set(docs[i : j + 1]) == {d for d, _ in sh[i : j + 1]}, (
                    f"{sf} {qid}: rank block {i}..{j} diverges from log-BM25:"
                    f" got {docs[i:j + 1]} want {[d for d, _ in sh[i:j + 1]]}"
                )
                i = j + 1


def test_hybrid_rrf_matches_oracle(spark, sf_dir):
    from monday_etl_automation_spark.plans.search_ops import PYTEST_QUERIES

    fn, oracle = PYTEST_QUERIES["hybrid_rrf_topk"]
    assert_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)


def test_hybrid_rrf_fuses_both_lists(spark, sf_dir):
    """A doc present in BOTH lists at rank r must outscore a doc that
    holds rank r in only one list; every fused row carries at least one
    source rank; per-query output is a clean 1..k ranking."""
    from monday_etl_automation_spark.plans.search_ops import hybrid_rrf_topk

    rows = hybrid_rrf_topk(spark, sf_dir).collect()
    assert rows
    per_q: dict[str, list] = {}
    for r in rows:
        assert r.bm_rk > 0 or r.ann_rk > 0
        per_q.setdefault(r.qid, []).append(r)
    for q, rs in per_q.items():
        rks = sorted(r.rk for r in rs)
        assert rks == list(range(1, len(rks) + 1))
        both = [r for r in rs if r.bm_rk > 0 and r.ann_rk > 0]
        single = [r for r in rs if (r.bm_rk > 0) != (r.ann_rk > 0)]
        for b in both:
            for s in single:
                base = s.bm_rk if s.bm_rk > 0 else s.ann_rk
                if max(b.bm_rk, b.ann_rk) <= base:
                    assert b.rrf_nano > s.rrf_nano


def test_bm25_incremental_postings_match_full_rebuild(spark, sf_dir):
    """Persisted postings + O(batch) batch postings must answer queries
    IDENTICALLY to a from-scratch posting build over the grown corpus,
    and the batch tokenize plan must never rescan the corpus."""
    from monday_etl_automation_spark.plans.search_ops import (
        _QUERIES,
        _bm25_tail_sql,
        _postings_index,
        _postings_sql,
        bm25_postings_batch,
        bm25_search_postings,
    )
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    batch = spark.createDataFrame(
        [
            (9_000_001, "dup dup scan merge vector window fast spark"),
            (9_000_002, "a fresh document about vector search and bm25 scoring"),
            (9_000_003, "dup"),
        ],
        "doc_id BIGINT, text STRING",
    )
    inc = bm25_postings_batch(spark, batch)
    # O(batch): the batch postings plan reads no parquet at all
    plan = inc._jdf.queryExecution().toString()  # noqa: SLF001
    assert "Scan parquet" not in plan, "batch postings rescan the corpus"
    merged = _postings_index(spark, sf_dir).unionByName(inc)

    queries: dict[str, list[str]] = {}
    for q, t in _QUERIES:
        queries.setdefault(q, []).append(t)
    got = sorted(map(tuple, bm25_search_postings(spark, merged, queries).collect()))

    # full rebuild over the grown corpus (base ∪ batch), same tail
    base = spark.table("documents").selectExpr("doc_id", "text")
    base.unionByName(batch).createOrReplaceTempView("_bm_grown")
    rebuilt = spark.sql(
        "WITH po AS ("
        + _postings_sql("spark", rel="_bm_grown")
        + "),\n"
        + _bm25_tail_sql("spark", "po")
    )
    want = sorted(map(tuple, rebuilt.collect()))
    assert got == want
    # the planted rare-term doc actually surfaces for the dup query
    dup_top = [r for r in got if r[0] == "q_dup_scan"]
    assert any(r[1] == 9_000_001 for r in dup_top)
