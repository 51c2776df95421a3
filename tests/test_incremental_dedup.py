"""Incremental dedup: an incoming batch dispositioned against the
persisted corpus indexes — exact-hash and simhash near-dup — with
DuckDB twins and planted positives. This is the operation the
persisted fingerprint indexes exist FOR: ingest-time dedup without a
corpus rescan."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.dedup_ops import (
    _HAMMING_MAX,
    _simhash_sql,
    dedup_exact_incremental,
    near_dup_incremental,
)
from monday_etl_automation_spark.sources.tables import register_views

_B = 30_000_000  # batch ids sit above every corpus id


@pytest.fixture()
def batch_pdf(spark, sf_dir):
    """Batch: verbatim clone (exact+near dup of corpus), twin pair of a
    fresh doc (dup_in_batch), lightly perturbed clone (near-dup only),
    and a genuinely new doc."""
    register_views(spark, sf_dir)
    rows = (
        spark.table("documents")
        .orderBy("doc_id")
        .limit(2)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .collect()
    )
    d0, d1 = rows[0], rows[1]
    fresh = "completely novel payload " * 8
    perturbed = d1.text.replace(d1.text.split()[0], "zzz", 1)
    return pd.DataFrame(
        {
            "doc_id": [_B + 1, _B + 2, _B + 3, _B + 4, _B + 5],
            "text": [d0.text, fresh, fresh, perturbed, "another brand new doc " * 6],
            "lang": [d0.lang, "en", "en", d1.lang, "en"],
            "source": ["src0"] * 5,
            "n_chars": [len(d0.text), len(fresh), len(fresh), len(perturbed), 132],
        }
    ), (d0, d1)


def test_exact_incremental_dispositions_and_twin(spark, sf_dir, batch_pdf):
    pdf, (d0, _d1) = batch_pdf
    out = dedup_exact_incremental(spark, sf_dir, spark.createDataFrame(pdf))
    got = {r.doc_id: (r.disposition, r.keeper_doc_id) for r in out.collect()}
    assert got[_B + 1] == ("dup_of_corpus", d0.doc_id)
    assert got[_B + 2] == ("new", _B + 2)
    assert got[_B + 3] == ("dup_in_batch", _B + 2)
    assert got[_B + 4][0] == "new"
    assert got[_B + 5][0] == "new"
    # DuckDB twin: same dispositions computed from scratch over
    # corpus + registered batch
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.register("new_batch", pdf)
    twin = con.execute(
        r"""
WITH corpus_hash AS (
  SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS text_hash,
         min(doc_id) AS corpus_keeper
  FROM documents GROUP BY 1
),
batch AS (
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS text_hash
  FROM new_batch
),
batch_min AS (SELECT text_hash, min(doc_id) AS batch_keeper FROM batch GROUP BY 1)
SELECT b.doc_id,
       CASE WHEN c.corpus_keeper IS NOT NULL THEN 'dup_of_corpus'
            WHEN b.doc_id <> m.batch_keeper THEN 'dup_in_batch'
            ELSE 'new' END AS disposition,
       CAST(coalesce(c.corpus_keeper, m.batch_keeper) AS BIGINT) AS keeper
FROM batch b
JOIN batch_min m ON b.text_hash = m.text_hash
LEFT JOIN corpus_hash c ON b.text_hash = c.text_hash
ORDER BY b.doc_id
"""
    ).fetchall()
    assert {t[0]: (t[1], t[2]) for t in twin} == got


def test_exact_incremental_agrees_with_full_rebuild(spark, sf_dir, batch_pdf):
    """Incremental keeper == full-rebuild keeper whenever batch ids are
    larger than corpus ids (the monotone-id ingest invariant)."""
    from monday_etl_automation_spark.plans.dedup_ops import dedup_exact

    pdf, _ = batch_pdf
    inc = {
        r.doc_id: r.keeper_doc_id
        for r in dedup_exact_incremental(spark, sf_dir, spark.createDataFrame(pdf)).collect()
    }
    base = spark.table("documents")
    merged = base.unionByName(spark.createDataFrame(pdf))
    merged.createOrReplaceTempView("documents")
    try:
        full = {
            r.keep_doc_id: r.text_hash for r in dedup_exact(spark, sf_dir).collect()
        }
        # every incremental keeper must be a full-rebuild keeper
        assert set(inc.values()) <= set(full)
    finally:
        from monday_etl_automation_spark.sources.tables import clear_artifact_caches

        spark._mea_views_sf_dir = None  # noqa: SLF001
        register_views(spark, sf_dir)
        clear_artifact_caches(spark)


def test_near_dup_incremental_detects_planted_and_twin(spark, sf_dir, batch_pdf):
    pdf, (d0, d1) = batch_pdf
    out = near_dup_incremental(spark, sf_dir, spark.createDataFrame(pdf))
    got = {r.doc_id: (r.has_near_dup, r.nearest_corpus_doc_id) for r in out.collect()}
    assert got[_B + 1] == (1, d0.doc_id)  # verbatim clone: hamming 0
    assert got[_B + 4][0] == 1  # one-word perturbation survives simhash
    assert got[_B + 2][0] == 0 and got[_B + 5][0] == 0  # fresh docs clean
    # DuckDB twin of the candidate set: same simhash + band pigeonhole
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.register("new_batch", pdf)
    csims = _simhash_sql("duckdb").replace("\nORDER BY doc_id", "")
    bsims = csims.replace("FROM documents", "FROM new_batch")
    twin = con.execute(
        f"""
WITH c AS ({csims}), b AS ({bsims}),
bkv AS (SELECT doc_id, simhash, j AS band_idx,
               (simhash // CAST(pow(2, j * 15) AS BIGINT)) % 32768 AS band_key
        FROM b, (SELECT unnest([0,1,2,3]) AS j)),
ckv AS (SELECT doc_id, simhash, j AS band_idx,
               (simhash // CAST(pow(2, j * 15) AS BIGINT)) % 32768 AS band_key
        FROM c, (SELECT unnest([0,1,2,3]) AS j)),
near AS (
  SELECT DISTINCT bkv.doc_id AS bd, ckv.doc_id AS cd,
         CAST(bit_count(xor(bkv.simhash, ckv.simhash)) AS INT) AS h
  FROM bkv JOIN ckv ON bkv.band_idx = ckv.band_idx AND bkv.band_key = ckv.band_key
)
SELECT bd, cd, h FROM near WHERE h <= {_HAMMING_MAX} ORDER BY bd, h, cd
"""
    ).fetchall()
    best = {}
    for bd, cd, h in twin:
        best.setdefault(bd, (cd, h))
    for doc_id, (has_nd, nearest) in got.items():
        if has_nd:
            assert best[doc_id][0] == nearest, doc_id
        else:
            assert doc_id not in best, doc_id


def test_incremental_uses_index_not_corpus_scan(spark, sf_dir, batch_pdf):
    """Scale contract: the incremental plans must not rescan the
    documents parquet — the only corpus access is the persisted index
    (localCheckpoint scan)."""
    pdf, _ = batch_pdf
    # warm the indexes so the plan below is pure search
    dedup_exact_incremental(spark, sf_dir, spark.createDataFrame(pdf))
    near_dup_incremental(spark, sf_dir, spark.createDataFrame(pdf))
    for fn in (dedup_exact_incremental, near_dup_incremental):
        plan = fn(spark, sf_dir, spark.createDataFrame(pdf))._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan, f"{fn.__name__} rescans the corpus:\n{plan[:500]}"
