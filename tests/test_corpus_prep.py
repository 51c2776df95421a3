"""Composed corpus-prep pipeline: DuckDB-twin parity, disposition
sanity, and formula-sync cross-checks against the component operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.corpus_ops import (
    corpus_prep,
    corpus_prep_oracle,
    corpus_prep_summary,
)
from oracle_compare import assert_matches_oracle


def test_corpus_prep_matches_oracle(spark, sf_dir):
    assert_matches_oracle(corpus_prep(spark, sf_dir), corpus_prep_oracle(), sf_dir)


def test_corpus_prep_covers_every_doc_once(spark, sf_dir):
    from monday_etl_automation_spark.sources.tables import load_table

    out = corpus_prep(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    dispositions = {r.disposition for r in out.select("disposition").distinct().collect()}
    assert "kept" in dispositions
    assert dispositions <= {
        "kept",
        "dropped_quality",
        "dropped_lang",
        "dropped_exact_dup",
        "dropped_near_dup",
    }
    # kept docs (and only kept docs) chunk
    assert out.where("disposition = 'kept' AND n_chunks <= 0").count() == 0
    assert out.where("disposition <> 'kept' AND n_chunks <> 0").count() == 0


def test_corpus_quality_matches_profile(spark, sf_dir):
    """The inlined quality formula must stay identical to
    text_profile's quality_score — the sync pin for the deliberate
    duplication."""
    from monday_etl_automation_spark.plans.corpus_ops import _quality_cte
    from monday_etl_automation_spark.plans.text_ops import text_profile
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    mine = spark.sql(
        f"WITH {_quality_cte('spark')} SELECT doc_id, quality_score FROM quality"
    )
    theirs = text_profile(spark, sf_dir).select("doc_id", "quality_score")
    assert mine.exceptAll(theirs).count() == 0
    assert theirs.exceptAll(mine).count() == 0


def test_dropping_quality_doc_does_not_drop_its_near_dup(spark, sf_dir):
    """Scoping rule: near-dup edges to docs already dropped by a gate
    or exact-dedup must not drop the surviving endpoint."""
    out = corpus_prep(spark, sf_dir)
    # any doc marked dropped_near_dup must have a SURVIVING smaller-id
    # neighbor — verify via the summary invariant instead of graph
    # reconstruction: near-dup drops <= near-dup pairs
    n_near = out.where("disposition = 'dropped_near_dup'").count()
    from monday_etl_automation_spark.plans.dedup_ops import simhash_near_pairs

    n_pairs = simhash_near_pairs(spark, sf_dir).count()
    assert n_near <= n_pairs


def test_gate_dropped_smaller_neighbor_does_not_drop_survivor(spark, sf_dir):
    """Adversarial injection for the fail-open bug: a near-dup pair
    whose SMALLER-id member is dropped by the quality gate must leave
    the surviving member 'kept' (the LEFT JOIN to after_exact finds no
    row for a gate-dropped neighbor, and a naive NULL test would treat
    that as a surviving neighbor).

    Construction: simhash is a per-token +1/-1 majority vote, so a
    text repeated N times has the IDENTICAL signature (hamming 0 →
    guaranteed band match) while its token count scales N× — push it
    past the 1000-token quality cap and the clone fails the gate
    (loses the 40-point length component AND the 15-point
    distinct-ratio component, so score <= 45 < 55) while staying a
    near-dup of the original."""
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    before = {r.doc_id: r.disposition for r in corpus_prep(spark, sf_dir).collect()}
    base = spark.table("documents")
    victim = (
        corpus_prep(spark, sf_dir)
        .where("disposition = 'kept'")
        .orderBy("doc_id")
        .first()
        .doc_id
    )
    vrow = base.where(F.col("doc_id") == victim).first()
    n_toks = len(vrow.text.split())
    rep = max(2, 1000 // n_toks + 1)
    clone = spark.createDataFrame(
        [(-5, " ".join([vrow.text] * rep), vrow.lang, vrow.source, len(vrow.text) * rep)],
        schema=base.schema,
    )
    base.unionByName(clone).createOrReplaceTempView("documents")
    try:
        out = {r.doc_id: r.disposition for r in corpus_prep(spark, sf_dir).collect()}
        assert out[-5] == "dropped_quality"
        # the survivor must NOT be collateral damage of its gate-dropped twin
        assert out[victim] == "kept"
        # and nobody else's disposition may shift either
        assert {k: v for k, v in out.items() if k != -5} == before
    finally:
        spark._mea_views_sf_dir = None  # noqa: SLF001
        register_views(spark, sf_dir)


def test_exact_dup_branch_fires_on_injected_duplicate(spark, sf_dir):
    """The synthetic corpus has no exact duplicates (verified via
    DuckDB), so the dropped_exact_dup branch would be vacuously green;
    inject a verbatim copy of a kept doc and assert the copy (higher
    doc_id) is dropped as an exact dup while the original stays kept."""
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    kept_id = corpus_prep(spark, sf_dir).where("disposition = 'kept'").first().doc_id
    base = spark.table("documents")
    clone = base.where(F.col("doc_id") == kept_id).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    base.unionByName(clone).createOrReplaceTempView("documents")
    try:
        out = {r.doc_id: r.disposition for r in corpus_prep(spark, sf_dir).collect()}
        assert out[kept_id] == "kept"
        assert out[kept_id + 10_000_000] == "dropped_exact_dup"
    finally:
        spark._mea_views_sf_dir = None  # noqa: SLF001
        register_views(spark, sf_dir)


def test_summary_totals(spark, sf_dir):
    rows = corpus_prep_summary(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    from monday_etl_automation_spark.sources.tables import load_table

    assert total == load_table(spark, sf_dir, "documents").count()
    kept = [r for r in rows if r.disposition == "kept"]
    assert kept and kept[0].n_chunks > 0
