"""Decontamination + PII scrubbing: DuckDB-twin parity and
planted-positive detection (the checks must not pass vacuously)."""

from __future__ import annotations

from monday_etl_automation_spark.plans.decontam_ops import (
    _BENCH_MOD,
    _HIT_MIN,
    _PII_MOD,
    _PLANT_MOD,
    benchmark_overlap,
    benchmark_overlap_oracle,
    pii_scrub,
    pii_scrub_oracle,
)
from oracle_compare import assert_matches_oracle


def test_benchmark_overlap_matches_oracle(spark, sf_dir):
    assert_matches_oracle(benchmark_overlap(spark, sf_dir), benchmark_overlap_oracle(), sf_dir)


def test_benchmark_overlap_flags_planted_docs(spark, sf_dir):
    rows = {r.doc_id: r for r in benchmark_overlap(spark, sf_dir).collect()}
    planted = [d for d in rows if d % _PLANT_MOD == 0]
    assert planted, "fixture has no planted doc_ids — raise sf or lower _PLANT_MOD"
    # every planted doc shares the sentinel's n-grams with the benchmark
    for d in planted:
        assert rows[d].is_contaminated == 1, f"planted doc {d} not flagged"
        assert rows[d].n_hits >= _HIT_MIN
    # benchmark docs are excluded from the checked corpus
    assert all(d % _BENCH_MOD != 0 for d in rows)
    # flagged set is planted docs + (rare) natural collisions — sanity:
    # the clean majority stays clean
    flagged = sum(r.is_contaminated for r in rows.values())
    assert flagged < len(rows) // 2, f"{flagged}/{len(rows)} flagged — threshold broken?"


def test_pii_scrub_matches_oracle(spark, sf_dir):
    assert_matches_oracle(pii_scrub(spark, sf_dir), pii_scrub_oracle(), sf_dir)


def test_pii_scrub_detects_and_redacts_planted_pii(spark, sf_dir):
    rows = {r.doc_id: r for r in pii_scrub(spark, sf_dir).collect()}
    planted = [d for d in rows if d % _PII_MOD == 0]
    assert planted
    for d, r in rows.items():
        if d % _PII_MOD == 0:
            assert r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips >= 1, d
        else:
            assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0), d
        # the scrub is total: no pattern survives in the clean text
        assert r.residual_pii == 0, f"doc {d}: {r.residual_pii} PII left after scrub"
