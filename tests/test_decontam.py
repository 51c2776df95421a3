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


def test_pii_regex_parity_adversarial(spark, sf_dir):
    """The PII twin's exactness rests on Java regex and RE2 agreeing on
    the three patterns. Pin that agreement on adversarial strings —
    almost-emails, boundary-adjacent phones, >3-digit octets, unicode
    neighbors — by counting matches over the same relation in both
    engines. A pattern revision that drifts between engines fails
    here, not in a driver-round hash mismatch."""
    import duckdb
    import pandas as pd

    from monday_etl_automation_spark.plans.decontam_ops import _PII_PATTERNS, _rx

    cases = [
        "plain text no pii",
        "a@b.co",
        "a@b.c",  # TLD too short: no match
        "x..y@ex.com and x.y@e-x.org",
        "not@an@email.com",  # greedy local part: engines must agree
        "@nolocal.com",
        "trailing dot@ex.com.",
        "555-123-4567",
        "x555-123-4567",  # \b before 5: digit-letter boundary
        "1555-123-4567",  # no boundary between 1 and 5: no match
        "555-123-45678",  # trailing extra digit: \b fails
        "555.123.4567",  # dots: not our pattern
        "10.0.0.1 and 255.255.255.255",
        "1234.0.0.1",  # leading octet 4 digits
        "10.0.0.1234",  # trailing octet 4 digits
        "1.2.3.4.5",  # five octets: engines must agree on the match span
        "v1.2.3.4rc",  # letters flush against the dots
        "café@exämple.com",  # unicode: [A-Za-z] classes are ASCII-only
        "email: a.b-c_d%e+f@sub.domain.info done",
        "ip:(10.20.30.40)",
    ]
    pdf = pd.DataFrame({"id": range(len(cases)), "s": cases})
    spark.createDataFrame(pdf).createOrReplaceTempView("_pii_cases")
    exprs = ", ".join(
        f"size(regexp_extract_all(s, '{_rx('spark', pat)}', 0)) AS n_{tag}"
        for tag, pat in _PII_PATTERNS.items()
    )
    got_spark = {
        r.id: (r.n_email, r.n_phone, r.n_ip)
        for r in spark.sql(f"SELECT id, {exprs} FROM _pii_cases").collect()
    }
    con = duckdb.connect()
    con.register("_pii_cases", pdf)
    dexprs = ", ".join(
        f"CAST(len(regexp_extract_all(s, '{_rx('duckdb', pat)}')) AS INT) AS n_{tag}"
        for tag, pat in _PII_PATTERNS.items()
    )
    got_duck = {
        r[0]: tuple(r[1:])
        for r in con.execute(f"SELECT id, {dexprs} FROM _pii_cases").fetchall()
    }
    assert got_spark == got_duck, {
        i: (got_spark[i], got_duck[i], cases[i])
        for i in got_spark
        if got_spark[i] != got_duck[i]
    }
    # and the patterns actually fire on the canonical positives
    assert got_spark[7] == (0, 1, 0) and got_spark[12] == (0, 0, 2)
