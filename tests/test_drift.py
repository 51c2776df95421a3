"""Snapshot drift monitor: identity zero, planted-drift detection,
vanished-source rows, DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from monday_etl_automation_spark.plans.drift_ops import source_drift, source_drift_oracle


def test_identity_drift_is_zero(spark, sf_dir):
    rows = source_drift(spark, sf_dir, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.docs_a == r.docs_b and r.tokens_a == r.tokens_b
        assert r.share_ppm_a == r.share_ppm_b and r.abs_delta_ppm == 0
    # ppm shares sum to 1e6 up to one floor-ulp per source
    s = sum(r.share_ppm_a for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000


@pytest.fixture(scope="module")
def drifted_dir(spark, sf_dir, tmp_path_factory):
    """Snapshot B: one source thinned to ~40%, another dropped."""
    out = str(tmp_path_factory.mktemp("snap_b"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sources = sorted(r.source for r in docs.select("source").distinct().collect())
    thin, gone = sources[0], sources[-1]
    # sources are assigned by doc_id residue in the synthetic data, so
    # the thinning predicate must use a modulus coprime-ish to that
    # assignment (doc_id % 40 halves a %-20 residue class)
    docs.where(
        f"source <> '{gone}' AND (source <> '{thin}' OR doc_id % 40 = 0)"
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out, thin, gone


def test_planted_drift_detected(spark, sf_dir, drifted_dir):
    out, thin, gone = drifted_dir
    rows = {r.source: r for r in source_drift(spark, sf_dir, out).collect()}
    # thinned source: fewer docs, lower share, positive delta
    r = rows[thin]
    assert r.docs_b < r.docs_a and r.share_ppm_b < r.share_ppm_a
    assert r.abs_delta_ppm > 0
    # vanished source surfaces as a row with zero B-side mass
    r = rows[gone]
    assert r.docs_a > 0 and r.docs_b == 0 and r.tokens_b == 0
    assert r.share_ppm_b == 0 and r.abs_delta_ppm == r.share_ppm_a
    # untouched sources still drift in SHARE (the mixture is relative:
    # removing mass elsewhere raises everyone else's share)
    others = [rows[s] for s in rows if s not in (thin, gone)]
    assert others and all(r.docs_a == r.docs_b for r in others)
    assert all(r.share_ppm_b >= r.share_ppm_a for r in others)


def test_drift_matches_duckdb_twin(spark, sf_dir, drifted_dir):
    out, _, _ = drifted_dir
    got = sorted(tuple(r) for r in source_drift(spark, sf_dir, out).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents_a AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    con.execute(
        f"CREATE VIEW documents_b AS SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(source_drift_oracle()).fetchall())
    con.close()
    assert got == want


def test_empty_snapshot_alarms_not_nulls(spark, sf_dir, tmp_path):
    """A snapshot that produced ZERO rows (failed crawl) is the
    loudest drift there is: every source must surface share_b=0 and
    delta=share_a — never NULL columns that silence a TVD alarm."""
    out = str(tmp_path / "empty")
    spark.read.parquet(f"{sf_dir}/documents.parquet").where("1 = 0").write.mode(
        "overwrite"
    ).parquet(f"{out}/documents.parquet")
    rows = source_drift(spark, sf_dir, out).collect()
    assert rows
    for r in rows:
        assert r.docs_b == 0 and r.tokens_b == 0
        assert r.share_ppm_b == 0
        assert r.abs_delta_ppm == r.share_ppm_a is not None
