"""Driver-exposed epoch-shuffled split writer (plans/eperm_extra.py,
r17): DuckDB-twin parity for the per-file statistics of the SHIPPED
parquet, artifact caching discipline, and the layout/permutation flags
the hash rides on."""

from __future__ import annotations

from monday_etl_automation_spark.plans.eperm_extra import (
    _EPERM_EPOCHS,
    _EPERM_FILES,
    _eperm_artifact,
    eperm_oracle_body,
    eperm_summary,
)
from oracle_compare import assert_matches_oracle


def test_eperm_matches_oracle(spark, sf_dir):
    assert_matches_oracle(eperm_summary(spark, sf_dir), eperm_oracle_body(), sf_dir)


def test_eperm_artifact_cached_per_snapshot(spark, sf_dir):
    a = _eperm_artifact(spark, sf_dir)
    b = _eperm_artifact(spark, sf_dir)
    assert a is b  # the HANDLE is the artifact (CLAUDE.md)


def test_eperm_layout_and_permutation_shape(spark, sf_dir):
    rows = eperm_summary(spark, sf_dir).collect()
    assert rows
    by_epoch: dict[str, list] = {}
    for r in rows:
        assert r.files_ok == 1  # exactly one parquet file per dir
        assert r.n >= 1
        assert r.min_key <= r.max_key
        by_epoch.setdefault(r.part.split(":")[0], []).append(r)
    assert set(by_epoch) == {f"e{e}" for e in _EPERM_EPOCHS}
    totals = set()
    for parts in by_epoch.values():
        assert len(parts) <= _EPERM_FILES
        # file key ranges are disjoint and ordered — concatenation in
        # file order is the epoch's global permutation
        parts.sort(key=lambda r: int(r.part.split(":f")[1]))
        for a, b in zip(parts, parts[1:]):
            assert a.max_key < b.min_key
        totals.add(sum(r.n for r in parts))
    # both epochs permute the SAME split membership
    assert len(totals) == 1
