"""Driver-exposed streaming vector-ingest section (vstream shape,
plans/vstream_extra.py): DuckDB one-shot-twin parity for the shipped
index-table aggregates, plus non-vacuity."""

from __future__ import annotations

from monday_etl_automation_spark.plans.vstream_extra import (
    vstream_oracle_body,
    vstream_summary,
)
from oracle_compare import assert_matches_oracle


def test_vstream_summary_matches_one_shot_oracle(spark, sf_dir):
    assert_matches_oracle(vstream_summary(spark, sf_dir), vstream_oracle_body(), sf_dir)


def test_vstream_state_is_nonempty_and_conserved(spark, sf_dir):
    rows = {r.part: r for r in vstream_summary(spark, sf_dir).collect()}
    n = rows["vec"].n
    assert n > 0
    # every ingested vector has exactly one bucket per probe set and
    # one owning inverted list — despite batches 2 and 3 redelivering
    # earlier rows (the sink's anti-join skip is what this conserves)
    for s in (1, 2, 3, 4):
        assert rows[f"b{s}"].n == n
    assert rows["ivf"].n == n
    # r17: the shipped code tables carry one row per (vector, subspace)
    assert rows["pqc"].n == 16 * n
    assert rows["ipqc"].n == 16 * n
