"""Dry-run of the vector_extra split contingency (COVERAGE.md r17,
r17 verdict item 4).

`vector_extra` carries 11 shapes under one driver hash — the most
load-bearing registry entry. The PLANNED split (seat pressure or an
un-diagnosable red) cuts on the family axis: SEARCH shapes keep the
entry, PIPELINE shapes move out. The one coupling is the hoisted
pq/ivfpq trainer chains: the search half keeps the hoist (its pq/ivfpq
branches reference the prefixed CTEs); a standalone pipeline half must
let vstream embed its own copies (include_trainers=True).

These tests PROVE the split works before it is ever needed: each half
is composed from the SAME per-shape sections the shipping entry uses
(vector_extra.compose_frames / compose_oracle — the split is a flag
flip, not new SQL) and hash-compared against DuckDB at sf0.01, the
driver's correctness SF. No registry change — this is contingency
insurance, not a new entry.

Skippable-slow: sf0.01 index builds + the DuckDB twin cost ~2-4 min,
so the default gate skips them; run with SPARK_GRAFT_SLOW=1 (recorded
in COVERAGE.md each time the contingency plan changes).
"""

from __future__ import annotations

import os

import pytest

from monday_etl_automation_spark.plans.vector_extra import (
    PIPELINE_SHAPES,
    SEARCH_SHAPES,
    compose_frames,
    compose_oracle,
    shape_frames,
)
from tests.oracle_compare import assert_matches_oracle

slow = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW") != "1",
    reason="sf0.01-heavy contingency dry-run; set SPARK_GRAFT_SLOW=1",
)

SF = "/root/testdata/sf0.01"


@slow
def test_search_half_matches_oracle(spark):
    df = compose_frames(shape_frames(spark, SF), SEARCH_SHAPES)
    assert_matches_oracle(df, compose_oracle(SEARCH_SHAPES, hoist_trainers=True), SF)


@slow
def test_pipeline_half_matches_oracle(spark):
    df = compose_frames(shape_frames(spark, SF), PIPELINE_SHAPES)
    assert_matches_oracle(
        df, compose_oracle(PIPELINE_SHAPES, hoist_trainers=False), SF
    )


def test_halves_partition_the_shape_set():
    """Cheap invariant, always on: the two halves cover every shipping
    shape exactly once (a shape added to the entry without a seat in
    the contingency plan fails here, not mid-incident)."""
    from monday_etl_automation_spark.plans.vector_extra import ALL_SHAPES

    assert sorted(SEARCH_SHAPES + PIPELINE_SHAPES) == sorted(ALL_SHAPES)
    assert len(set(ALL_SHAPES)) == len(ALL_SHAPES)
