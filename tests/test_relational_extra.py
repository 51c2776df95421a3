"""Oracle-differential tests for the non-registered extra shapes.

Same gate as the registered queries (tests/test_queries.py) — these
live outside the driver's 50-entry window but are held to the
identical correctness standard.
"""

from __future__ import annotations

import pytest

from monday_etl_automation_spark.plans.relational_extra import EXTRA_QUERIES
from oracle_compare import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, sf_dir, name):
    fn, oracle = EXTRA_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), oracle, sf_dir)
