"""Oracle-differential tests for every registered query (sf0.001).

Mirrors the driver's verify loop: each queries() entry must match its
oracle_sql() DuckDB result on row-count, column names, and
order-insensitive values. sf0.001 keeps the loop fast; driver_sim.py
runs the same check at sf0.01 (the driver's gate scale).
"""

from __future__ import annotations

import pytest

from monday_etl_automation_spark.plans import registry
from oracle_compare import assert_matches_oracle

_QUERIES = registry.queries()
_ORACLES = registry.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    if name in _ORACLES:
        assert_matches_oracle(df, _ORACLES[name], sf_dir)
    else:
        assert df.count() >= 0  # rows-only check for non-SQL-expressible ops


def test_every_query_has_oracle_or_is_whitelisted():
    """Queries without oracles get a weaker driver check — keep that
    set explicit so coverage regressions are visible."""
    no_oracle = set(_QUERIES) - set(_ORACLES)
    assert no_oracle <= set(), f"unexpected oracle-less queries: {no_oracle}"


def test_registry_fits_driver_window():
    """The driver's correctness pass covers only the first 50
    registered queries (round-1 lesson: 7 of 57 shipped unchecked).
    Every operator's covering query must sit inside that window."""
    assert len(_QUERIES) <= 50, f"registry has {len(_QUERIES)} queries; driver checks only 50"


def test_quantile_matches_independent_quantile_cont():
    """QUANTILE_ORACLE is the same SQL text as the Spark side (shared
    rank construct), so the driver compare alone would let a bug in
    that construct pass on both engines. Pin the construct against
    DuckDB's INDEPENDENT quantile_cont implementation (round-9
    code-review finding)."""
    import duckdb

    from monday_etl_automation_spark.plans.relational import QUANTILE_SQL

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'"
        )
        got = con.execute(QUANTILE_SQL).fetchall()
        want = con.execute(
            """
SELECT l_returnflag,
  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.25), 6) AS q25,
  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS median,
  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.75), 6) AS q75,
  min(CAST(l_quantity AS DOUBLE)) AS min_qty,
  max(CAST(l_quantity AS DOUBLE)) AS max_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".strip()
        ).fetchall()
        con.close()
        assert got == want, f"{sf}: histogram quantiles diverge from quantile_cont"
