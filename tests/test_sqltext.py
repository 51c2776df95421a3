"""materialize_ctes transforms every driver oracle (registry) and
every pytest twin (oracle_compare) — pin its edges: CTE heads in all
three placements get the hint, WINDOW clauses and non-CTE aliases do
not, and the rewrite is idempotent and value-preserving."""

from __future__ import annotations

import duckdb

from monday_etl_automation_spark.plans.sqltext import materialize_ctes


def test_cte_heads_all_placements():
    sql = (
        "WITH a AS (SELECT 1 AS x),\n"
        "b AS (SELECT x FROM a), c AS (SELECT x FROM b)\n"
        "  indented AS (SELECT 1)\n"
        "SELECT * FROM c"
    )
    out = materialize_ctes(sql)
    assert "WITH a AS MATERIALIZED (SELECT 1" in out
    assert "\nb AS MATERIALIZED (" in out
    assert ", c AS MATERIALIZED (" in out
    assert "indented AS MATERIALIZED (" in out


def test_window_clause_and_aliases_untouched():
    sql = (
        "WITH h AS (SELECT 1 AS x)\n"
        "SELECT max(x) OVER w AS (SELECT 1)\n"  # pathological text, not a CTE
        "FROM h, (VALUES (1)) pk(k)\n"
        "  WINDOW w AS (PARTITION BY x)"
    )
    out = materialize_ctes(sql)
    assert "WINDOW w AS (PARTITION BY x)" in out  # window def untouched
    assert "(VALUES (1)) pk(k)" in out
    assert out.count("MATERIALIZED") == 1  # only the real CTE


def test_idempotent():
    sql = "WITH a AS (SELECT 1 AS x)\nSELECT * FROM a"
    once = materialize_ctes(sql)
    assert materialize_ctes(once) == once


def test_value_preserving_on_duckdb():
    sql = (
        "WITH a AS (SELECT unnest(range(5)) AS x),\n"
        "b AS (SELECT x * 2 AS y FROM a)\n"
        "SELECT sum(y) AS s FROM b"
    )
    con = duckdb.connect()
    assert con.execute(sql).fetchall() == con.execute(materialize_ctes(sql)).fetchall()


def test_every_registry_oracle_carries_the_hint():
    """Every CTE head in every driver oracle gets the hint — except
    `WITH RECURSIVE` heads, which the regex correctly skips (the
    RECURSIVE keyword sits between WITH and the name, and a recursive
    CTE cannot take MATERIALIZED anyway)."""
    import re

    from monday_etl_automation_spark.plans import registry

    for name, sql in registry.oracle_sql().items():
        out = materialize_ctes(sql)
        bare = [
            frag
            for frag in re.findall(r"(?:\S+ )?\S+ AS \(", out)
            if not frag.endswith("AS MATERIALIZED (")
            and not frag.startswith("RECURSIVE ")
            and "WINDOW" not in frag
        ]
        assert not bare, f"{name}: unhinted CTE head(s): {bare[:3]}"
