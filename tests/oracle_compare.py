"""Local mimic of the driver's DuckDB-oracle differential check.

Runs a Spark DataFrame and a DuckDB SQL string over the same parquet
tables and asserts row-count, column names, and order-insensitive
value equality. Floats are compared after round(9) so legitimate
last-ulp differences don't flake the local loop, but any real drift
fails loudly (the driver's own check may be stricter — queries should
aim for exact values: integers, strings, timestamps, or explicitly
rounded aggregates).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 9):.9f}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    from monday_etl_automation_spark.plans.sqltext import materialize_ctes

    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]

    con = duckdb_con(sf_dir)
    # same CTE hint the registry applies to every driver oracle —
    # DuckDB 1.0 inlines CTEs, and the deep twin chains (ivfpq: 61.7s
    # -> 0.9s) dominate the suite's DuckDB wall without it (r17)
    res = con.execute(materialize_ctes(oracle_sql))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"

    sn, dn = _normalize(s_cols, s_rows), _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"values differ; first diffs (spark vs duckdb): {diffs}")
