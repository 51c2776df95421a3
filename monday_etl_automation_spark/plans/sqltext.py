"""Oracle-side SQL text utilities.

``materialize_ctes``: force ``AS MATERIALIZED`` on every CTE of a
DuckDB oracle. DuckDB 1.0 INLINES CTEs by default, so a deep
self-referencing chain (unrolled Lloyd rounds, staged encoders)
re-evaluates its upstream tree once per reference — the same
exponential blowup Spark's CTE inlining has, which this repo's Spark
executors already avoid with stepwise localCheckpoints. Measured on
the IVF-PQ one-shot twin at sf0.001: 61.7s inlined -> 0.9s
materialized, byte-identical results (r17, BENCH_NOTES_r17.md). The
r16 comment "DuckDB materializes repeated CTEs" described newer
planners, not the 1.0.0 in this container.

Only DuckDB oracle strings go through this — Spark SQL has no
MATERIALIZED keyword (its executors materialize via localCheckpoint
instead).
"""

from __future__ import annotations

import re

# a CTE head is `name AS (` at line start, or after `WITH ` / `, `
# mid-line (the generated chains place heads both ways). Window-clause
# definitions (`WINDOW w AS (` — relational.py q2 shape) must NOT
# match: `WINDOW ` is excluded because the lookbehind set does not
# include it and the line-start alternative requires the name to BE
# the first token. Derived-table, VALUES, and column aliases never
# have the `name AS (` shape.
_CTE_HEAD = re.compile(
    r"(?m)(^[ \t]*|(?<=WITH )|(?<=, ))([A-Za-z_][A-Za-z_0-9]*) AS \("
)


def materialize_ctes(sql: str) -> str:
    """Rewrite every CTE head ``name AS (`` to
    ``name AS MATERIALIZED (`` — idempotent."""
    return _CTE_HEAD.sub(
        r"\1\2 AS MATERIALIZED (", sql.replace(" AS MATERIALIZED (", " AS (")
    )


def spark_str_lit(s: str) -> str:
    """A Spark SQL single-quoted string literal for ``s``, safe for
    interpolation into VALUES parameter relations. Spark string
    literals interpret backslash escape sequences (default
    ``spark.sql.parser.escapedStringLiterals=false``), so both the
    backslash AND the quote must be escaped — a bare
    ``replace("'", "''")`` would silently alter any value containing a
    backslash (r18 ADVICE)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def tail_order(dialect: str, keys: str) -> str:
    """Final ORDER BY for the DuckDB twin ONLY. Every compare that
    consumes these bodies (the driver hash, strict_compare,
    tests/oracle_compare) sorts rows before comparing, so a Spark-side
    trailing sort buys nothing and costs a boundary-sampling job + a
    range Exchange + Sort per execution (guide §2.4, r18). The DuckDB
    side keeps the sort: it is free there and keeps twin output
    deterministic for human inspection."""
    return "" if dialect == "spark" else f"\nORDER BY {keys}"
