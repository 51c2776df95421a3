"""Rule-engine semantics tests (SURVEY §5 item 3: U2/W1 properties)
plus the §2.11 GROUPED_AGG surface.

The flagship oracle already differential-tests the full engine against
DuckDB on 60k fixture rows; these tests pin the individual SEMANTIC
guarantees on hand-built micro-fixtures where each property is
isolated and the expected answer is computed by eye.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from monday_etl_automation_spark.operators.selection import apply_rules, parse_file_cells

_T = dt.datetime(2024, 1, 1)

_FILES_SCHEMA = "item_id BIGINT, column_id STRING, asset_id BIGINT, file_name STRING, created_at TIMESTAMP"
_RULES_SCHEMA = (
    "column_id STRING, tier INT, include_kw1 STRING, include_kw2 STRING, "
    "exclude_kw1 STRING, file_type STRING, pick STRING, max_count INT"
)


def _rules(spark, rows):
    return spark.createDataFrame(rows, _RULES_SCHEMA)


def _files(spark, rows):
    return spark.createDataFrame(rows, _FILES_SCHEMA)


def test_fallback_never_fires_when_main_tier_matches(spark):
    rules = _rules(
        spark,
        [
            ("docs", 1, "alpha", None, None, "pdf", "latest", None),
            ("docs", 2, None, None, None, "any", "latest", None),  # fallback
        ],
    )
    files = _files(
        spark,
        [
            (1, "docs", 10, "alpha report.pdf", _T),
            (1, "docs", 11, "unrelated.txt", _T + dt.timedelta(days=1)),
        ],
    )
    got = apply_rules(files, rules).collect()
    assert [(r.tier, r.asset_id) for r in got] == [(1, 10)]

    # remove the tier-1 match -> the fallback tier takes over
    files2 = _files(spark, [(1, "docs", 11, "unrelated.txt", _T)])
    got2 = apply_rules(files2, rules).collect()
    assert [(r.tier, r.asset_id) for r in got2] == [(2, 11)]


def test_pick_latest_returns_max_created_at(spark):
    rules = _rules(spark, [("docs", 1, None, None, None, "any", "latest", None)])
    files = _files(
        spark,
        [
            (1, "docs", 10, "a.pdf", _T),
            (1, "docs", 11, "b.pdf", _T + dt.timedelta(hours=2)),
            (1, "docs", 12, "c.pdf", _T + dt.timedelta(hours=1)),
        ],
    )
    got = apply_rules(files, rules).collect()
    assert [(r.asset_id, r.sel_rank) for r in got] == [(11, 1)]


def test_missing_created_at_sorts_last_and_pick_all_caps(spark):
    rules = _rules(spark, [("docs", 1, None, None, None, "any", "all", 2)])
    files = _files(
        spark,
        [
            (1, "docs", 10, "a.pdf", None),  # epoch-0 default -> ranks last
            (1, "docs", 11, "b.pdf", _T),
            (1, "docs", 12, "c.pdf", _T + dt.timedelta(hours=1)),
        ],
    )
    got = sorted((r.asset_id, r.sel_rank) for r in apply_rules(files, rules).collect())
    assert got == [(11, 2), (12, 1)]  # capped at 2, NULL-created file dropped


def test_exclude_keyword_and_type_filter(spark):
    rules = _rules(spark, [("docs", 1, None, None, "brouillon", "pdf", "all", None)])
    files = _files(
        spark,
        [
            (1, "docs", 10, "rapport final.pdf", _T),
            (1, "docs", 11, "rapport BROUILLON.pdf", _T),  # excluded (normalized)
            (1, "docs", 12, "rapport.txt", _T),  # wrong type
        ],
    )
    got = [r.asset_id for r in apply_rules(files, rules).collect()]
    assert got == [10]


def test_malformed_cells_yield_zero_rows(spark):
    cells = spark.createDataFrame(
        [
            (1, "docs", '{"files": [{"assetId": 7, "name": "x.pdf", "createdAt": "2024-01-01T00:00:00"}]}'),
            (2, "docs", "not json at all"),
            (3, "docs", None),
        ],
        "item_id BIGINT, column_id STRING, cell STRING",
    )
    got = parse_file_cells(cells).collect()
    assert [(r.item_id, r.asset_id) for r in got] == [(1, 7)]


def test_grouped_agg_pandas_udf_matches_builtin(spark, sf_dir):
    from monday_etl_automation_spark.functions.grouped import sum_value_micros
    from monday_etl_automation_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    got = (
        events.groupBy("user_id")
        .agg(sum_value_micros(F.col("value")).alias("s"))
        .orderBy("user_id")
        .collect()
    )
    want = (
        events.groupBy("user_id")
        .agg(F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias("s"))
        .orderBy("user_id")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) > 0
