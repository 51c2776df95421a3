"""Pins for the r18 integer-exact money aggregation (functions/intsum).

Two laws, checked against the LIVE fixture (so a driver testdata regen
that ships >2-decimal money values breaks loudly here, not as a silent
value drift in a converted query):

1. unscaled(x) == CAST(x AS DECIMAL(.,2)) * 100 for every money column
   the converted queries touch — the boundary where round(x*100) and
   the decimal cast could disagree if values stopped being exact
   2-decimal quantities.
2. SplitSum reconstructs exactly the decimal SUM (same value through
   the same output type) on real, grouped data.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monday_etl_automation_spark.functions.intsum import SplitSum, unscaled  # noqa: E402
from monday_etl_automation_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

MONEY_COLS = [
    ("lineitem", "l_quantity"),
    ("lineitem", "l_extendedprice"),
    ("lineitem", "l_discount"),
    ("lineitem", "l_tax"),
    ("orders", "o_totalprice"),
    ("part", "p_retailprice"),
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
]


@pytest.mark.parametrize("table,col", MONEY_COLS)
def test_unscaled_equals_decimal_cast(spark, table, col):
    df = load_table(spark, SF_DIR, table)
    mism = df.where(
        unscaled(F.col(col))
        != (F.col(col).cast("decimal(18,2)") * 100).cast("bigint")
    ).count()
    assert mism == 0, f"{table}.{col}: {mism} rows where round(x*100) != decimal cast"


def test_splitsum_matches_decimal_sum(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    # charge-shaped expression: the widest per-row value the converted
    # queries aggregate (scale 6, |x| <= ~1.3e11)
    pc = unscaled(F.col("l_extendedprice"))
    dc = unscaled(F.col("l_discount"))
    tc = unscaled(F.col("l_tax"))
    ch = pc * (F.lit(100) - dc) * (F.lit(100) + tc)
    ss = SplitSum(ch, "ch")
    got = (
        l.groupBy("l_returnflag")
        .agg(*ss.aggs)
        .select("l_returnflag", ss.decimal(6, "decimal(34,6)").alias("v"))
    )
    dec = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")
    charge = (dec * (F.lit(1).cast("decimal(4,2)") + F.col("l_tax").cast("decimal(4,2)"))).cast(
        "decimal(24,6)"
    )
    want = l.groupBy("l_returnflag").agg(F.sum(charge).cast("decimal(34,6)").alias("v"))
    g = {r["l_returnflag"]: r["v"] for r in got.collect()}
    w = {r["l_returnflag"]: r["v"] for r in want.collect()}
    assert g == w


def test_splitsum_negative_values(spark):
    # recombination identity must hold for negatives (acctbal can be < 0)
    c = load_table(spark, SF_DIR, "customer")
    bal = unscaled(F.col("c_acctbal"))
    ss = SplitSum(bal, "bal")
    got = c.agg(*ss.aggs).select(ss.decimal(2, "decimal(28,2)").alias("v")).collect()[0]["v"]
    want = c.agg(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("decimal(28,2)").alias("v")).collect()[0]["v"]
    assert got == want
