"""General relational analytics surface (SURVEY.md §2.3-§2.6 note rows).

The reference's relational operators are key-lookups and top-1 windows;
a general engine must also cover the standard analytics shapes the
TPC-H-ish testdata exercises: multi-way joins, hash aggregation,
rollup/grouping sets, ranking windows, and set operations. Everything
below is a declarative DataFrame plan — Catalyst chooses broadcast vs
shuffle joins (AQE re-plans at runtime), pushes filters into the
parquet scans, and prunes columns.

Numeric policy for oracle-exactness: money/quantity sums cast to
DECIMAL(18,2) *before* aggregation (exact, order-insensitive —
float sums would drift between Spark's and DuckDB's reduction
orders). Final OUTPUTS are always driver-safe types (BIGINT,
DOUBLE, STRING, naive TIMESTAMP): the driver's value-hash renders
DuckDB DECIMAL/HUGEINT as float64 while Spark keeps Decimal
objects, so any trailing-zero decimal ("770970.00" vs "770970.0")
hash-mismatches — both sides therefore CAST the exact decimal
aggregate to DOUBLE as the last step (correctly-rounded nearest
double in both engines => bit-identical).

Scale notes (100 TB posture):
- fact-to-fact joins (lineitem⋈orders) shuffle on the join key; both
  sides would be bucketed on orderkey in a real deployment, the plan
  here is unchanged.
- dims (region/nation/customer/supplier/part) stay under the
  broadcast threshold at any SF that keeps them dimension-shaped.
- aggregations are partial+final hash aggs (map-side combine) —
  verified via .explain: HashAggregate(partial) -> Exchange ->
  HashAggregate(final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monday_etl_automation_spark.functions.intsum import SplitSum, unscaled
from monday_etl_automation_spark.sources.tables import load_table

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# q1 — pricing summary (TPC-H Q1 shape): scan-heavy group-agg
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r18 (guide §2.3, narrower types): the four decimal SUMs were the
    # stage cost (1.4s single-task at sf0.1); identical values come out
    # of long per-row math + split int64 accumulators at 0.6-0.8s. The
    # reconstructed decimals carry the OLD sum types (28,2)/(28,4)/
    # (34,6), so every downstream expression (avg division, double
    # cast) is bit-identical to the decimal formulation.
    l = _t(spark, sf_dir, "lineitem")
    qc = unscaled(F.col("l_quantity"))
    pc = unscaled(F.col("l_extendedprice"))
    dc = unscaled(F.col("l_discount"))
    tc = unscaled(F.col("l_tax"))
    dp = pc * (F.lit(100) - dc)  # scale 4, == decimal(12,2)*(1-disc)
    ch = dp * (F.lit(100) + tc)  # scale 6, == disc_price*(1+tax)
    sq, sp = SplitSum(qc, "sq"), SplitSum(pc, "sp")
    sd, sc = SplitSum(dp, "sd"), SplitSum(ch, "sc")
    g = (
        l.where(F.col("l_shipdate") <= F.lit("2000-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*sq.aggs, *sp.aggs, *sd.aggs, *sc.aggs, F.count(F.lit(1)).alias("_cnt"))
    )
    sum_qty = sq.decimal(2, "decimal(28,2)")
    sum_price = sp.decimal(2, "decimal(28,2)")
    return g.select(
        "l_returnflag",
        "l_linestatus",
        sum_qty.cast("double").alias("sum_qty"),
        sum_price.cast("double").alias("sum_base_price"),
        sd.decimal(4, "decimal(28,4)").cast("double").alias("sum_disc_price"),
        sc.decimal(6, "decimal(34,6)").cast("double").alias("sum_charge"),
        F.round(sum_qty / F.col("_cnt"), 2).cast("double").alias("avg_qty"),
        F.round(sum_price / F.col("_cnt"), 2).cast("double").alias("avg_price"),
        F.col("_cnt").alias("count_order"),
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
  CAST(sum(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(24,6)) AS DECIMAL(24,6))) AS DOUBLE) AS sum_charge,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))) / count(*), 2) AS DOUBLE) AS avg_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / count(*), 2) AS DOUBLE) AS avg_price,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip()


# ---------------------------------------------------------------------------
# q3 — shipping priority (TPC-H Q3 shape): 3-way join + agg + top-k
# ---------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-01-01"))
    # r18: long unscaled rev + split int64 sums (guide §2.3); the
    # reconstructed decimal(28,4) is the exact old sum type/value.
    rev = unscaled(F.col("l_extendedprice")) * (
        F.lit(100) - unscaled(F.col("l_discount"))
    )
    ss = SplitSum(rev, "rev")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(*ss.aggs)
        .select(
            "l_orderkey",
            "o_orderdate",
            "o_orderpriority",
            ss.decimal(4, "decimal(28,4)").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_ORACLE = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""".strip()


# ---------------------------------------------------------------------------
# q5 — regional revenue (TPC-H Q5 shape): 6-way join, dims broadcast
# ---------------------------------------------------------------------------


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    # r18: long unscaled rev + split int64 sums (guide §2.3)
    rev = unscaled(F.col("l_extendedprice")) * (
        F.lit(100) - unscaled(F.col("l_discount"))
    )
    ss = SplitSum(rev, "rev")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(*ss.aggs)
        .select("n_name", ss.decimal(4, "decimal(28,4)").cast("double").alias("revenue"))
    )


Q5_ORACLE = """
SELECT
  n_name,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""".strip()


# ---------------------------------------------------------------------------
# rollup — hierarchical totals (SURVEY A3 generalization)
# ---------------------------------------------------------------------------


def rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    # r18: split int64 sum instead of the decimal sum (guide §2.3);
    # the rollup's Expand tripled the decimal per-row cost, so the win
    # is proportionally larger here.
    ss = SplitSum(unscaled(F.col("l_quantity")), "qty")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            *ss.aggs,
            F.grouping_id("l_returnflag", "l_linestatus").cast("long").alias("gid"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n_items",
            ss.decimal(2, "decimal(28,2)").cast("double").alias("sum_qty"),
            "gid",
        )
    )


ROLLUP_ORACLE = """
SELECT
  COALESCE(l_returnflag, 'ALL') AS l_returnflag,
  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
  count(*) AS n_items,
  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
""".strip()


# ---------------------------------------------------------------------------
# window — ranking analytics (SURVEY W1-W3 generalization)
# ---------------------------------------------------------------------------


def window_part_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand, with brand price stats.

    Prices are quantized to 2 decimals (exact decimal quantize) then
    output as DOUBLE — driver-safe, and max/lag are selections (no
    float arithmetic), so both engines agree bit-for-bit.
    """
    p = _t(spark, sf_dir, "part")
    dprice = F.col("p_retailprice").cast(DEC).cast("double")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    brand = Window.partitionBy("p_brand")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            dprice.alias("price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.max(dprice).over(brand).alias("brand_max"),
            F.lag(dprice, 1).over(w).alias("prev_price"),
        )
        .where(F.col("rn") <= 3)
    )


WINDOW_RANK_ORACLE = """
WITH ranked AS (
  SELECT
    p_brand,
    p_partkey,
    CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
    CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
    CAST(RANK() OVER w AS INTEGER) AS rnk,
    MAX(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE)) OVER (PARTITION BY p_brand) AS brand_max,
    LAG(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER w AS prev_price
  FROM part
  WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
)
SELECT * FROM ranked WHERE rn <= 3 ORDER BY p_brand, rn
""".strip()


# ---------------------------------------------------------------------------
# set ops — intersect / except / union (SURVEY U1 generalization)
# ---------------------------------------------------------------------------


def setops_customer_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with open ('O') orders vs finished ('F') orders:
    both (intersect), open-only (except), and either (union distinct),
    tagged and unioned into one relation."""
    o = _t(spark, sf_dir, "orders")
    open_c = o.where(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    fin_c = o.where(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    both = open_c.intersect(fin_c).select("o_custkey", F.lit("both").alias("cohort"))
    only_open = open_c.exceptAll(fin_c).select("o_custkey", F.lit("open_only").alias("cohort"))
    either = open_c.union(fin_c).distinct().select("o_custkey", F.lit("either").alias("cohort"))
    return both.unionByName(only_open).unionByName(either)


SETOPS_ORACLE = """
WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
fin_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
SELECT o_custkey, 'both' AS cohort FROM (SELECT o_custkey FROM open_c INTERSECT SELECT o_custkey FROM fin_c)
UNION ALL
SELECT o_custkey, 'open_only' AS cohort FROM (SELECT o_custkey FROM open_c EXCEPT SELECT o_custkey FROM fin_c)
UNION ALL
SELECT o_custkey, 'either' AS cohort FROM (SELECT o_custkey FROM open_c UNION SELECT o_custkey FROM fin_c)
ORDER BY cohort, o_custkey
""".strip()


# ---------------------------------------------------------------------------
# semi/anti joins — existence predicates
# ---------------------------------------------------------------------------


def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation counts of customers WITH any urgent order (left semi)
    and WITHOUT any order at all (left anti)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    with_urgent = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_with_urgent"))
    )
    no_orders = (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_no_orders"))
    )
    return (
        with_urgent.join(no_orders, "c_nationkey", "full_outer")
        .select(
            "c_nationkey",
            F.coalesce("n_with_urgent", F.lit(0)).alias("n_with_urgent"),
            F.coalesce("n_no_orders", F.lit(0)).alias("n_no_orders"),
        )
    )


SEMI_ANTI_ORACLE = """
WITH with_urgent AS (
  SELECT c_nationkey, count(*) AS n_with_urgent
  FROM customer
  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
  GROUP BY c_nationkey
),
no_orders AS (
  SELECT c_nationkey, count(*) AS n_no_orders
  FROM customer
  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  GROUP BY c_nationkey
)
SELECT
  COALESCE(w.c_nationkey, n.c_nationkey) AS c_nationkey,
  COALESCE(w.n_with_urgent, 0) AS n_with_urgent,
  COALESCE(n.n_no_orders, 0) AS n_no_orders
FROM with_urgent w FULL OUTER JOIN no_orders n ON w.c_nationkey = n.c_nationkey
ORDER BY c_nationkey
""".strip()


# ---------------------------------------------------------------------------
# q4 — order priority check (TPC-H Q4 shape): EXISTS decorrelated to a
# left-semi join. No commit/receipt dates in the synthetic lineitem, so
# "late" is l_shipdate > o_orderdate + 90 days.
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01")) & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(l, o.o_orderkey == l.l_orderkey, "inner").where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""".strip()


# ---------------------------------------------------------------------------
# q10 — returned-item customers (TPC-H Q10 shape): 4-way join + top-20
# ---------------------------------------------------------------------------


def q10_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    # r18: long unscaled rev + split int64 sums (guide §2.3)
    rev = unscaled(F.col("l_extendedprice")) * (
        F.lit(100) - unscaled(F.col("l_discount"))
    )
    ss = SplitSum(rev, "rev")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*ss.aggs)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            ss.decimal(4, "decimal(28,4)").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  n_name,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""".strip()


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change (TPC-H Q6 shape): pure scan+filter+agg,
# the pushdown benchmark — every predicate must reach the parquet scan
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    # r18: long unscaled price*disc + split int64 sums (guide §2.3)
    rev = unscaled(F.col("l_extendedprice")) * unscaled(F.col("l_discount"))
    ss = SplitSum(rev, "rev")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(*ss.aggs, F.count(F.lit(1)).alias("n_items"))
        .select(
            ss.decimal(4, "decimal(28,4)").cast("double").alias("revenue"),
            "n_items",
        )
    )


Q6_ORACLE = """
SELECT
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""".strip()


# ---------------------------------------------------------------------------
# distinct counts (SURVEY A4/A5 as a first-class query) + the skew and
# layout contracts (§2.12), union-tagged into the same entry so the
# whole family sits inside the driver's 50-entry correctness window
# (r15 — the quantile_stats-hll pattern; verdict item: "driver-expose
# the skew-lever equality contract").
#
# What the driver hash now pins, per section:
#   exact           the original four COUNT DISTINCTs over lineitem.
#   salted_distinct operators/skew.py:salted_distinct_count — exact
#                   per-key COUNT DISTINCT via the two-level rewrite;
#                   the oracle computes the PLAIN count(DISTINCT), so
#                   the hash IS the "salt is internal plumbing" law.
#   salted_agg      operators/skew.py:salted_aggregate — two-phase
#                   partial/merge aggregation over a deterministic
#                   xxhash64 salt vs the plain GROUP BY oracle.
#   salted_join     operators/skew.py:salted_join_hot_only — the
#                   two-path (hot keys salted+replicated, cold keys
#                   plain) join, hot set from the hot_keys frequency
#                   probe, vs the plain join+aggregate oracle.
#   zorder          sources/clustering.py's bit-interleave z-value
#                   (the clustered-write key) — the SAME SQL text runs
#                   on both engines, pinning the bucket quantization
#                   and the shift/mask interleave cross-engine
#                   (count + max zval per coarse z-range).
#
# The hot-key SPREADING behavior (the point of salting) stays pinned by
# tests/test_skew.py on synthetically skewed data; what belongs under
# the driver hash is the exactness law on real tables, which is what a
# user relies on before flipping the lever at 100 TB.
# ---------------------------------------------------------------------------

_ZBITS = 10  # buckets per dimension, matches sources/clustering.py


def _zorder_sql(corpus: str = "part") -> str:
    """One SQL text, two engines (the quantile_stats trick): quantize
    (p_size, p_retailprice) to 2^{_ZBITS} buckets from their (min, max)
    via the explicit floor formula (width_bucket semantics, spelled out
    so neither engine's builtin is load-bearing), interleave the bucket
    bits with fully-parenthesized shift/mask terms, and aggregate per
    coarse z-range. Double math is IEEE-identical cross-engine (same
    operation order); every bit term is parenthesized so operator
    precedence never differs."""
    terms = []
    for k, b in enumerate(("b1", "b2")):
        for i in range(_ZBITS):
            terms.append(f"((({b} >> {i}) & 1) << {i * 2 + k})")
    interleave = " + ".join(terms)
    # nested subqueries, not CTEs: this text is UNION-ALL'd into the
    # oracle, where a mid-statement WITH is a parse error on both engines
    return f"""
SELECT 'zorder' AS section, CAST((zval >> 14) AS STRING) AS k,
       CAST(count(*) AS BIGINT) AS n, CAST(max(zval) AS DOUBLE) AS v
FROM (
  SELECT {interleave} AS zval
  FROM (
    SELECT
      least(CAST({2**_ZBITS - 1} AS BIGINT),
            CAST(floor((CAST(p_size AS DOUBLE) - lo1) * {2**_ZBITS}.0 / (hi1 - lo1)) AS BIGINT)) AS b1,
      least(CAST({2**_ZBITS - 1} AS BIGINT),
            CAST(floor((CAST(p_retailprice AS DOUBLE) - lo2) * {2**_ZBITS}.0 / (hi2 - lo2)) AS BIGINT)) AS b2
    FROM {corpus}, (
      SELECT CAST(min(p_size) AS DOUBLE) AS lo1, CAST(max(p_size) AS DOUBLE) AS hi1,
             min(CAST(p_retailprice AS DOUBLE)) AS lo2, max(CAST(p_retailprice AS DOUBLE)) AS hi2
      FROM {corpus}
    ) zstats
  ) zb
) zv
GROUP BY (zval >> 14)
""".strip()


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized per (session, snapshot) like tpch_extra: the hot_keys
    probe inside is EAGER (localCheckpoint + a metadata collect), so
    re-building the plan per call would re-pay it; a DataFrame is an
    immutable logical plan, so re-serving one is free and safe."""
    from monday_etl_automation_spark.sources.tables import (
        session_artifact_cache,
        snapshot_key,
    )

    cache = session_artifact_cache(spark, "distinct_counts_plan")
    key = tuple(snapshot_key(sf_dir, t) for t in ("lineitem", "supplier", "part"))
    hit = cache.get(key)
    if hit is None:
        hit = _build_distinct_counts(spark, sf_dir)
        cache[key] = hit
    return hit


def _build_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from monday_etl_automation_spark.operators.skew import (
        hot_keys,
        salted_aggregate,
        salted_distinct_count,
        salted_join_hot_only,
    )
    from monday_etl_automation_spark.sources.tables import register_views

    l = _t(spark, sf_dir, "lineitem")
    nul_d = F.lit(None).cast("double")

    # exact: one scan, four distincts (Expand), unpivoted to rows
    exact = (
        l.agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
        )
        .select(
            F.expr(
                "stack(4, 'n_orders', n_orders, 'n_parts', n_parts,"
                " 'n_suppliers', n_suppliers, 'n_flag_status', n_flag_status)"
                " AS (k, n)"
            )
        )
        .select(F.lit("exact").alias("section"), "k", F.col("n").cast("bigint").alias("n"), nul_d.alias("v"))
    )

    # salted_distinct: exact COUNT(DISTINCT l_suppkey) per returnflag
    # via the (keys, x)-distinct two-level rewrite
    s_dist = salted_distinct_count(l, ["l_returnflag"], "l_suppkey").select(
        F.lit("salted_distinct").alias("section"),
        F.col("l_returnflag").alias("k"),
        F.col("n_distinct").cast("bigint").alias("n"),
        nul_d.alias("v"),
    )

    # salted_agg: two-phase partial/merge over a deterministic salt;
    # decimal internally, DOUBLE at the edge (CLAUDE.md type rule)
    s_agg = salted_aggregate(
        l,
        ["l_linestatus"],
        {
            "n_rows": ("count", F.lit(1)),
            "sum_qty": ("sum", F.col("l_quantity").cast(DEC)),
        },
        n_salts=8,
    ).select(
        F.lit("salted_agg").alias("section"),
        F.col("l_linestatus").alias("k"),
        F.col("n_rows").cast("bigint").alias("n"),
        F.col("sum_qty").cast("double").alias("v"),
    )

    # salted_join: two-path hot-only salted join lineitem⋈supplier,
    # hot set from the frequency probe (metadata-sized), then the
    # revenue rollup per supplier nation — oracle is the PLAIN join
    # r18: rev as a LONG unscaled value (guide §2.3) — narrower shuffle
    # payload through the salted join AND a split int64 sum at the
    # rollup; the reconstructed decimal(28,4) is the old sum type.
    rev_long = unscaled(F.col("l_extendedprice")) * (
        F.lit(100) - unscaled(F.col("l_discount"))
    )
    li = l.select("l_suppkey", rev_long.alias("rev"))
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    hot = hot_keys(li.select("l_suppkey"), ["l_suppkey"], min_share=0.002)
    ss_rev = SplitSum(F.col("rev"), "rev")
    s_join = (
        salted_join_hot_only(li, sup, ["l_suppkey"], hot, n_salts=4)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), *ss_rev.aggs)
        .select(
            F.lit("salted_join").alias("section"),
            F.col("s_nationkey").cast("string").alias("k"),
            F.col("n").cast("bigint").alias("n"),
            ss_rev.decimal(4, "decimal(28,4)").cast("double").alias("v"),
        )
    )

    # zorder: shared SQL text over the part view. Full registration,
    # never a names=("part",) subset: register_views marks the WHOLE
    # sf_dir as registered, so a partial call would leave every other
    # view unregistered for the rest of the session.
    register_views(spark, sf_dir)
    zorder = spark.sql(_zorder_sql("part"))

    return exact.unionByName(s_dist).unionByName(s_agg).unionByName(s_join).unionByName(zorder)


DISTINCT_ORACLE = f"""
SELECT 'exact' AS section, 'n_orders' AS k, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v FROM lineitem
UNION ALL
SELECT 'exact', 'n_parts', CAST(count(DISTINCT l_partkey) AS BIGINT), NULL FROM lineitem
UNION ALL
SELECT 'exact', 'n_suppliers', CAST(count(DISTINCT l_suppkey) AS BIGINT), NULL FROM lineitem
UNION ALL
SELECT 'exact', 'n_flag_status', CAST(count(DISTINCT (l_returnflag, l_linestatus)) AS BIGINT), NULL FROM lineitem
UNION ALL
SELECT 'salted_distinct', l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT), NULL FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'salted_agg', l_linestatus, CAST(count(*) AS BIGINT),
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
FROM lineitem GROUP BY l_linestatus
UNION ALL
SELECT 'salted_join', CAST(s_nationkey AS STRING), CAST(count(*) AS BIGINT),
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE)
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY s_nationkey
UNION ALL
{_zorder_sql("part")}
""".strip()


# ---------------------------------------------------------------------------
# date arithmetic — truncation, extraction, interval math (§2.7 note:
# "full date arithmetic ... built into Spark SQL and exposed")
# ---------------------------------------------------------------------------


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            # date_trunc returns tz-aware TIMESTAMP even on NTZ input;
            # cast back to NTZ (session is UTC => same wall time) so the
            # output matches DuckDB's naive timestamp exactly
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz").alias("order_month"),
            F.year("o_orderdate").alias("y"),
            F.quarter("o_orderdate").alias("q"),
            (F.dayofweek("o_orderdate") - 1).alias("dow"),  # 0=Sunday, as DuckDB
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        )
        .groupBy("order_month", "y", "q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("dow").alias("min_dow"),
            F.max("dow").alias("max_dow"),
            F.max("due_date").alias("latest_due"),
        )
    )


DATE_ORACLE = """
SELECT
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
  CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS q,
  count(*) AS n_orders,
  CAST(min(EXTRACT(dow FROM o_orderdate)) AS INT) AS min_dow,
  CAST(max(EXTRACT(dow FROM o_orderdate)) AS INT) AS max_dow,
  max(o_orderdate + INTERVAL 30 DAY) AS latest_due
FROM orders
GROUP BY 1, 2, 3
ORDER BY order_month
""".strip()


# ---------------------------------------------------------------------------
# quantiles — exact interpolated percentiles per group, RANK-BASED
# (round 9): Spark's percentile() buffers every group value in the
# aggregation state (an executor-memory risk on a skewed group at
# 100x scale — r8 verdict "what's wrong" #2). The rank construct below
# computes the identical percentile_cont value via a partitioned
# window sort (spills to disk, bounded state) + one hash agg, and the
# SAME SQL text runs on both engines, so the strict hash compare holds
# without depending on two engines' internal interpolation formulas.
# ---------------------------------------------------------------------------


def _quantile_fracs_sql(fracs: dict[str, float]) -> str:
    """Exact interpolated quantiles by VALUE HISTOGRAM — the shape
    that scales: one map-side-combining hash agg collapses the fact
    table to (group, value, count) rows, a window cumulates over that
    |distinct values|-sized relation, and conditional aggregates pick
    the rank-straddling values. Aggregation state is bounded by the
    value cardinality (50 here; at 100 TB a value-histogram or
    binary-search pass is how exact quantiles are actually computed —
    never by buffering a group in one aggregator, which is what
    Spark's percentile() does, and never by window-sorting the whole
    fact table, which round 9's first attempt measured at +1.9s).

    Unrolled per-fraction conditional aggregates (3 constants —
    unrolling avoids the 3x row blowup a parameter-table cross join
    would push through the shuffle). pos = p*(n-1) is IEEE-exact for
    p in {.25, .5, .75} (dyadic rationals times an integer), so
    floor/ceil/frac agree bit-for-bit across engines. The value at
    0-based rank k is the smallest x whose cumulative count exceeds k
    — well-defined under ties by construction."""
    picks = []
    outs = []
    for name, p in fracs.items():
        pos = f"{p} * (n - 1)"
        picks.append(
            f"min(CASE WHEN cum >= CAST(floor({pos}) AS BIGINT) + 1 THEN x END) AS lo_{name},\n"
            f"    min(CASE WHEN cum >= CAST(ceil({pos}) AS BIGINT) + 1 THEN x END) AS hi_{name},\n"
            f"    min({pos} - floor({pos})) AS f_{name}"
        )
        outs.append(f"round(lo_{name} + f_{name} * (hi_{name} - lo_{name}), 6) AS {name}")
    picks_sql = ",\n    ".join(picks)
    outs_sql = ",\n  ".join(outs)
    return f"""
WITH h AS (
  SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS DOUBLE)
),
w AS (
  SELECT l_returnflag, x, c,
         CAST(sum(c) OVER (
           PARTITION BY l_returnflag ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum,
         CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
  FROM h
),
hit AS (
  SELECT l_returnflag,
    {picks_sql},
    min(x) AS min_qty,
    max(x) AS max_qty
  FROM w GROUP BY l_returnflag
)
SELECT l_returnflag,
  {outs_sql},
  min_qty, max_qty
FROM hit
ORDER BY l_returnflag
""".strip()


QUANTILE_SQL = _quantile_fracs_sql({"q25": 0.25, "median": 0.5, "q75": 0.75})

# the sketch section's error/merge contracts (r14, r13 verdict item 7:
# the sketch family's driver-hashable columns, previously pytest-only
# in tests/test_sketches.py)
_HLL_REL_ERR = 0.05  # lg_k=12 -> ~1.6% RSE; 0.05 leaves redraw headroom
_HLL_SHARDS = 8
# r17 sweep point (the seat map's last feasible row): a second lg_k in
# the SAME grouping pass. lg_k=8 -> 256 registers, RSE ~6.5%; bound at
# ~3 sigma (0.20) for regeneration headroom. Only the direct-estimate
# contract rides the sweep (merge law stays pinned at lg_k=12 — one
# parameterized law suffices; the sweep hardens the ERROR bound
# against parameter-specific flukes).
_HLL_LGK2 = 8
_HLL_REL_ERR2 = 0.20

# r16 (verdict item 2): the REMAINING sketch families under the hash —
# same bound-contract pattern (pin the BOUND, never estimate equality):
# - cms: count-min point estimates for fixed probe user_ids. est >=
#   exact is a THEOREM (hash collisions only ever add); the upper bound
#   eps*N holds per key with prob 1-delta — pinned at 20x headroom
#   (_CMS_ERR_HEADROOM) so a regenerated dataset cannot flake the hash.
#   merge_ok re-checks both bounds after mergeInPlace of two half-
#   stream sketches (same eps/conf/seed — the partial-aggregation law).
# - hh: every TRUE heavy hitter (freq > support*N) must appear in the
#   freqItems candidate list — the Karp-Papadimitriou-Shenker
#   completeness guarantee, deterministic (false positives are the
#   algorithm's allowed slack and stay unpinned).
# - gk: approx_percentile(accuracy=_GK_ACC) values must sit within
#   +/- 2*n/accuracy RANKS of the target rank, verified by one exact
#   rank pass (count of values strictly below / at-or-below the
#   returned value). est_ok pins the median, merge_ok pins q25 AND q75.
_CMS_EPS = 0.001
_CMS_CONF = 0.99
_CMS_SEED = 42
_CMS_ERR_HEADROOM = 20  # bound checked at 20x the sketch's eps*N
_CMS_PROBES = tuple(range(8))  # fixed probe user_ids, oracle-mirrored
# r17 (verdict item 5): a SECOND parameter point per sketch family —
# the bound contracts must hold across the parameter space, not at one
# configuration. (grp-prefix, eps, conf, seed, headroom): the sweep
# point uses a 10x coarser eps (narrower sketch, more collisions — the
# regime where est >= exact is actually exercised), a different seed
# (different hash family), and a 2x headroom (2*0.01*N == the first
# point's absolute bound; Markov over the d=5 rows puts the flake
# probability ~1e-3 per probe). Both sketches build in the SAME cube
# pass, so the sweep adds aggregate width, not a scan.
_CMS_PARAMS = (
    ("", _CMS_EPS, _CMS_CONF, _CMS_SEED, _CMS_ERR_HEADROOM),
    ("k01:", 0.01, _CMS_CONF, 7, 2),
)
_HH_SUPPORT = 0.05  # event_type is ~uniform over 5 values (~20% each)
_GK_ACC = 1000
# second GK accuracy point (10x coarser): rank bound +/- 2n/100. Both
# accuracies ride ONE approx_percentile aggregation pass and ONE exact
# rank-verification join (wider aggregates, same two lineitem scans).
_GK_ACC2 = 100


def _cms_rows(spark: SparkSession, ev) -> list[tuple]:
    """Driver-side CMS probe rows — the sketch objects are KB-sized
    (metadata-scale collect, CLAUDE.md-compliant) and PySpark exposes
    no SQL-level estimator, so estimateCount runs through the JVM
    sketch API exactly as a monitoring job would.

    TWO event scans total: a cube(half) aggregation yields both
    half-stream sketches AND the direct whole-stream sketch — for
    EVERY _CMS_PARAMS point — in one pass (CMS is mergeable, so the
    cube's global row exercises Spark's own partial-merge machinery;
    the driver-side mergeInPlace of the halves then pins the SAME law
    through the public API), and one conditional aggregation carries
    every probe's exact count plus the stream total."""
    cms_aggs = [
        F.count_min_sketch(
            F.col("user_id"), F.lit(eps), F.lit(conf), F.lit(seed)
        ).alias(f"cms_{i}")
        for i, (_, eps, conf, seed, _) in enumerate(_CMS_PARAMS)
    ]
    # key by (grouping(h), h), not h alone: a NULL event_id would put
    # the data-NULL group AND the cube grand-total row both at h=None,
    # silently overwriting one with the other (r16 advice). grouping()
    # separates them: the total row is (1, None), data groups (0, h).
    sk = {
        (r.g, r.h): r
        for r in ev.withColumn("h", F.pmod(F.col("event_id"), F.lit(2)))
        .cube("h")
        .agg(*cms_aggs, F.grouping("h").cast("int").alias("g"))
        .collect()
    }
    if (0, None) in sk:
        raise ValueError("cms probe: NULL event_id rows are out of contract")
    stats = ev.agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum((F.col("user_id") == k).cast("long")).alias(f"c{k}")
            for k in _CMS_PROBES
        ],
    ).collect()[0]
    jread = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom  # noqa: SLF001
    rows = []
    for i, (tag, eps, _conf, _seed, headroom) in enumerate(_CMS_PARAMS):
        col = f"cms_{i}"
        direct = jread(bytes(sk[(1, None)][col]))
        merged = jread(bytes(sk[(0, 0)][col]))
        merged.mergeInPlace(jread(bytes(sk[(0, 1)][col])))
        bound = headroom * eps * stats["total"]
        for k in _CMS_PROBES:
            exact = int(stats[f"c{k}"] or 0)
            d_est = direct.estimateCount(k)
            m_est = merged.estimateCount(k)
            rows.append(
                (
                    "cms",
                    f"{tag}{k}",
                    exact,
                    int(exact <= d_est <= exact + bound),
                    int(exact <= m_est <= exact + bound),
                )
            )
    return rows


def _hh_rows(ev) -> list[tuple]:
    candidates = set(ev.stat.freqItems(["event_type"], _HH_SUPPORT).collect()[0][0])
    counts = [
        (r.event_type, r.n)
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    total = sum(n for _, n in counts)
    return [
        ("hh", et, int(n), int(et in candidates), None)
        for et, n in sorted(counts)
        if n > _HH_SUPPORT * total
    ]


def _gk_rank_sql() -> str:
    """Both accuracy points in ONE approx_percentile pass + ONE exact
    rank-verification join: ap carries a qs array per accuracy, rk a
    lo/hi sum per (accuracy, fraction), and the two output rows per
    group read from the same 5-row rk relation (grp prefix 'k{acc}:'
    for the sweep point)."""
    accs = (_GK_ACC, _GK_ACC2)
    qs_cols = ",\n         ".join(
        f"approx_percentile(CAST(l_quantity AS DOUBLE), array(0.25, 0.5, 0.75),"
        f" {a}) AS qs_{a}"
        for a in accs
    )
    sums = []
    for a in accs:
        for i, p in enumerate(("25", "50", "75")):
            x = "CAST(l.l_quantity AS DOUBLE)"
            sums.append(
                f"sum(CASE WHEN {x} <  ap.qs_{a}[{i}] THEN 1 ELSE 0 END) AS lo{p}_{a}"
            )
            sums.append(
                f"sum(CASE WHEN {x} <= ap.qs_{a}[{i}] THEN 1 ELSE 0 END) AS hi{p}_{a}"
            )
    sums_sql = ",\n         ".join(sums)

    def _ok(a: int, p: str, frac: str) -> str:
        return (
            f"lo{p}_{a} <= {frac} * n + 2.0 * n / {a}"
            f" AND hi{p}_{a} >= {frac} * n - 2.0 * n / {a}"
        )

    # ONE select over rk, unpivoted by a VALUES cross join (the
    # release_extra._report_sql shape): a UNION of per-accuracy selects
    # would reference rk twice, and Spark inlines CTEs — doubling the
    # lineitem scans. CASE on the accuracy tag picks the right sums.
    def _pick(expr_fn) -> str:
        branches = " ".join(
            f"WHEN ac.acc = {a} THEN CASE WHEN {expr_fn(a)} THEN 1 ELSE 0 END"
            for a in accs
        )
        return f"CASE {branches} END"

    ok50 = _pick(lambda a: _ok(a, "50", "0.50"))
    ok2575 = _pick(lambda a: f"{_ok(a, '25', '0.25')} AND {_ok(a, '75', '0.75')}")
    acc_vals = ", ".join(f"('{'' if a == _GK_ACC else f'k{a}:'}', {a})" for a in accs)
    return f"""
WITH ap AS (
  SELECT l_returnflag,
         {qs_cols}
  FROM lineitem GROUP BY l_returnflag
),
rk AS (
  SELECT l.l_returnflag, count(*) AS n,
         {sums_sql}
  FROM lineitem l JOIN ap ON l.l_returnflag = ap.l_returnflag
  GROUP BY l.l_returnflag
)
SELECT ac.pref || l_returnflag AS l_returnflag, CAST(n AS BIGINT) AS n,
  CAST({ok50} AS BIGINT) AS ok50,
  CAST({ok2575} AS BIGINT) AS ok2575
FROM rk CROSS JOIN (VALUES {acc_vals}) ac(pref, acc)
""".strip()


_GK_RANK_SQL = _gk_rank_sql()


def quantile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union: the exact rank-based quantiles (section
    'quantile') plus the HLL sketch family's driver-hashable contract
    rows (section 'hll', one per event_type).

    Approximate answers can't hash-match an oracle, so the hll rows
    carry (a) the EXACT distinct count (DuckDB-twinned value), (b)
    est_ok = the DataSketches estimate landing within the published
    {_HLL_REL_ERR} relative bound, and (c) merge_ok = the MERGE
    contract: the union of {_HLL_SHARDS} per-shard sketches ALSO
    estimates within the bound of the exact count — the property that
    makes sketches correct under partial aggregation, task retry, and
    AQE re-planning. r16 adds the remaining sketch families under the
    same bound-contract pattern (see the _CMS/_HH/_GK block comment):
    'cms' (count-min point-estimate bounds, direct + merged), 'hh'
    (heavy-hitter completeness), and 'gk' (approx_percentile rank-error
    bounds). r17 sweeps a second parameter point through each bound
    contract (grp prefixes 'k01:' for cms eps=0.01/seed=7, 'k100:' for
    gk accuracy=100) — the sweep rows ride the SAME scans (one cube
    pass builds all sketches; one ap aggregation + one rank join carry
    both accuracies, unpivoted by a VALUES cross join so rk is read
    once). merge_ok is deliberately NOT merged == direct:
    the direct aggregation serves the HIP estimator, which a union
    legitimately drops for the composite estimator, so the two
    estimates agree only while both sides sit in exact sparse mode
    (they did at sf0.001; the r14 sf0.1 driver spot-check caught them
    diverging at 1,500 distinct/group — accuracy intact, equality
    never the real contract). The oracle pins both flags at 1, so a
    sketch regression driver-hash-mismatches instead of passing
    silently; the same contracts are pytest-pinned in
    tests/test_sketches.py."""
    from monday_etl_automation_spark.plans.sketch_ops import (
        hll_sketch_per_group,
        hll_union_estimate,
    )
    from monday_etl_automation_spark.sources.tables import register_views

    register_views(spark, sf_dir)
    dnull = F.lit(None).cast("double")
    q = spark.sql(QUANTILE_SQL).select(
        F.lit("quantile").alias("section"),
        F.col("l_returnflag").alias("grp"),
        "q25",
        "median",
        "q75",
        "min_qty",
        "max_qty",
        F.lit(None).cast("bigint").alias("n_exact"),
        F.lit(None).cast("bigint").alias("est_ok"),
        F.lit(None).cast("bigint").alias("merge_ok"),
    )
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    # estimate + exact in ONE grouping (one events scan); only the
    # merge-law side needs its own (event_type, shard) grouping, and
    # its input is the same single-projection scan
    est = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), F.lit(12))).alias(
            "n_distinct_est"
        ),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("user_id"), F.lit(_HLL_LGK2))
        ).alias("est_k2"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    shards = hll_sketch_per_group(
        ev.withColumn("shard", F.pmod(F.col("user_id"), F.lit(_HLL_SHARDS))),
        ["event_type", "shard"],
        "user_id",
    )
    merged = hll_union_estimate(shards, ["event_type"]).withColumnRenamed(
        "n_distinct_est", "merged_est"
    )
    # r17: the lg_k sweep rows ride the SAME est/merged subtree via a
    # row-local stack() unpivot — a second select over `est` would
    # re-execute the grouping (Spark inlines), adding exchanges the
    # (7, 4) plan pin exists to catch. merge_ok is NULL on the sweep
    # rows: the merge law stays pinned at the primary lg_k.
    hll = (
        est.join(merged, "event_type")
        .select(
            "event_type",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            (
                F.abs(F.col("n_distinct_est") - F.col("n_exact"))
                <= F.col("n_exact") * _HLL_REL_ERR
            )
            .cast("bigint")
            .alias("ok1"),
            (
                F.abs(F.col("merged_est") - F.col("n_exact"))
                <= F.col("n_exact") * _HLL_REL_ERR
            )
            .cast("bigint")
            .alias("mk1"),
            (
                F.abs(F.col("est_k2") - F.col("n_exact"))
                <= F.col("n_exact") * _HLL_REL_ERR2
            )
            .cast("bigint")
            .alias("ok2"),
        )
        .selectExpr(
            "stack(2, event_type, ok1, mk1,"
            f" concat('k{_HLL_LGK2}:', event_type), ok2, CAST(NULL AS BIGINT))"
            " AS (grp, est_ok, merge_ok)",
            "n_exact",
        )
        .select(
            F.lit("hll").alias("section"),
            "grp",
            dnull.alias("q25"),
            dnull.alias("median"),
            dnull.alias("q75"),
            dnull.alias("min_qty"),
            dnull.alias("max_qty"),
            "n_exact",
            "est_ok",
            "merge_ok",
        )
    )
    # r16 sections: cms + hh rows are driver-computed EAGER PROBES (KB
    # sketches via the JVM API + candidate lists) — memoized per
    # (session, events snapshot) like every eager plan-build probe
    # (CLAUDE.md; the flagship/tpch_extra pattern). The DuckDB oracle
    # re-derives the exact counts inline each compare, so the driver
    # hash still pins the cached rows against fresh ground truth every
    # round; gk stays a lazy plan over lineitem, re-executed per pass.
    from monday_etl_automation_spark.sources.tables import (
        session_artifact_cache,
        snapshot_key,
    )

    probe_cache = session_artifact_cache(spark, "sketch_probe_rows")
    probe_key = (snapshot_key(sf_dir, "events"),)
    probe_rows = probe_cache.get(probe_key)
    if probe_rows is None:
        probe_rows = _cms_rows(spark, ev) + _hh_rows(ev)
        probe_cache[probe_key] = probe_rows
    small = spark.createDataFrame(
        probe_rows,
        "section STRING, grp STRING, n_exact BIGINT, est_ok BIGINT, merge_ok BIGINT",
    ).select(
        "section",
        "grp",
        dnull.alias("q25"),
        dnull.alias("median"),
        dnull.alias("q75"),
        dnull.alias("min_qty"),
        dnull.alias("max_qty"),
        "n_exact",
        "est_ok",
        "merge_ok",
    )
    gk = spark.sql(_GK_RANK_SQL).select(
        F.lit("gk").alias("section"),
        F.col("l_returnflag").alias("grp"),
        dnull.alias("q25"),
        dnull.alias("median"),
        dnull.alias("q75"),
        dnull.alias("min_qty"),
        dnull.alias("max_qty"),
        F.col("n").alias("n_exact"),
        F.col("ok50").alias("est_ok"),
        F.col("ok2575").alias("merge_ok"),
    )
    return q.unionByName(hll).unionByName(small).unionByName(gk)


QUANTILE_ORACLE = f"""
WITH qx AS ({QUANTILE_SQL.replace("ORDER BY l_returnflag", "")})
SELECT 'quantile' AS section, l_returnflag AS grp,
       q25, median, q75, min_qty, max_qty,
       CAST(NULL AS BIGINT) AS n_exact,
       CAST(NULL AS BIGINT) AS est_ok,
       CAST(NULL AS BIGINT) AS merge_ok
FROM qx
UNION ALL
SELECT 'hll' AS section, event_type AS grp,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       CAST(1 AS BIGINT) AS est_ok,
       CAST(1 AS BIGINT) AS merge_ok
FROM events GROUP BY event_type
UNION ALL
SELECT 'hll', 'k{_HLL_LGK2}:' || event_type,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(count(DISTINCT user_id) AS BIGINT),
       CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
FROM events GROUP BY event_type
UNION ALL
SELECT 'cms', pr.pref || CAST(pk.k AS VARCHAR),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(coalesce(pc.n, 0) AS BIGINT),
       CAST(1 AS BIGINT), CAST(1 AS BIGINT)
FROM (VALUES {", ".join(f"({k})" for k in _CMS_PROBES)}) pk(k)
CROSS JOIN (VALUES {", ".join(f"('{tag}')" for tag, *_ in _CMS_PARAMS)}) pr(pref)
LEFT JOIN (
  SELECT user_id, count(*) AS n FROM events
  WHERE user_id IN ({", ".join(str(k) for k in _CMS_PROBES)})
  GROUP BY user_id
) pc ON pk.k = pc.user_id
UNION ALL
SELECT 'hh', event_type,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(count(*) AS BIGINT),
       CAST(1 AS BIGINT), CAST(NULL AS BIGINT)
FROM events GROUP BY event_type
HAVING count(*) > {_HH_SUPPORT} * (SELECT count(*) FROM events)
UNION ALL
SELECT 'gk', gp.pref || l_returnflag,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(count(*) AS BIGINT),
       CAST(1 AS BIGINT), CAST(1 AS BIGINT)
FROM lineitem
CROSS JOIN (VALUES (''), ('k{_GK_ACC2}:')) gp(pref)
GROUP BY gp.pref, l_returnflag
ORDER BY section, grp
""".strip()


# ---------------------------------------------------------------------------
# fuzzy match — edit-distance entity resolution within blocking groups
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 4


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part names via levenshtein <= 4, blocked on
    (p_brand, p_size, name word) — the standard entity-resolution
    shape (block -> compare -> threshold) with a NAME-DERIVED band
    component in the blocking key (round 14).

    Why the word band: (p_brand, p_size) alone has FIXED cardinality
    (25 x 50 = 1,250 blocks), so per-block population — and with it
    candidate-pair work and the levenshtein spend — grows as n^2/1250
    no matter how diverse the names are. Adding each name word as a
    band key makes the block key high-cardinality whenever names are
    (the production case), bounding candidate work; on this data it
    cuts candidates 4.2x (1,639 -> 388 at sf0.01) while retaining
    98.6-98.7% of the true pairs (a pair is only dropped when EVERY
    word was edited — rare within a 4-edit budget on 2-word names;
    retention pinned >= 0.95 in tests/test_plans.py). The oracle
    mirrors the identical blocking, so the driver compare is exact.

    Plan shape: explode ~2 word keys per part, hash equi-join on
    (brand, size, word), distinct the collided pairs, THEN one
    levenshtein per candidate pair — never per shared word, never
    per (brand, size) cross pair."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size", "p_name")
    k = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        "p_name",
        F.explode(F.split(F.col("p_name"), " ")).alias("w"),
    )
    a = k.alias("a")
    b = k.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.w") == F.col("b.w"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("partkey_a"),
            F.col("b.p_partkey").alias("partkey_b"),
            F.col("a.p_brand").alias("p_brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
        .distinct()
    )
    return (
        cand.select(
            "partkey_a",
            "partkey_b",
            "p_brand",
            F.levenshtein(F.col("name_a"), F.col("name_b")).alias("edit_dist"),
        )
        .where(F.col("edit_dist") <= _FUZZY_MAX_DIST)
    )


FUZZY_ORACLE = f"""
WITH k AS (
  SELECT p_partkey, p_brand, p_size, p_name,
         unnest(string_split(p_name, ' ')) AS w
  FROM part
),
cand AS (
  SELECT DISTINCT
    a.p_partkey AS partkey_a,
    b.p_partkey AS partkey_b,
    a.p_brand AS p_brand,
    a.p_name AS name_a,
    b.p_name AS name_b
  FROM k a
  JOIN k b
    ON a.p_brand = b.p_brand
   AND a.p_size = b.p_size
   AND a.w = b.w
   AND a.p_partkey < b.p_partkey
)
SELECT partkey_a, partkey_b, p_brand,
       CAST(levenshtein(name_a, name_b) AS INT) AS edit_dist
FROM cand
WHERE levenshtein(name_a, name_b) <= {_FUZZY_MAX_DIST}
ORDER BY partkey_a, partkey_b
""".strip()


# ---------------------------------------------------------------------------
# cube — full cross-dimensional totals (rollup's big sibling)
# ---------------------------------------------------------------------------


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    # r18: split int64 sum instead of the decimal sum (guide §2.3);
    # cube's 4-way Expand quadrupled the decimal per-row cost.
    ss = SplitSum(unscaled(F.col("o_totalprice")), "price")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            *ss.aggs,
            F.grouping_id("o_orderstatus", "o_orderpriority").cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
            "n_orders",
            ss.decimal(2, "decimal(28,2)").cast("double").alias("sum_price"),
            "gid",
        )
    )


CUBE_ORACLE = """
SELECT
  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
""".strip()


QUERIES: dict[str, tuple] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_ORACLE),
    "q4_order_priority": (q4_order_priority, Q4_ORACLE),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_ORACLE),
    "distinct_counts": (distinct_counts, DISTINCT_ORACLE),
    "quantile_stats": (quantile_stats, QUANTILE_ORACLE),
    "date_arithmetic": (date_arithmetic, DATE_ORACLE),
    "fuzzy_name_match": (fuzzy_name_match, FUZZY_ORACLE),
    "q10_returned_customers": (q10_returned_customers, Q10_ORACLE),
    "cube_orders": (cube_orders, CUBE_ORACLE),
    "q3_shipping_priority": (q3_shipping_priority, Q3_ORACLE),
    "q5_region_revenue": (q5_region_revenue, Q5_ORACLE),
    "rollup_returnflag": (rollup_returnflag, ROLLUP_ORACLE),
    "window_part_rank": (window_part_rank, WINDOW_RANK_ORACLE),
    "setops_customer_cohorts": (setops_customer_cohorts, SETOPS_ORACLE),
    "semi_anti_customers": (semi_anti_customers, SEMI_ANTI_ORACLE),
}
