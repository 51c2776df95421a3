"""Extra relational analytics shapes.

The five shapes are individually pytest-verified against their DuckDB
oracles (``tests/test_relational_extra.py``) AND driver-registered as
ONE union-tagged relation (``tpch_extra``) so the whole family sits
inside the driver's 50-entry correctness window. They follow every
registry convention — driver-safe output types, decimal-exact internal
aggregation, broadcast dims, deterministic ordering.

Shapes (adapted to the synthetic schema, which has no
partsupp/shipmode/phone columns):

- q7_nation_volume   — bi-nation shipping volume by year (TPC-H Q7):
                       two broadcast nation joins + fact join + agg.
- q13_order_histogram— customer order-count distribution (Q13):
                       left join + two-level aggregation.
- q14_promo_ratio    — promo revenue share (Q14): conditional decimal
                       sums, one final double division.
- q18_large_orders   — large-volume customers (Q18): HAVING subquery
                       via join on an aggregated relation.
- q22_idle_balances  — above-average balances with no recent orders
                       (Q22 shape): scalar subquery + anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.sources.tables import load_table

DEC = "decimal(18,2)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    return (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
    ).cast("decimal(18,4)")


# --- q7: volume between nation pairs ---------------------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY") | (
        F.col("supp_nation") == "GERMANY"
    ) & (F.col("cust_nation") == "FRANCE")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01")) & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("ck"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT
  n1.n_name AS supp_nation,
  n2.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
    OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""".strip()


# --- q13: order-count histogram --------------------------------------------


def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) d
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""".strip()


# --- q14: promo revenue share ----------------------------------------------


def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01")) & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type").startswith("PROMO"), _rev()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double"), 6
            ).alias("promo_pct"),
        )
    )


Q14_ORACLE = """
WITH j AS (
  SELECT
    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) AS rev,
    p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
)
SELECT
  CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
  CAST(sum(rev) AS DOUBLE) AS total_revenue,
  round(100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(sum(rev) AS DOUBLE), 6) AS promo_pct
FROM j
""".strip()


# --- q18: large-volume customers -------------------------------------------

_Q18_QTY = 150


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sum_qty"))
        .where(F.col("sum_qty") > _Q18_QTY)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast(DEC).cast("double").alias("total_price"),
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(100)
    )


Q18_ORACLE = f"""
SELECT
  c_name, c_custkey, o_orderkey, o_orderdate,
  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
  CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 100
""".strip()


# --- q22: idle above-average balances (scalar subquery + anti join) ---------


def q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1997-01-01")).select(
        "o_custkey"
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg(F.col("c_acctbal").cast(DEC)).alias("a"))
        .select(F.col("a"))
    )
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal").cast(DEC) > F.col("a"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast(DEC)).cast("double").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_ORACLE = """
SELECT
  c_mktsegment,
  count(*) AS n_customers,
  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
WHERE CAST(c_acctbal AS DECIMAL(18,2)) > (
    SELECT avg(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  )
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""".strip()


EXTRA_QUERIES: dict[str, tuple] = {
    "q7_nation_volume": (q7_nation_volume, Q7_ORACLE),
    "q13_order_histogram": (q13_order_histogram, Q13_ORACLE),
    "q14_promo_ratio": (q14_promo_ratio, Q14_ORACLE),
    "q18_large_orders": (q18_large_orders, Q18_ORACLE),
    "q22_idle_balances": (q22_idle_balances, Q22_ORACLE),
}


# ---------------------------------------------------------------------------
# tpch_extra — all five shapes in ONE tagged relation, so the family
# sits inside the driver's 50-entry correctness window (same pattern as
# temporal_joins: disjoint shapes, per-shape NULL columns lose nothing).
# ---------------------------------------------------------------------------

_S = lambda: F.lit(None).cast("string")  # noqa: E731
_I = lambda: F.lit(None).cast("bigint")  # noqa: E731
_D = lambda: F.lit(None).cast("double")  # noqa: E731


def tpch_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-tagged q7/q13/q14/q18/q22 under one oracle hash."""
    q7 = q7_nation_volume(spark, sf_dir).select(
        F.lit("q7").alias("shape"),
        F.col("supp_nation").alias("s1"),
        F.col("cust_nation").alias("s2"),
        F.col("l_year").cast("bigint").alias("i1"),
        _I().alias("i2"),
        F.col("revenue").alias("d1"),
        _D().alias("d2"),
        _D().alias("d3"),
    )
    q13 = q13_order_histogram(spark, sf_dir).select(
        F.lit("q13").alias("shape"),
        _S().alias("s1"),
        _S().alias("s2"),
        F.col("c_count").cast("bigint").alias("i1"),
        F.col("custdist").cast("bigint").alias("i2"),
        _D().alias("d1"),
        _D().alias("d2"),
        _D().alias("d3"),
    )
    q14 = q14_promo_ratio(spark, sf_dir).select(
        F.lit("q14").alias("shape"),
        _S().alias("s1"),
        _S().alias("s2"),
        _I().alias("i1"),
        _I().alias("i2"),
        F.col("promo_revenue").alias("d1"),
        F.col("total_revenue").alias("d2"),
        F.col("promo_pct").alias("d3"),
    )
    q18 = q18_large_orders(spark, sf_dir).select(
        F.lit("q18").alias("shape"),
        F.col("c_name").alias("s1"),
        # ISO date string, not DATE: a NULL DATE column renders None
        # (Spark, object dtype) vs NaT (DuckDB, datetime64) in pandas
        F.col("o_orderdate").cast("date").cast("string").alias("s2"),
        F.col("c_custkey").cast("bigint").alias("i1"),
        F.col("o_orderkey").cast("bigint").alias("i2"),
        F.col("total_price").alias("d1"),
        F.col("sum_qty").alias("d2"),
        _D().alias("d3"),
    )
    q22 = q22_idle_balances(spark, sf_dir).select(
        F.lit("q22").alias("shape"),
        F.col("c_mktsegment").alias("s1"),
        _S().alias("s2"),
        F.col("n_customers").cast("bigint").alias("i1"),
        _I().alias("i2"),
        F.col("total_bal").alias("d1"),
        _D().alias("d2"),
        _D().alias("d3"),
    )
    return (
        q7.unionByName(q13)
        .unionByName(q14)
        .unionByName(q18)
        .unionByName(q22)
        .orderBy("shape", "s1", "s2", "i1", "i2")
    )


def _cte(sql: str) -> str:
    """Strip the trailing ORDER BY so the shape can sit in a CTE (q18
    keeps its ORDER BY — its LIMIT depends on it)."""
    head, _, tail = sql.rpartition("ORDER BY")
    return head.strip() if head else sql


TPCH_EXTRA_ORACLE = f"""
WITH q7r AS ({_cte(Q7_ORACLE)}),
q13r AS ({_cte(Q13_ORACLE)}),
q14r AS ({Q14_ORACLE}),
q18r AS ({Q18_ORACLE}),
q22r AS ({_cte(Q22_ORACLE)})
SELECT 'q7' AS shape, supp_nation AS s1, cust_nation AS s2,
       CAST(l_year AS BIGINT) AS i1, CAST(NULL AS BIGINT) AS i2,
       revenue AS d1, CAST(NULL AS DOUBLE) AS d2, CAST(NULL AS DOUBLE) AS d3
FROM q7r
UNION ALL
SELECT 'q13', NULL, NULL, CAST(c_count AS BIGINT), CAST(custdist AS BIGINT),
       NULL, NULL, NULL
FROM q13r
UNION ALL
SELECT 'q14', NULL, NULL, NULL, NULL, promo_revenue, total_revenue, promo_pct
FROM q14r
UNION ALL
SELECT 'q18', c_name, CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
       CAST(c_custkey AS BIGINT), CAST(o_orderkey AS BIGINT),
       total_price, sum_qty, NULL
FROM q18r
UNION ALL
SELECT 'q22', c_mktsegment, NULL, CAST(n_customers AS BIGINT), NULL,
       total_bal, NULL, NULL
FROM q22r
ORDER BY shape, s1, s2, i1, i2
""".strip()


QUERIES: dict[str, tuple] = {
    "tpch_extra": (tpch_extra, TPCH_EXTRA_ORACLE),
}
