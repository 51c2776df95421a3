"""Property tests for the oracle-parity TYPE policy (VERDICT r1 #10).

Round 1's 12 driver hash-fails were all type-representation bugs
invisible to a value-only comparator: DuckDB widens integer SUM to
HUGEINT and decimal SUM to DECIMAL(38,s), and its pandas conversion
renders both as float64 while Spark keeps int64/Decimal. These
Hypothesis tests push randomly generated ints / decimals / timestamps
through BOTH engines' SUM/AVG/window pipelines using the repo's
casting policy (aggregate exactly, output driver-safe types) and
assert representation-level identity — Python types, repr, and
pandas-stringified frames — so any policy regression fails here
before the driver ever runs.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group key
        st.integers(min_value=-10**9, max_value=10**9),  # int measure
        st.integers(min_value=-10**7, max_value=10**7),  # cents (decimal = /100)
        st.integers(min_value=0, max_value=10**9),  # epoch seconds offset
    ),
    min_size=1,
    max_size=60,
)


def _typed(rows):
    return sorted(tuple((type(v).__name__, repr(v)) for v in r) for r in rows)


def _pd_str(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    cols = []
    for c in pdf.columns:
        s = pdf[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            s = s.dt.tz_localize(None)
        cols.append(s.astype(str))
    return sorted(zip(*[c.tolist() for c in cols]))


def _compare(spark_df, con, sql):
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = con.execute(sql).fetchall()
    assert _typed(s_rows) == _typed(d_rows), "collect/fetchall repr mismatch"
    s_pd, d_pd = spark_df.toPandas(), con.execute(sql).df()
    assert _pd_str(s_pd) == _pd_str(d_pd), "pandas-stringified mismatch"


@_SETTINGS
@given(_rows)
def test_sum_avg_type_parity(spark, rows):
    """Integer SUM -> BIGINT both sides; decimal SUM -> DOUBLE both
    sides; AVG -> rounded DOUBLE both sides."""
    pdf = pd.DataFrame(rows, columns=["g", "iv", "cents", "secs"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_parity_t")
    con = duckdb.connect()
    con.register("_parity_t", pdf)

    # policy note (and itself a property this test pins): decimal
    # DIVISION is out — DuckDB's `/` on decimals yields DOUBLE (float
    # adds), Spark keeps decimal. Exact amounts must be built with
    # decimal MULTIPLICATION, which both engines keep exact.
    amt = "CAST(cents AS DECIMAL(18,0)) * CAST(0.01 AS DECIMAL(3,2))"
    spark_out = spark.sql(
        f"""
        SELECT g,
               count(*) AS n,
               sum(iv) AS sum_iv,
               CAST(sum({amt}) AS DOUBLE) AS sum_amt,
               CAST(round(avg(iv), 6) AS DOUBLE) AS avg_iv
        FROM _parity_t GROUP BY g ORDER BY g
        """
    )
    duck_sql = f"""
        SELECT g,
               count(*) AS n,
               CAST(sum(iv) AS BIGINT) AS sum_iv,
               CAST(sum({amt}) AS DOUBLE) AS sum_amt,
               CAST(round(avg(iv), 6) AS DOUBLE) AS avg_iv
        FROM _parity_t GROUP BY g ORDER BY g
    """
    _compare(spark_out, con, duck_sql)
    con.close()


@_SETTINGS
@given(_rows)
def test_window_and_timestamp_type_parity(spark, rows):
    """row_number -> INT both sides; event-time timestamps -> NTZ
    microsecond timestamps on the Spark side == DuckDB naive."""
    base = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        [(g, iv, base + dt.timedelta(seconds=secs)) for g, iv, _, secs in rows],
        columns=["g", "iv", "ts"],
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_parity_w")
    con = duckdb.connect()
    con.register("_parity_w", pdf)

    spark_out = spark.sql(
        """
        SELECT g, iv,
               CAST(ts AS TIMESTAMP_NTZ) AS ts,
               CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS ts_hour,
               row_number() OVER (PARTITION BY g ORDER BY ts, iv) AS rn
        FROM _parity_w ORDER BY g, rn
        """
    )
    duck_sql = """
        SELECT g, iv,
               CAST(ts AS TIMESTAMP) AS ts,
               CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ts_hour,
               CAST(row_number() OVER (PARTITION BY g ORDER BY ts, iv) AS INT) AS rn
        FROM _parity_w ORDER BY g, rn
    """
    _compare(spark_out, con, duck_sql)
    con.close()
