"""Temporal join operators the reference lacks (SURVEY.md §2.3 note:
"no theta/range/as-of joins exist in the reference — they arrive free
with df.join in our engine").

- asof_last_click     — backward as-of join over the events stream:
                        for each purchase, the same user's most recent
                        click at-or-before it. Implemented with the
                        union-marker + running last(ignorenulls)
                        window (operators/joins.py:asof_join_backward)
                        — ONE shuffle on user_id, no range scan.
- range_error_context — sliding-lookback range join: per error event,
                        how many events the same user produced in the
                        preceding 10 minutes. Implemented as a
                        bucketed equi-join (bucket width == window
                        length, probe side explodes into 2 buckets) —
                        the exact-result range-join shape that stays
                        an equi-join at 100 TB.

Oracles: DuckDB computes the same semantics directly (correlated
scalar subquery for the as-of; a theta left join for the range) —
independent formulations, same answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.operators.joins import asof_join_backward, bucketed_range_join
from monday_etl_automation_spark.sources.tables import load_table


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    # payload field order (event_id first) is the equal-ts tiebreak:
    # the greatest (ts, event_id) click wins, matching the oracle's
    # ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
    out = asof_join_backward(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"event_id": "click_event_id", "ts": "click_ts"},
    )
    # NTZ output (UTC session) = DuckDB's naive timestamps, arrow-exact
    return (
        out.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("click_ts", F.col("click_ts").cast("timestamp_ntz"))
        .orderBy("event_id")
    )


ASOF_ORACLE = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
SELECT
  p.event_id, p.user_id, p.ts,
  (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_event_id,
  (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_ts
FROM p
ORDER BY p.event_id
""".strip()


_LOOKBACK_S = 600  # 10 minutes


def range_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    pairs = bucketed_range_join(
        errors,
        ev.select("event_id", "user_id", "ts", "event_type"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        window_seconds=_LOOKBACK_S,
    )
    counts = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_prior"),
        F.sum(F.when(F.col("r_event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("n_prior_errors"),
    )
    return (
        errors.join(counts, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            F.coalesce("n_prior", F.lit(0)).alias("n_prior"),
            F.coalesce("n_prior_errors", F.lit(0)).alias("n_prior_errors"),
        )
        .orderBy("event_id")
    )


RANGE_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
SELECT
  e.event_id, e.user_id, e.ts,
  count(a.event_id) AS n_prior,
  CAST(COALESCE(sum(CASE WHEN a.event_type = 'error' THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_prior_errors
FROM e
LEFT JOIN events a
  ON a.user_id = e.user_id
 AND a.ts >= e.ts - INTERVAL {_LOOKBACK_S} SECOND
 AND a.ts < e.ts
GROUP BY e.event_id, e.user_id, e.ts
ORDER BY e.event_id
""".strip()


def temporal_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of + range join in one relation (merged so both temporal
    operators sit inside the driver's 50-entry correctness window).
    The probe sets are disjoint (purchases vs errors), so a tagged
    union with per-kind NULL columns loses nothing."""
    asof = asof_last_click(spark, sf_dir).select(
        F.lit("asof").alias("join_kind"),
        "event_id",
        "user_id",
        "ts",
        "click_event_id",
        "click_ts",
        F.lit(None).cast("bigint").alias("n_prior"),
        F.lit(None).cast("bigint").alias("n_prior_errors"),
    )
    rng = range_error_context(spark, sf_dir).select(
        F.lit("range").alias("join_kind"),
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("bigint").alias("click_event_id"),
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
        "n_prior",
        "n_prior_errors",
    )
    return asof.unionByName(rng).orderBy("join_kind", "event_id")


TEMPORAL_ORACLE = f"""
WITH asof_res AS ({ASOF_ORACLE.replace("ORDER BY p.event_id", "")}),
rng AS ({RANGE_ORACLE.replace("ORDER BY e.event_id", "")})
SELECT 'asof' AS join_kind, event_id, user_id, ts, click_event_id, click_ts,
       CAST(NULL AS BIGINT) AS n_prior, CAST(NULL AS BIGINT) AS n_prior_errors
FROM asof_res
UNION ALL
SELECT 'range', event_id, user_id, ts, CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
       n_prior, n_prior_errors
FROM rng
ORDER BY join_kind, event_id
""".strip()


QUERIES: dict[str, tuple] = {
    "temporal_joins": (temporal_joins, TEMPORAL_ORACLE),
}
