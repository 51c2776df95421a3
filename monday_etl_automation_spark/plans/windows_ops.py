"""Event-time window operators over ``events`` (SURVEY.md §2.10).

The window aggregations live in streaming/pipeline.py as functions of
an arbitrary events frame — ``window()`` / ``session_window()`` are
the same expressions in batch and streaming plans, so ONE definition
serves both. The REGISTERED tumbling/sliding/session queries run the
REAL Structured Streaming pipeline (availableNow over the parquet
source, memory sink) and must reproduce the batch answer the DuckDB
oracle computes directly — replay determinism is the §2.10 test
strategy, and it covers the batch operator and the streaming replay
in a single driver-checked entry. The batch twins below stay exported
for tests (tests/test_streaming.py asserts batch == replay).

DuckDB oracles: tumbling = time_bucket; sliding = each event assigned
to size/slide buckets; session = gaps-and-islands (lag + cumulative
session ids); dead-letter = the CASE the router applies.

Scale notes: window aggs shuffle once on (window, key); session
windows shuffle on user_id. Value sums aggregate in DECIMAL (exact)
and output DOUBLE (driver-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.sources.tables import load_table, register_views
from monday_etl_automation_spark.streaming import pipeline as streaming


# ---------------------------------------------------------------------------
# tumbling — 1-hour fixed windows
# ---------------------------------------------------------------------------


def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        streaming.tumbling_counts(events.withWatermark("ts", "100 days"))
        .orderBy("window_start", "event_type")
    )


TUMBLING_ORACLE = """
SELECT
  time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
  time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
""".strip()


def stream_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming replay — must equal the batch twin."""
    return streaming.run_replay(spark, sf_dir)


# ---------------------------------------------------------------------------
# sliding — 1-hour windows sliding every 30 minutes
# ---------------------------------------------------------------------------


def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (shared expression) — used by tests for replay parity."""
    events = load_table(spark, sf_dir, "events")
    return streaming.sliding_stats(events).orderBy("window_start", "event_type")


def stream_sliding_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming replay — must equal the batch twin."""
    return streaming.run_sliding_replay(spark, sf_dir)


SLIDING_ORACLE = """
WITH assigned AS (
  SELECT
    time_bucket(INTERVAL 30 MINUTE, ts) - i * INTERVAL 30 MINUTE AS window_start,
    event_type, value
  FROM events, (SELECT unnest([0, 1]) AS i)
)
SELECT
  window_start,
  event_type,
  count(*) AS n_events,
  CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS max_value
FROM assigned
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""".strip()


# ---------------------------------------------------------------------------
# session — 5-minute-gap sessions per user
# ---------------------------------------------------------------------------


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (shared expression) — used by tests for replay parity."""
    events = load_table(spark, sf_dir, "events")
    return streaming.session_stats(events).orderBy("user_id", "session_start")


def stream_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming replay of the merge-on-gap session
    aggregation — the state shape where streaming diverges most from
    batch, so replay==oracle is the strongest §2.10 evidence.

    r15: + the ``timer`` section — the EXPLICIT-timer sessionizer
    (``applyInPandasWithState`` + EventTimeTimeout,
    streaming/pipeline.py:sessionize_with_timers) replayed through
    time-ordered micro-batches, union-tagged so the last pytest-only
    streaming operator rides the driver hash. Its oracle is the pure
    gaps-and-islands computation RESTRICTED to sessions the watermark
    provably closed: with a 0-second delay the final watermark is the
    global max event time, so a user's final session is emitted iff
    ``last_event + gap <= max(ts)`` — verified exact against the
    replay at sf0.001/0.01/0.1 before wiring. Note the two sections'
    gap conventions differ deliberately: session_window starts a new
    session AT gap distance (>=), the timer state machine only after
    a STRICT > gap silence — both pinned by their oracles."""
    # The two replays are independent streams over independent sinks,
    # so they run CONCURRENTLY (the dead_letter_counts pattern —
    # Structured Streaming's normal multi-query mode): wall time is
    # max(window, timer), not their sum.
    # users_mod=7: deterministic 1-in-7 user slice — the timer
    # replay's cost is per (group, micro-batch) state-protocol calls,
    # so the slice bounds it at ~1/7 while every timer semantic still
    # fires; the oracle filters the identical slice (full corpus
    # stays covered by tests/test_streaming.py at the pytest SF).
    # n_splits=2 (r19, was 3; r18 verdict item 4): the replay's fixed
    # cost is per micro-batch (state server + store commits, ~1.3-1.5s
    # each at sf0.1 — re-measured r19 at both 32 and 8 cores:
    # timer3 4.77/4.17s vs timer2 3.26/3.17s) and 2 batches still
    # exercise a real cross-batch session, a mid-stream timer fire at
    # the interior boundary, and the final watermark pass. The emitted
    # set depends ONLY on the final watermark, never the batch cut —
    # pinned by test_timer_sessionization_split_invariant (2==3==8
    # splits) — so the oracle is unchanged; the multi-boundary state
    # path stays exercised by the 4-batch pytest variant
    # (tests/test_streaming.py). State width 4 re-confirmed optimal at
    # both core counts (width 2 slower on BOTH window and timer).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_win = pool.submit(streaming.run_session_replay, spark, sf_dir)
        f_tim = pool.submit(
            streaming.run_timer_sessions_replay, spark, sf_dir, 300, 2, 7
        )
        win = f_win.result()
        tim = f_tim.result()
    win_t = win.select(
        F.lit("window").alias("section"),
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.lit(None).cast("bigint").alias("sum_micros"),
    )
    tim_t = tim.select(
        F.lit("timer").alias("section"),
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        # the timer state machine tracks LAST EVENT time, not the
        # window-close bound — session_end carries it as-is
        F.col("session_last").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.lit(None).cast("double").alias("sum_value"),
        F.col("sum_micros").cast("bigint").alias("sum_micros"),
    )
    return win_t.unionByName(tim_t)


# Gaps-and-islands, twice: the window section breaks at >= 5 min
# (session_window's exclusive [start, last+gap) end) and reports
# last + gap as session_end; the timer section breaks at > 5 min
# (the state machine's strict-silence rule), reports the last event
# itself, integer-exact micros sums, and keeps only sessions the
# 0-delay watermark closed (last + gap <= global max ts).
SESSION_ORACLE = """
WITH marked AS (
  SELECT
    user_id, ts, value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
),
numbered AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
),
t_marked AS (
  SELECT
    user_id, epoch_us(ts) AS ts_us,
    CAST(floor(value * 1000000) AS BIGINT) AS val_us,
    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) > 300000000
         OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
  WHERE user_id % 7 = 0
),
t_numbered AS (
  SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM t_marked
),
t_sessions AS (
  SELECT user_id, session_id, min(ts_us) AS start_us, max(ts_us) AS last_us,
         count(*) AS n_events, sum(val_us) AS sum_micros
  FROM t_numbered GROUP BY user_id, session_id
),
-- max_sid marks each user's FINAL session: a non-final session is
-- closed by the DATA GAP to its successor and the engine emits it
-- regardless of the watermark, so only final sessions go through the
-- timer-fire condition below (r16; without the disjunct, a mid-stream
-- session whose last+gap lands in the same millisecond as the global
-- max would be emitted by the replay but dropped by the oracle —
-- pinned by tests/test_streaming.py's boundary fixture)
t_final AS (
  SELECT ts.*, max(session_id) OVER (PARTITION BY user_id) AS max_sid
  FROM t_sessions ts
),
t_max AS (SELECT max(epoch_us(ts)) AS max_us FROM events WHERE user_id % 7 = 0)
SELECT
  'window' AS section,
  min(ts) AS session_start,
  max(ts) + INTERVAL 5 MINUTE AS session_end,
  user_id,
  count(*) AS n_events,
  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
  CAST(NULL AS BIGINT) AS sum_micros
FROM numbered
GROUP BY user_id, session_id
UNION ALL
SELECT
  'timer',
  make_timestamp(start_us),
  make_timestamp(last_us),
  user_id,
  CAST(n_events AS BIGINT),
  CAST(NULL AS DOUBLE),
  CAST(sum_micros AS BIGINT)
FROM t_final, t_max
WHERE session_id < max_sid
   OR (last_us + 300000000) // 1000 < max_us // 1000
""".strip()


# ---------------------------------------------------------------------------
# event_hygiene — webhook-retry suppression (rows must survive exactly
# once) + semi-structured props extraction (P2 analog over the stream)
# ---------------------------------------------------------------------------


def event_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-dedup counts + semi-structured payload stats in ONE
    per-event_type relation (merged for the 50-entry driver window;
    both families stay independently computed and join on event_type).

    - dedup half: batch shape of dropDuplicatesWithinWatermark — one
      row per event_id after doubling the stream (webhook retries);
      events are unique in the fixture, so this also checks dedup does
      not drop legitimate rows.
    - props half: the P2 analog over the stream — get_json_object
      extraction with silent-null semantics, aggregated per type.
    - VARIANT half: the SAME stats through Spark 4's native VARIANT
      path (try_parse_json + variant_get, plans/spark4_ops.py) —
      parse-once binary documents instead of per-path string
      re-parsing; joined in as ``*_variant`` columns so the driver
      hash pins VARIANT semantics against DuckDB's JSON extraction.
    """
    from monday_etl_automation_spark.plans.spark4_ops import variant_props_stats

    events = load_table(spark, sf_dir, "events")
    doubled = events.unionByName(events)  # simulate webhook retries
    uniq = (
        doubled.dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    props = (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
    vstats = variant_props_stats(spark, sf_dir).select(
        "event_type",
        F.col("n_with_k").cast("bigint").alias("n_with_k_variant"),
        F.col("sum_k").cast("bigint").alias("sum_k_variant"),
        F.col("min_k").cast("bigint").alias("min_k_variant"),
        F.col("max_k").cast("bigint").alias("max_k_variant"),
    )
    return uniq.join(props, "event_type").join(vstats, "event_type")


EVENT_HYGIENE_ORACLE = """
WITH doubled AS (SELECT * FROM events UNION ALL SELECT * FROM events),
uniq AS (SELECT event_id, any_value(event_type) AS event_type FROM doubled GROUP BY event_id),
dd AS (SELECT event_type, count(*) AS n_unique FROM uniq GROUP BY event_type),
props AS (
  SELECT
    event_type,
    count(*) AS n_events,
    CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
    min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
    max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
  FROM events
  GROUP BY event_type
),
variantp AS (
  SELECT
    event_type,
    CAST(count(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS n_with_k_variant,
    CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k_variant,
    CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS min_k_variant,
    CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS max_k_variant
  FROM events
  GROUP BY event_type
)
SELECT dd.event_type, dd.n_unique, props.n_events, props.sum_k, props.min_k, props.max_k,
       variantp.n_with_k_variant, variantp.sum_k_variant,
       variantp.min_k_variant, variantp.max_k_variant
FROM dd
JOIN props ON dd.event_type = props.event_type
JOIN variantp ON dd.event_type = variantp.event_type
ORDER BY dd.event_type
""".strip()


# ---------------------------------------------------------------------------
# stateful — custom applyInPandasWithState operator (per-user running
# totals in explicit group state), replayed availableNow
# ---------------------------------------------------------------------------


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three custom-UDF surfaces (§2.11) in one per-user relation:

    - ``applyInPandasWithState`` — the REAL stateful streaming operator
      (explicit GroupState, integer-exact accumulators), replayed
      availableNow and reduced to final totals;
    - ``applyInPandas`` grouped-map — per-user inter-event gap stats
      (operators/grouped_map.py), whole-group pandas computation;
    - GROUPED_AGG pandas UDF — the integer-micros UDAF
      (functions/grouped.py), which must independently re-derive the
      stateful operator's sum (udaf_sum_micros == sum_micros is part
      of the hashed check).

    All three shuffle on the same key (user_id) and join on it; one
    oracle hash covers the lot.
    """
    from monday_etl_automation_spark.functions.grouped import sum_value_micros
    from monday_etl_automation_spark.operators.grouped_map import user_gap_stats

    totals = streaming.run_stateful_replay(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    gaps = user_gap_stats(events).drop("n_events")
    # GROUPED_AGG has no partial aggregation: the whole group crosses
    # the shuffle, and AQE's size-based coalescing would funnel every
    # group through one Python worker (see operators/grouped_map.py) —
    # partition the Python stage by CPU explicitly.
    cpus = spark.sparkContext.defaultParallelism
    udaf = (
        events.select("user_id", "value")
        .repartition(cpus, "user_id")
        .groupBy("user_id")
        .agg(sum_value_micros(F.col("value")).alias("udaf_sum_micros"))
    )
    return totals.join(gaps, "user_id").join(udaf, "user_id")


STATEFUL_ORACLE = """
WITH g AS (
  SELECT
    user_id, value,
    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
)
SELECT
  user_id,
  count(*) AS n_events,
  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
  count(gap) AS n_gaps,
  min(gap) AS min_gap_us,
  max(gap) AS max_gap_us,
  CAST(sum(gap) AS DOUBLE) / count(gap) AS mean_gap_us,
  CAST(sum(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT) AS udaf_sum_micros
FROM g
GROUP BY user_id
ORDER BY user_id
""".strip()


# ---------------------------------------------------------------------------
# dead_letter — quarantine routing for malformed payloads (reference
# error echo app.py:101-102,334-338; SURVEY §2.10). The registered
# query streams events with deterministically injected corrupt JSON
# through the foreachBatch router (delivered/quarantine parquet
# tables), then counts both dispositions per event_type.
# ---------------------------------------------------------------------------


def dead_letter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing + the S12/S13 status-upsert sink in one
    tagged relation. The upsert rows run the REAL StatusUpsertSink
    (multi-micro-batch MERGE, streaming/pipeline.py:run_status_upsert)
    and count its final state per latest status — the oracle's
    latest-per-key row_number()=1 SQL must reproduce the merged sink
    state exactly, which puts the only cell-mutation path
    (Leyton_depot.py:594-633) under the driver hash.

    The two pipelines are independent streams over independent sinks,
    so they replay CONCURRENTLY (two streaming queries in one session
    — Structured Streaming's normal multi-query mode); wall time is
    max(pipelines), not their sum."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_dlq = pool.submit(streaming.run_dead_letter, spark, sf_dir)
        # n_splits=2: the merged state is batch-order independent (the
        # per-key top-1 is associative), so the driver entry exercises
        # one real cross-batch MERGE at half the micro-batch machinery
        # (~1.1s/batch of state-store + dynamic-overwrite commits at
        # sf0.1 — r8 verdict item 4); the 4-batch variant stays pinned
        # in tests/test_streaming.py.
        f_ups = pool.submit(streaming.run_status_upsert, spark, sf_dir, 2)
        delivered, quarantined = f_dlq.result()
        upserted = f_ups.result()
    tagged = (
        delivered.select("event_type", F.lit("delivered").alias("disposition"))
        .unionByName(quarantined.select("event_type", F.lit("quarantined").alias("disposition")))
        .unionByName(
            upserted.select(
                F.col("status").alias("event_type"), F.lit("upsert_latest").alias("disposition")
            )
        )
    )
    return tagged.groupBy("event_type", "disposition").agg(
        F.count(F.lit(1)).alias("n_events")
    )


DEAD_LETTER_ORACLE = """
SELECT
  event_type,
  CASE WHEN event_id % 13 = 0 OR json_extract_string(props, '$.k') IS NULL
       THEN 'quarantined' ELSE 'delivered' END AS disposition,
  count(*) AS n_events
FROM events
GROUP BY event_type, disposition
UNION ALL
SELECT event_type, 'upsert_latest' AS disposition, count(*) AS n_events
FROM (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_type DESC) AS rn
  FROM events
) latest
WHERE rn = 1
GROUP BY event_type
ORDER BY event_type, disposition
""".strip()


QUERIES: dict[str, tuple] = {
    # streaming replays double as the batch-window correctness checks:
    # oracle == the batch semantics, replay must reproduce them exactly
    "stream_tumbling_replay": (stream_tumbling_replay, TUMBLING_ORACLE),
    "stream_sliding_replay": (stream_sliding_replay, SLIDING_ORACLE),
    "stream_session_replay": (stream_session_replay, SESSION_ORACLE),
    "dead_letter_counts": (dead_letter_counts, DEAD_LETTER_ORACLE),
    "stateful_user_totals": (stateful_user_totals, STATEFUL_ORACLE),
    "event_hygiene": (event_hygiene, EVENT_HYGIENE_ORACLE),
}
