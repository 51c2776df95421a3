"""Structured Streaming surface (SURVEY.md §2.10).

The reference is an at-least-once webhook processor with no windowing;
the engine exposes the full Structured Streaming shape over the
``events`` table: watermarked tumbling/sliding/session windows,
duplicate-event suppression (``dropDuplicatesWithinWatermark`` — the
webhook-retry path), and a ``foreachBatch`` MERGE-style upsert (the
S12 status-mutation path, Leyton_depot.py:594-613).

Batch/stream parity: every streaming aggregation here has the exact
same expression as its batch twin in ``plans/windows_ops.py``, so a
full replay with ``availableNow`` must reproduce the batch answer —
that property is what the driver's oracle checks.

Scale notes: state stores are keyed by (window, event_type) /
(user_id, session) — bounded by watermark eviction; a real deployment
sets ``spark.sql.streaming.stateStore.providerClass`` to RocksDB for
100 TB replays. The parquet source here stands in for Kafka: the plan
is identical from the first transformation on.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monday_etl_automation_spark.sources.tables import load_table


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet (stand-in for a Kafka topic).

    The file carries TIMESTAMP(NANOS); we read nanos as long and
    convert, exactly like the batch loader (sources/tables.py).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = load_table(spark, sf_dir, "events").schema
    raw_schema = ", ".join(
        f"{f.name} {'LONG' if f.name == 'ts' else f.dataType.simpleString()}"
        for f in schema.fields
    )
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # integer division: `/` would widen to double and lose precision
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked 1-hour tumbling counts per event_type.

    Identical aggregation expression to the batch twin; DECIMAL sums
    for engine-exact totals.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation, driver-safe DOUBLE output
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            # NTZ output (UTC session => same wall time) matches the
            # oracle's naive timestamps at the arrow level too
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            F.col("w.end").cast("timestamp_ntz").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Webhook-retry suppression: drop duplicate event_ids while their
    watermark window is open (at-least-once -> effectively-once)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_replay(spark: SparkSession, sf_dir: str, name: str | None = None) -> DataFrame:
    """Full availableNow replay of the tumbling aggregation into a
    memory sink; returns the final (batch-equal) result."""
    sink = name or f"replay_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_counts(event_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("window_start", "event_type")


def stateful_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user totals maintained in explicit group state (the shape for
    operators watermark windows can't express — per-key accumulators,
    custom eviction, decode state machines).

    Numeric policy: the state holds (n_events, sum of
    floor(value * 1e6) as int64) — integer accumulation is
    order-insensitive and engine-exact, so the batch SQL twin matches
    bit-for-bit (float sums would drift with pandas' reduction order).

    Emits the updated totals for every group touched by a micro-batch;
    totals are monotone in n_events, so the final answer of a replay
    is the max-n_events row per user.
    """
    import pandas as pd  # noqa: PLC0415 (executor-side import parity)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        import math  # noqa: PLC0415

        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += sum(math.floor(v * 1_000_000) for v in pdf["value"])
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_micros": [s]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id BIGINT, n_events BIGINT, sum_micros BIGINT",
        stateStructType="n BIGINT, s BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_replay(spark: SparkSession, sf_dir: str, name: str | None = None) -> DataFrame:
    """availableNow replay of the stateful operator; reduce the update
    stream to the final (= max n_events) row per user."""
    from pyspark.sql import Window

    sink = name or f"stateful_{uuid.uuid4().hex[:8]}"
    q = (
        stateful_user_totals_stream(event_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_state_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(sink)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("user_id")
    )


class StatusUpsertSink:
    """S12 analog: MERGE-style latest-status upsert via foreachBatch.

    Maintains a keyed status table ((item_id, column_id) -> label) as
    a parquet directory, overwritten per micro-batch with the merge of
    previous state and the batch's latest-per-key rows. In a real
    deployment this is a Delta/Iceberg MERGE; vanilla-Spark overwrite
    keeps the same idempotent, exactly-once-per-key semantics.
    """

    def __init__(self, spark: SparkSession, path: str | None = None) -> None:
        self.spark = spark
        self.path = path or tempfile.mkdtemp(prefix="status_upsert_")
        self._has_state = False

    def current(self) -> DataFrame:
        if not self._has_state:
            return self.spark.createDataFrame(
                [], "item_id BIGINT, column_id STRING, status STRING, updated_at TIMESTAMP"
            )
        return self.spark.read.parquet(self.path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        w = Window.partitionBy("item_id", "column_id").orderBy(
            F.desc("updated_at"), F.desc("status")
        )
        latest = (
            batch.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
        )
        merged = (
            self.current()
            .unionByName(latest)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
        out = self.path + f"_b{batch_id}"
        merged.write.mode("overwrite").parquet(out)
        self.spark.read.parquet(out).write.mode("overwrite").parquet(self.path)
        self._has_state = True

    def run(self, statuses: DataFrame) -> None:
        q = (
            statuses.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_upsert_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
