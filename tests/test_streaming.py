"""Structured Streaming behavior tests (SURVEY.md §2.10, §5 item 4).

Covers the streaming-only semantics that have no DuckDB oracle:
replay determinism, duplicate suppression, and the foreachBatch
MERGE-style status upsert (S12 analog).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from monday_etl_automation_spark.streaming.pipeline import (
    StatusUpsertSink,
    dedup_events,
    event_stream,
    run_replay,
)


def test_replay_is_deterministic(spark, sf_dir):
    a = run_replay(spark, sf_dir).collect()
    b = run_replay(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_dedup_within_watermark_suppresses_retries(spark, sf_dir, tmp_path):
    import uuid

    events = event_stream(spark, sf_dir)
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup_events(events)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from monday_etl_automation_spark.sources.tables import load_table

    n_unique = load_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert spark.table(sink).collect()[0]["n"] == n_unique


def test_status_upsert_keeps_latest_per_key(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "status", "RES020", t0),
        (1, "status", "RES010", t0 + dt.timedelta(minutes=5)),
        (2, "status", "Dossier déposé", t0),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, "item_id BIGINT, column_id STRING, status STRING, updated_at TIMESTAMP"
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "item_id BIGINT, column_id STRING, status STRING, updated_at TIMESTAMP"
    ).parquet(src)
    sink = StatusUpsertSink(spark, str(tmp_path / "state"))
    sink.run(stream)

    got = {(r.item_id, r.column_id): r.status for r in sink.current().collect()}
    assert got == {(1, "status"): "RES010", (2, "status"): "Dossier déposé"}

    # second run with a newer status must overwrite (idempotent MERGE)
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(2, "status", "RES020", t0 + dt.timedelta(hours=1))],
        "item_id BIGINT, column_id STRING, status STRING, updated_at TIMESTAMP",
    ).write.parquet(src2)
    stream2 = spark.readStream.schema(
        "item_id BIGINT, column_id STRING, status STRING, updated_at TIMESTAMP"
    ).parquet(src2)
    sink.run(stream2)
    got2 = {(r.item_id, r.column_id): r.status for r in sink.current().collect()}
    assert got2[(2, "status")] == "RES020"
    assert got2[(1, "status")] == "RES010"
