"""Custom Python data source tests (§2.1 S8 as a pluggable source)."""

from __future__ import annotations

import time

from monday_etl_automation_spark.sources.webhook_source import (
    WebhookEventsDataSource,
    make_event,
)


def _register(spark) -> None:
    if not getattr(spark, "_webhook_src_registered", False):
        spark.dataSource.register(WebhookEventsDataSource)
        spark._webhook_src_registered = True  # noqa: SLF001


def test_batch_source_deterministic_and_partitioned(spark):
    _register(spark)
    df = spark.read.format("webhook_events").option("n_events", 1000).option("partitions", 8).load()
    assert df.rdd.getNumPartitions() == 8
    rows = sorted(map(tuple, df.collect()))
    assert len(rows) == 1000
    assert rows == sorted(map(tuple, df.collect()))  # re-read identical
    assert rows[0] == make_event(0)
    assert rows[-1] == make_event(999)
    # schema contract: driver-safe types only
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "bigint", "string", "string", "timestamp_ntz", "string",
    ]


def test_stream_source_matches_batch(spark, tmp_path):
    """The streaming reader over the same feed must produce exactly the
    batch rows once all micro-batches drain."""
    import uuid

    _register(spark)
    sink = f"webhook_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("webhook_events")
        .option("events_per_batch", 100)
        .option("max_events", 500)
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(sink).count() < 500:
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table(sink).collect()))
    want = sorted(make_event(e) for e in range(500))
    assert got[:500] == want  # the stream may have read a little past 500
    assert len(got) >= 500
