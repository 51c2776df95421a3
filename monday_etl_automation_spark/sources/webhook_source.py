"""Custom Python data source: synthetic Monday-webhook events (§2.1 S8).

The reference ingests webhook POSTs (app.py: FastAPI endpoints); on
Spark that boundary is a *data source*. This module implements the
webhook feed as a first-class PySpark 4 Python Data Source
(``pyspark.sql.datasource``) — the public DSv2-for-Python API — in
both batch and streaming form, so a pipeline can

    spark.dataSource.register(WebhookEventsDataSource)
    spark.read.format("webhook_events").option("n_events", 10_000).load()
    spark.readStream.format("webhook_events").option("events_per_batch", 500).load()

Payload generation is a pure function of event_id (any partitioning
of the id range yields identical rows), so the source
is deterministic under retries and the batch/streaming readers agree
row-for-row — asserted in tests/test_webhook_source.py.

At scale the generator stands in for any partitioned pull (Kafka,
HTTP archive, queue export): ``partitions()`` declares the parallel
split and each task reads only its slice.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_SCHEMA = (
    "event_id BIGINT, item_id BIGINT, column_id STRING, event_type STRING, "
    "ts TIMESTAMP_NTZ, payload STRING"
)

_TYPES = ("create_pulse", "update_column_value", "create_update")
_COLUMNS = ("status", "fichiers", "texte", "formula", "date")
_T0 = dt.datetime(2024, 1, 1)


def make_event(event_id: int) -> tuple:
    """Deterministic webhook event — pure function of event_id."""
    item_id = 1000 + (event_id * 7919) % 5000
    column_id = _COLUMNS[event_id % len(_COLUMNS)]
    event_type = _TYPES[(event_id // 3) % len(_TYPES)]
    ts = _T0 + dt.timedelta(seconds=13 * event_id)
    payload = json.dumps(
        {
            "boardId": 4000 + item_id % 7,
            "pulseId": item_id,
            "columnId": column_id,
            "value": {"index": event_id % 40},
        },
        separators=(",", ":"),
        sort_keys=True,
    )
    return (event_id, item_id, column_id, event_type, ts, payload)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


class WebhookEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_events = int(options.get("n_events", 1000))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        per = -(-self.n_events // self.n_partitions)
        return [
            _RangePartition(i * per, min((i + 1) * per, self.n_events))
            for i in range(self.n_partitions)
            if i * per < self.n_events
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for eid in range(partition.start, partition.end):
            yield make_event(eid)


class WebhookEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch is the next slice of the feed.
    Offsets are plain event-id watermarks, so restart/replay from a
    checkpoint re-reads exactly the same rows (exactly-once source
    semantics under deterministic generation)."""

    def __init__(self, options: dict) -> None:
        self.per_batch = int(options.get("events_per_batch", 100))
        self.max_events = int(options.get("max_events", 10_000))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["next"]
        hi = min(lo + self.per_batch, self.max_events)
        return iter([make_event(e) for e in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([make_event(e) for e in range(start["next"], end["next"])])


class WebhookEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "webhook_events"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> WebhookEventsReader:
        return WebhookEventsReader(self.options)

    def simpleStreamReader(self, schema) -> WebhookEventsStreamReader:
        return WebhookEventsStreamReader(self.options)
