"""VectorIngestSink: batch-decomposition equivalence, redelivery
idempotence, partial-commit crash recovery, dirty-batch determinism."""

from __future__ import annotations

import shutil

import pytest

from monday_etl_automation_spark.plans.embed_ingest import (
    ann_assign_batch,
    ivf_assign_batch,
    pq_encode_batch,
)
from monday_etl_automation_spark.sources.tables import register_views
from monday_etl_automation_spark.streaming.vector_ingest import VectorIngestSink

_OFF = 200000


def _vecs(spark, sf_dir, ids, off=_OFF):
    register_views(spark, sf_dir)
    idlist = ", ".join(str(i) for i in ids)
    return spark.sql(
        f"SELECT vec_id + {off} AS vec_id, embedding, label"
        f" FROM embeddings WHERE vec_id IN ({idlist})"
    ).localCheckpoint(eager=True)


def _state(sink):
    return {
        "vectors": sorted(r.vec_id for r in sink.vectors().collect()),
        "buckets": sorted(map(tuple, sink.buckets().collect())),
        "ivf": sorted(map(tuple, sink.ivf_assignment().collect())),
        "codes": sorted(map(tuple, sink.codes().collect())),
    }


@pytest.fixture()
def sink(spark, sf_dir, tmp_path):
    return VectorIngestSink(spark, sf_dir, str(tmp_path / "ingest"))


def test_stream_equals_one_shot_encoding(spark, sf_dir, sink):
    """Three batches (with a cross-batch redelivered id) must leave the
    same index state as encoding the union of fresh vectors at once —
    frozen quantizers make ingestion batch-decomposable."""
    b1 = _vecs(spark, sf_dir, [1, 2, 3])
    b2 = _vecs(spark, sf_dir, [3, 4])  # vec 3 redelivered -> skipped
    b3 = _vecs(spark, sf_dir, [5])
    sink.process_batch(b1, 1)
    sink.process_batch(b2, 2)
    sink.process_batch(b3, 3)

    got = _state(sink)
    assert got["vectors"] == [i + _OFF for i in (1, 2, 3, 4, 5)]

    union = _vecs(spark, sf_dir, [1, 2, 3, 4, 5])
    assert got["buckets"] == sorted(
        map(tuple, ann_assign_batch(spark, sf_dir, union).collect())
    )
    assert got["ivf"] == sorted(
        map(tuple, ivf_assign_batch(spark, sf_dir, union).where("rc = 1").drop("rc").collect())
    )
    assert got["codes"] == sorted(
        map(tuple, pq_encode_batch(spark, sf_dir, union).collect())
    )


def test_redelivery_is_idempotent(spark, sf_dir, sink):
    b1 = _vecs(spark, sf_dir, [1, 2])
    b2 = _vecs(spark, sf_dir, [3])
    sink.process_batch(b1, 1)
    sink.process_batch(b2, 2)
    before = _state(sink)
    sink.process_batch(b2, 2)  # at-least-once redelivery
    assert _state(sink) == before
    sink.process_batch(b1, 1)  # even a far-past redelivery converges
    assert _state(sink) == before


def test_partial_commit_recovers_on_replay(spark, sf_dir, sink):
    """Crash after committing SOME of a batch's partitions: the replay
    re-derives the same fresh set from pre-batch state and overwrites
    every partition deterministically."""
    sink.process_batch(_vecs(spark, sf_dir, [1, 2]), 1)
    b2 = _vecs(spark, sf_dir, [3, 4])
    sink.process_batch(b2, 2)
    clean = _state(sink)
    # simulate the crash: batch 2's codes partition vanished mid-commit
    shutil.rmtree(f"{sink.codes_path}/batch_id=2")
    assert _state(sink) != clean
    sink.process_batch(b2, 2)  # replay
    assert _state(sink) == clean


def test_dirty_batch_resolves_deterministically(spark, sf_dir, sink):
    """A batch carrying the same vec_id twice (different payloads)
    resolves to the min (label, embedding) struct on every retry."""
    a = _vecs(spark, sf_dir, [7])
    b = _vecs(spark, sf_dir, [9]).selectExpr(
        f"{7 + _OFF} AS vec_id", "embedding", "label"
    )
    dirty = a.union(b).localCheckpoint(eager=True)
    sink.process_batch(dirty, 1)
    first = _state(sink)
    sink.process_batch(dirty, 1)
    assert _state(sink) == first
    assert first["vectors"] == [7 + _OFF]
    # the winning payload is the min struct — re-derive independently
    want_label = min(
        (r.label, tuple(r.embedding)) for r in dirty.collect()
    )[0]
    got_label = sink.vectors().collect()[0].label
    assert got_label == want_label


def test_ivfpq_codes_ride_the_sink(spark, sf_dir, sink):
    from monday_etl_automation_spark.plans.embed_ingest import ivfpq_encode_batch

    sink.process_batch(_vecs(spark, sf_dir, [1, 2]), 1)
    sink.process_batch(_vecs(spark, sf_dir, [3]), 2)
    got = sorted(map(tuple, sink.ivfpq_codes().collect()))
    union = _vecs(spark, sf_dir, [1, 2, 3])
    want = sorted(map(tuple, ivfpq_encode_batch(spark, sf_dir, union).collect()))
    assert got == want and got
