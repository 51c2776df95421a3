"""Contracts around round-8 performance machinery: scoped replay
shuffle width and snapshot-keyed index persistence. These are the
behaviors that would regress silently (a leaked conf override or a
stale index serve wrong-but-plausible results later)."""

from __future__ import annotations

import os
import shutil

from monday_etl_automation_spark.plans.embed_ops import (
    _ann_bucket_index,
    _train_ivf_ranked,
)
from monday_etl_automation_spark.sources.tables import register_views
from monday_etl_automation_spark.streaming.pipeline import (
    _REPLAY_SHUFFLE_PARTITIONS,
    run_replay,
)


def test_replay_restores_session_shuffle_partitions(spark, sf_dir):
    """The replay-scoped width override must never leak into the
    session: later batch queries would silently run at the replay
    width (wrong parallelism for corpus-scale shuffles)."""
    original = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "23")
    try:
        run_replay(spark, sf_dir)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "23"
    finally:
        # restore what the SESSION had, not a hardcoded width — this
        # test must not itself commit the conf-leak it polices
        spark.conf.set("spark.sql.shuffle.partitions", original)
    assert _REPLAY_SHUFFLE_PARTITIONS < 23  # the override actually overrides


def test_persisted_indexes_memoize_and_invalidate(spark, sf_dir, tmp_path):
    """ANN bucket index and IVF assignment are cached per (session,
    data snapshot) and must (a) return the same relation while the
    snapshot is unchanged, (b) rebuild when the file changes — a stale
    index would serve assignments for vanished vectors."""
    work = tmp_path / "snap"
    work.mkdir()
    for t in ("embeddings", "documents"):
        shutil.copy(os.path.join(sf_dir, f"{t}.parquet"), work / f"{t}.parquet")
    # register_views requires the full table set; point the cache key
    # dir at the copy but register views from the real sf_dir
    register_views(spark, sf_dir)
    a1 = _ann_bucket_index(spark, str(work))
    a2 = _ann_bucket_index(spark, str(work))
    assert a1 is a2, "unchanged snapshot must hit the cache"
    assert isinstance(a1, tuple) and isinstance(a1[1], int)  # (index, modulus) travel together
    i1 = _train_ivf_ranked(spark, str(work))
    assert _train_ivf_ranked(spark, str(work)) is i1
    # content-identical rewrite still changes (mtime, size) key
    emb = work / "embeddings.parquet"
    data = emb.read_bytes()
    emb.write_bytes(data)
    os.utime(emb, ns=(os.stat(emb).st_mtime_ns + 1_000_000, os.stat(emb).st_mtime_ns + 1_000_000))
    a3 = _ann_bucket_index(spark, str(work))
    assert a3 is not a1, "changed snapshot must rebuild the index"
