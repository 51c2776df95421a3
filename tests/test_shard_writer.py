"""Shard writer: payload bounds, one-file-per-shard layout,
determinism, and lossless round-trip."""

from __future__ import annotations

import glob

from monday_etl_automation_spark.plans.packing_ops import pack_sequences
from monday_etl_automation_spark.sources.shard_writer import (
    read_training_shards,
    write_training_shards,
)

_PACK_BUDGET = 256
_FILE_BUDGET = 2048


def _packed(spark, sf_dir):
    return pack_sequences(spark, sf_dir, budget=_PACK_BUDGET).localCheckpoint(eager=True)


def test_shard_files_bounded_and_single(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    packed = _packed(spark, sf_dir)
    manifest = write_training_shards(packed, out, tokens_per_file=_FILE_BUDGET)
    rows = manifest.collect()
    assert rows
    for r in rows:
        # overshoot bounded by one sequence (itself <= the pack budget)
        assert r.n_tokens < _FILE_BUDGET + _PACK_BUDGET
    # every non-final file of a shard is filled past the budget line
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, files in by_shard.items():
        files.sort(key=lambda r: r.file_seq)
        assert [f.file_seq for f in files] == list(range(len(files)))
        for f in files[:-1]:
            assert f.n_tokens >= _FILE_BUDGET - _PACK_BUDGET
    # exactly one parquet file per (shard, file_seq) directory
    for d in glob.glob(f"{out}/shard=*/file_seq=*"):
        parts = [p for p in glob.glob(f"{d}/*.parquet") if "_SUCCESS" not in p]
        assert len(parts) == 1, d


def test_shard_round_trip_lossless(spark, sf_dir, tmp_path):
    out = str(tmp_path / "shards")
    packed = _packed(spark, sf_dir)
    write_training_shards(packed, out, tokens_per_file=_FILE_BUDGET)
    back = read_training_shards(spark, out)
    orig = sorted(
        (r.shard, r.seq_idx, r.doc_id, r.chunk_idx, r.n_chunk_tokens)
        for r in packed.collect()
    )
    got = sorted(
        (r.shard, r.seq_idx, r.doc_id, r.chunk_idx, r.n_chunk_tokens)
        for r in back.collect()
    )
    assert got == orig


def test_shard_manifest_deterministic(spark, sf_dir, tmp_path):
    packed = _packed(spark, sf_dir)
    m1 = write_training_shards(packed, str(tmp_path / "a"), tokens_per_file=_FILE_BUDGET)
    m2 = write_training_shards(packed, str(tmp_path / "b"), tokens_per_file=_FILE_BUDGET)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
