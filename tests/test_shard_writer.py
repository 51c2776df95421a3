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


def _file_sequences(spark, out):
    """{range-rank -> [(shuffle_key, doc_id), ...]} per output file,
    asserting in-file sort and cross-file range disjointness — together
    these make 'concatenate files in range order' the global order."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(out)
        .select(F.input_file_name().alias("f"), "shuffle_key", "doc_id")
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r.f, []).append((r.shuffle_key, r.doc_id))
    seqs = sorted(by_file.values(), key=lambda s: min(s))
    prev_max = None
    for s in seqs:
        assert s == sorted(s)  # in-file order
        if prev_max is not None:
            assert min(s) > prev_max  # disjoint, increasing ranges
        prev_max = max(s)
    return seqs


def test_shuffled_split_is_global_permutation(spark, sf_dir, tmp_path):
    from monday_etl_automation_spark.plans.sampling_ops import corpus_splits
    from monday_etl_automation_spark.sources.shard_writer import write_shuffled_split

    out = str(tmp_path / "ep0")
    write_shuffled_split(spark, sf_dir, out, epoch=0, n_files=4)
    seqs = _file_sequences(spark, out)
    got_docs = sorted(d for s in seqs for (_, d) in s)
    want_docs = sorted(
        r.doc_id for r in corpus_splits(spark, sf_dir).where("split = 'train'").collect()
    )
    assert got_docs == want_docs  # lossless: exactly the split, once each


def test_shuffled_split_epochs_reproducible_and_independent(spark, sf_dir, tmp_path):
    from monday_etl_automation_spark.sources.shard_writer import write_shuffled_split

    a1 = str(tmp_path / "a1")
    a2 = str(tmp_path / "a2")
    b = str(tmp_path / "b")
    write_shuffled_split(spark, sf_dir, a1, epoch=0, n_files=4)
    write_shuffled_split(spark, sf_dir, a2, epoch=0, n_files=4)
    write_shuffled_split(spark, sf_dir, b, epoch=1, n_files=4)
    order_a1 = [d for s in _file_sequences(spark, a1) for (_, d) in s]
    order_a2 = [d for s in _file_sequences(spark, a2) for (_, d) in s]
    order_b = [d for s in _file_sequences(spark, b) for (_, d) in s]
    assert order_a1 == order_a2  # same epoch: byte-identical order
    assert sorted(order_a1) == sorted(order_b)  # same membership
    assert order_a1 != order_b  # different epoch: different permutation


def test_tokenized_shards_round_trip(spark, sf_dir, tmp_path):
    """Tokenized shards: one parquet file per (shard, file_seq), the
    manifest totals equal the sequence totals, and read-back id arrays
    are byte-identical to the assembled sequences."""
    import glob as _glob

    from monday_etl_automation_spark.plans.tokenize_ops import packed_token_sequences
    from monday_etl_automation_spark.sources.shard_writer import (
        read_training_shards,
        write_tokenized_shards,
    )

    seqs = packed_token_sequences(spark, sf_dir, budget=512)
    out = str(tmp_path / "tok_shards")
    manifest = write_tokenized_shards(seqs, out, tokens_per_file=2048).collect()
    assert manifest
    want_total = seqs.groupBy().sum("n_tokens").collect()[0][0]
    assert sum(r.n_tokens for r in manifest) == want_total
    for r in manifest:
        files = _glob.glob(f"{out}/shard={r.shard}/file_seq={r.file_seq}/*.parquet")
        assert len(files) == 1, f"expected ONE file per group, got {files}"
    back = read_training_shards(spark, out)
    got = {
        (r.shard, r.seq_idx): list(r.token_ids) for r in back.collect()
    }
    want = {(r.shard, r.seq_idx): list(r.token_ids) for r in seqs.collect()}
    assert got == want
