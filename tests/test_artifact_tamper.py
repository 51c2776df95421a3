"""Tamper-sensitivity of the shipped-artifact hash contracts.

The r16/r17 read-back exposures (eperm, tokp, vstream) claim that the
driver hash verifies the BYTES ON DISK — that the aggregates it rides
would change if the shipped parquet were corrupted. These tests prove
that claim by re-running the IDENTICAL aggregation expressions (the
factored ``_eperm_agg`` / ``_tokp_agg`` / ``_vstream_agg``, the same
code paths the driver-hashed summaries call) over an in-memory
corrupted copy of the shipped rows and asserting the contract fires.

Two corruption classes per the md5-multiset design:
- a SINGLE-ROW value flip — any honest aggregate catches it somewhere;
- a COMPENSATING tamper that preserves every plain aggregate the shape
  carries (count, key sum, min/max) — only the 60-bit md5 multiset
  checksum catches it. This is the case the checksum column exists
  for; a sum-of-keys contract alone would wave it through.

The shipped artifacts themselves are never touched (they are
session-cached; CLAUDE.md) — corruption is applied lazily on top of
the read-back DataFrames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.eperm_extra import (
    _eperm_agg,
    _eperm_artifact,
)
from monday_etl_automation_spark.plans.release_extra import (
    _tokenized_shard_artifact,
    _tokp_agg,
)
from monday_etl_automation_spark.plans.tokenize_ops import eod_token_id
from monday_etl_automation_spark.plans.vstream_extra import (
    _ingest_artifact,
    _vstream_agg,
)


def _by_key(rows, key):
    return {getattr(r, key): r.asDict() for r in rows}


# --- eperm: epoch-shuffled split files -----------------------------------------


def test_eperm_single_row_tamper_changes_checksum(spark, sf_dir):
    (base,) = _eperm_artifact(spark, sf_dir)
    back = spark.read.parquet(base)
    baseline = _by_key(_eperm_agg(back).collect(), "part")
    victim = back.orderBy("epoch", "file_id", "doc_id").first()
    part = f"e{victim.epoch}:f{victim.file_id}"
    hit = (
        (F.col("epoch") == victim.epoch)
        & (F.col("file_id") == victim.file_id)
        & (F.col("doc_id") == victim.doc_id)
    )
    tampered = back.withColumn(
        "doc_id", F.when(hit, F.col("doc_id") + 10**12).otherwise(F.col("doc_id"))
    )
    got = _by_key(_eperm_agg(tampered).collect(), "part")
    assert got[part]["checksum"] != baseline[part]["checksum"]
    for p in baseline:
        if p != part:
            assert got[p] == baseline[p]


def test_eperm_compensating_pair_tamper_only_checksum_fires(spark, sf_dir):
    """Shift two interior rows' shuffle keys by +1/-1 inside one file:
    n, min_key, max_key all survive — the md5 multiset checksum is the
    only line of defense, and it fires."""
    (base,) = _eperm_artifact(spark, sf_dir)
    back = spark.read.parquet(base)
    baseline = _by_key(_eperm_agg(back).collect(), "part")
    # a file with enough rows to have two strictly-interior keys
    part, rec = next(
        (p, r) for p, r in sorted(baseline.items()) if r["n"] >= 4
    )
    epoch, fid = part[1:].split(":f")
    keys = [
        r.shuffle_key
        for r in back.where(
            (F.col("epoch") == int(epoch)) & (F.col("file_id") == int(fid))
        )
        .orderBy("shuffle_key")
        .collect()
    ]
    lo, hi = keys[1], keys[-2]  # strictly interior: ±1 can't touch min/max
    assert rec["min_key"] < lo and hi < rec["max_key"]
    in_file = (F.col("epoch") == int(epoch)) & (F.col("file_id") == int(fid))
    tampered = back.withColumn(
        "shuffle_key",
        F.when(in_file & (F.col("shuffle_key") == lo), F.col("shuffle_key") + 1)
        .when(in_file & (F.col("shuffle_key") == hi), F.col("shuffle_key") - 1)
        .otherwise(F.col("shuffle_key")),
    )
    got = _by_key(_eperm_agg(tampered).collect(), "part")
    for field in ("n", "min_key", "max_key", "files_ok"):
        assert got[part][field] == baseline[part][field]
    assert got[part]["checksum"] != baseline[part]["checksum"]
    for p in baseline:
        if p != part:
            assert got[p] == baseline[p]


# --- tokp: tokenized training shards -------------------------------------------


def test_tokp_token_value_tamper_changes_ids_sum(spark, sf_dir):
    """Flip every content token's VALUE in one file while preserving
    every count (sequence, token, span, EOD): only the content sum can
    catch it, and it does."""
    out, manifest, budget = _tokenized_shard_artifact(spark, sf_dir)
    back = spark.read.parquet(out)
    baseline = _by_key(_tokp_agg(back, manifest, budget).collect(), "shard")
    victim = back.select("shard", "file_seq").first()
    eod = eod_token_id(None)
    in_file = (F.col("shard") == victim.shard) & (
        F.col("file_seq") == victim.file_seq
    )
    # +10^9 on non-EOD tokens: sizes and EOD count survive by
    # construction (token ids are small non-negative ints)
    tampered = back.withColumn(
        "token_ids",
        F.when(
            in_file,
            F.expr(
                "transform(token_ids, x -> CASE WHEN x = "
                f"{eod} THEN x ELSE x + 1000000000 END)"
            ),
        ).otherwise(F.col("token_ids")),
    )
    got = _by_key(_tokp_agg(tampered, manifest, budget).collect(), "shard")
    s = victim.shard
    for field in ("tok_total", "ids_total", "span_total", "eod_total"):
        assert got[s][field] == baseline[s][field]
    assert got[s]["ids_sum"] != baseline[s]["ids_sum"]
    for p in baseline:
        if p != s:
            assert got[p] == baseline[p]


# --- vstream: streaming vector-index ingest tables ------------------------------


def test_vstream_label_tamper_only_checksum_fires(spark, sf_dir):
    """Rewrite every shipped vector's label: vec row count and key sum
    are untouched (labels ride neither), so the md5 multiset checksum
    is the only aggregate standing between the hash and silently
    corrupted payload bytes."""
    _, sink = _ingest_artifact(spark, sf_dir)
    vec, buck, ivf, pqc, ipqc = (
        sink.vectors(),
        sink.buckets(),
        sink.ivf_assignment(),
        sink.codes(),
        sink.ivfpq_codes(),
    )
    baseline = _by_key(_vstream_agg(vec, buck, ivf, pqc, ipqc).collect(), "part")
    tampered_vec = vec.withColumn("label", F.concat(F.col("label"), F.lit("~")))
    got = _by_key(
        _vstream_agg(tampered_vec, buck, ivf, pqc, ipqc).collect(), "part"
    )
    assert got["vec"]["n"] == baseline["vec"]["n"]
    assert got["vec"]["key_sum"] == baseline["vec"]["key_sum"]
    assert got["vec"]["checksum"] != baseline["vec"]["checksum"]
    for p in baseline:
        if p != "vec":
            assert got[p] == baseline[p]
