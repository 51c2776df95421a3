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

import pytest
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
    # Pick a file with two STRICTLY-interior keys at least 2 apart
    # (r17 ADVICE): interior so ±1 can't touch min/max, gap >= 2 so the
    # shifts can't merely SWAP the pair (hi == lo+1 would leave the
    # multiset — hence the checksum — unchanged), and derived from the
    # distinct-value set so boundary duplicates can't fake interiority.
    part = lo = hi = None
    for p, r in sorted(baseline.items()):
        if r["n"] < 4:
            continue
        e, f = p[1:].split(":f")
        keys = sorted(
            row.shuffle_key
            for row in back.where(
                (F.col("epoch") == int(e)) & (F.col("file_id") == int(f))
            )
            .select("shuffle_key")
            .distinct()
            .collect()
        )
        interior = [k for k in keys if keys[0] < k < keys[-1]]
        if len(interior) >= 2 and interior[-1] >= interior[0] + 2:
            part, lo, hi = p, interior[0], interior[-1]
            epoch, fid = e, f
            break
    assert part is not None, "no file with a qualifying interior key pair"
    rec = baseline[part]
    assert rec["min_key"] < lo and hi < rec["max_key"] and hi >= lo + 2
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


# --- relr/pack: release report + shard manifest (r17 verdict item 6) ------------
#
# The relr chain's persisted artifact is the MATERIALIZED corpus_prep
# disposition set (_prep_source); everything downstream (report
# counters, released-id set, pack checksums) derives from it. The
# tamper classes mirror eperm's: a row flip and a truncation are caught
# by the report counters alone; a COMPENSATING kept-swap (same split,
# same bench/contam status) provably survives every relr counter — the
# pack section's md5 multiset checksum over (doc_id, chunk_idx, tokens)
# is the line of defense that catches it, which is why the family
# ships both shapes under one hash.


def _prep_frame(spark, sf_dir):
    from monday_etl_automation_spark.plans.release_extra import _prep_source

    return spark.table(_prep_source(spark, sf_dir))


def _report_counts(spark, prep_view: str) -> dict[str, int]:
    from monday_etl_automation_spark.plans.release_extra import _report_sql

    return {r.stage: r.n for r in spark.sql(_report_sql("spark", prep_view)).collect()}


def _with_view(df, name: str) -> str:
    df.createOrReplaceTempView(name)
    return name


def test_relr_disposition_flip_fires_kept_counter(spark, sf_dir):
    prep = _prep_frame(spark, sf_dir)
    base_view = _with_view(prep, "_tamper_prep_base")
    baseline = _report_counts(spark, base_view)
    victim = prep.where(F.col("disposition") == "kept").select("doc_id").first().doc_id
    tampered = prep.withColumn(
        "disposition",
        F.when(F.col("doc_id") == victim, F.lit("dropped_tamper")).otherwise(
            F.col("disposition")
        ),
    )
    got = _report_counts(spark, _with_view(tampered, "_tamper_prep_flip"))
    assert got["total_docs"] == baseline["total_docs"]
    assert got["kept_after_prep"] == baseline["kept_after_prep"] - 1
    assert got != baseline


def test_relr_truncated_prep_fires_kept_counter(spark, sf_dir):
    prep = _prep_frame(spark, sf_dir)
    baseline = _report_counts(spark, _with_view(prep, "_tamper_prep_base"))
    victim = prep.where(F.col("disposition") == "kept").select("doc_id").first().doc_id
    got = _report_counts(
        spark, _with_view(prep.where(F.col("doc_id") != victim), "_tamper_prep_trunc")
    )
    # total_docs counts the documents table, not prep — unchanged by
    # design; the kept LEFT JOIN is what notices the missing row.
    assert got["total_docs"] == baseline["total_docs"]
    assert got["kept_after_prep"] == baseline["kept_after_prep"] - 1


def test_relr_compensating_swap_only_pack_checksum_fires(spark, sf_dir):
    """Swap kept-ness between two docs with identical (split, bench,
    contam) coordinates: every relr counter survives — and the pack
    shape's conservation checksum catches the changed released set."""
    from monday_etl_automation_spark.plans.decontam_ops import _BENCH_MOD
    from monday_etl_automation_spark.plans.release_extra import (
        _N_SHARDS,
        _PACK_BUDGET,
        _SHARD_EXPR,
        _released_ctes,
        _pack_agg,
        pack_summary,
    )
    from monday_etl_automation_spark.plans.packing_ops import pack_sequences

    prep = _prep_frame(spark, sf_dir)
    base_view = _with_view(prep, "_tamper_prep_base")
    baseline = _report_counts(spark, base_view)

    ctes = _released_ctes("spark", base_view)
    contam = {
        r.doc_id for r in spark.sql(f"WITH {ctes} SELECT doc_id FROM rcontam").collect()
    }
    train = {
        r.doc_id
        for r in spark.sql(
            f"WITH {ctes} SELECT doc_id FROM rsplits WHERE split = 'train'"
        ).collect()
    }
    disp = {r.doc_id: r.disposition for r in prep.select("doc_id", "disposition").collect()}
    clean_train = (  # same split, non-bench, non-contam: every relr counter blind
        lambda d: d in train and d % _BENCH_MOD != 0 and d not in contam
    )
    a = next(d for d, v in sorted(disp.items()) if v == "kept" and clean_train(d))
    b = next(
        (d for d, v in sorted(disp.items()) if v != "kept" and clean_train(d)), None
    )
    if b is None:
        pytest.skip("no non-kept clean train doc at this SF")

    tampered = prep.withColumn(
        "disposition",
        F.when(F.col("doc_id") == a, F.lit(disp[b]))
        .when(F.col("doc_id") == b, F.lit("kept"))
        .otherwise(F.col("disposition")),
    )
    tview = _with_view(tampered, "_tamper_prep_swap")
    got = _report_counts(spark, tview)
    assert got == baseline, "swap should survive EVERY relr counter"

    pack_base = _by_key(pack_summary(spark, sf_dir).collect(), "shard")
    tamp_ids = spark.sql(
        f"WITH {_released_ctes('spark', tview)}"
        " SELECT doc_id FROM rel WHERE split = 'train'"
    )
    pack_got = _by_key(
        _pack_agg(
            pack_sequences(
                spark, sf_dir, budget=_PACK_BUDGET, n_shards=_N_SHARDS, doc_ids=tamp_ids
            )
        ).collect(),
        "shard",
    )
    shards = {
        spark.sql(
            f"SELECT {_SHARD_EXPR['spark'].replace('doc_id', str(d))} AS s"
        ).first().s
        for d in (a, b)
    }
    assert any(
        pack_got.get(s, {}).get("checksum") != pack_base.get(s, {}).get("checksum")
        for s in shards
    ), "pack multiset checksum must catch the swapped released set"
    for s in set(pack_base) - shards:
        assert pack_got[s] == pack_base[s]


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
