"""Driver-exposed packing → tokenized-shard → release sections
(plans/release_extra.py, r16): DuckDB-twin parity for each section,
conservation non-vacuity, and the segment-tree first-fit's exact
equivalence to the linear reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.release_extra import (
    PACK_ORACLE_BODY,
    _report_sql,
    _tokp_oracle_body,
    pack_summary,
    release_report,
    tokp_summary,
    train_doc_ids,
)
from oracle_compare import assert_matches_oracle


def test_release_report_matches_oracle(spark, sf_dir):
    assert_matches_oracle(release_report(spark, sf_dir), _report_sql("duckdb"), sf_dir)


def test_release_report_reconciles(spark, sf_dir):
    r = {row.stage: row.n for row in release_report(spark, sf_dir).collect()}
    assert r["released_total"] > 0
    # the stage counters must account for every kept doc
    assert (
        r["released_total"] + r["excluded_benchmark"] + r["dropped_contaminated"]
        == r["kept_after_prep"]
    )
    assert (
        r["released_train"] + r["released_val"] + r["released_test"]
        == r["released_total"]
    )
    # planted decontamination is non-vacuous (the repo-wide pattern)
    assert r["dropped_contaminated"] > 0


def test_pack_summary_matches_oracle(spark, sf_dir):
    assert_matches_oracle(pack_summary(spark, sf_dir), PACK_ORACLE_BODY, sf_dir)


def test_tokp_summary_matches_oracle(spark, sf_dir):
    assert_matches_oracle(tokp_summary(spark, sf_dir), _tokp_oracle_body(), sf_dir)


def test_pack_summary_flags_and_bounds(spark, sf_dir):
    rows = pack_summary(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.budget_ok == 1 and r.halffill_ok == 1
        assert r.lb_seqs >= 1 and r.n_chunks >= r.lb_seqs


def test_train_ids_are_cached_per_snapshot(spark, sf_dir):
    a = train_doc_ids(spark, sf_dir)
    b = train_doc_ids(spark, sf_dir)
    assert a is b  # the HANDLE is the artifact (CLAUDE.md)
    assert a.count() > 0


def test_tokp_shards_carry_only_train_docs(spark, sf_dir):
    """The shipped artifact references only released-train documents —
    checked against the packer input chain, not the writer's own
    bookkeeping."""
    from monday_etl_automation_spark.plans.release_extra import (
        _tokenized_shard_artifact,
    )

    out, _manifest, budget = _tokenized_shard_artifact(spark, sf_dir)
    back = spark.read.parquet(out)
    # every sequence's token counts respect the (corpus-adaptive) budget
    over = back.where(F.col("n_tokens") > budget).count()
    assert over == 0


def _linear_first_fit(toks, budget):
    remaining, out = [], []
    for tok in toks:
        for i, room in enumerate(remaining):
            if room >= tok:
                remaining[i] = room - tok
                out.append(i)
                break
        else:
            remaining.append(budget - tok)
            out.append(len(remaining) - 1)
    return out


def test_segment_tree_first_fit_equals_linear_reference():
    """The O(n log n) segment-tree first-fit (packing_ops.
    first_fit_assign — the DEPLOYED assignment loop, called here
    directly) must produce bit-identical assignments to the textbook
    linear scan — same leftmost-fit rule, same creation order — across
    random FFD-sorted instances including zero-size and budget-size
    chunks."""
    from monday_etl_automation_spark.plans.packing_ops import first_fit_assign

    rng = random.Random(20260816)
    for _ in range(200):
        budget = rng.choice([7, 16, 64, 128, 256])
        n = rng.randint(0, 300)
        toks = sorted((rng.randint(0, budget) for _ in range(n)), reverse=True)
        assert first_fit_assign(toks, budget) == _linear_first_fit(toks, budget)
    # unsorted inputs too: first-fit is defined for any order and the
    # tree must track residuals identically
    for _ in range(100):
        budget = rng.choice([9, 33, 100])
        toks = [rng.randint(0, budget) for _ in range(rng.randint(0, 120))]
        assert first_fit_assign(toks, budget) == _linear_first_fit(toks, budget)
