"""Mixture sampling: DuckDB-twin parity, target-share accuracy, and
hash-gate determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.sampling_ops import (
    mixture_rates,
    mixture_rates_oracle,
    mixture_sample,
    mixture_sample_oracle,
)
from oracle_compare import assert_matches_oracle

# uneven mix over the synthetic 20-source corpus: upweight src0,
# exclude everything past src3 (exclusion IS a mixing decision)
_WEIGHTS = {"src0": 6.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
_BUDGET = 4_000


def test_mixture_rates_match_oracle(spark, sf_dir):
    assert_matches_oracle(
        mixture_rates(spark, sf_dir, _WEIGHTS, _BUDGET),
        mixture_rates_oracle(_WEIGHTS, _BUDGET),
        sf_dir,
    )


def test_mixture_sample_matches_oracle(spark, sf_dir):
    assert_matches_oracle(
        mixture_sample(spark, sf_dir, _WEIGHTS, _BUDGET),
        mixture_sample_oracle(_WEIGHTS, _BUDGET),
        sf_dir,
    )


def test_mixture_sample_is_deterministic(spark, sf_dir):
    a = sorted(r.doc_id for r in mixture_sample(spark, sf_dir, _WEIGHTS, _BUDGET).collect())
    b = sorted(r.doc_id for r in mixture_sample(spark, sf_dir, _WEIGHTS, _BUDGET).collect())
    assert a == b and len(a) > 0


def test_mixture_sample_hits_targets(spark, sf_dir):
    """Realized per-source tokens: exact when the source keeps
    everything (rate 1 — undersupplied vs target), within a tolerance
    band when thinned (hash gate is per-doc Bernoulli at test scale)."""
    rates = {r.source: r for r in mixture_rates(spark, sf_dir, _WEIGHTS, _BUDGET).collect()}
    got = {
        r.source: r.tok
        for r in mixture_sample(spark, sf_dir, _WEIGHTS, _BUDGET)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    assert set(got) <= set(_WEIGHTS)  # unlisted sources fully excluded
    for src, r in rates.items():
        if r.keep_rate >= 1.0:
            assert got[src] == r.n_tokens  # kept in full
        else:
            lo, hi = 0.55 * r.target_tokens, 1.45 * r.target_tokens
            assert lo <= got.get(src, 0) <= hi, (
                f"{src}: {got.get(src, 0)} vs target {r.target_tokens}"
            )


def test_absent_source_excluded_from_normalizer(spark, sf_dir):
    """A weighted source missing from the corpus (or with zero tokens)
    must NOT inflate the normalizer z — that would silently thin every
    present source below its intended share and underfill the budget.
    It surfaces as an explicit (n_tokens=0, keep_rate=0) row instead."""
    ghost = dict(_WEIGHTS, ghost_source=100.0)
    with_ghost = {r.source: r for r in mixture_rates(spark, sf_dir, ghost, _BUDGET).collect()}
    without = {r.source: r for r in mixture_rates(spark, sf_dir, _WEIGHTS, _BUDGET).collect()}
    g = with_ghost.pop("ghost_source")
    assert (g.n_tokens, g.target_tokens, g.keep_rate) == (0, 0, 0.0)
    for src, r in without.items():
        w = with_ghost[src]
        assert (w.target_tokens, w.keep_rate) == (r.target_tokens, r.keep_rate), src
    # and the twin agrees exactly
    assert_matches_oracle(
        mixture_rates(spark, sf_dir, ghost, _BUDGET),
        mixture_rates_oracle(ghost, _BUDGET),
        sf_dir,
    )


def test_corpus_splits_match_oracle(spark, sf_dir):
    from monday_etl_automation_spark.plans.sampling_ops import (
        corpus_splits,
        corpus_splits_oracle,
    )

    assert_matches_oracle(corpus_splits(spark, sf_dir), corpus_splits_oracle(), sf_dir)


def test_corpus_splits_properties(spark, sf_dir):
    """Disjoint+exhaustive, near-target fractions, and — the property
    that justifies hash assignment over rand() — growth stability: a
    doc's split must not change when OTHER docs enter or leave the
    corpus (otherwise re-splitting after ingest leaks eval docs into
    train)."""
    from pyspark.sql import functions as F

    from monday_etl_automation_spark.plans.sampling_ops import corpus_splits

    out = corpus_splits(spark, sf_dir)
    rows = {r.doc_id: r for r in out.collect()}
    n = len(rows)
    assert n > 0
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in rows.values():
        counts[r.split] += 1
    assert counts["train"] / n > 0.8 and counts["val"] > 0 and counts["test"] > 0
    # shuffle_key is an independent permutation driver: all distinct
    # (md5 collisions at corpus scale are 2^-60 events)
    assert len({r.shuffle_key for r in rows.values()}) == n
    # growth stability: splits computed on a half-corpus agree exactly
    half = (
        corpus_splits(spark, sf_dir)
        .where(F.col("doc_id") % 2 == 0)
        .collect()
    )
    # simulate "smaller corpus" by recomputing over a filtered view:
    # hash assignment depends only on doc_id, so filtering the INPUT
    # must give the same assignments as filtering the OUTPUT
    docs = spark.table("documents").where(F.col("doc_id") % 2 == 0)
    docs.createOrReplaceTempView("documents")
    try:
        # run the raw SQL against the overridden view (corpus_splits
        # itself would re-register the full table via register_views)
        from monday_etl_automation_spark.plans.sampling_ops import _split_sql

        sub = spark.sql(_split_sql("spark", {"train": 0.90, "val": 0.05, "test": 0.05}))
        got = {(r.doc_id, r.split) for r in sub.collect()}
        want = {(r.doc_id, r.split) for r in half}
        assert got == want, "split assignment changed when the corpus shrank"
    finally:
        spark._mea_views_sf_dir = None  # force re-registration of real views
        from monday_etl_automation_spark.sources.tables import register_views

        register_views(spark, sf_dir)


def test_temperature_rates_match_oracle(spark, sf_dir):
    from monday_etl_automation_spark.plans.sampling_ops import (
        temperature_rates,
        temperature_rates_oracle,
    )

    for k in (0, 1, 2):  # alpha = 1, 0.5, 0.25 — the sqrt-chain range
        assert_matches_oracle(
            temperature_rates(spark, sf_dir, k, 10_000),
            temperature_rates_oracle(k, 10_000),
            sf_dir,
        )


def test_temperature_alpha_one_is_natural_sharing(spark, sf_dir):
    """alpha=1: w_s = n_s, so rate = min(1, T/sum(n)) — identical for
    every source (natural sampling just scales the whole corpus)."""
    from monday_etl_automation_spark.plans.sampling_ops import temperature_rates

    rows = temperature_rates(spark, sf_dir, 0, 10_000).collect()
    assert len(rows) >= 2
    total = sum(r.n_tokens for r in rows)
    want = min(1.0, 10_000 / total)
    # (n/z*T)/n vs T/z differ by last-ulp per source — tolerance, not
    # set-equality (cross-ENGINE parity is exact; cross-SOURCE is not)
    for r in rows:
        assert abs(r.keep_rate - want) < 1e-12


def test_temperature_flattens_toward_uniform(spark, sf_dir):
    """Lower alpha damps the head: the spread of per-source token
    TARGETS (max/min) must shrink monotonically as alpha drops, and
    targets still sum to ~T."""
    from monday_etl_automation_spark.plans.sampling_ops import temperature_rates

    spreads = []
    for k in (0, 1, 2):
        rows = temperature_rates(spark, sf_dir, k, 10_000).collect()
        tgts = [r.target_tokens for r in rows]
        assert abs(sum(tgts) - 10_000) <= len(tgts)  # rounding only
        spreads.append(max(tgts) / max(1, min(tgts)))
    assert spreads[0] >= spreads[1] >= spreads[2]
    assert spreads[2] < spreads[0] or spreads[0] == 1.0


def test_quality_floor_matches_oracle_and_counts(spark, sf_dir):
    from monday_etl_automation_spark.plans.sampling_ops import (
        quality_floor_sample,
        quality_floor_sample_oracle,
    )

    for frac in (0.25, 0.5, 1.0):
        assert_matches_oracle(
            quality_floor_sample(spark, sf_dir, frac),
            quality_floor_sample_oracle(frac),
            sf_dir,
        )
    kept = quality_floor_sample(spark, sf_dir, 0.5).collect()
    per_src: dict[str, int] = {}
    for r in kept:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    totals = {
        r.source: r["count"]
        for r in spark.table("documents").groupBy("source").count().collect()
    }
    # every source survives with ceil(n/2) docs ((rn-1)*1e6 < 5e5*n) —
    # ceil, so even a 1-doc source keeps its doc instead of vanishing
    assert set(per_src) == set(totals)
    for s, n in totals.items():
        assert per_src[s] == (n + 1) // 2
    # the kept set is the TOP of each source: min kept score per source
    # >= max dropped score is not guaranteed under ties, but ranks are
    # contiguous from 1
    ranks: dict[str, list[int]] = {}
    for r in kept:
        ranks.setdefault(r.source, []).append(r.quality_rank)
    for s, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1))


def test_mixture_rates_randomized_weight_parity(spark, sf_dir):
    """Seeded random weight configs through the full twin — catches
    parity edge cases (tiny weights, >1 rates clamped, many sources)
    that the hand-picked configs miss."""
    import random

    from monday_etl_automation_spark.plans.sampling_ops import (
        mixture_rates,
        mixture_rates_oracle,
    )

    rng = random.Random(8)
    sources = [f"src{i}" for i in range(20)] + ["ghost_a", "ghost_b"]
    for _ in range(3):
        weights = {
            s: round(rng.uniform(0.01, 5.0), 3)
            for s in rng.sample(sources, rng.randint(3, 12))
        }
        total = rng.choice([100, 5_000, 1_000_000])
        assert_matches_oracle(
            mixture_rates(spark, sf_dir, weights, total),
            mixture_rates_oracle(weights, total),
            sf_dir,
        )
