"""Sketch contracts: error bounds vs exact answers, and the merge law
(union of partial sketches == whole-table sketch) that makes sketches
correct under partial/final aggregation and task retry."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.sketch_ops import (
    approx_quantiles_per_group,
    frequent_items,
    hll_distinct_per_group,
    hll_sketch_per_group,
    hll_union_estimate,
    sketch_summary,
)
from monday_etl_automation_spark.sources.tables import load_table


def test_hll_estimate_within_bound(spark, sf_dir):
    """lg_k=12 has ~1.6% RSE; assert within 5% (≈3 sigma) per group."""
    rows = sketch_summary(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.rel_err < 0.05, f"{r.event_type}: est {r.n_distinct_est} vs {r.n_distinct}"


def test_hll_merge_law(spark, sf_dir):
    """Merge of per-shard sketches stays within the published error
    bound of the exact answer: store daily/shard sketches, roll up
    later without rescanning — the property that guarantees partial
    aggregation can't change the answer's ACCURACY.

    NOT pinned as merged == direct: the direct aggregation serves the
    HIP estimator, which a union legitimately drops for the composite
    estimator — the two agree only while both sides sit in exact
    sparse mode (they do at this SF, asserted below as documentation;
    the r14 sf0.1 driver spot-check caught them diverging at 1,500
    distinct per group with accuracy intact, which is why the
    driver-hashed merge_ok flag in quantile_stats pins the bound, not
    equality)."""
    ev = load_table(spark, sf_dir, "events")
    sharded = ev.withColumn("shard", (F.col("event_id") % 16).cast("int"))
    per_shard = hll_sketch_per_group(sharded, ["event_type", "shard"], "user_id")
    merged = {
        r.event_type: r.n_distinct_est
        for r in hll_union_estimate(
            per_shard.withColumnRenamed("hll", "hll"), ["event_type"]
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(merged[k] - n) <= n * 0.05, (k, merged[k], n)
    # exact-sparse-mode equality at THIS cardinality only (see above)
    whole = {
        r.event_type: r.n_distinct_est
        for r in hll_distinct_per_group(ev, ["event_type"], "user_id").collect()
    }
    assert merged == whole


def test_approx_quantiles_rank_error(spark, sf_dir):
    """GK accuracy=10000 → rank error <= 0.01%; compare against the
    exact percentile on lineitem quantities per returnflag."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty", F.col("l_quantity").cast("double")
    )
    approx = {
        r.l_returnflag: r.quantiles
        for r in approx_quantiles_per_group(li, ["l_returnflag"], "qty", [0.5, 0.9]).collect()
    }
    exact = {
        r.l_returnflag: r.q
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(qty, array(0.5, 0.9))").alias("q"))
        .collect()
    }
    for k, (a50, a90) in approx.items():
        e50, e90 = exact[k]
        # quantities are integers 1..50: rank error 1e-4 can move the
        # answer at most one integer step at this scale
        assert abs(a50 - e50) <= 1.0
        assert abs(a90 - e90) <= 1.0


def test_frequent_items_finds_hot_key(spark, sf_dir):
    """A synthetically hot key must appear in the heavy-hitter list."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("event_id") % 3 != 0, F.lit(7)).otherwise(F.col("user_id")),
    )
    items = frequent_items(ev, "user_id", support=0.5).collect()[0][0]
    assert 7 in items


def test_count_min_sketch_builds(spark, sf_dir):
    from monday_etl_automation_spark.plans.sketch_ops import count_min_error_bound

    ev = load_table(spark, sf_dir, "events")
    cms = count_min_error_bound(ev, "event_type").collect()[0]["cms"]
    assert isinstance(cms, (bytes, bytearray)) and len(cms) > 0
