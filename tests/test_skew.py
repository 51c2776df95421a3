"""Skew-mitigation operators: salted results must equal their unsalted
twins exactly (salt is internal plumbing), and the salted plans must
actually spread hot keys across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.operators.skew import (
    hot_keys,
    salted_aggregate,
    salted_distinct_count,
    salted_join,
)
from monday_etl_automation_spark.sources.tables import load_table


def _skewed_events(spark, sf_dir):
    """events with a synthetically hot key: ~80% of rows collapse onto
    user_id 1 (zipf-head stand-in), the rest keep their key."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 != 0, F.lit(1)).otherwise(F.col("user_id")),
    )


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = _skewed_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    # force the comparison through the shuffle path (no broadcast)
    plain = sorted(
        map(tuple, ev.hint("shuffle_hash").join(dim, ["user_id"]).select("event_id", "user_tag").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(ev, dim, ["user_id"], n_salts=8, salt_on="event_id")
            .select("event_id", "user_tag")
            .collect(),
        )
    )
    assert len(salted) > 0
    assert salted == plain


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    ev = _skewed_events(spark, sf_dir)
    dim = spark.createDataFrame([(1, "hot")], "user_id BIGINT, user_tag STRING")
    plain = sorted(
        map(tuple, ev.join(dim, ["user_id"], "left").select("event_id", "user_tag").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(ev, dim, ["user_id"], n_salts=4, how="left", salt_on="event_id")
            .select("event_id", "user_tag")
            .collect(),
        )
    )
    assert salted == plain
    assert any(t is None for _, t in salted)  # unmatched users survive


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The salted shuffle key (keys + _salt) must split the hot key's
    rows across multiple distinct salt values — the property that
    bounds any reducer's share at 1/n_salts."""
    ev = _skewed_events(spark, sf_dir)
    from monday_etl_automation_spark.operators.skew import _salt_col

    n = (
        ev.where("user_id = 1")
        .withColumn("_salt", _salt_col(ev, 8, "event_id"))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n == 8


def test_hot_keys_probe(spark, sf_dir):
    ev = _skewed_events(spark, sf_dir)
    hot = {r.user_id for r in hot_keys(ev, ["user_id"], min_share=0.5).collect()}
    assert hot == {1}


def test_salted_aggregate_equals_plain(spark, sf_dir):
    ev = _skewed_events(spark, sf_dir)
    plain = sorted(
        map(
            tuple,
            ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.floor(F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint")).alias(
                    "sum_micros"
                ),
                F.max("event_id").alias("max_event"),
            )
            .collect(),
        )
    )
    salted = sorted(
        map(
            tuple,
            salted_aggregate(
                ev.withColumn(
                    "micros",
                    F.floor(F.col("value").cast("decimal(18,6)") * 1000000).cast("bigint"),
                ),
                ["user_id"],
                {
                    "n": ("count", F.lit(1)),
                    "sum_micros": ("sum", F.col("micros")),
                    "max_event": ("max", F.col("event_id")),
                },
                n_salts=8,
                salt_on="event_id",
            ).collect(),
        )
    )
    assert salted == plain
    assert len(salted) > 0


def test_salted_distinct_count_equals_plain(spark, sf_dir):
    ev = _skewed_events(spark, sf_dir)
    plain = sorted(
        map(
            tuple,
            ev.groupBy("user_id").agg(F.countDistinct("event_type").alias("n_distinct")).collect(),
        )
    )
    got = sorted(map(tuple, salted_distinct_count(ev, ["user_id"], "event_type").collect()))
    assert got == plain


def test_salted_join_hot_only_equals_plain_join(spark, sf_dir):
    """Two-path variant: hot keys salted, cold keys joined plainly —
    the union must equal the unsalted join row-for-row, for inner AND
    left (left exercises unmatched cold rows surviving the anti/semi
    split)."""
    from monday_etl_automation_spark.operators.skew import salted_join_hot_only

    ev = _skewed_events(spark, sf_dir)
    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        # drop some keys so a LEFT join has unmatched rows on both paths
        .where(F.col("user_id") % 7 != 3)
        .withColumn("user_tag", F.concat(F.lit("u"), F.col("user_id")))
    )
    hot = hot_keys(ev, ["user_id"], min_share=0.1)
    assert hot.count() == 1  # the synthetic zipf head, and only it
    for how in ("inner", "left"):
        plain = sorted(
            map(
                tuple,
                ev.hint("shuffle_hash")
                .join(dim, ["user_id"], how)
                .select("event_id", "user_tag")
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                salted_join_hot_only(
                    ev, dim, ["user_id"], hot, n_salts=8, how=how, salt_on="event_id"
                )
                .select("event_id", "user_tag")
                .collect(),
            )
        )
        assert len(got) > 0
        assert got == plain, f"hot-only salted {how} join diverged from plain"
