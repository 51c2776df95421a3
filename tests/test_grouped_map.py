"""applyInPandas grouped-map operator vs its SQL twin (§2.11)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from monday_etl_automation_spark.operators.grouped_map import user_gap_stats
from monday_etl_automation_spark.sources.tables import load_table


def test_user_gap_stats_matches_sql_twin(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    got = sorted(map(tuple, user_gap_stats(events).collect()))

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    want_df = (
        events.select("user_id", "ts")
        .withColumn("gap", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("gap").alias("n_gaps"),
            F.min("gap").alias("min_gap_us"),
            F.max("gap").alias("max_gap_us"),
            (F.sum("gap").cast("double") / F.count("gap")).alias("mean_gap_us"),
        )
    )
    want = sorted(map(tuple, want_df.collect()))
    assert got == want
    assert len(got) > 0
