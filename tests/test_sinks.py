"""Deterministic partitioned sink tests (SURVEY §2.1 S9-S11).

The reference's Drive folder tree (lot/dossier/section, idempotent
find-or-create) maps to deterministic `partitionBy` output paths:
re-running the same write is idempotent (dynamic partition overwrite),
and the layout is derivable from the data alone — no list-create-relist
dance, no duplicate folders to resolve.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.plans.flagship import flagship


def test_partitioned_sink_layout_and_idempotence(spark, sf_dir, tmp_path):
    out = str(tmp_path / "depot")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    selected = flagship(spark, sf_dir)
    (
        selected.write.mode("overwrite")
        .partitionBy("column_id")
        .parquet(out)
    )
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == selected.count()
    # partition pruning works against the layout
    pruned_plan = (
        first.where(F.col("column_id") == "file_col_a")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(column_id" in pruned_plan

    # idempotent re-run: same deterministic paths, same rows, no dupes
    (
        flagship(spark, sf_dir).write.mode("overwrite")
        .partitionBy("column_id")
        .parquet(out)
    )
    assert spark.read.parquet(out).count() == n_first
