"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same config
block is what we would ship on a 1000-executor cluster (AQE on, skew
join on, Arrow on, UTC). Only the shuffle-partition count is
environment-derived — on a real cluster it would be set to
2-3x total executor cores, and AQE coalesces down from there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    except ValueError:
        return 32


def get_spark(app_name: str = "monday_etl_automation_spark") -> SparkSession:
    """Create (or reuse) the engine's SparkSession.

    UTC session timezone is required for DuckDB-oracle comparison
    (DuckDB timestamps are UTC-naive). AQE is on so that at scale the
    runtime re-plans: broadcast conversion, skew-join splitting,
    shuffle-partition coalescing.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # 50 registered queries × several codegen stages each overflow
        # the default 100-entry generated-class cache, forcing Janino
        # recompilation of expensive expression trees (decimal sums) on
        # every re-run; the cache holds class references, so a larger
        # bound costs little memory
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
