"""r19: interleaved A/B of StatusUpsertSink.process_batch — r18 shape
(touched collected off the raw batch; latest un-materialized) vs r19
shape (aggregated batch checkpointed once, touched derived from it).
Run ALONE."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.streaming import pipeline as sp  # noqa: E402

SF = "/root/testdata/sf0.1"


class OldSink(sp.StatusUpsertSink):
    """The r18 process_batch, verbatim, for the A/B."""

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        latest = self._bucketed(self._latest_per_key(batch))
        if self._has_state:
            touched = [
                r["bucket"]
                for r in batch.select(
                    (F.col("item_id") % self.n_buckets).cast("int").alias("bucket")
                )
                .distinct()
                .collect()
            ]
            prev = self.spark.read.parquet(self.path).where(F.col("bucket").isin(touched))
            merged = self._bucketed(self._latest_per_key(prev.unionByName(latest)))
        else:
            merged = latest
        merged = merged.repartition(self.n_buckets, "bucket")
        if self._has_state:
            merged = merged.localCheckpoint(eager=True)
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(self.path)
        )
        self._has_state = True


def run_upsert(spark, sink_cls, n_splits=2):
    statuses = sp.derive_statuses(sp.load_table(spark, SF, "events"))
    src = tempfile.mkdtemp(prefix="status_src_")
    statuses.repartition(n_splits).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(statuses.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sink = sink_cls(spark)
    sink.run(stream)
    sink.current().write.format("noop").mode("overwrite").save()


def main() -> int:
    spark = get_spark("probe_r19_upsert")
    variants = {
        "upsert_new": lambda: run_upsert(spark, sp.StatusUpsertSink),
        "upsert_r18": lambda: run_upsert(spark, OldSink),
    }
    for name, fn in variants.items():
        fn()  # warm
    samples = {n: [] for n in variants}
    for p in range(4):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"pass{p} {name}")
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)
    for name, s in samples.items():
        print(f"{name:12s} min={min(s):.3f} all={[round(x,3) for x in s]}")
    # value-equality spot check old vs new final state
    import pandas as pd  # noqa: F401

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
