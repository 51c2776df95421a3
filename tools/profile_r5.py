"""Round-5 profiling: break the two slow streaming entries into parts."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.sources.tables import load_table  # noqa: E402
from monday_etl_automation_spark.streaming import pipeline as streaming  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label:40s} {best:7.2f}s")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


spark = get_spark("profile")
events = load_table(spark, SF, "events")

# warmup
noop(events)

from monday_etl_automation_spark.functions.grouped import sum_value_micros  # noqa: E402
from monday_etl_automation_spark.operators.grouped_map import user_gap_stats  # noqa: E402

t("stateful: run_stateful_replay", lambda: noop(streaming.run_stateful_replay(spark, SF)))
t("stateful: user_gap_stats", lambda: noop(user_gap_stats(events)))
t(
    "stateful: udaf",
    lambda: noop(
        events.groupBy("user_id").agg(sum_value_micros(F.col("value")).alias("u"))
    ),
)

t("dlq: run_dead_letter", lambda: (lambda d, q: (noop(d), noop(q)))(*streaming.run_dead_letter(spark, SF)))
t("dlq: run_status_upsert", lambda: noop(streaming.run_status_upsert(spark, SF)))

from monday_etl_automation_spark.plans import registry  # noqa: E402

qs = registry.queries()
t("full stateful_user_totals", lambda: noop(qs["stateful_user_totals"](spark, SF)))
t("full dead_letter_counts", lambda: noop(qs["dead_letter_counts"](spark, SF)))
t("full f_naming_pipeline", lambda: noop(qs["f_naming_pipeline"](spark, SF)))
t("full near_dup_components", lambda: noop(qs["near_dup_components"](spark, SF)))
