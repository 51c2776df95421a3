"""r19 item 8: per-shape exec profile of the 16-shape tpch_extra entry
(the OPTIMIZATION_r18 method) — interleaved min-of-3 with the noop
sink. Run ALONE."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.plans import relational_extra as rx  # noqa: E402
from monday_etl_automation_spark.plans.relational_extra import tpch_extra  # noqa: E402

SF = "/root/testdata/sf0.1"

SHAPES = [
    "q2_min_cost_supplier", "q7_nation_volume", "q8_market_share", "q9_profit",
    "q11_important_values", "q12_priority_classes", "q13_order_histogram",
    "q14_promo_ratio", "q15_top_supplier", "q16_supplier_counts",
    "q17_small_qty_revenue", "q18_large_orders", "q19_bracket_revenue",
    "q20_excess_suppliers", "q21_waiting_suppliers", "q22_idle_balances",
]


def main() -> int:
    spark = get_spark("probe_r19_tpch")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    fns = {n: getattr(rx, n) for n in SHAPES}
    fns["FULL_tpch_extra"] = tpch_extra
    for n, fn in fns.items():
        noop(fn(spark, SF))  # warm
    samples = {n: [] for n in fns}
    for p in range(3):
        for n, fn in fns.items():
            sc.setJobDescription(f"pass{p} {n}")
            t0 = time.time()
            noop(fn(spark, SF))
            samples[n].append(time.time() - t0)
    for n, s in sorted(samples.items(), key=lambda kv: -min(kv[1])):
        print(f"{n:24s} min={min(s):.3f} all={[round(x,3) for x in s]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
