"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed with a count-collapsing action (collect on the
already-small results; the heavy work happens in the distributed plan).
A warmup pass on sf0.001 triggers JVM/codegen warmup so measured times
reflect steady-state execution, matching how a long-lived cluster runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "flagship_depot_selection",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "rollup_returnflag",
    "window_part_rank",
    "setops_customer_cohorts",
    "semi_anti_customers",
    "dedup_exact",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_near_pairs",
    "cosine_topk",
    "text_stats",
    "tumbling_window_counts",
    "b5_sign_pipeline",
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from monday_etl_automation_spark.plans import registry
    from monday_etl_automation_spark.session import get_spark

    spark = get_spark("bench")
    qs = registry.queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in sorted(qs) if n not in HEADLINE]

    # Warmup: run each query once at the smallest SF (JVM JIT + codegen).
    for name in names:
        try:
            qs[name](spark, "/root/testdata/sf0.001").limit(1).collect()
        except Exception:
            pass

    times: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            df.collect()
            dt = time.time() - t0
        except Exception as ex:  # noqa: BLE001
            print(f"# bench error {name}: {type(ex).__name__}: {str(ex)[:200]}", file=sys.stderr)
            dt = float("nan")
        times[name] = round(dt, 3)
        total += dt if dt == dt else 0.0

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
