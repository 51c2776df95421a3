"""r19 item 1: interleaved A/B of the two r18-regressed queries vs
their r17 formulations (identical up to the removed trailing output
sort), plus a component profile of dead_letter_counts.

Interleaved in ONE session per CLAUDE.md (join strategy re-plans per
execution; sequential A/Bs measure JVM warmth). Run ALONE.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.plans.dedup_ops import ngram_jaccard_pairs  # noqa: E402
from monday_etl_automation_spark.plans.windows_ops import dead_letter_counts  # noqa: E402
from monday_etl_automation_spark.streaming import pipeline as streaming  # noqa: E402

SF = "/root/testdata/sf0.1"


def t(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    spark = get_spark("probe_r19_regr")
    sc = spark.sparkContext

    variants = {
        "ngram_new": lambda: noop(ngram_jaccard_pairs(spark, SF)),
        "ngram_r17": lambda: noop(
            ngram_jaccard_pairs(spark, SF).orderBy("doc_id_a", "doc_id_b")
        ),
        "dlq_new": lambda: noop(dead_letter_counts(spark, SF)),
        "dlq_r17": lambda: noop(
            dead_letter_counts(spark, SF).orderBy("event_type", "disposition")
        ),
        # components of dead_letter_counts (run sequentially here, so
        # comp_dlq + comp_ups > the concurrent entry's wall is expected)
        "comp_dlq_replay": lambda: streaming.run_dead_letter(spark, SF),
        "comp_upsert2": lambda: noop(streaming.run_status_upsert(spark, SF, 2)),
    }

    # warmup each once (small SF for the registered entries)
    for name, fn in variants.items():
        sc.setJobDescription(f"warmup {name}")
        fn()

    samples: dict[str, list[float]] = {n: [] for n in variants}
    for p in range(4):
        for name, fn in variants.items():
            sc.setJobDescription(f"pass{p} {name}")
            samples[name].append(t(fn))
    for name, s in samples.items():
        print(
            f"{name:18s} min={min(s):.3f} med={sorted(s)[len(s)//2]:.3f} "
            f"max={max(s):.3f} all={[round(x,3) for x in s]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
