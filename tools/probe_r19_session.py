"""r19 item 4: stream_session_replay probe — per-component wall times
(window vs timer replay), state-store width 4 vs 2, and timer
micro-batch count 3 vs 2, interleaved in one session. Run under both
SPARK_GRAFT_CPUS=32 and =8 (the c8 config is where Python workers are
scarcer). Run ALONE."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.streaming import pipeline as sp  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> int:
    spark = get_spark("probe_r19_session")
    sc = spark.sparkContext
    cpus = sc.defaultParallelism

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def width(w, fn):
        saved = sp._REPLAY_SHUFFLE_PARTITIONS
        sp._REPLAY_SHUFFLE_PARTITIONS = w
        try:
            fn()
        finally:
            sp._REPLAY_SHUFFLE_PARTITIONS = saved

    variants = {
        "window_w4": lambda: width(4, lambda: noop(sp.run_session_replay(spark, SF))),
        "window_w2": lambda: width(2, lambda: noop(sp.run_session_replay(spark, SF))),
        "timer3_w4": lambda: width(
            4, lambda: noop(sp.run_timer_sessions_replay(spark, SF, 300, 3, 7))
        ),
        "timer2_w4": lambda: width(
            4, lambda: noop(sp.run_timer_sessions_replay(spark, SF, 300, 2, 7))
        ),
        "timer3_w2": lambda: width(
            2, lambda: noop(sp.run_timer_sessions_replay(spark, SF, 300, 3, 7))
        ),
    }
    for n, f in variants.items():
        f()  # warm
    samples = {n: [] for n in variants}
    for p in range(3):
        for n, f in variants.items():
            sc.setJobDescription(f"pass{p} {n}")
            t0 = time.time()
            f()
            samples[n].append(time.time() - t0)
    print(f"cpus={cpus}")
    for n, s in samples.items():
        print(f"{n:12s} min={min(s):.3f} all={[round(x,3) for x in s]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
