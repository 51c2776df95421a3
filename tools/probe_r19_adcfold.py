"""r19 item 3: interleaved A/B — exploded ADC tails (r18 shape,
reconstructed via the shared SQL helpers) vs the folded array tails
now used by pq_topk / ivfpq_topk. Also checks row equality. Run ALONE.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from monday_etl_automation_spark.session import get_spark  # noqa: E402
from monday_etl_automation_spark.plans import ivfpq_ops, pq_ops  # noqa: E402
from monday_etl_automation_spark.sources.tables import register_views  # noqa: E402

SF = "/root/testdata/sf0.1"


def old_pq(spark):
    register_views(spark, SF)
    codes, cent = pq_ops._train_pq(spark, SF)
    codes.createOrReplaceTempView("_pq_codes")
    cent.createOrReplaceTempView("_pq_cent")
    lut, vn = pq_ops._pq_search_meta(spark, SF)
    lut.createOrReplaceTempView("_pq_lut")
    vn.createOrReplaceTempView("_pq_vn")
    return spark.sql(
        "WITH "
        + pq_ops._pq_search_sql(
            "spark",
            f"({pq_ops._pq_ex_sql('spark')})",
            "_pq_codes",
            "_pq_cent",
            lut_rel="_pq_lut",
            vn_rel="_pq_vn",
        )
    )


def old_ivfpq(spark):
    register_views(spark, SF)
    ranked, rcb, vparts = ivfpq_ops._train_ivfpq(spark, SF)
    ranked.createOrReplaceTempView("_ipq_ranked")
    rcb.createOrReplaceTempView("_ipq_rcb")
    vparts.createOrReplaceTempView("_ipq_vparts")
    _, cent, _, nprobe = ivfpq_ops._train_ivf(spark, SF)
    cent.createOrReplaceTempView("_ipq_cent")
    meta = ivfpq_ops._ivfpq_search_meta(spark, SF)
    pre = {}
    for name, df in meta.items():
        view = f"_ipq_pre_{name}"
        df.createOrReplaceTempView(view)
        pre[name] = view
    return spark.sql(
        "WITH "
        + ivfpq_ops._ivfpq_tail_sql(
            "spark", "_ipq_ranked", "_ipq_cent", "_ipq_rcb", "_ipq_vparts", "e6x",
            nprobe=nprobe, pre=pre,
        )
    )


def main() -> int:
    spark = get_spark("probe_r19_adcfold")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "pq_old": lambda: noop(old_pq(spark)),
        "pq_new": lambda: noop(pq_ops.pq_topk(spark, SF)),
        "ipq_old": lambda: noop(old_ivfpq(spark)),
        "ipq_new": lambda: noop(ivfpq_ops.ivfpq_topk(spark, SF)),
    }
    # row equality old vs new (sorted value compare)
    a = sorted(map(tuple, old_pq(spark).collect()))
    b = sorted(map(tuple, pq_ops.pq_topk(spark, SF).collect()))
    print("pq rows equal:", a == b, len(a))
    a = sorted(map(tuple, old_ivfpq(spark).collect()))
    b = sorted(map(tuple, ivfpq_ops.ivfpq_topk(spark, SF).collect()))
    print("ivfpq rows equal:", a == b, len(a))

    for name, fn in variants.items():
        fn()  # warm
    samples = {n: [] for n in variants}
    for p in range(5):
        for name, fn in variants.items():
            sc.setJobDescription(f"pass{p} {name}")
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)
    for name, s in samples.items():
        print(f"{name:10s} min={min(s):.3f} all={[round(x,3) for x in s]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
