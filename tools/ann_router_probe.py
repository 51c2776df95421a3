"""Router-evidence probe (r17, r16 verdict item 1): measure IVF
recall@5 on the HARD deep-rung corpus (tools/ann_hard_probe.py
fixtures) — the corpus regime the router hands to IVF — alongside the
LSH number at the same rung, so the routing boundary's two sides are
measured on identical ground truth.

Run ALONE (one Spark workload at a time):
    python tools/ann_router_probe.py [n_total] [plant_cos]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ann_hard_probe import build_hard_corpus  # noqa: E402


def main() -> int:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 17000
    plant_cos = float(sys.argv[2]) if len(sys.argv) > 2 else 0.55
    from monday_etl_automation_spark.plans import embed_ops as eo
    from monday_etl_automation_spark.session import get_spark

    d = tempfile.mkdtemp(prefix="ann_router_")
    try:
        for f in os.listdir("/root/testdata/sf0.001"):
            if f != "embeddings.parquet":
                shutil.copy(os.path.join("/root/testdata/sf0.001", f), os.path.join(d, f))
        build_hard_corpus(d, n_total, plant_cos=plant_cos)
        m = eo._ann_modulus(n_total)
        b = m.bit_length() - 1
        nc, npr = eo._ivf_params(n_total)
        print(f"n={n_total} -> LSH rung b={b}; IVF ncent={nc} nprobe={npr}")

        spark = get_spark("ann_router_probe")

        def sets(df):
            out: dict[int, set[int]] = {}
            for r in df.collect():
                out.setdefault(r.query_id, set()).add(r.neighbor_id)
            return out

        exact = sets(eo.cosine_topk(spark, d))
        total = sum(len(nb) for nb in exact.values())
        planted = sum(1 for nb in exact.values() for v in nb if v >= 50000)
        print(f"exact top-5 planted share: {planted / max(1, total):.3f}")

        for name, fn in (("lsh", eo.ann_lsh_topk), ("ivf", eo.ivf_topk)):
            t0 = time.time()
            got = sets(fn(spark, d))
            hits = sum(len(got.get(q, set()) & nb) for q, nb in exact.items())
            print(f"{name}: recall@5 {hits / total:.3f} ({hits}/{total})"
                  f" wall {time.time() - t0:.1f}s")

        # the router itself, boundary overridden to this corpus's rung
        auto = sets(eo.ann_topk_auto(spark, d, route_b=b))
        ivf = sets(eo.ivf_topk(spark, d))
        print(f"router(route_b={b}) == ivf rows: {auto == ivf}")
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
