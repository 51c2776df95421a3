"""Clone-regime COST probe (r17 verdict item 5).

SCALE.md's ladder arithmetic claims IVF's probed share drops below
LSH's candidate share past ~200k vectors on clone-regime corpora —
the one regime where both backends measured 1.000 recall at every
rung, so routing there is purely a COST decision. This tool measures
the actual candidate-set sizes (the exact-re-rank input, the unit of
per-query work both backends pay) and the end-to-end search walls on
synthetic clone corpora at the sizes the claim names.

Clone regime: the corpus is clusters of near-duplicates (cosine
~0.995 within a cluster) — dedup-shaped data, where a query's true
neighbors are its cluster siblings and k-means cells align with
neighbor structure.

Decision rule (the verdict's): if IVF's candidate set is >= 2x
smaller at these sizes, wire a cost-aware route for the regime;
otherwise document and close permanently.

Run ALONE (one Spark workload at a time):
    python tools/ann_clone_cost_probe.py [n1,n2,...]   (default 200000,1000000)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIM = 64
_CLUSTER = 10  # near-dup component size (make_sf1's 10-copy posture)


def build_clone_corpus(dst: str, n_total: int, seed: int = 20260817) -> None:
    """embeddings.parquet: n_total/_CLUSTER isotropic cluster centers,
    each with _CLUSTER members at ~0.995 cosine to the center. vec_ids
    are sequential, so the fixed query-id set (embed_ops._QUERY_IDS,
    0..1950 step 50) lands inside the first 200 clusters — every query
    is a clone with 9 true siblings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    n_clusters = n_total // _CLUSTER
    centers = rng.standard_normal((n_clusters, _DIM)).astype(np.float64)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    members = np.repeat(centers, _CLUSTER, axis=0)
    noise = rng.standard_normal(members.shape) * 0.05  # cos(member,center)~0.997
    members += noise
    members /= np.linalg.norm(members, axis=1, keepdims=True)
    ids = np.arange(members.shape[0], dtype=np.int64)
    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in v] for v in members.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array((ids % 10).astype(np.int64), pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dst, "embeddings.parquet"))


def main() -> int:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [200_000, 1_000_000]
    )
    from monday_etl_automation_spark.plans import embed_ops as eo
    from monday_etl_automation_spark.session import get_spark
    from monday_etl_automation_spark.sources.tables import clear_artifact_caches

    spark = get_spark("ann_clone_cost_probe")
    nq = len(eo._QUERY_IDS)  # noqa: SLF001

    for n_total in sizes:
        d = tempfile.mkdtemp(prefix="ann_clone_")
        try:
            for f in os.listdir("/root/testdata/sf0.001"):
                if f != "embeddings.parquet":
                    shutil.copy(
                        os.path.join("/root/testdata/sf0.001", f), os.path.join(d, f)
                    )
            build_clone_corpus(d, n_total)
            m = eo._ann_modulus(n_total)  # noqa: SLF001
            b = m.bit_length() - 1
            nc, npr = eo._ivf_params(n_total)  # noqa: SLF001
            print(
                f"\n=== n={n_total}: LSH rung b={b} (modulus {m});"
                f" IVF ncent={nc} nprobe={npr} (probed share {npr / nc:.3f}) ==="
            )
            clear_artifact_caches(spark)

            # --- LSH: candidate pairs entering the exact re-rank ----
            idx, mm = eo._ann_bucket_index(spark, d)  # noqa: SLF001
            idx.createOrReplaceTempView("_ann_buckets")
            sql = eo._ann_lsh_sql("spark", modulus=mm)  # noqa: SLF001
            head = sql.rsplit("SELECT query_id, neighbor_id, cosine, rk", 1)[0]
            lsh_cand = spark.sql(
                head + "SELECT CAST(count(*) AS BIGINT) AS c FROM cand"
            ).collect()[0][0]
            t0 = time.time()
            eo.ann_lsh_topk(spark, d).write.format("noop").mode("overwrite").save()
            lsh_wall = time.time() - t0

            # --- IVF: vectors in the probed cells --------------------
            ranked, _, _, nprobe = eo._train_ivf(spark, d)  # noqa: SLF001
            ranked.createOrReplaceTempView("_ivf_ranked_probe")
            ivf_cand = spark.sql(
                f"""
WITH asgf AS (SELECT vec_id, cid FROM _ivf_ranked_probe WHERE rc = 1),
qpick AS (
  SELECT vec_id, cid FROM _ivf_ranked_probe
  WHERE {eo._query_pred()} AND rc <= {nprobe}
)
SELECT CAST(count(*) AS BIGINT) AS c
FROM qpick q JOIN asgf v ON q.cid = v.cid AND q.vec_id <> v.vec_id
""".strip()  # noqa: SLF001
            ).collect()[0][0]
            t0 = time.time()
            eo.ivf_topk(spark, d).write.format("noop").mode("overwrite").save()
            ivf_wall = time.time() - t0

            # --- recall sanity: both backends on clone ground truth --
            def sets(df):
                out: dict[int, set[int]] = {}
                for r in df.collect():
                    out.setdefault(r.query_id, set()).add(r.neighbor_id)
                return out

            exact = sets(eo.cosine_topk(spark, d))
            total = sum(len(v) for v in exact.values())
            rec = {}
            for name, fn in (("lsh", eo.ann_lsh_topk), ("ivf", eo.ivf_topk)):
                got = sets(fn(spark, d))
                rec[name] = (
                    sum(len(got.get(q, set()) & v) for q, v in exact.items()) / total
                )

            ratio = lsh_cand / max(1, ivf_cand)
            print(
                f"LSH:  cand {lsh_cand:>12,} ({lsh_cand / nq:,.0f}/query)"
                f"  wall {lsh_wall:6.1f}s  recall@5 {rec['lsh']:.3f}"
            )
            print(
                f"IVF:  cand {ivf_cand:>12,} ({ivf_cand / nq:,.0f}/query)"
                f"  wall {ivf_wall:6.1f}s  recall@5 {rec['ivf']:.3f}"
            )
            print(f"LSH/IVF candidate ratio: {ratio:.2f}x")
        finally:
            shutil.rmtree(d, ignore_errors=True)
            clear_artifact_caches(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
