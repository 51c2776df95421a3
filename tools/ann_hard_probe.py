"""Deep-rung HARD-case ANN recall probe (r15 verdict item 3).

SCALE.md's honest caveat: the sf1 replicated snapshot's true neighbors
are near-clones (cosine ~1), so deep-rung recall evidence there is
easy-case. This tool builds a corpus that is hard at a DEEP rung by
construction:

- N = 30,000 vectors (dim 64) -> the ANN ladder picks b = 8
  (125 * 2^7 = 16,000 < N <= 125 * 2^8 = 32,000), far off the b=4
  pytest floor;
- every fixed query id (0, 50, ..., 1950) gets exactly 5 PLANTED
  neighbors at a controlled cosine (default 0.55 — far from the
  near-clone ~0.95 regime; per-plane sign agreement ~0.69);
- the background is isotropic noise — query cosines ~N(0, 1/8), whose
  EXTREME tail over 30k draws reaches ~0.57: that bounds how hard a
  dominant planted pair can be at this (n, dim). cos=0.35 plants (the
  original sf0.01-hard-case idea) are strictly BELOW the background's
  top-5, so with plant_cos <= ~0.5 the measurement degenerates to the
  pure isotropic case — which this tool also reports when you pass a
  low plant cosine (recall vs the brute-force top-5 is always the
  metric; the planted share line says which regime you measured).

Measured r16 (dated 2026-08-16, b=8, seed 20260816):
  isotropic ground truth (plants at 0.35, share 0.0):
    Hamming-1: recall@5 0.575   Hamming-<=2: 0.800
  planted 0.55 ground truth: see BENCH_NOTES_r16.md (the pinned floor
  corpus, tests/test_ann_recall.py).

Prints recall@5 of ann_lsh_topk vs the exact brute-force top-5, the
planted share of that ground truth, and the per-query candidate
count, at the corpus's own ladder rung. Run ALONE.

Run: python tools/ann_hard_probe.py [n_total] [plant_cos]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DIM = 64
_COS = 0.55
_K = 5
_QUERY_IDS = list(range(0, 2000, 50))


def build_hard_corpus(dst: str, n_total: int = 30000, seed: int = 20260816, plant_cos: float = _COS) -> None:
    """Write embeddings.parquet: planted hard pairs + isotropic noise.
    Deterministic per seed; plants live at vec_ids >= 50000 so the
    fixed query-id set and the dense background ids never collide."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    rows_id: list[int] = []
    vecs: list[np.ndarray] = []

    def unit(v: np.ndarray) -> np.ndarray:
        return v / np.linalg.norm(v)

    # background: ids 0..n_bg-1 (includes the query ids themselves)
    n_plant = len(_QUERY_IDS) * _K
    n_bg = n_total - n_plant
    bg = rng.standard_normal((n_bg, _DIM))
    for i in range(n_bg):
        rows_id.append(i)
        vecs.append(unit(bg[i]))
    # planted neighbors: v = cos*q + sin*r with r ⊥ q
    by_id = {i: vecs[i] for i in _QUERY_IDS}
    sin = float(np.sqrt(1.0 - plant_cos * plant_cos))
    pid = 50000
    for q in _QUERY_IDS:
        qv = by_id[q]
        for _ in range(_K):
            r = rng.standard_normal(_DIM)
            r = unit(r - np.dot(r, qv) * qv)
            rows_id.append(pid)
            vecs.append(unit(plant_cos * qv + sin * r))
            pid += 1
    emb = [[float(x) for x in v] for v in vecs]
    table = pa.table(
        {
            "vec_id": pa.array(rows_id, pa.int64()),
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array([i % 10 for i in rows_id], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(dst, "embeddings.parquet"))


def main() -> int:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    plant_cos = float(sys.argv[2]) if len(sys.argv) > 2 else _COS
    from monday_etl_automation_spark.plans import embed_ops as eo
    from monday_etl_automation_spark.session import get_spark

    d = tempfile.mkdtemp(prefix="ann_hard_")
    try:
        for f in os.listdir("/root/testdata/sf0.001"):
            if f != "embeddings.parquet":
                shutil.copy(os.path.join("/root/testdata/sf0.001", f), os.path.join(d, f))
        build_hard_corpus(d, n_total, plant_cos=plant_cos)
        m = eo._ann_modulus(n_total)
        print(f"corpus n={n_total} -> ladder modulus {m} (b={m.bit_length() - 1})")

        spark = get_spark("ann_hard_probe")
        exact = eo.cosine_topk(spark, d).collect()
        truth: dict[int, set[int]] = {}
        for r in exact:
            truth.setdefault(r.query_id, set()).add(r.neighbor_id)
        # the planted pairs must BE the exact top-5 (else the probe is
        # measuring the wrong thing)
        planted_share = sum(
            1 for q, nb in truth.items() for v in nb if v >= 50000
        ) / max(1, sum(len(nb) for nb in truth.values()))
        print(f"exact top-5 that are planted: {planted_share:.3f}")

        approx = eo.ann_lsh_topk(spark, d).collect()
        got: dict[int, set[int]] = {}
        for r in approx:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = sum(len(got.get(q, set()) & nb) for q, nb in truth.items())
        total = sum(len(nb) for nb in truth.values())
        print(f"hard-case recall@5 at b={m.bit_length() - 1}: {hits / total:.3f} ({hits}/{total})")

        # candidate volume: re-run the candidate CTE alone
        idx, mm = eo._ann_bucket_index(spark, d)
        idx.createOrReplaceTempView("_ann_buckets")
        sql = eo._ann_lsh_sql("spark", modulus=mm)
        cand_sql = sql[: sql.index("scored AS")] + (
            "sel AS (SELECT count(*) AS n FROM cand) SELECT n FROM sel"
        )
        ncand = spark.sql(cand_sql).collect()[0][0]
        print(f"total candidates across {len(_QUERY_IDS)} queries: {ncand}"
              f" (~{ncand // len(_QUERY_IDS)}/query vs corpus {n_total})")
        return 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
