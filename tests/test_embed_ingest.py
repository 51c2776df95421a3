"""Incremental embedding-index ingestion: frozen-quantizer identity,
batch search, zero-corpus-scan plans, and a DuckDB training twin."""

from __future__ import annotations

import duckdb
import pytest

from monday_etl_automation_spark.plans import pq_ops as P
from monday_etl_automation_spark.plans.embed_ingest import (
    ann_assign_batch,
    ivf_assign_batch,
    pq_encode_batch,
    pq_search_batch,
)
from monday_etl_automation_spark.plans.embed_ops import (
    _IVF_NPROBE,
    _ann_bucket_index,
    _train_ivf_ranked,
)
from monday_etl_automation_spark.plans.pq_ops import _train_pq
from monday_etl_automation_spark.sources.tables import register_views

_OFF = 100000  # batch ids = corpus id + _OFF (disjoint id spaces)
_CLONE, _PERT, _FRESH, _TINY = 7, 12, 21, 3


@pytest.fixture(scope="module")
def batch(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
SELECT vec_id + {_OFF} AS vec_id, embedding, label
FROM embeddings WHERE vec_id = {_CLONE}
UNION ALL
SELECT vec_id + {_OFF},
       zip_with(embedding, sequence(0, 63),
                (x, i) -> IF(i = 0, CAST(x + CAST(0.05 AS FLOAT) AS FLOAT), x)),
       label
FROM embeddings WHERE vec_id = {_PERT}
UNION ALL
SELECT vec_id + {_OFF}, reverse(embedding), label
FROM embeddings WHERE vec_id = {_FRESH}
UNION ALL
SELECT vec_id + {_OFF},
       zip_with(embedding, sequence(0, 63),
                (x, j) -> CAST(CAST(x AS DOUBLE) + ((j % 5) - 2) * 0.001 AS FLOAT)),
       label
FROM embeddings WHERE vec_id = {_TINY}
""".strip()
    ).localCheckpoint(eager=True)


def test_frozen_quantizer_clone_identity(spark, sf_dir, batch):
    """A batch vector identical to a corpus vector must produce
    IDENTICAL index rows across all three indexes — encoding depends
    only on the persisted quantizer, never on a retrain."""
    want = sorted(
        (r.s, r.bucket)
        for r in _ann_bucket_index(spark, sf_dir)[0].where(f"vec_id = {_CLONE}").collect()
    )
    got = sorted(
        (r.s, r.bucket)
        for r in ann_assign_batch(spark, sf_dir, batch)
        .where(f"vec_id = {_CLONE + _OFF}")
        .collect()
    )
    assert got == want and got

    want = sorted(
        (r.cid, r.rc)
        for r in _train_ivf_ranked(spark, sf_dir)
        .where(f"vec_id = {_CLONE} AND rc <= {_IVF_NPROBE}")
        .collect()
    )
    got = sorted(
        (r.cid, r.rc)
        for r in ivf_assign_batch(spark, sf_dir, batch)
        .where(f"vec_id = {_CLONE + _OFF}")
        .collect()
    )
    assert got == want and got

    codes, _ = _train_pq(spark, sf_dir)
    want = sorted((r.sub, r.code) for r in codes.where(f"vec_id = {_CLONE}").collect())
    got = sorted(
        (r.sub, r.code)
        for r in pq_encode_batch(spark, sf_dir, batch)
        .where(f"vec_id = {_CLONE + _OFF}")
        .collect()
    )
    assert got == want and len(got) == P._M


def test_pq_search_batch_finds_sources(spark, sf_dir, batch):
    rows = pq_search_batch(spark, sf_dir, batch).collect()
    top1 = {r.query_id: (r.neighbor_id, r.cosine) for r in rows if r.rk == 1}
    # the clone's nearest corpus vector is its original, cosine exactly 1
    assert top1[_CLONE + _OFF] == (_CLONE, 1.0)
    # a small single-component perturbation still resolves to its source
    nb, cos = top1[_PERT + _OFF]
    assert nb == _PERT and cos > 0.99
    # every batch query gets a full top-k
    # the tiny (planted-style) perturbation resolves to its source too
    nb, cos = top1[_TINY + _OFF]
    assert nb == _TINY and cos > 0.999
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = max(per_q.get(r.query_id, 0), r.rk)
    assert set(per_q) == {_CLONE + _OFF, _PERT + _OFF, _FRESH + _OFF, _TINY + _OFF}
    assert all(v == 5 for v in per_q.values())


def test_ingest_plans_never_scan_corpus(spark, sf_dir, batch):
    """Encoding a batch must be O(|batch|) + the persisted quantizer:
    no parquet scan may appear in the plan (the re-rank in
    pq_search_batch is the one legitimate corpus access and is
    excluded here)."""
    for fn in (ann_assign_batch, ivf_assign_batch, pq_encode_batch):
        plan = fn(spark, sf_dir, batch)._jdf.queryExecution().toString()
        assert "Scan parquet" not in plan, f"{fn.__name__} rescans the corpus:\n{plan[:600]}"


def test_embed_near_dup_batch(spark, sf_dir, batch):
    from monday_etl_automation_spark.plans.embed_ingest import embed_near_dup_batch
    from monday_etl_automation_spark.plans.embed_ops import _nd_bucket_sql, _nd_meta_cte

    rows = {r.vec_id: r for r in embed_near_dup_batch(spark, sf_dir, batch).collect()}
    assert set(rows) == {v + _OFF for v in (_CLONE, _PERT, _FRESH, _TINY)}
    # exact clone: always same bucket, cosine exactly 1 of its source
    r = rows[_CLONE + _OFF]
    assert (r.has_near_dup, r.nearest_corpus_vec_id, r.cosine) == (1, _CLONE, 1.0)
    # reversed vector: near-orthogonal to everything, never flagged
    assert rows[_FRESH + _OFF].has_near_dup == 0
    # tiny perturbation: the contract is bucket-collision => detection.
    # Whether the perturbed vector shares its source's bucket is a
    # property of the current (regenerating) testdata, so assert the
    # implication, not the collision.
    bucket = _nd_bucket_sql("spark")
    batch.createOrReplaceTempView("_ing_batch_t")
    b_bucket = spark.sql(
        f"WITH {_nd_meta_cte('spark')} SELECT {bucket} DIV (SELECT d FROM ndm) AS b"
        f" FROM _ing_batch_t WHERE vec_id = {_TINY + _OFF}"
    ).collect()[0].b
    c_bucket = spark.sql(
        f"WITH {_nd_meta_cte('spark')} SELECT {bucket} DIV (SELECT d FROM ndm) AS b"
        f" FROM embeddings WHERE vec_id = {_TINY}"
    ).collect()[0].b
    r = rows[_TINY + _OFF]
    if b_bucket == c_bucket:
        assert r.has_near_dup == 1 and r.nearest_corpus_vec_id == _TINY
        assert r.cosine > 0.999
    else:  # pragma: no cover - dataset-dependent branch
        assert r.has_near_dup in (0, 1)


def test_pq_encode_batch_duckdb_twin(spark, sf_dir, batch):
    """An independent DuckDB training run over the same corpus must
    encode the batch identically — proves the persisted Spark codebook
    equals the from-scratch trained one (no session-state drift)."""
    got = sorted(
        (r.vec_id, r.sub, r.code)
        for r in pq_encode_batch(spark, sf_dir, batch).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    bdf = batch.toPandas()
    con.register("ing_batch", bdf)
    rounds = ",\n".join(
        f"{P._pq_codes_sql('duckdb', 'ex', f'cent{k}', str(k))},\n"
        f"cent{k + 1} AS ({P._pq_cent_next_sql('ex', f'codes{k}')})"
        for k in range(P._PQ_ITERS)
    )
    bex = P._pq_ex_sql("duckdb").replace("FROM embeddings", "FROM ing_batch")
    twin = f"""
WITH meta AS (SELECT greatest(1, count(*) // {P._K}) AS step FROM embeddings),
ex AS ({P._pq_ex_sql('duckdb')}),
cent0 AS ({P._pq_cent0_sql('duckdb', '(SELECT step FROM meta)')}),
{rounds},
bex AS ({bex}),
{P._pq_codes_sql('duckdb', 'bex', f'cent{P._PQ_ITERS}', 'b')}
SELECT vec_id, sub, code FROM codesb ORDER BY vec_id, sub
""".strip()
    want = sorted(tuple(r) for r in con.execute(twin).fetchall())
    con.close()
    assert got == want


def test_ivfpq_frozen_clone_identity(spark, sf_dir, batch):
    """IVF-PQ extends the frozen-quantizer invariant: a cloned corpus
    vector gets the identical (cid, sub, code) rows the persisted
    vparts relation holds for its source."""
    from monday_etl_automation_spark.plans.embed_ingest import ivfpq_encode_batch
    from monday_etl_automation_spark.plans.ivfpq_ops import _train_ivfpq

    _, _, vparts = _train_ivfpq(spark, sf_dir)
    want = sorted(
        (r.cid, r.sub, r.code) for r in vparts.where(f"vec_id = {_CLONE}").collect()
    )
    got = sorted(
        (r.cid, r.sub, r.code)
        for r in ivfpq_encode_batch(spark, sf_dir, batch)
        .where(f"vec_id = {_CLONE + _OFF}")
        .collect()
    )
    assert got == want and len(got) == P._M


def test_ivfpq_search_batch_finds_sources(spark, sf_dir, batch):
    from monday_etl_automation_spark.plans.embed_ingest import ivfpq_search_batch

    rows = ivfpq_search_batch(spark, sf_dir, batch).collect()
    top1 = {r.query_id: (r.neighbor_id, r.cosine) for r in rows if r.rk == 1}
    assert top1[_CLONE + _OFF] == (_CLONE, 1.0)
    nb, cos = top1[_TINY + _OFF]
    assert nb == _TINY and cos > 0.999
    per_q: dict[int, int] = {}
    for r in rows:
        per_q[r.query_id] = max(per_q.get(r.query_id, 0), r.rk)
    assert set(per_q) == {v + _OFF for v in (_CLONE, _PERT, _FRESH, _TINY)}
    assert all(v == 5 for v in per_q.values())


# ---------------------------------------------------------------------------
# round 14: the adaptive near-dup prefix ladder (mix-plane family)
# ---------------------------------------------------------------------------


def test_nd_ladder_python_sql_parity():
    """The Python divisor (cached with the persisted index) and the
    oracle's in-SQL CASE ladder must agree at every rung boundary —
    they are generated from the same _nd_ladder() source, and this pin
    keeps them that way."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _NEARDUP_BITS_MAX,
        _NEARDUP_BITS_MIN,
        _NEARDUP_TARGET,
        _nd_divisor,
        _nd_meta_cte,
    )

    con = duckdb.connect()
    probe = [1, 2]
    for b in range(_NEARDUP_BITS_MIN, _NEARDUP_BITS_MAX + 1):
        t = _NEARDUP_TARGET * 2**b
        probe += [t - 1, t, t + 1]
    for cnt in probe:
        sql = (
            f"WITH c AS (SELECT {cnt} AS cnt), "
            + _nd_meta_cte("duckdb").replace(
                "(SELECT count(*) AS cnt FROM embeddings) ndc", "c ndc"
            )
            + " SELECT d FROM ndm"
        )
        assert con.sql(sql).fetchone()[0] == _nd_divisor(cnt), cnt
    con.close()


def test_nd_ladder_extends_past_legacy_saturation():
    """The r13 _PLANE_ND family had 11 distinct planes, so the ladder
    saturated at 2^11 buckets (~33k vectors at TARGET=16) and pair
    work went quadratic past it (SCALE.md). The mix-plane ladder must
    keep widening: per-bucket population (cnt * divisor / 2^BITS_MAX)
    stays <= TARGET until the 2^BITS_MAX capacity (~268M vectors)."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _NEARDUP_BITS_MAX,
        _NEARDUP_TARGET,
        _nd_divisor,
    )

    assert _NEARDUP_BITS_MAX >= 20  # far past the legacy 11-bit cliff
    for cnt in (33_000, 60_000, 200_000, 5_000_000, 100_000_000):
        buckets = 2**_NEARDUP_BITS_MAX // _nd_divisor(cnt)
        assert cnt / buckets <= _NEARDUP_TARGET, (cnt, buckets)
    # legacy saturation point: 33k vectors now get > 2^11 buckets
    assert 2**_NEARDUP_BITS_MAX // _nd_divisor(33_000) > 2**11


def test_nd_index_divisor_matches_snapshot_count(spark, sf_dir):
    """The divisor travels WITH the cached index handle and equals the
    ladder value of the snapshot's own count — the coupling the batch
    near-dup path relies on (r13 ADVICE: a live-view re-derivation
    could silently misalign batch vs index bucket keys)."""
    from monday_etl_automation_spark.plans.embed_ops import _nd_divisor, _nd_ex_index

    ex, d = _nd_ex_index(spark, sf_dir)
    cnt = spark.sql("SELECT count(*) FROM embeddings").collect()[0][0]
    assert d == _nd_divisor(cnt)
    # the persisted buckets are consistent with that divisor: every
    # bucket id fits in 2^BITS_MAX / d
    from monday_etl_automation_spark.plans.embed_ops import _NEARDUP_BITS_MAX

    hi = ex.selectExpr("max(bucket) AS m").collect()[0].m
    assert 0 <= hi < 2**_NEARDUP_BITS_MAX // d


# ---------------------------------------------------------------------------
# round 14: the ANN/IVF capacity ladders (r13 verdict item 3)
# ---------------------------------------------------------------------------


def test_ivf_ladder_python_sql_parity():
    """The Python (ncent, nprobe) twin (cached with the quantizer
    handles) and the meta-CTE CASE ladders must agree at every rung
    boundary."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _ivf_ladder,
        _ivf_meta_cte,
        _ivf_params,
    )

    con = duckdb.connect()
    probe = [1, 2]
    for t, _, _ in _ivf_ladder():
        probe += [t - 1, t, t + 1]
    for cnt in probe:
        sql = (
            f"WITH c AS (SELECT {cnt} AS cnt), "
            + _ivf_meta_cte("duckdb").replace(
                "(SELECT count(*) AS cnt FROM embeddings) ivc", "c ivc"
            )
            + " SELECT ncent, nprobe, step FROM meta"
        )
        ncent, nprobe, step = con.sql(sql).fetchone()
        assert (ncent, nprobe) == _ivf_params(cnt), cnt
        assert step == max(1, cnt // ncent), cnt
    con.close()


def test_ann_ladder_python_sql_parity():
    """Same pin for the ANN bucket modulus."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _ann_ladder,
        _ann_meta_cte,
        _ann_modulus,
    )

    con = duckdb.connect()
    probe = [1, 2]
    for t, _ in _ann_ladder():
        probe += [t - 1, t, t + 1]
    for cnt in probe:
        sql = (
            f"WITH c AS (SELECT {cnt} AS cnt), "
            + _ann_meta_cte("duckdb").replace(
                "(SELECT count(*) AS cnt FROM embeddings) anc", "c anc"
            )
            + " SELECT m FROM am"
        )
        assert con.sql(sql).fetchone()[0] == _ann_modulus(cnt), cnt
    con.close()


def test_capacity_ladders_scale_and_keep_base_config():
    """(a) Corpora at the pytest/driver SFs get EXACTLY the r13 fixed
    config (bit-identical results, recall floors untouched); (b) past
    the base rung ncent grows ~sqrt(n) and the probed corpus share
    nprobe/ncent shrinks; (c) the ANN modulus keeps per-set bucket
    population ~TARGET up to the 2^BITS_MAX capacity; (d) the ANN
    extension planes never collide with the near-dup planes."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _ANN_BITS_MAX,
        _ANN_PLANES,
        _ANN_SETS,
        _ANN_TARGET,
        _IVF_NCENT,
        _IVF_NPROBE,
        _ND_PLANE_BASE,
        _NEARDUP_BITS_MAX,
        _ann_modulus,
        _ann_plane,
        _ivf_params,
    )

    # (a) base-rung identity
    for cnt in (200, 2000):
        assert _ivf_params(cnt) == (_IVF_NCENT, _IVF_NPROBE)
        assert _ann_modulus(cnt) == 2**_ANN_PLANES
    # (b) sqrt growth, shrinking probe share
    base_frac = _IVF_NPROBE / _IVF_NCENT
    prev_ncent = _IVF_NCENT
    for cnt in (20_000, 200_000, 2_000_000):
        ncent, nprobe = _ivf_params(cnt)
        assert ncent > prev_ncent
        assert nprobe / ncent < base_frac
        prev_ncent = ncent
    # (c) per-set population bounded until capacity
    for cnt in (20_000, 200_000, _ANN_TARGET * 2**_ANN_BITS_MAX):
        assert cnt / _ann_modulus(cnt) <= _ANN_TARGET, cnt
    # (d) plane-range disjointness
    ann_planes = {
        _ann_plane(s, i)
        for s in range(1, _ANN_SETS + 1)
        for i in range(_ANN_BITS_MAX)
    }
    nd_planes = set(range(_ND_PLANE_BASE, _ND_PLANE_BASE + _NEARDUP_BITS_MAX))
    assert not ann_planes & nd_planes
    assert len(ann_planes) == _ANN_SETS * _ANN_BITS_MAX  # pairwise distinct


def test_ann_index_modulus_matches_snapshot_count(spark, sf_dir):
    """The modulus travels WITH the cached bucket index and equals the
    ladder value of the snapshot's own count (the nd-divisor coupling
    rule); the stored buckets are FULL width — ladder-independent."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _ANN_BITS_MAX,
        _ann_bucket_index,
        _ann_modulus,
    )

    idx, m = _ann_bucket_index(spark, sf_dir)
    cnt = spark.sql("SELECT count(*) FROM embeddings").collect()[0][0]
    assert m == _ann_modulus(cnt)
    hi = idx.selectExpr("max(bucket) AS m").collect()[0].m
    assert m <= hi < 2**_ANN_BITS_MAX  # full width stored, wider than any rung


# ---------------------------------------------------------------------------
# round 14: cross-engine exactness BEYOND the base rung. The driver's
# correctness SFs never leave rung 0 (<= 2,500 vectors), so without
# this pin a Spark/DuckDB divergence in the ladder arithmetic itself
# (CASE boundaries, step clamp, modulus keep-bits) would only surface
# at production scale. A 3,000-vector snapshot lands on IVF rung 1
# (ncent 40, nprobe 24) and ANN modulus 32, and the twins must stay
# value-identical there.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def rung1_dir(spark, sf_dir, tmp_path_factory):
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("rung1"))
    for f in os.listdir(sf_dir):
        if f != "embeddings.parquet":
            shutil.copy(os.path.join(sf_dir, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(
        f"""
COPY (
  SELECT * FROM '/root/testdata/sf0.1/embeddings.parquet'
  UNION ALL
  SELECT vec_id + 2000 AS vec_id,
         list_transform(embedding, x -> CAST(x + 0.003 AS FLOAT)) AS embedding,
         label
  FROM '/root/testdata/sf0.1/embeddings.parquet' WHERE vec_id < 1000
) TO '{d}/embeddings.parquet' (FORMAT parquet)
"""
    )
    con.close()
    return d


@pytest.mark.parametrize("op", ["ivf_topk", "ann_lsh_topk", "embed_near_dup"])
def test_ladder_rung1_twin_exactness(spark, rung1_dir, op):
    from monday_etl_automation_spark.plans import embed_ops as eo

    assert eo._ivf_params(3000) == (40, 24)  # genuinely off the base rung
    assert eo._ann_modulus(3000) == 32
    fn, osql = {
        "ivf_topk": (eo.ivf_topk, eo._ivf_sql("duckdb")),
        "ann_lsh_topk": (eo.ann_lsh_topk, eo._ann_lsh_sql("duckdb")),
        "embed_near_dup": (eo.embed_near_dup, eo._near_dup_sql("duckdb")),
    }[op]
    srows = [tuple(r) for r in fn(spark, rung1_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{rung1_dir}/embeddings.parquet'"
    )
    orows = con.sql(osql).fetchall()
    con.close()

    def norm(rows):
        # sorted: the twins dropped their cosmetic final ORDER BY in
        # r18 (the driver compare is order-insensitive); this test pins
        # VALUE exactness, like its deep-rung sibling below
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows
        )

    assert len(srows) == len(orows) and len(srows) > 0
    assert norm(srows) == norm(orows)


# ---------------------------------------------------------------------------
# round 15: the ANN capacity raise (BITS_MAX 16 -> 24) and the frozen
# plane map that makes "stored indexes survive the raise" actually
# true. The r14 extension stride was (BITS_MAX - PLANES), so raising
# the constant would have silently reassigned the extension planes of
# probe sets 2..4 and invalidated every stored bucket's high bits —
# the stride is now the fixed _ANN_EXT_STRIDE and these pins freeze
# the (set, bit) -> plane map and the deep-bit cross-engine values.
# ---------------------------------------------------------------------------


def test_ann_plane_ids_are_frozen():
    """Literal (set, bit) -> plane pins. These values are FROZEN: a
    stored full-width index encodes them physically, so any change —
    including reintroducing a BITS_MAX-derived stride — invalidates
    persisted indexes and must fail here loudly."""
    from monday_etl_automation_spark.plans.embed_ops import (
        _ANN_BITS_MAX,
        _ANN_PLANES,
        _ANN_SETS,
        _ann_plane,
    )

    # legacy bits (the r13 fixed-width index, bit-identical forever)
    assert _ann_plane(1, 0) == 1
    assert _ann_plane(1, 3) == 4
    assert _ann_plane(2, 0) == 5
    assert _ann_plane(4, 3) == 16
    # extension bits at the fixed stride of 32
    assert _ann_plane(1, 4) == 201
    assert _ann_plane(1, 23) == 220
    assert _ann_plane(2, 4) == 233
    assert _ann_plane(3, 10) == 271
    assert _ann_plane(4, 23) == 316
    # the map must not depend on BITS_MAX: every plane id fits inside
    # the per-set stride window regardless of how many bits are in use
    assert _ANN_BITS_MAX - _ANN_PLANES <= 32
    for s in range(1, _ANN_SETS + 1):
        for i in range(_ANN_PLANES, _ANN_BITS_MAX):
            assert _ann_plane(s, i) == 201 + (s - 1) * 32 + (i - _ANN_PLANES)


@pytest.mark.parametrize("modulus", [256, 2**20])
def test_ann_deep_rung_twin_exactness(spark, rung1_dir, modulus):
    """Cross-engine exactness at rungs far above the corpus's own
    (3,000 vectors -> natural rung m=32): Spark searches the PERSISTED
    full-width index reduced to the deep modulus; DuckDB recomputes
    every projection inline at the same modulus. Equality proves the
    stored high bits (incl. bits 16..19, beyond the r14 width) are
    exactly the oracle's — i.e. an index stored before a BITS_MAX
    raise keeps answering correctly after it."""
    from monday_etl_automation_spark.plans import embed_ops as eo

    idx, _ = eo._ann_bucket_index(spark, rung1_dir)
    idx.createOrReplaceTempView("_ann_buckets")
    srows = [tuple(r) for r in spark.sql(eo._ann_lsh_sql("spark", modulus=modulus)).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{rung1_dir}/embeddings.parquet'"
    )
    orows = con.sql(eo._ann_lsh_sql("duckdb", modulus=modulus)).fetchall()
    con.close()

    def norm(rows):
        return sorted(
            tuple(round(v, 6) if isinstance(v, float) else v for v in r) for r in rows
        )

    assert len(srows) == len(orows)
    if modulus == 256:
        # ~12 vectors/bucket/set here: candidate sets are non-trivial
        assert len(srows) > 0
    assert norm(srows) == norm(orows)


def test_ann_stored_index_survives_bits_raise(spark, rung1_dir):
    """A pre-raise deployment stored 16-bit buckets; those rows are
    exactly today's full-width rows mod 2^16, and every search keeps
    LOW bits (bucket % m) — so search results at any rung m <= 2^16
    must be identical whether the stored index is 16- or 24-bit wide.
    Guards the low-bits-keep convention itself (a switch to the
    near-dup ladder's high-bits DIV would break stored indexes)."""
    from monday_etl_automation_spark.plans import embed_ops as eo

    idx, m = eo._ann_bucket_index(spark, rung1_dir)
    assert m <= 2**16
    idx.createOrReplaceTempView("_ann_buckets")
    full = [tuple(r) for r in spark.sql(eo._ann_lsh_sql("spark", modulus=m)).collect()]
    idx.selectExpr("vec_id", "s", "bucket % 65536 AS bucket").createOrReplaceTempView(
        "_ann_buckets"
    )
    legacy = [tuple(r) for r in spark.sql(eo._ann_lsh_sql("spark", modulus=m)).collect()]
    idx.createOrReplaceTempView("_ann_buckets")  # restore for later tests
    assert len(full) > 0
    assert sorted(full) == sorted(legacy)


def test_ann_lsh_spark_requires_cached_modulus():
    """ADVICE r14: the spark dialect without a modulus would emit dead
    Hamming probes for bits >= the rung (the flip < m filter is
    oracle-only) — it must refuse instead."""
    from monday_etl_automation_spark.plans import embed_ops as eo

    with pytest.raises(ValueError):
        eo._ann_lsh_sql("spark", modulus=None)
