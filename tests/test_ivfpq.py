"""IVF-PQ residual quantization: DuckDB twin parity, recall floor,
persisted-index search plan."""

from __future__ import annotations

from monday_etl_automation_spark.plans.embed_ops import cosine_topk
from monday_etl_automation_spark.plans.ivfpq_ops import (
    _ivfpq_sql,
    _train_ivfpq,
    ivfpq_topk,
)
from monday_etl_automation_spark.plans.pq_ops import _M
from tests.oracle_compare import assert_matches_oracle

_RECALL_SF = "/root/testdata/sf0.01"


def test_ivfpq_matches_oracle(spark, sf_dir):
    assert_matches_oracle(ivfpq_topk(spark, sf_dir), _ivfpq_sql("duckdb"), sf_dir)


def test_ivfpq_matches_oracle_sf001(spark):
    assert_matches_oracle(ivfpq_topk(spark, _RECALL_SF), _ivfpq_sql("duckdb"), _RECALL_SF)


def test_ivfpq_recall_floor(spark):
    exact: dict[int, set[int]] = {}
    for r in cosine_topk(spark, _RECALL_SF).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx: dict[int, set[int]] = {}
    for r in ivfpq_topk(spark, _RECALL_SF).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(approx.get(q, set()) & nbrs) for q, nbrs in exact.items())
    total = sum(len(nbrs) for nbrs in exact.values())
    rec = hits / total
    # measured 0.960 (sf0.01) / 0.935 (sf0.1) at nprobe=12, cand=200
    # (round 9): the probed lists bound recall exactly as plain IVF —
    # residual quantization only reorders candidates before the exact
    # re-rank. Floor 0.80 now matches the LSH/IVF/PQ paths.
    assert rec >= 0.80, f"IVF-PQ recall {rec:.3f} below design floor"


def test_ivfpq_index_is_compact(spark, sf_dir):
    """The persisted artifact: every vector carries exactly one list id
    and _M codes — the 8-byte-plus-list representation the ADC scan
    reads instead of full vectors."""
    _, rcb, vparts = _train_ivfpq(spark, sf_dir)
    per_vec = vparts.groupBy("vec_id").count().collect()
    assert per_vec and all(r["count"] == _M for r in per_vec)
    cids = vparts.select("vec_id", "cid").distinct().groupBy("vec_id").count().collect()
    assert all(r["count"] == 1 for r in cids)
    # codebooks are KB-sized: at most _M subs x 16 codes x 4 dims rows
    assert rcb.count() <= _M * 16 * 4


def test_ivfpq_folded_search_plan(spark, sf_dir):
    """r19 fold pin: the probed-ADC search must not re-aggregate the
    exploded codes per execution — no hash-partitioning exchange, no
    SortMergeJoin of the checkpointed KB-sized metadata (stats-less
    ExistingRDD scans need the explicit broadcast hints), no
    CartesianProduct."""
    from monday_etl_automation_spark.plans.ivfpq_ops import ivfpq_topk

    df = ivfpq_topk(spark, sf_dir)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 0
