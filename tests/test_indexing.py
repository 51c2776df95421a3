"""Two-pass global index unit tests (operators/indexing.py).

Regression context: repartitionByRange samples split boundaries with a
per-execution seed, so an unmaterialized two-pass index could compute
offsets on one partitioning and emit rows under another — wrong global
ids that only showed up at sf0.1 (caught by tools/strict_compare.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monday_etl_automation_spark.operators.indexing import with_global_index
from monday_etl_automation_spark.sources.tables import load_table


def test_global_index_is_correct_and_stable(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    idx = with_global_index(o, ["o_orderkey"], name="rn", start=1, num_partitions=7)
    a = sorted((r.o_orderkey, r.rn) for r in idx.collect())
    b = sorted((r.o_orderkey, r.rn) for r in idx.collect())  # re-execution
    assert a == b, "global index changed between executions"
    keys = sorted(r.o_orderkey for r in o.collect())
    want = [(k, i + 1) for i, k in enumerate(keys)]
    assert a == want


def test_global_index_start_offset_and_empty(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    idx = with_global_index(o.limit(5), ["o_orderkey"], name="auto_id", start=100)
    got = sorted(r.auto_id for r in idx.collect())
    assert got == [100, 101, 102, 103, 104]
    empty = with_global_index(o.where("o_orderkey < 0"), ["o_orderkey"], name="rn")
    assert empty.count() == 0
