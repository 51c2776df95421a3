"""Drift-proofing for the one external boundary: the driver-written
parquet testdata.

The driver regenerates /root/testdata between rounds and the physical
encoding of ``events.ts`` has already changed once (TIMESTAMP(NANOS)
-> naive TIMESTAMP(MICROS)), which silently compressed every
timestamp 1000x through a forced-LONG read path. These tests pin the
*loaded* semantics — type and epoch range — via both ingestion paths
(batch loader and streaming source) against a DuckDB read of the same
file, so any future encoding drift fails loudly instead of emitting
wrong answers. This is the reference's dynamic-typing lesson
(Leyton_depot.py:147-153 adapts parsing to the cell's type tag)
applied at our source boundary.
"""

from __future__ import annotations

import datetime
import os

import duckdb
from pyspark.sql import functions as F
from pyspark.sql import types as T

from monday_etl_automation_spark.sources.tables import load_table, normalize_ts
from monday_etl_automation_spark.streaming.pipeline import event_stream


def _oracle_range(sf_dir: str):
    path = os.path.join(sf_dir, "events.parquet")
    return duckdb.sql(
        f"select min(ts), max(ts), count(*) from '{path}'"
    ).fetchone()


def test_batch_events_ts_matches_duckdb_to_the_microsecond(spark, sf_dir):
    lo, hi, n = _oracle_range(sf_dir)
    df = load_table(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.agg(
        F.min("ts").cast("timestamp_ntz").alias("lo"),
        F.max("ts").cast("timestamp_ntz").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # exact microsecond agreement with DuckDB's naive read — a 1000x
    # compression, unit drift, or timezone shift all fail here
    assert row["lo"] == lo
    assert row["hi"] == hi
    assert row["n"] == n
    # sanity-pin the era: the generator writes 2024 events; epoch-ish
    # values (the round-5 failure collapsed everything to ~1970-01-20)
    # are caught even if the oracle read drifted identically
    assert row["lo"] > datetime.datetime(2020, 1, 1)
    assert row["hi"] < datetime.datetime(2100, 1, 1)


def test_stream_events_ts_matches_batch(spark, sf_dir):
    lo, hi, n = _oracle_range(sf_dir)
    stream = event_stream(spark, sf_dir)
    assert isinstance(stream.schema["ts"].dataType, T.TimestampType)
    # run the stream's exact projection as a batch over the same file
    # (identical plan from the first transformation on)
    raw = (
        spark.read.schema(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
        )
        .parquet(os.path.join(sf_dir, "events.parquet"))
    )
    row = (
        normalize_ts(raw)
        .agg(
            F.min("ts").cast("timestamp_ntz").alias("lo"),
            F.max("ts").cast("timestamp_ntz").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()[0]
    )
    assert (row["lo"], row["hi"], row["n"]) == (lo, hi, n)


# The loaded (post-normalize_ts) logical schema every operator and
# oracle in this repo is written against. If the driver regenerates the
# testdata under different physical types, this names the exact
# table/column that moved instead of letting 50 queries fail obscurely
# (or worse, pass wrongly — the round-5 failure mode).
_EXPECTED_SCHEMAS = {
    "region": "r_regionkey:int, r_name:string",
    "nation": "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer": "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier": "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part": "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders": "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem": "l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz",
    "events": "event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, value:double, props:string",
    "documents": "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings": "vec_id:bigint, embedding:array<float>, label:int",
}


def test_loaded_schemas_are_pinned(spark, sf_dir):
    from monday_etl_automation_spark.sources.tables import TABLES

    assert set(_EXPECTED_SCHEMAS) == set(TABLES)
    for name in TABLES:
        got = ", ".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in load_table(spark, sf_dir, name).schema.fields
        )
        assert got == _EXPECTED_SCHEMAS[name], (
            f"testdata drift in table {name!r}:\n  loaded   {got}\n"
            f"  expected {_EXPECTED_SCHEMAS[name]}\n"
            "If the driver re-wrote the parquet with new physical types, "
            "extend sources/tables.py normalize_ts (events.ts) or re-pin "
            "here after auditing every consumer."
        )


def test_normalize_ts_handles_all_known_encodings(spark):
    base = datetime.datetime(2024, 3, 1, 12, 30, 45, 123456)
    micros = int(base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    # nanos-as-long (the pre-round-5 physical encoding)
    df_long = spark.createDataFrame([(micros * 1000,)], "ts long")
    # naive micros (the current encoding)
    df_ntz = spark.createDataFrame([(base,)], "ts timestamp_ntz")
    # already normalized
    df_ts = spark.createDataFrame([(base,)], "ts timestamp")

    outs = []
    for df in (df_long, df_ntz, df_ts):
        out = normalize_ts(df)
        assert isinstance(out.schema["ts"].dataType, T.TimestampType)
        outs.append(out.select(F.col("ts").cast("timestamp_ntz")).collect()[0][0])
    assert outs == [base, base, base]


def test_partial_register_views_does_not_mark_sf_dir_registered(spark, sf_dir):
    """r15 regression: register_views(names=subset) used to set the
    session's 'views registered for this sf_dir' tag, turning every
    later FULL registration into a no-op — the first lineitem query
    after a names=("part",) call failed with TABLE_OR_VIEW_NOT_FOUND."""
    from monday_etl_automation_spark.sources.tables import register_views

    saved = getattr(spark, "_mea_views_sf_dir", None)
    try:
        spark._mea_views_sf_dir = None
        spark.catalog.dropTempView("lineitem")
        register_views(spark, sf_dir, ("part",))
        assert getattr(spark, "_mea_views_sf_dir", None) != sf_dir
        register_views(spark, sf_dir)  # must NOT be a no-op
        assert spark.sql("SELECT count(*) AS n FROM lineitem").collect()[0][0] > 0
    finally:
        spark._mea_views_sf_dir = None
        register_views(spark, sf_dir)
        spark._mea_views_sf_dir = saved


def test_cross_dir_subset_registration_drops_full_tag(spark, sf_dir):
    """r16 (r15 ADVICE, medium): a subset registration against a
    DIFFERENT sf_dir leaves the session with a MIXED view mapping —
    the tag must drop so a later full registration of the original dir
    cannot early-return and silently serve the other dir's rows."""
    from monday_etl_automation_spark.sources.tables import (
        clear_artifact_caches,
        register_views,
    )

    other = "/root/testdata/sf0.01"
    saved = getattr(spark, "_mea_views_sf_dir", None)
    try:
        clear_artifact_caches(spark)
        spark._mea_views_sf_dir = None
        register_views(spark, sf_dir)  # full: tag = sf_dir
        assert getattr(spark, "_mea_views_sf_dir", None) == sf_dir
        n_before = spark.sql("SELECT count(*) AS n FROM documents").collect()[0][0]
        register_views(spark, other, ("documents",))  # subset, other dir
        assert getattr(spark, "_mea_views_sf_dir", None) is None
        register_views(spark, sf_dir)  # must rebind EVERY view
        n_after = spark.sql("SELECT count(*) AS n FROM documents").collect()[0][0]
        assert n_after == n_before
    finally:
        clear_artifact_caches(spark)
        spark._mea_views_sf_dir = None
        register_views(spark, sf_dir)
        spark._mea_views_sf_dir = saved


def test_artifact_cache_eviction_hook_fires():
    """r16 (r15 ADVICE, low): superseded snapshot entries must release
    owned resources — the hook fires on identity-eviction and on
    clear(), never on unrelated keys, and hook errors never propagate."""
    from monday_etl_automation_spark.sources.tables import _ArtifactCache

    seen = []
    c = _ArtifactCache()
    c.on_evict = seen.append
    c[("sfA", "events", 1, 10)] = "v1"
    c[("sfB", "events", 1, 10)] = "other"  # different identity: no evict
    assert seen == []
    c[("sfA", "events", 2, 20)] = "v2"  # same identity, new snapshot
    assert seen == ["v1"]
    c.clear()
    assert sorted(seen) == sorted(["v1", "other", "v2"])
    # a raising hook is swallowed
    c.on_evict = lambda v: (_ for _ in ()).throw(RuntimeError("boom"))
    c[("sfA", "events", 3, 30)] = "v3"
    c[("sfA", "events", 4, 40)] = "v4"  # evicts v3; hook raises; survives
    assert c[("sfA", "events", 4, 40)] == "v4"
