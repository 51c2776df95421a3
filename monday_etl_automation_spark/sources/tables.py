"""Parquet table sources.

The engine's batch sources are columnar parquet scans — Catalyst pushes
filters and prunes columns into the scan (the reference hand-rolled both
as GraphQL query construction, fixed_signature_utils.py:257-289; here
they are free). At 100 TB these scans are the leaves of every plan, so
nothing below ever materializes a table eagerly: loaders return lazy
DataFrames and all pruning happens in the optimizer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize a timestamp column to TimestampType regardless of the
    physical parquet encoding it arrived under.

    The driver regenerates the test parquet between rounds and the
    ``events.ts`` encoding has already drifted once (TIMESTAMP(NANOS)
    -> naive TIMESTAMP(MICROS)); this is the single choke point where
    every encoding becomes the same logical column:

    - ``LongType`` — nanos-as-long (``spark.sql.legacy.parquet
      .nanosAsLong``): integer ``div 1000`` to micros, then
      ``timestamp_micros``. ``/`` would widen to double and lose
      precision above 2^53 (nanos since epoch is ~2^60).
    - ``TimestampNTZType`` — naive micros: with the UTC session the
      ``cast("timestamp")`` is instant-identical and lossless.
    - ``TimestampType`` — already normalized, no-op.

    Batch (`load_table`) and streaming (`streaming.pipeline
    .event_stream`) both route through here, so a future drift breaks
    in exactly one place — and `tests/test_sources.py` pins the
    loaded range so it breaks loudly.
    """
    for field in df.schema.fields:
        if field.name != col:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one test table.

    ``events.ts`` has shipped under multiple physical encodings across
    driver rounds; `normalize_ts` maps them all to a microsecond
    TimestampType. DuckDB reads the same column as a naive microsecond
    TIMESTAMP, so under the UTC session the two engines agree to the
    microsecond and the conversion is oracle-exact.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # memoized per (session, sf_dir, table): spark.read.parquet costs a
    # driver-side file listing + footer read (~100ms); multi-shape
    # queries (tpch_extra: 16 shapes x ~3 tables) would otherwise pay
    # it ~50x per BUILD. DataFrames are immutable logical plans, so
    # sharing one relation across queries in a session is free and safe
    # (plan-build profile: tpch_extra build 7.7s -> see commit).
    cache = getattr(spark, "_mea_table_cache", None)
    if cache is None:
        cache = {}
        spark._mea_table_cache = cache  # noqa: SLF001 (own session tag)
    # the key carries the file's (mtime_ns, size): the cached plan pins
    # the parquet footer/listing from first read, and this environment
    # is KNOWN to regenerate /root/testdata mid-round (round-5
    # incident) — a stale plan would silently read the old snapshot.
    # One os.stat per call is ~1000x cheaper than the listing it saves.
    fpath = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(fpath)
        fkey = (st.st_mtime_ns, st.st_size)
    except OSError:
        fkey = None
    key = (sf_dir, name, fkey)
    cached = cache.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # oracle parity must not depend on the caller's session config:
    # DuckDB timestamps are UTC-naive, so timestamp rendering/windowing
    # must be UTC even if the driver built its own SparkSession
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = normalize_ts(spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))
    cache[key] = df
    return df


def snapshot_key(sf_dir: str, name: str) -> tuple:
    """(sf_dir, table, mtime_ns, size) — the cache key that pins a
    derived artifact (trained quantizer, LSH bucket index, near-pair
    relation) to the exact file snapshot it was computed from. This
    environment is KNOWN to regenerate /root/testdata mid-round; a
    derived artifact served across a regeneration would silently
    describe vanished rows."""
    fpath = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(fpath)
        return (sf_dir, name, st.st_mtime_ns, st.st_size)
    except OSError:
        return (sf_dir, name, None, None)


def scan_split_ceiling(sf_dir: str, name: str) -> int:
    """Upper bound on the number of scan tasks the table's parquet
    layout can yield: row groups are Spark's split granularity, so a
    file written as ONE row group is read by ONE task no matter what
    ``maxPartitionBytes`` says. Footer-only read (KBs), memoized by
    callers via snapshot_key. Returns a huge number on any error so
    the adaptive branch below never fires on uncertainty."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")).metadata.num_row_groups
    except Exception:  # noqa: BLE001
        return 1 << 30


def _spread_n(spark: SparkSession, sf_dir: str, name: str) -> int | None:
    """Shared gate for the two spread twins (r18 ADVICE: the memoized
    probe + cores/2 threshold must live once so they cannot drift):
    the partition count to spread an unsplittable scan of ``name``
    over, or None when the layout already yields >= cores/2 scan tasks
    (the 100 TB case, where spreading must not fire). Footer-only
    row-group probe, snapshot-memoized."""
    cpus = spark.sparkContext.defaultParallelism
    key = ("scan_split_ceiling",) + snapshot_key(sf_dir, name)
    cache = session_artifact_cache(spark, "scan_split_ceiling")
    ceiling = cache.get(key)
    if ceiling is None:
        ceiling = scan_split_ceiling(sf_dir, name)
        cache[key] = ceiling
    return None if ceiling * 2 > cpus else cpus


def spread_unsplittable_scan(spark: SparkSession, df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    """Guide §2.5 (input skew: "one huge unsplittable file ...
    otherwise repartition immediately after the read"): when the
    parquet layout cannot produce even half a core's worth of scan
    tasks, round-robin the (narrow, pre-derivation) rows across the
    cluster so downstream per-row work parallelizes. LAYOUT-adaptive,
    not scale-tuned: at 100 TB the same table ships thousands of row
    groups and this is a no-op; it fires only on the pathological
    single-row-group input the guide describes. Apply BEFORE heavy
    derivations so the exchange carries raw columns, never derived
    payloads (the r14 lesson: repartitioning encoded binary cost more
    than it saved)."""
    n = _spread_n(spark, sf_dir, name)
    return df if n is None else df.repartition(n)


def spread_hint_n(spark: SparkSession, sf_dir: str, name: str) -> int | None:
    """SQL-text twin of spread_unsplittable_scan: the partition count a
    ``/*+ REPARTITION(n) */`` hint should use to spread a heavy
    derivation over an unsplittable scan of ``name`` — or None when the
    layout already yields >= cores/2 scan tasks (the 100 TB case, where
    the hint must not fire)."""
    return _spread_n(spark, sf_dir, name)


class _ArtifactCache(dict):
    """Snapshot-keyed artifact dict that EVICTS superseded snapshots on
    insert: a testdata regeneration changes the (mtime, size) part of
    the key, and without eviction the old entry's checkpointed blocks
    (linear in corpus size for shingle/pair relations) stay pinned in
    executor storage for the session lifetime. Identity = the key with
    mtime/size stripped, so one entry per (sf_dir, table [, ...])
    survives. Dropping the reference lets Spark's ContextCleaner
    unpersist the orphaned checkpoint blocks.

    ``on_evict``: optional callable invoked with each superseded
    entry's VALUE — for artifacts that own resources the garbage
    collector cannot reclaim (e.g. the timer replay's on-disk source
    dirs), the hook is where they are released. Hook errors are
    swallowed: eviction is best-effort cleanup, never a query failure.

    CONSUMER CONTRACT (r16 advice): for tagged caches whose hook
    deletes on-disk state, eviction (clear() or a snapshot
    regeneration) invalidates any lazy DataFrame previously returned
    for the evicted entry — its parquet source is gone, and executing
    the stale handle fails with missing files. Consumers must
    re-resolve the artifact through the builder after any
    clear/regeneration, never hold a handle across one; every builder
    in this repo is already re-entrant (cache-miss -> rebuild), so
    "re-resolve" is just calling the builder again.
    """

    on_evict = None

    @staticmethod
    def _identity(key):
        if isinstance(key, tuple) and key and isinstance(key[0], tuple):
            return tuple(_ArtifactCache._identity(k) for k in key)
        if isinstance(key, tuple) and len(key) >= 2:
            return key[:2]
        return key

    def __setitem__(self, key, value):
        ident = self._identity(key)
        for k in [k for k in self if self._identity(k) == ident and k != key]:
            old = dict.pop(self, k)
            if self.on_evict is not None and old is not value:
                try:
                    self.on_evict(old)
                except Exception:  # noqa: BLE001 (cleanup is best-effort)
                    pass
        dict.__setitem__(self, key, value)

    def clear(self):
        if self.on_evict is not None:
            for old in self.values():
                try:
                    self.on_evict(old)
                except Exception:  # noqa: BLE001
                    pass
        dict.clear(self)


def session_artifact_cache(spark: SparkSession, tag: str, on_evict=None) -> dict:
    """Per-session dict for snapshot-keyed derived artifacts.

    ``on_evict`` binds once per tag: a second call site passing a
    DIFFERENT hook for the same tag raises instead of silently
    replacing the first (r16 advice — last-caller-wins would let one
    builder's cleanup discipline be swapped out by an unrelated
    caller), and a call omitting it leaves the bound hook in place.
    """
    attr = f"_mea_cache_{tag}"
    cache = getattr(spark, attr, None)
    if cache is None:
        cache = _ArtifactCache()
        setattr(spark, attr, cache)
    if on_evict is not None:
        if cache.on_evict is not None and cache.on_evict is not on_evict:
            raise ValueError(
                f"artifact cache {tag!r} already has a different on_evict hook"
            )
        cache.on_evict = on_evict
    return cache


def bind_table(spark: SparkSession, sf_dir: str, name: str) -> None:
    """Direct-call cache-poisoning guard for snapshot-keyed builders:
    ensure view ``name`` reflects THIS sf_dir before training/indexing
    reads it, without requiring the full 10-table registration (a
    partial snapshot dir — e.g. an embeddings-only fixture — must
    still work).

    If the session's full view mapping is already bound to sf_dir, the
    views are right (including deliberate test overrides of a single
    view, which leave the tag in place — those keep working). Otherwise
    rebind just this table and DROP the tag: the session now holds a
    mixed mapping, so the next register_views must not skip."""
    if getattr(spark, "_mea_views_sf_dir", None) == sf_dir:
        return
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    spark._mea_views_sf_dir = None  # noqa: SLF001 (mixed mapping: force re-register)


def clear_artifact_caches(spark: SparkSession) -> None:
    """Drop every snapshot-keyed derived artifact (signature indexes,
    ANN buckets, IVF assignments) in this session.

    The snapshot key covers the FILE, not the temp view: a caller that
    overrides the ``documents``/``embeddings`` view (the injection
    tests do, to plant duplicates) would otherwise poison the cache —
    the artifact built from the overridden view stays keyed under the
    untouched file's snapshot and serves wrong answers after the view
    is restored. Every view override must bracket itself with this."""
    for attr in list(vars(spark)):
        if attr.startswith("_mea_cache_"):
            getattr(spark, attr).clear()


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register the test tables as temp views for the SQL surface.

    Idempotent per (session, sf_dir): repeat calls with the same
    sf_dir skip the parquet re-open (file listing + footer read per
    table costs >1s wall for 10 tables, which would otherwise be paid
    by every query build). Switching sf_dir re-registers everything.
    """
    if getattr(spark, "_mea_views_sf_dir", None) == sf_dir:
        return
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    if tuple(names) != TABLES:
        # a subset registration must NOT mark the sf_dir as fully
        # registered — it would turn every later full call into a
        # no-op and leave the remaining views unresolvable (r15 bug:
        # a names=("part",) call broke every lineitem query after it).
        # It must also DROP any existing tag: if the session was fully
        # bound to dir A and this subset rebinds some views to dir B,
        # the mapping is now mixed and a later register_views(spark, A)
        # must not early-return against it (mirrors bind_table).
        spark._mea_views_sf_dir = None  # noqa: SLF001 (mixed mapping)
        return
    spark._mea_views_sf_dir = sf_dir  # noqa: SLF001 (own session tag)
    # base views changed — any fixture views derived from them are stale
    spark._mea_fixtures_sf_dir = None  # noqa: SLF001
    # ...and so is any artifact built while a DIFFERENT view mapping
    # was live. Clearing here makes the common restore idiom
    # (`spark._mea_views_sf_dir = None; register_views(...)`) safe even
    # when the caller forgets clear_artifact_caches; direct
    # createOrReplaceTempView overrides still need the explicit bracket.
    clear_artifact_caches(spark)
