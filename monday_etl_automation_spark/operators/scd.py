"""SCD Type-2: versioned dimension history (valid_from / valid_to).

The reference mutates Monday cells in place (S12/S13 —
change_status_simple overwrites the old value, Leyton_depot.py:594-613);
a warehouse keeps the history instead: each key holds a chain of
versions with [valid_from, valid_to) intervals and one open (current)
row. Two operators:

- `scd2_from_changelog` — build the versioned dimension from a change
  log in one pass: collapse no-op changes (same attributes as the
  previous version), then `lead()` per key closes each interval. One
  shuffle on the key; at 100 TB this is the same cost as any keyed
  window.
- `scd2_merge` — apply a new batch of changes incrementally: ONLY the
  keys present in the batch have their chains rebuilt (semi-join
  selects them, anti-join passes the rest through untouched), so
  per-batch work is O(touched keys' history), not O(dimension) — the
  same touched-partition principle as StatusUpsertSink
  (`streaming/pipeline.py`). Merge is associative with the builder:
  merge(build(log1), log2) == build(log1 ∪ log2) for ARBITRARY
  batches — including retroactive events that land between two
  previously-collapsed duplicate events — pinned by tests/test_scd.py
  (median split + retro-insert).

Output contract: (key, attrs..., valid_from, valid_to, is_current,
_event_ts) with valid_to NULL on the open version (driver-safe
types). ``_event_ts`` is internal bookkeeping: the sorted timestamps
of every change event collapsed into the version (no-op collapse is
otherwise lossy — a retro batch event landing between two collapsed
duplicates would lose the reversion version on rebuild). Serving
queries drop it; its size is bounded by the key's duplicate-event
count, and only touched keys ever re-explode it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame, key: str, attrs: list[str], ts: str
) -> DataFrame:
    """Versioned dimension from a (key, attrs..., ts) change log.

    Consecutive duplicate states collapse (a change event that sets
    the same attributes extends the current version instead of opening
    a redundant one), but their timestamps are RETAINED in
    ``_event_ts`` so an incremental merge can replay the exact event
    history for touched keys. Ties on (key, ts) are broken by the
    attribute tuple so the result is deterministic under any input
    order.

    One shuffle on the key: the version-id running sum, the per-version
    group-by, and the interval-closing lead all share the key
    partitioning (grouping on (key, _vid) is co-located by key).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), *[F.col(a).asc() for a in attrs])
    state = F.struct(*[F.col(a) for a in attrs])
    # version id = running count of state changes per key; rows sharing
    # a _vid are the collapsed duplicates of one version
    flagged = (
        changes.select(key, *attrs, ts)
        .withColumn("_prev_state", F.lag(state).over(w))
        .withColumn(
            "_new",
            (F.col("_prev_state").isNull() | (F.col("_prev_state") != state)).cast("int"),
        )
        .withColumn("_vid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    versioned = flagged.groupBy(key, "_vid").agg(
        *[F.first(a).alias(a) for a in attrs],
        F.min(ts).alias("valid_from"),
        F.sort_array(F.collect_list(ts)).alias("_event_ts"),
    )
    w2 = Window.partitionBy(key).orderBy(F.col("valid_from").asc(), *[F.col(a).asc() for a in attrs])
    return (
        versioned.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_vid")
        .select(key, *attrs, "valid_from", "valid_to", "is_current", "_event_ts")
    )


def scd2_merge(
    dim: DataFrame, batch: DataFrame, key: str, attrs: list[str], ts: str
) -> DataFrame:
    """Incrementally apply ``batch`` (a change log) to an existing SCD2
    dimension: untouched keys pass through with zero work; touched
    keys' histories are rebuilt from (their replayed event history ∪
    the batch). Equivalent to rebuilding from the full concatenated
    log for ARBITRARY batches — retroactive events included — because
    ``_event_ts`` replays every collapsed duplicate event, not just
    version starts (a valid_from-only replay loses the reversion when
    a retro event lands between two collapsed duplicates).

    Dimensions built before ``_event_ts`` existed degrade gracefully:
    their versions replay as single events at valid_from, which is
    exact for append-only (non-retroactive) batches only."""
    touched = batch.select(key).distinct()
    if "_event_ts" not in dim.columns:
        dim = dim.withColumn("_event_ts", F.array(F.col("valid_from")))
    untouched = dim.join(touched, key, "left_anti")
    affected_as_log = (
        dim.join(touched, key, "left_semi")
        .select(key, *attrs, F.explode("_event_ts").alias(ts))
    )
    rebuilt = scd2_from_changelog(
        affected_as_log.unionByName(batch.select(key, *attrs, ts)), key, attrs, ts
    )
    return untouched.unionByName(rebuilt)


def scd2_as_of(dim: DataFrame, key: str, at) -> DataFrame:
    """Point-in-time view: the version of each key valid at ``at``
    (a timestamp literal/column). Interval containment on the chain —
    with the dimension partitioned/bucketed by key this is a pruned
    scan, never a window."""
    at_col = F.lit(at) if not hasattr(at, "_jc") else at
    return dim.where(
        (F.col("valid_from") <= at_col)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > at_col))
    )
