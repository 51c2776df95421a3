"""Grouped-map operator surface: ``applyInPandas`` (SURVEY.md §2.11).

Per-group pandas computation for logic that needs the WHOLE group in
one frame — the shape for per-entity sequence features a 100 TB
training-data pipeline computes (session gap statistics, per-user
orderings, windowed sequence encodings). One shuffle on the group key;
each group materializes as a pandas DataFrame in an Arrow batch, so
groups must fit in executor memory (the same bound the stateful
operator carries).

Numeric policy: gaps are integer microseconds (exact, engine-neutral);
the only float output is one-shot division (mean), matching the
repo-wide oracle-exactness rules.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, n_gaps BIGINT, min_gap_us BIGINT, "
    "max_gap_us BIGINT, mean_gap_us DOUBLE"
)


def user_gap_stats(events: DataFrame) -> DataFrame:
    """Per-user inter-event gap statistics via ``applyInPandas``.

    Equivalent SQL uses lag() + aggregation (the test oracle does
    exactly that); the grouped-map form is the template for group
    logic SQL cannot express (sequence models, per-entity decoding).

    Parallelism: the pre-shuffle on the group key is EXPLICIT
    (repartition to defaultParallelism) because AQE's size-based
    partition coalescing sees only shuffle bytes, not Python compute —
    on a small-bytes/many-groups input it collapses the exchange to
    one partition and serializes every group through a single Python
    worker (measured 3.9s -> 1.25s at sf0.1). At 100 TB the same rule
    holds: size a Python grouped stage by CPU, never by bytes.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # r18 (guide §4.2): raw numpy instead of four pandas
        # temporaries per group — the function runs once PER GROUP, so
        # its constant factors multiply by |users|. datetime64[ns] at
        # parquet's microsecond precision makes ns//1000 integer math
        # exactly the old round(total_seconds()*1e6) value.
        import numpy as np

        ts_ns = np.sort(pdf["ts"].to_numpy(dtype="datetime64[ns]").view("int64"))
        gaps_us = np.diff(ts_ns) // 1000
        n = gaps_us.size
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "n_gaps": [n],
                "min_gap_us": [int(gaps_us.min()) if n else None],
                "max_gap_us": [int(gaps_us.max()) if n else None],
                "mean_gap_us": [float(gaps_us.sum()) / n if n else None],
            }
        )

    cpus = events.sparkSession.sparkContext.defaultParallelism
    return (
        events.select("user_id", "ts")
        .repartition(cpus, "user_id")
        .groupBy("user_id")
        .applyInPandas(stats, _OUT_SCHEMA)
    )
