"""Numeric accumulation helpers shared by the batch UDAF
(functions/grouped.py) and the stateful streaming operator
(streaming/pipeline.py).

Deliberately imports NO pyspark: the streaming operator imports this
inside an executor-side closure, where modules that define pandas_udfs
at import time cannot load (no active SparkSession on the worker).
"""

from __future__ import annotations

import numpy as np


def checked_micros_sum(vals: np.ndarray) -> int:
    """Sum floor(v * 1e6) as int64 with a loud overflow guard.

    int64 accumulation wraps silently in numpy; the magnitude bound
    |max| * 1e6 * n < 2^62 is conservative (one spare bit) and costs
    one vectorized max — when it ever trips, fail like an
    arbitrary-precision Python sum would have at the Arrow boundary,
    instead of corrupting the total (ADVICE r5)."""
    if vals.size:
        bound = float(np.abs(vals).max()) * 1_000_000.0 * vals.size
        if bound >= float(2**62):
            raise OverflowError(
                f"micros sum may exceed int64 (|max|*1e6*n = {bound:.3g}); "
                "switch to a dtype=object sum"
            )
    return int(np.floor(vals * 1_000_000).astype("int64").sum())
