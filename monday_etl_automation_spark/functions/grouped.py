"""Grouped-aggregate pandas UDF surface (SURVEY.md §2.11).

The reference has no UDAF concept (its aggregations A1-A6 are plain
Python loops); every registered aggregate in this engine is a Spark
built-in. This module exposes the GROUPED_AGG escape hatch promised in
§2.11 for aggregations built-ins cannot express — Arrow-vectorized,
one call per (group, partition) with partial aggregation disabled, so
its contract is: use built-ins first, reach for this only when the
aggregation logic genuinely needs Python.

Numeric policy matches the stateful streaming operator
(streaming/pipeline.py): accumulate integer micros, which is exact and
order-insensitive — a float-summing UDAF would drift between pandas'
and the JVM's reduction orders.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from monday_etl_automation_spark.functions.numeric import checked_micros_sum


@F.pandas_udf("long")
def sum_value_micros(v: pd.Series) -> int:
    """Exact sum of floor(value * 1e6) as int64 (GROUPED_AGG: the
    pd.Series -> scalar signature makes Spark treat this as an
    aggregate). np.floor over float64 is element-identical to
    math.floor, and the int64 accumulation is order-insensitive —
    vectorized, not a per-element Python loop."""
    return checked_micros_sum(v.dropna().to_numpy(dtype="float64"))
