"""Resample / downsample: time-bucketed aggregation.

Extension operator (SURVEY.md §2.2).  Pure groupBy over a truncated time
column → partial (map-side) aggregation before the single shuffle; at
100 TB this is the cheapest possible shape because combiners collapse
each bucket locally first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

_TRUNC_UNITS = {"year", "quarter", "month", "week", "day", "hour", "minute", "second"}


def resample(
    df: DataFrame,
    time_col: str,
    every: str,
    aggs: dict[str, tuple[str, str]],
    *,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate into calendar buckets.

    Parameters
    ----------
    every
        A date_trunc unit: 'hour', 'day', 'week', ...
    aggs
        ``{output_name: (stat, column)}`` with stat in
        sum/avg/min/max/count/count_distinct. Every output is aliased to
        ``output_name`` (oracle naming contract).
    """
    if every not in _TRUNC_UNITS:
        raise ValueError(f"every must be one of {sorted(_TRUNC_UNITS)}, got {every!r}")
    partition_by = (
        [] if partition_by is None else [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    needed = [time_col, *partition_by, *[c for _, c in aggs.values()]]
    missing = [c for c in needed if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    stat_fns = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "count_distinct": F.countDistinct,
    }
    agg_exprs = []
    for name, (stat, col) in aggs.items():
        if stat not in stat_fns:
            raise ValueError(f"unknown stat {stat!r}; supported: {sorted(stat_fns)}")
        agg_exprs.append(stat_fns[stat](F.col(col)).alias(name))

    bucket = F.date_trunc(every, F.col(time_col)).alias("bucket")
    return df.groupBy(*partition_by, bucket).agg(*agg_exprs)
