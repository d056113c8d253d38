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


def hopping_window_agg(
    df: DataFrame,
    time_col: str,
    window: str,
    hop: str,
    aggs: dict[str, tuple[str, str]],
    *,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Overlapping (hopping/sliding) window aggregation in BATCH.

    ``F.window(t, window, hop)`` assigns each row to the window/hop
    overlapping slots (epoch-aligned, same semantics as the streaming
    windowed aggregations in streaming/), then one groupBy per slot —
    the row-explosion factor is window/hop, priced explicitly by the
    caller.  Output carries ``window_start`` / ``window_end``.

    Plan: Explode(window slots) -> partial agg -> ONE exchange on
    (keys, window) — identical scale shape to resample, ×(window/hop)
    input rows.
    """
    from ._time import assert_time_dtype

    parts = (
        [] if partition_by is None
        else [partition_by] if isinstance(partition_by, str)
        else list(partition_by)
    )
    missing = [c for c in (time_col, *parts) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    assert_time_dtype(df, time_col)
    stat_fns = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "count_distinct": F.countDistinct,
    }
    agg_cols = []
    for name, (stat, col) in aggs.items():
        if stat not in stat_fns:
            raise ValueError(f"unknown stat {stat!r}; supported: {sorted(stat_fns)}")
        agg_cols.append(stat_fns[stat](F.col(col)).alias(name))
    win = F.window(F.col(time_col).cast("timestamp"), window, hop)
    return (
        df.groupBy(*parts, win.alias("_w"))
        .agg(*agg_cols)
        .select(
            *parts,
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *[F.col(name) for name in aggs],
        )
    )
