"""Gap filling: densify a time series onto a regular grid and fill holes.

Extension operator (SURVEY.md §2.2/§2.4).  The reference assumes dense
index-as-time input (src/lib.rs:445-447); real event data has holes, so
lag features over calendar buckets need densification first.

Composition (all built-ins, two shuffles: the grid aggregation and the
spine join; the ffill window reuses the join's partitioning):

1. per-partition [min, max] time range (cheap agg);
2. spine = explode(sequence(min, max, interval)) — the dense grid;
3. left-join observed buckets onto the spine;
4. forward-fill via ``last(value, ignorenulls=True)`` over the partition
   window (running frame).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

_UNITS = {"hour": "1 hour", "day": "1 day", "minute": "1 minute", "week": "7 days"}


def fill_gaps(
    df: DataFrame,
    time_col: str,
    every: str,
    value_cols: Sequence[str],
    *,
    partition_by: str | Sequence[str],
    strategy: str = "ffill",
) -> DataFrame:
    """Densify ``df`` (already bucketed at ``every`` granularity, unique
    per (partition, bucket)) onto the full per-partition time grid.

    Output: one row per (partition, grid bucket) with ``{v}_filled`` per
    value column plus ``is_gap`` marking synthesized rows.
    """
    if every not in _UNITS:
        raise ValueError(f"every must be one of {sorted(_UNITS)}, got {every!r}")
    if strategy != "ffill":
        raise ValueError(f"only strategy='ffill' is implemented, got {strategy!r}")
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    missing = [c for c in ([time_col, *partition_by, *value_cols]) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    spine = (
        df.groupBy(*partition_by)
        .agg(F.min(time_col).alias("_t0"), F.max(time_col).alias("_t1"))
        .select(
            *partition_by,
            F.explode(
                F.sequence("_t0", "_t1", F.expr(f"INTERVAL {_UNITS[every]}"))
            ).alias(time_col),
        )
    )
    joined = spine.join(df, on=[*partition_by, time_col], how="left")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = joined.select(
        *partition_by,
        time_col,
        F.col(value_cols[0]).isNull().alias("is_gap"),
        *[F.last(v, ignorenulls=True).over(w).alias(f"{v}_filled") for v in value_cols],
    )
    return out


def locf(
    df,
    value_col: str,
    time_col: str,
    *,
    partition_by,
    order_extra=None,
    out_col: str | None = None,
):
    """Last-observation-carried-forward imputation: replace NULLs in
    ``value_col`` with the most recent non-NULL value of the same
    series — the standard sensor-stream repair next to
    :func:`fill_gaps` (which fills missing ROWS; this fills missing
    VALUES on existing rows).

    One keyed window pass (``last(..., ignorenulls=True)`` over ROWS
    UNBOUNDED PRECEDING): the same single-Exchange shape as every lag/
    rolling operator; leading NULLs (nothing to carry) stay NULL.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    extra = (
        [] if order_extra is None
        else [order_extra] if isinstance(order_extra, str)
        else list(order_extra)
    )
    missing = [c for c in (value_col, time_col, *parts, *extra) if c not in df.columns]
    if missing:
        from ..errors import ColumnNotFoundError

        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    w = (
        Window.partitionBy(*parts)
        .orderBy(time_col, *extra)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        out_col or f"{value_col}_filled",
        F.last(value_col, ignorenulls=True).over(w),
    )
