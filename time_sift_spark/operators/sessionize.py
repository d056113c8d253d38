"""Sessionization: segment per-key event streams on inactivity gaps.

Extension operator (SURVEY.md §2.2 "no reference counterpart").  Built
from the engine's own load-bearing primitive: the session boundary is a
lag comparison (gap to previous event > threshold), the session index a
running sum over the same window — two window expressions sharing one
partitioning, one shuffle total.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError


def sessionize(
    df: DataFrame,
    time_col: str,
    gap_seconds: int,
    *,
    partition_by: str | Sequence[str],
    order_extra: str | Sequence[str] | None = None,
) -> DataFrame:
    """Append ``session_seq`` (0-based per-key session index) and
    ``is_session_start`` to ``df``.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_seconds`` (strictly greater), or at the first event.
    """
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order_extra = (
        [] if order_extra is None else [order_extra] if isinstance(order_extra, str) else list(order_extra)
    )
    missing = [c for c in ([time_col] + partition_by + order_extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    w = Window.partitionBy(*partition_by).orderBy(time_col, *order_extra)
    prev_ts = F.lag(F.col(time_col), 1).over(w)
    # integer µs arithmetic — exact, and bit-identical to the DuckDB
    # oracle's epoch_us(); float seconds would round.
    from ._time import assert_time_dtype, ts_us

    assert_time_dtype(df, time_col)
    gap_us = ts_us(F.col(time_col)) - ts_us(prev_ts)
    is_start = F.when(
        prev_ts.isNull() | (gap_us > F.lit(int(gap_seconds) * 1_000_000)), F.lit(1)
    ).otherwise(F.lit(0))
    # running sum of boundary flags = session index (1-based), minus 1
    out = df.withColumn("is_session_start", is_start)
    seq = F.sum("is_session_start").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.lit(1)
    return out.withColumn("session_seq", seq.cast("long"))
