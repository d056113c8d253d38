"""Interval (range) join: pair rows whose timestamps lie within ±tolerance.

Spark has no native band/range join (SURVEY.md §2.2; the common OLAP
pattern list calls this out).  A naive inequality join degenerates to a
per-key cross product; the scalable composition is TIME-BUCKET BLOCKING:

1. bucket both sides at ``tolerance`` granularity (integer µs div);
2. explode the LEFT side into its bucket and both neighbors — any right
   row within ±tolerance must land in one of those three buckets;
3. equi-join on (keys…, bucket) — a plain shuffled hash join;
4. filter the exact |Δt| ≤ tolerance predicate.

Each true pair is produced exactly once (a right row has one bucket; the
left row emits that bucket exactly once).  Cost scales with genuine
match density, not with per-key row-count squared.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._time import assert_time_dtype, ts_us, ts_us_sql
from ..errors import ColumnNotFoundError


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    tolerance_seconds: int,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
) -> DataFrame:
    """Inner join of rows within ±tolerance on their time columns.

    Output: ``on`` keys, the requested left/right columns, and
    ``delta_us`` = right_time − left_time in µs (signed).
    """
    on = [on] if isinstance(on, str) else list(on)
    for c in [*on, left_time, *left_cols]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in [*on, right_time, *right_cols]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")

    assert_time_dtype(left, left_time)
    assert_time_dtype(right, right_time)
    tol_us = int(tolerance_seconds) * 1_000_000
    l_us = ts_us(F.col(left_time))
    r_us = ts_us(F.col(right_time))

    lb = left.select(
        *on,
        *[F.col(c).alias(f"l_{c}") for c in left_cols],
        l_us.alias("_l_us"),
        F.explode(
            F.array(
                F.expr(f"{ts_us_sql(left_time)} div {tol_us} - 1"),
                F.expr(f"{ts_us_sql(left_time)} div {tol_us}"),
                F.expr(f"{ts_us_sql(left_time)} div {tol_us} + 1"),
            )
        ).alias("_bucket"),
    )
    rb = right.select(
        *on,
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        r_us.alias("_r_us"),
        F.expr(f"{ts_us_sql(right_time)} div {tol_us}").alias("_bucket"),
    )
    joined = lb.join(rb, on=[*on, "_bucket"]).where(
        F.abs(F.col("_r_us") - F.col("_l_us")) <= tol_us
    )
    return joined.select(
        *on,
        *[f"l_{c}" for c in left_cols],
        *[f"r_{c}" for c in right_cols],
        (F.col("_r_us") - F.col("_l_us")).alias("delta_us"),
    )

def interval_join_lookup(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    tolerance_seconds: int,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    max_broadcast_rows: int | None = 1_000_000,
) -> DataFrame:
    """Broadcast-lookup interval join — same output contract as
    :func:`interval_join`, different physical strategy for a SMALL right
    side (the asof_join_lookup pattern applied to a band predicate).

    The right side collapses to one time-sorted struct-array row per key
    and broadcasts; each left (fact) row filters its key's array to the
    ±tolerance band and explodes the hits — ZERO shuffles on the fact
    side. Choose this when the right side fits a broadcast (~8 GB hard
    limit); the bucket-blocked :func:`interval_join` when both sides are
    large.

    GUARDRAIL: the small-right assumption is verified with a row-bounded
    probe (``fits_broadcast`` — never a full scan); past
    ``max_broadcast_rows`` the call degrades to the bucket-blocked
    :func:`interval_join` with a warning instead of collecting an
    oversized broadcast. ``None`` skips the probe.
    """
    if max_broadcast_rows is not None:
        from .asof import fits_broadcast

        if not fits_broadcast(right, max_broadcast_rows):
            import warnings

            warnings.warn(
                f"interval_join_lookup: right side exceeds {max_broadcast_rows} "
                "rows; falling back to the bucket-blocked interval join",
                stacklevel=2,
            )
            return interval_join(
                left, right, on=on, left_time=left_time, right_time=right_time,
                tolerance_seconds=tolerance_seconds,
                left_cols=left_cols, right_cols=right_cols,
            )
    on = [on] if isinstance(on, str) else list(on)
    left_cols, right_cols = list(left_cols), list(right_cols)
    for c in [*on, left_time, *left_cols]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in [*on, right_time, *right_cols]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")

    assert_time_dtype(left, left_time)
    assert_time_dtype(right, right_time)
    tol_us = int(tolerance_seconds) * 1_000_000
    entry = F.struct(
        ts_us(F.col(right_time)).alias("_t"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    lookup = right.groupBy(*on).agg(F.sort_array(F.collect_list(entry)).alias("_arr"))

    joined = left.select(
        *on, *[F.col(c).alias(f"l_{c}") for c in left_cols],
        ts_us(F.col(left_time)).alias("_l_us"),
    ).join(F.broadcast(lookup), on=on, how="inner")
    hits = F.filter(
        F.col("_arr"), lambda s: F.abs(s["_t"] - F.col("_l_us")) <= F.lit(tol_us)
    )
    exploded = joined.select(
        *on, *[f"l_{c}" for c in left_cols], "_l_us", F.explode(hits).alias("_hit")
    )
    return exploded.select(
        *on,
        *[f"l_{c}" for c in left_cols],
        *[F.col("_hit")[c].alias(f"r_{c}") for c in right_cols],
        (F.col("_hit")["_t"] - F.col("_l_us")).alias("delta_us"),
    )


def interval_join_auto(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    tolerance_seconds: int,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Strategy-picking interval join — the ONE entry point for callers
    who have not already sized the right side (mirror of
    operators/asof.asof_join_auto).  A row-bounded probe decides: right
    side proven small → broadcast-lookup plan (zero fact-side shuffles);
    otherwise the bucket-blocked equi-join plan.  Neither failure mode
    of a hand-picked strategy — broadcasting past the ~8 GB cliff, or
    shuffling a fact table against a tiny dimension — can then be
    picked by accident."""
    from .asof import fits_broadcast

    if fits_broadcast(right, broadcast_threshold_rows):
        return interval_join_lookup(
            left, right, on=on, left_time=left_time, right_time=right_time,
            tolerance_seconds=tolerance_seconds,
            left_cols=left_cols, right_cols=right_cols, max_broadcast_rows=None,
        )
    return interval_join(
        left, right, on=on, left_time=left_time, right_time=right_time,
        tolerance_seconds=tolerance_seconds,
        left_cols=left_cols, right_cols=right_cols,
    )
