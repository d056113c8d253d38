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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    left_cols: Sequence[str],
    right_cols: Sequence[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval × interval OVERLAP join: pair rows whose [start, end]
    ranges intersect (``a.start ≤ b.end AND b.start ≤ a.end``) on the
    same key — the two-sided generalization of :func:`interval_join`
    (point within ±tolerance), covering session-vs-incident,
    campaign-vs-outage, shift-vs-event alignment.

    Blocking: BOTH sides explode each interval into the time buckets it
    covers (``sequence(start div W, end div W)``); overlapping
    intervals share at least one bucket, so candidates come from a
    plain (keys…, bucket) equi-join; a pair sharing k buckets is
    produced k times and deduplicated by the identifying columns
    (dropDuplicates on keys + payloads — ``left_cols``/``right_cols``
    MUST identify their rows, e.g. include the row id); the exact
    overlap predicate filters residuals.

    Cost: Σ(interval length / W) exploded rows per side — pick
    ``bucket_seconds`` near the typical interval length so each
    interval lands in O(1) buckets; a mega-interval (one row spanning
    the whole calendar) explodes to calendar/W rows — cap or split such
    outliers upstream, the usual skew answer.  Output adds
    ``overlap_us`` = min(ends) − max(starts) in µs (≥ 0; 0 for
    instant-touch overlaps).
    """
    on = [on] if isinstance(on, str) else list(on)
    for c in [*on, left_start, left_end, *left_cols]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in [*on, right_start, right_end, *right_cols]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")
    if not left_cols or not right_cols:
        raise ValueError("left_cols/right_cols must identify their rows "
                         "(the k-bucket dedup key) — pass at least the row id")
    for t, a, b in ((left, left_start, left_end), (right, right_start, right_end)):
        assert_time_dtype(t, a)
        assert_time_dtype(t, b)
    w_us = int(bucket_seconds) * 1_000_000

    def _explode(df, start, end, cols, pfx):
        return df.select(
            *on,
            *[F.col(c).alias(f"{pfx}_{c}") for c in cols],
            ts_us(F.col(start)).alias(f"_{pfx}_s"),
            ts_us(F.col(end)).alias(f"_{pfx}_e"),
            F.explode(
                F.expr(
                    f"sequence({ts_us_sql(start)} div {w_us}, "
                    f"{ts_us_sql(end)} div {w_us})"
                )
            ).alias("_bucket"),
        )

    lb = _explode(left, left_start, left_end, left_cols, "l")
    rb = _explode(right, right_start, right_end, right_cols, "r")
    joined = lb.join(rb, on=[*on, "_bucket"]).where(
        (F.col("_l_s") <= F.col("_r_e")) & (F.col("_r_s") <= F.col("_l_e"))
    )
    out_cols = [*on, *[f"l_{c}" for c in left_cols], *[f"r_{c}" for c in right_cols]]
    return (
        joined.select(
            *out_cols,
            (F.least("_l_e", "_r_e") - F.greatest("_l_s", "_r_s")).alias("overlap_us"),
        )
        .dropDuplicates(out_cols)
    )
