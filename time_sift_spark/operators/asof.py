"""As-of join: for each left row, the most recent right row at or before it.

Spark has no native as-of join (SURVEY.md §2.2).  The scalable
composition used here is the union+window technique:

1. project both sides to a common shape, tagged with a side marker;
2. union (no shuffle yet — union is partition-concat);
3. ONE window over (key, time): ``last(right_payload, ignorenulls=True)``
   carries the latest right row forward onto every subsequent row;
4. keep only left rows.

Cost: a single Exchange on the join key — same as the equi-join shuffle a
sort-merge join would need, but with no range cross-product and no skew
amplification: each key's rows are processed in one sorted pass.  This is
the standard large-scale formulation (a point-in-time join); a broadcast
variant is unnecessary because the union path is already one shuffle.

Tie semantics: ``direction='backward'`` matches right_time <= left_time
(inclusive), like ``pd.merge_asof``.  Within equal timestamps the right
row sorts first (side marker), so an exactly-simultaneous right row IS
visible to the left row — deterministic.

Caveat: if the right side carries SEVERAL rows at the same (key, time),
which of them wins is ordering-dependent in the union+window form (and
max-payload in the lookup form) — dedupe the right side to one row per
(key, time) first for fully deterministic results.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join — backward (default), forward, or nearest; all
    inclusive.

    Every ``left`` row gains ``{c}{suffix}`` for each c in ``right_cols``:
    ``direction="backward"`` takes the most recent right row with
    ``right_time <= left_time``; ``direction="forward"`` the earliest
    right row with ``right_time >= left_time`` (NULLs where none exists);
    ``direction="nearest"`` whichever of the two is closer in time
    (tie → backward — pandas ``merge_asof`` semantics).  Backward and
    forward are the SAME one-Exchange union+window plan — forward flips
    the tie ordering and the frame side, nothing else; nearest runs both
    carries over one Exchange and resolves per row.

    ``tolerance_us`` bounds the match's staleness (pandas
    ``merge_asof(tolerance=...)`` semantics): a matched right row farther
    than that many microseconds from the left row is discarded — the
    payload columns fall back to NULL, never to an older/newer row.
    Requires timestamp time columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    if direction == "nearest":
        # the gap comparison needs real time arithmetic
        from ._time import assert_time_dtype

        assert_time_dtype(left, left_time)
        assert_time_dtype(right, right_time)
    if tolerance_us is not None:
        if tolerance_us < 0:
            raise ValueError(f"tolerance_us must be non-negative, got {tolerance_us}")
        from ._time import assert_time_dtype

        assert_time_dtype(left, left_time)
        assert_time_dtype(right, right_time)
    on = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols)
    for c in on + [left_time]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in on + [right_time, *right_cols]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")

    payload = [f"{c}{suffix}" for c in right_cols]
    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_cols, payload)],
        F.col(left_time).alias("_asof_t"),
    )
    right_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left.columns],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        F.col(right_time).alias("_asof_t"),
    )
    unioned = left_tagged.unionByName(right_tagged)

    if direction == "nearest":
        return _finish_nearest(
            unioned, on, left_time, payload, suffix, tolerance_us
        )

    # one shuffle: partition by key, order by (time, side). Backward:
    # side=0 (right) sorts before side=1 (left) at equal times and
    # last() looks over the PRECEDING frame — a same-instant right row is
    # visible. Forward mirrors it: right sorts after left at ties and
    # first() looks over the FOLLOWING frame.
    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy("_asof_t", "_side")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_asof_t").asc(), F.col("_side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    # The matched right ROW rides the window as ONE struct — (its time,
    # its payload values) — so the value returned and the timestamp the
    # tolerance test uses always come from the SAME row, even when that
    # row's payload is NULL.  (Per-column last(p, ignorenulls=True)
    # carries would silently substitute an older non-NULL value under a
    # newer row's timestamp — diverging from pandas merge_asof / DuckDB
    # ASOF, which match the most recent right ROW, nulls included.)
    entry = F.when(
        F.col("_side") == 0,
        F.struct(F.col("_asof_t").alias("_t"), *[F.col(p).alias(p) for p in payload]),
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        pick(entry, ignorenulls=True).over(w).alias("_m"),
    )
    out = carried.where(F.col("_side") == 1)
    m = F.col("_m")
    if tolerance_us is not None:
        from ._time import ts_us

        gap = (
            ts_us(left_time) - ts_us(m["_t"])
            if direction == "backward"
            else ts_us(m["_t"]) - ts_us(left_time)
        )
        ok = m.isNotNull() & (gap <= F.lit(tolerance_us))
        picked = [F.when(ok, m[p]).alias(p) for p in payload]
    else:
        picked = [m[p].alias(p) for p in payload]
    keep = [c for c in out.columns if c not in ("_side", "_asof_t", "_m")]
    return out.select(*keep, *picked)


def _finish_nearest(
    unioned: DataFrame,
    on: Sequence[str],
    left_time: str,
    payload: Sequence[str],
    suffix: str,
    tolerance_us: int | None,
) -> DataFrame:
    """Nearest-direction resolution (pandas ``merge_asof
    direction='nearest'``): BOTH the backward and the forward carry run
    over the same tagged union — two WindowExecs sharing ONE Exchange
    (same partition key, opposite tie/frames) — then each left row keeps
    whichever match is closer in time (tie → backward, matching pandas).
    ``tolerance_us`` bounds each direction's gap before the choice."""
    from ._time import ts_us

    wb = (
        Window.partitionBy(*on)
        .orderBy("_asof_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_t").asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # One struct per right row — (µs time, payload values) — carried by
    # both directions, so each direction's gap and its returned values
    # come from the SAME right row even when that row's payload is NULL.
    entry = F.when(
        F.col("_side") == 0,
        F.struct(ts_us("_asof_t").alias("_t"), *[F.col(p).alias(p) for p in payload]),
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        F.last(entry, ignorenulls=True).over(wb).alias("_b"),
        F.first(entry, ignorenulls=True).over(wf).alias("_f"),
    )
    out = carried.where(F.col("_side") == 1)
    b, f_ = F.col("_b"), F.col("_f")
    bgap = ts_us(left_time) - b["_t"]
    fgap = f_["_t"] - ts_us(left_time)
    b_ok = b.isNotNull()
    f_ok = f_.isNotNull()
    if tolerance_us is not None:
        b_ok = b_ok & (bgap <= F.lit(tolerance_us))
        f_ok = f_ok & (fgap <= F.lit(tolerance_us))
    use_b = b_ok & (~f_ok | (bgap <= fgap))
    picked = [
        F.when(use_b, b[p]).when(f_ok, f_[p]).alias(p) for p in payload
    ]
    keep = [c for c in out.columns if c not in ("_side", "_asof_t", "_b", "_f")]
    return out.select(*keep, *picked)


def fits_broadcast(df: DataFrame, max_rows: int) -> bool:
    """Row-bounded existence probe: scans until ``max_rows + 1`` rows are
    found, never the full table — the cheap pre-flight check the
    broadcast-lookup strategies use before committing to a plan that
    collects the right side to every executor."""
    return len(df.limit(max_rows + 1).take(max_rows + 1)) <= max_rows


def asof_join_lookup(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    max_broadcast_rows: int | None = 1_000_000,
) -> DataFrame:
    """Broadcast-lookup as-of join — same semantics as :func:`asof_join`,
    different physical strategy for a SMALL right side.

    The right side collapses to one row per key holding its time-sorted
    (time, payload…) structs; that tiny table broadcasts, and each left
    row picks the last struct with time <= left_time from the array — a
    per-row binary-search-like probe with ZERO shuffles on the left
    (fact) side.  Choose this when right fits in a broadcast; the
    union+window form when both sides are large.

    GUARDRAIL: the small-right assumption is verified, not trusted — if
    the right side exceeds ``max_broadcast_rows`` (row-bounded probe, no
    full scan), the call degrades gracefully to the one-Exchange
    union+window plan (:func:`asof_join`) with a warning, instead of
    OOM-ing executors on a collected broadcast at 100× the expected
    size.  ``max_broadcast_rows=None`` skips the probe for callers that
    have already sized the dimension.  The row bound is deliberately
    conservative vs Spark's ~8 GB broadcast ceiling: the collected
    struct arrays amplify per-row footprint.
    """
    if max_broadcast_rows is not None and not fits_broadcast(right, max_broadcast_rows):
        import warnings

        warnings.warn(
            f"asof_join_lookup: right side exceeds {max_broadcast_rows} rows; "
            "falling back to the union+window as-of plan",
            stacklevel=2,
        )
        return asof_join(
            left, right, on=on, left_time=left_time, right_time=right_time,
            right_cols=right_cols, suffix=suffix, direction="backward",
        )
    on = [on] if isinstance(on, str) else list(on)
    right_cols = list(right_cols)
    for c in on + [left_time]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in on + [right_time, *right_cols]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")

    entry = F.struct(F.col(right_time).alias("_t"), *[F.col(c).alias(c) for c in right_cols])
    lookup = right.groupBy(*on).agg(F.sort_array(F.collect_list(entry)).alias("_asof_arr"))

    joined = left.join(F.broadcast(lookup), on=on, how="left")
    hits = F.filter(F.col("_asof_arr"), lambda s: s["_t"] <= F.col(left_time))
    best = F.when(F.size(hits) > 0, F.element_at(hits, F.size(hits)))
    out_cols = [
        best[c].alias(f"{c}{suffix}") for c in right_cols
    ]
    return joined.select(*left.columns, *out_cols)


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
    broadcast_threshold_rows: int = 1_000_000,
) -> DataFrame:
    """Strategy-picking as-of join — the ONE entry point callers should
    use when they have not already sized the right side.

    Picks the broadcast-lookup plan (:func:`asof_join_lookup` — zero
    fact-side shuffles) when the right side proves small with the
    row-bounded :func:`fits_broadcast` probe AND the semantics are the
    lookup form's (backward, no tolerance); otherwise the one-Exchange
    union+window plan (:func:`asof_join`).  The probe never scans past
    ``broadcast_threshold_rows + 1`` rows, so the decision costs one
    bounded job — cheap insurance against the two failure modes of a
    hand-picked strategy: broadcasting past the ~8 GB cliff (executor
    OOM) and shuffling a fact table against a 100-row dimension.  The
    default threshold is deliberately conservative vs the broadcast
    ceiling because the collected struct arrays amplify per-row
    footprint (same reasoning as :func:`asof_join_lookup`)."""
    if (
        direction == "backward"
        and tolerance_us is None
        and fits_broadcast(right, broadcast_threshold_rows)
    ):
        return asof_join_lookup(
            left, right, on=on, left_time=left_time, right_time=right_time,
            right_cols=right_cols, suffix=suffix, max_broadcast_rows=None,
        )
    return asof_join(
        left, right, on=on, left_time=left_time, right_time=right_time,
        right_cols=right_cols, suffix=suffix, direction=direction,
        tolerance_us=tolerance_us,
    )


def asof_interpolate(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    value_col: str,
    out_col: str | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Linear time-interpolation join: each left row gets the right
    series' value LINEARLY INTERPOLATED between its bracketing
    observations — the sensor-fusion / irregular-to-aligned resampling
    primitive (pandas ``merge_asof`` + ``interpolate`` in one pass).

        v(t) = v_b + (v_f - v_b) · (t - t_b) / (t_f - t_b)

    Exactly on an observation (t_b = t) the observed value is returned;
    with only one side available the series extends flat (backward or
    forward carry); with no observations NULL.  Same physical shape as
    the nearest as-of: ONE Exchange on the key, backward + forward
    carries as two WindowExecs, then a scalar projection.  The weight is
    a ratio of exact microsecond integers (IEEE division — engine-
    reproducible); the result is rounded with the shared pure-double
    rounding (operators/_num.round_double).
    """
    from ._num import round_double
    from ._time import assert_time_dtype, ts_us

    on = [on] if isinstance(on, str) else list(on)
    for c in on + [left_time]:
        if c not in left.columns:
            raise ColumnNotFoundError(f"left column {c!r} not in {left.columns}")
    for c in on + [right_time, value_col]:
        if c not in right.columns:
            raise ColumnNotFoundError(f"right column {c!r} not in {right.columns}")
    assert_time_dtype(left, left_time)
    assert_time_dtype(right, right_time)
    out_col = out_col or f"{value_col}_interp"

    # A NULL observation is NO observation: drop it before the union so
    # the backward/forward value and time carries are guaranteed to land
    # on the same right row (otherwise last(_v, ignorenulls) could skip
    # a NULL-valued row whose time last(_rt_us) still reports, and the
    # interpolation weights would come from a different row than the
    # values being interpolated).
    right = right.where(F.col(value_col).isNotNull())

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("_v"),
        F.col(left_time).alias("_asof_t"),
    )
    right_tagged = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in on
            else F.col(c)
            for c in left.columns
        ],
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_v"),
        F.col(right_time).alias("_asof_t"),
    )
    unioned = left_tagged.unionByName(right_tagged).withColumn(
        "_rt_us", F.when(F.col("_side") == 0, ts_us("_asof_t"))
    )
    wb = (
        Window.partitionBy(*on)
        .orderBy("_asof_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*on)
        .orderBy(F.col("_asof_t").asc(), F.col("_side").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    carried = unioned.select(
        *[c for c in unioned.columns if c not in ("_v", "_rt_us")],
        F.last("_v", ignorenulls=True).over(wb).alias("_bv"),
        F.first("_v", ignorenulls=True).over(wf).alias("_fv"),
        F.last("_rt_us", ignorenulls=True).over(wb).alias("_bt"),
        F.first("_rt_us", ignorenulls=True).over(wf).alias("_ft"),
    )
    out = carried.where(F.col("_side") == 1)
    from ._time import ts_us_sql

    interp = (
        f"(_bv + (_fv - _bv) * (CAST(({ts_us_sql(left_time)}) - _bt AS DOUBLE) "
        "/ CAST(_ft - _bt AS DOUBLE)))"
    )
    est = (
        F.when(F.col("_bt").isNull() & F.col("_ft").isNull(), F.lit(None))
        .when(F.col("_bt").isNull(), F.col("_fv"))
        .when(F.col("_ft").isNull() | (F.col("_ft") == F.col("_bt")), F.col("_bv"))
        .otherwise(F.expr(round_double(interp, round_to)))
    )
    keep = [c for c in out.columns if c not in ("_side", "_asof_t", "_bv", "_fv", "_bt", "_ft")]
    return out.select(*keep, est.alias(out_col))
