"""Rolling (trailing-window) statistics over time series.

Extension operator (no reference counterpart — the reference's only
window primitive is the lag shift, SURVEY.md §2.2).  Same execution shape
as the lag plan: every stat for every window size shares ONE window
partitioning+ordering, so Catalyst plans a single Exchange+Sort and
WindowExec evaluates all frames in one pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._time import assert_time_dtype, ts_us
from ..errors import ColumnNotFoundError, InvalidLagsError

_STATS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev_samp,
}


def rolling_features(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    window_sizes: Sequence[int],
    *,
    stats: Sequence[str] = ("mean", "min", "max"),
    partition_by: str | Sequence[str] | None = None,
    order_extra: str | Sequence[str] | None = None,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Trailing ROWS-frame statistics: for each window size n, stat over
    the current row and the n-1 preceding rows within the series.

    Output column naming: ``{value}_r{n}_{stat}`` (all aliased — oracle
    contract).
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    partition_by = (
        [] if partition_by is None else [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    order_extra = (
        [] if order_extra is None else [order_extra] if isinstance(order_extra, str) else list(order_extra)
    )
    if not window_sizes:
        raise InvalidLagsError("window_sizes must not be empty")
    bad = [s for s in stats if s not in _STATS]
    if bad:
        raise InvalidLagsError(f"unknown stats {bad}; supported: {sorted(_STATS)}")
    missing = [c for c in (value_cols + [time_col] + partition_by + order_extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    order_by = [time_col, *order_extra]
    base = Window.partitionBy(*partition_by).orderBy(*order_by) if partition_by else Window.orderBy(*order_by)
    keep = list(keep_cols) if keep_cols is not None else [*partition_by, *order_by]

    exprs: list[Column] = []
    for n in window_sizes:
        if int(n) < 1:
            raise InvalidLagsError(f"window size must be >= 1, got {n}")
        frame = base.rowsBetween(-(int(n) - 1), 0)
        for v in value_cols:
            for s in stats:
                exprs.append(_STATS[s](F.col(v)).over(frame).alias(f"{v}_r{n}_{s}"))
    return df.select(*keep, *exprs)


def range_rolling_features(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    range_seconds: Sequence[int],
    *,
    stats: Sequence[str] = ("mean", "min", "max"),
    partition_by: str | Sequence[str] | None = None,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Trailing TIME-RANGE frame statistics: for each horizon ``r``
    seconds, stat over rows whose timestamp lies within ``(t - r, t]``
    (inclusive of equal timestamps, like SQL RANGE frames).

    The order key is integer epoch-µs (RANGE frames need a numeric key;
    integer µs keeps frame membership exact and oracle-identical).
    Output columns: ``{value}_t{r}s_{stat}``.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    partition_by = (
        [] if partition_by is None else [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    if not range_seconds:
        raise InvalidLagsError("range_seconds must not be empty")
    bad = [s for s in stats if s not in _STATS]
    if bad:
        raise InvalidLagsError(f"unknown stats {bad}; supported: {sorted(_STATS)}")
    missing = [c for c in (value_cols + [time_col] + partition_by) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    assert_time_dtype(df, time_col)
    t_us = ts_us(F.col(time_col))
    base = (
        Window.partitionBy(*partition_by).orderBy(t_us)
        if partition_by
        else Window.orderBy(t_us)
    )
    keep = list(keep_cols) if keep_cols is not None else [*partition_by, time_col]
    exprs: list[Column] = []
    for r in range_seconds:
        if int(r) < 1:
            raise InvalidLagsError(f"range must be >= 1 second, got {r}")
        frame = base.rangeBetween(-(int(r) * 1_000_000 - 1), 0)
        for v in value_cols:
            for s in stats:
                exprs.append(_STATS[s](F.col(v)).over(frame).alias(f"{v}_t{r}s_{s}"))
    return df.select(*keep, *exprs)


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    order_extra: Sequence[str] = (),
    round_dp: int = 4,
) -> DataFrame:
    """Time-weighted average per key over an irregular series: each value
    is held constant until the next observation (step interpolation), so
    the mean is Σ(value·Δt) / Σ(Δt); the final observation has no interval
    and contributes nothing.

    Zero-length intervals (consecutive rows at one timestamp) are dropped
    BEFORE aggregation: they carry zero weight, and a key whose intervals
    are all zero-length would otherwise hit Σ(Δt)=0 — a DIVIDE_BY_ZERO
    error under Spark's ANSI default where DuckDB yields NULL. With the
    filter, such keys are simply absent on both engines.

    One window (lead over the key) + one aggregation — two shuffles on the
    same key, which AQE coalesces at scale. The denominator is an exact
    integer-µs sum; the numerator is rounded at the RATIO (``round_dp``)
    so accumulation order can't leak into comparisons.
    """
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    for c in (*partition_by, value_col, time_col, *order_extra):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    t_us = ts_us(F.col(time_col))
    w = Window.partitionBy(*partition_by).orderBy(
        t_us, *[F.col(c) for c in order_extra]
    )
    dt = (F.lead(t_us).over(w) - t_us).alias("_dt_us")
    d = df.select(*partition_by, F.col(value_col).alias("_v"), dt).where(
        F.col("_dt_us") > 0
    )
    return d.groupBy(*partition_by).agg(
        F.round(
            F.sum(F.col("_v") * F.col("_dt_us")) / F.sum("_dt_us"), round_dp
        ).alias("time_weighted_avg"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def rolling_median(
    df: DataFrame,
    value_col: str,
    time_col: str,
    window_size: int,
    *,
    partition_by: str | Sequence[str] | None = None,
    order_extra: str | Sequence[str] | None = None,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact trailing-window median: ``{v}_r{n}_median``.

    Built from sort_array(collect_list) + explicit middle-element
    interpolation rather than the engines' percentile aggregates: Spark
    interpolates ``(a+b)/2`` while DuckDB's quantile_cont computes
    ``a + 0.5*(b-a)`` — different expression trees that can differ in the
    last ulp. Making the interpolation an explicit shared expression
    restores bit-identical cross-engine values. O(w log w) per row —
    intended for the small trailing windows rolling stats use.
    """
    parts = (
        [] if partition_by is None
        else [partition_by] if isinstance(partition_by, str)
        else list(partition_by)
    )
    extra = (
        [] if order_extra is None
        else [order_extra] if isinstance(order_extra, str)
        else list(order_extra)
    )
    n = int(window_size)
    if n < 1:
        raise InvalidLagsError(f"window size must be >= 1, got {window_size}")
    missing = [c for c in (value_col, time_col, *parts, *extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    order_by = [time_col, *extra]
    base = Window.partitionBy(*parts).orderBy(*order_by) if parts else Window.orderBy(*order_by)
    frame = base.rowsBetween(-(n - 1), 0)
    keep = list(keep_cols) if keep_cols is not None else [*parts, *order_by]
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(frame))
    cnt = F.size(arr)
    lo = F.element_at(arr, ((cnt + 1) / 2).cast("int"))
    hi = F.element_at(arr, ((cnt + 2) / 2).cast("int"))
    return df.select(
        *keep,
        F.col(value_col),
        ((lo + hi) / F.lit(2.0)).alias(f"{value_col}_r{n}_median"),
    )


def rolling_median_oracle_sql(
    table: str, value: str, part: str, order: str, window_size: int
) -> str:
    """DuckDB oracle: same sorted-array middle interpolation, two-stage
    because a window call can't nest inside list_sort's argument."""
    n = int(window_size)
    frame = (
        f"(PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
    )
    mid = "(list_sort(arr)[CAST(floor((len(arr)+1)/2) AS INT)]" \
          " + list_sort(arr)[CAST(floor((len(arr)+2)/2) AS INT)])/2.0"
    return f"""
    WITH f AS (
      SELECT {part}, {order}, {value}, list({value}) OVER {frame} AS arr
      FROM {table}
    )
    SELECT {part}, {order}, {value}, {mid} AS {value}_r{n}_median
    FROM f
    """


def _rq_expr(arr: str, p: float, *, duck: bool = False) -> str:
    """Type-7 (linear-interpolation) quantile over a SORTED array
    column, 1-based — the rolling_median interpolation generalized to
    any p: h = p·(n−1), q = a[⌊h⌋+1] + (h−⌊h⌋)·(a[⌊h⌋+2 clamped] −
    a[⌊h⌋+1]).  The ARITHMETIC tree (multiply, floor, subtract,
    interpolate) is identical text on both engines; only the indexing
    spelling differs (element_at vs list subscript), which moves values
    unchanged — the robust_scale type-7 discipline on a trailing
    frame."""
    n = f"len({arr})" if duck else f"size({arr})"
    at = (lambda i: f"{arr}[{i}]") if duck else (
        lambda i: f"element_at({arr}, {i})")
    h = f"({p!r} * ({n} - 1))"
    lo = f"(CAST(floor({h}) AS INT) + 1)"
    hi = f"LEAST({lo} + 1, {n})"
    return (f"({at(lo)} + ({h} - floor({h})) * "
            f"({at(hi)} - {at(lo)}))")


def rolling_quantile(
    df: DataFrame,
    value_col: str,
    time_col: str,
    window_size: int,
    p: float,
    *,
    partition_by: str | Sequence[str] | None = None,
    order_extra: str | Sequence[str] | None = None,
    keep_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Exact trailing-window quantile (rolling p95 latency, p90 load —
    the ops-dashboard staple): ``{v}_r{n}_p{tag}`` via
    sort_array(collect_list) + the explicit type-7 interpolation
    (:func:`_rq_expr`) — the rolling_median generalization; engine
    percentile aggregates interpolate with different trees and drift a
    ulp cross-engine.  O(w log w) per row, for the small trailing
    windows rolling stats use; shorter-than-w prefixes use their real
    window (type-7 over what exists), never an imputed width."""
    parts = (
        [] if partition_by is None
        else [partition_by] if isinstance(partition_by, str)
        else list(partition_by)
    )
    extra = (
        [] if order_extra is None
        else [order_extra] if isinstance(order_extra, str)
        else list(order_extra)
    )
    n = int(window_size)
    if n < 1:
        raise InvalidLagsError(f"window size must be >= 1, got {window_size}")
    if not (0.0 <= float(p) <= 1.0):
        raise ValueError(f"p must be in [0, 1], got {p}")
    missing = [c for c in (value_col, time_col, *parts, *extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    order_by = [time_col, *extra]
    base = Window.partitionBy(*parts).orderBy(*order_by) if parts else Window.orderBy(*order_by)
    frame = base.rowsBetween(-(n - 1), 0)
    keep = list(keep_cols) if keep_cols is not None else [*parts, *order_by]
    tag = str(p).replace("0.", "")
    staged = df.select(
        *keep,
        F.col(value_col),
        F.sort_array(F.collect_list(F.col(value_col)).over(frame)).alias("_rqa"),
    )
    return staged.select(
        *keep,
        F.col(value_col),
        F.expr(_rq_expr("_rqa", float(p))).alias(f"{value_col}_r{n}_p{tag}"),
    )


def rolling_quantile_oracle_sql(
    table: str, value: str, part: str, order: str, window_size: int, p: float
) -> str:
    """DuckDB oracle: same sorted-array type-7 interpolation, two-stage
    (a window call can't nest inside list_sort's argument)."""
    n = int(window_size)
    frame = (
        f"(PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN {n - 1} PRECEDING AND CURRENT ROW)"
    )
    tag = str(p).replace("0.", "")
    q = _rq_expr("list_sort(arr)", float(p), duck=True)
    return f"""
    WITH f AS (
      SELECT {part}, {order}, {value}, list({value}) OVER {frame} AS arr
      FROM {table}
    )
    SELECT {part}, {order}, {value}, {q} AS {value}_r{n}_p{tag}
    FROM f
    """


def _median_mid_exprs(arr: str) -> str:
    """Shared middle-element interpolation over a sorted array column
    (1-based). Identical scalar text on both engines — see
    rolling_median's determinism note."""
    return (
        f"(element_at({arr}, CAST(floor((size({arr})+1)/2) AS INT))"
        f" + element_at({arr}, CAST(floor((size({arr})+2)/2) AS INT)))/2.0"
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    *,
    partition_by: str | Sequence[str],
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Robust per-group outlier flag via the Median Absolute Deviation:
    ``|x - median| > threshold * 1.4826 * MAD`` — the robust analogue of
    the z-score (1.4826 rescales MAD to σ under normality; the 3σ-rule
    threshold carries over).  Immune to the outliers themselves, unlike
    mean/std which they inflate.

    Two keyed passes (median, then MAD of residuals), each a
    collect_list + sorted-middle on the SAME partitioning — one exchange
    feeds both windows.  The interpolation is the shared expression both
    engines evaluate identically.  Group cardinality bounds the
    collected arrays; for groups past ~1e6 rows switch to a bucketed
    quantile, not this operator.

    Output: ``{v}_median``, ``{v}_mad``, ``is_outlier`` (NULL when the
    group's MAD is 0 — the robust scale is undefined, matching the
    zscore operator's 0-stddev convention).
    """
    parts = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    if not parts:
        raise ColumnNotFoundError("mad_outliers requires a group key")
    missing = [c for c in (value_col, *parts) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    w = Window.partitionBy(*parts)
    v = value_col
    arr = F.sort_array(F.collect_list(F.col(v)).over(w))
    med_txt = _median_mid_exprs("_arr")
    staged = df.select(*df.columns, arr.alias("_arr")).withColumn(
        "_med", F.expr(med_txt)
    )
    res_arr = F.sort_array(F.collect_list(F.expr(f"abs({v} - _med)")).over(w))
    staged2 = staged.select(*staged.columns, res_arr.alias("_resarr")).withColumn(
        "_mad", F.expr(_median_mid_exprs("_resarr"))
    )
    from ._num import round_double

    def dr(col: str) -> str:
        return round_double(col, round_to)

    return staged2.select(
        *parts,
        *[c for c in df.columns if c not in parts],
        F.expr(dr("_med")).alias(f"{v}_median"),
        F.expr(dr("_mad")).alias(f"{v}_mad"),
        F.expr(
            f"CASE WHEN _mad = 0.0 THEN CAST(NULL AS BOOLEAN) "
            f"ELSE abs({v} - _med) > {threshold} * 1.4826 * _mad END"
        ).alias("is_outlier"),
    )


def mad_outliers_oracle_sql(
    table: str,
    value: str,
    part: str,
    keep: str,
    *,
    threshold: float = 3.0,
    round_to: int = 4,
) -> str:
    """DuckDB oracle: same two staged sorted-list medians (list_sort +
    1-based indexing), same scalar interpolation/flag text."""
    def mid(arr: str) -> str:
        return (
            f"(list_sort({arr})[CAST(floor((len({arr})+1)/2) AS INT)]"
            f" + list_sort({arr})[CAST(floor((len({arr})+2)/2) AS INT)])/2.0"
        )

    from ._num import round_double

    def dr(col: str) -> str:
        return round_double(col, round_to)

    return f"""
    WITH s1 AS (
      SELECT {keep}, {value}, list({value}) OVER (PARTITION BY {part}) AS _arr
      FROM {table}
    ),
    s2 AS (
      SELECT {keep}, {value}, {mid('_arr')} AS _med FROM s1
    ),
    s3 AS (
      SELECT {keep}, {value}, _med,
             list(abs({value} - _med)) OVER (PARTITION BY {part}) AS _resarr
      FROM s2
    ),
    s4 AS (
      SELECT {keep}, {value}, _med, {mid('_resarr')} AS _mad FROM s3
    )
    SELECT {keep}, {value},
           {dr('_med')} AS {value}_median,
           {dr('_mad')} AS {value}_mad,
           CASE WHEN _mad = 0.0 THEN CAST(NULL AS BOOLEAN)
                ELSE abs({value} - _med) > {threshold} * 1.4826 * _mad END AS is_outlier
    FROM s4
    """


def rolling_moments_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    order_extra: Sequence[str] = (),
    window: int = 20,
    round_to: int = 6,
) -> str:
    """Trailing rolling SKEWNESS and EXCESS KURTOSIS per series — the
    higher-moment companions of rolling mean/stddev: the shape stats a
    risk monitor watches (return asymmetry, tail heaviness) that no
    built-in rolling aggregate provides cross-engine deterministically.

    Method: raw power sums S1..S4 over the ROWS frame as EXACT decimal
    sums of PRE-QUANTIZED powers (each power is one fixed double
    expression — (v·v), ((v·v)·v), ((v·v)·(v·v)) — rounded then cast to
    decimal, so the frame sum is order-independent: Spark iterates the
    frame, DuckDB reassociates via segment tree; doubles would diverge
    at a rounding boundary, the r2 failure class).  Central moments
    come from the power sums by the standard identities, bound as
    COLUMNS layer by layer (each CTE referenced once — no staging
    hazard), so both engines evaluate the identical IEEE expression
    tree; skew = m3 / (m2·√m2), excess kurtosis = m4/m2² − 3, NULL when
    m2 = 0 (constant window — undefined, not invented).

    Plan: ONE window exchange on the series key; all four frame sums +
    the count share it (the lag-plan discipline).
    """
    from ._num import dec_to_double, round_double

    oext = "".join(f", {c}" for c in order_extra)
    v = f"CAST({value_col} AS DOUBLE)"
    qp = lambda e, p: (  # noqa: E731
        f"CAST({round_double(e, 6)} AS DECIMAL({p},6))"
    )
    w = (f"PARTITION BY {group_col} ORDER BY {time_col}{oext} "
         f"ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW")
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    return f"""
    WITH _rmw AS (
      SELECT {group_col}, {time_col}{oext}, {value_col},
             CAST(COUNT({value_col}) OVER ({w}) AS BIGINT) AS n,
             CAST(SUM({qp(v, 18)}) OVER ({w}) AS DECIMAL(27,6)) AS s1,
             CAST(SUM({qp(f'({v} * {v})', 24)}) OVER ({w}) AS DECIMAL(33,6)) AS s2,
             CAST(SUM({qp(f'(({v} * {v}) * {v})', 27)}) OVER ({w}) AS DECIMAL(36,6)) AS s3,
             CAST(SUM({qp(f'(({v} * {v}) * ({v} * {v}))', 29)}) OVER ({w}) AS DECIMAL(38,6)) AS s4
      FROM {table}
    ),
    _rmd AS (
      SELECT {group_col}, {time_col}{oext}, {value_col}, n,
             CAST(n AS DOUBLE) AS nd,
             {dec_to_double('s1')} AS s1d, {dec_to_double('s2')} AS s2d,
             {dec_to_double('s3')} AS s3d, {dec_to_double('s4')} AS s4d
      FROM _rmw
    ),
    _rmm AS (
      SELECT {group_col}, {time_col}{oext}, {value_col}, n,
             (s1d / nd) AS mean, (s2d / nd) AS e2,
             (s3d / nd) AS e3, (s4d / nd) AS e4
      FROM _rmd
    ),
    _rmc AS (
      SELECT {group_col}, {time_col}{oext}, {value_col}, n, mean,
             (e2 - (mean * mean)) AS m2,
             ((e3 - ((3.0 * mean) * e2)) + ((2.0 * mean) * (mean * mean))) AS m3,
             (((e4 - ((4.0 * mean) * e3)) + (((6.0 * mean) * mean) * e2))
              - (((3.0 * mean) * mean) * (mean * mean))) AS m4
      FROM _rmm
    )
    SELECT {group_col}, {time_col}{oext}, {value_col}, n,
           {rd('mean')} AS roll_mean,
           CASE WHEN m2 <= 0.0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd('(m3 / (m2 * SQRT(m2)))')} END AS roll_skew,
           CASE WHEN m2 <= 0.0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd('((m4 / (m2 * m2)) - 3.0)')} END AS roll_kurt_excess
    FROM _rmc
    """


def burst_detect_sql(
    d,
    table: str,
    time_col: str,
    group_col: str,
    *,
    baseline_days: int = 7,
    flag_ratio: float = 2.0,
    round_to: int = 6,
    staged_counts: str | None = None,
) -> str:
    """Burst detection on event rates: per (group, day), today's event
    count against the trailing ``baseline_days``-day mean (current day
    EXCLUDED — a burst must not inflate its own baseline), the ratio,
    and a ≥ ``flag_ratio`` flag — the ops-monitoring primitive behind
    "error rate is 3× its trailing week" alerts, the rate-side
    companion of the value-side monitors (seasonal anomaly screens
    values; this screens VOLUME).

    ``staged_counts`` swaps the raw-event day bucketing for a
    pre-aggregated (k, x, cnt) relation — the merge entry point the
    STREAMING twin drains into (the histogram sketch's staged_counts
    discipline): counts accumulated elsewhere feed the identical
    trailing-window tail.

    Determinism: counts are exact BIGINTs over the day-bucket groupBy;
    the baseline mean is one IEEE division of the exact trailing SUM by
    the actual frame COUNT (so the first days use their real shorter
    baseline, never an imputed divisor); rows with an EMPTY baseline
    (each group's first day) report NULL ratio and never flag.
    LAG-by-rows equals LAG-by-calendar only on gap-free daily series —
    the MASE contract; gap-fill first on holey calendars.

    Plan: one (group, day) partial-agg shuffle; ONE window exchange on
    the group key carries both trailing frames; per-key state bounded
    by the bucket calendar.
    """
    from ._num import round_double

    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    w = (f"PARTITION BY k ORDER BY x "
         f"ROWS BETWEEN {baseline_days} PRECEDING AND 1 PRECEDING")
    ratio = "(CAST(cnt AS DOUBLE) / (CAST(base_sum AS DOUBLE) / CAST(base_n AS DOUBLE)))"
    bucket = (
        f"SELECT k, x, cnt FROM {staged_counts}" if staged_counts
        else f"""SELECT {group_col} AS k, {day} AS x, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY {group_col}, {day}"""
    )
    return f"""
    WITH _bdb AS (
      {bucket}
    ),
    _bdw AS (
      SELECT k, x, cnt,
             CAST(SUM(cnt) OVER ({w}) AS BIGINT) AS base_sum,
             CAST(COUNT(cnt) OVER ({w}) AS BIGINT) AS base_n
      FROM _bdb
    )
    SELECT k AS {group_col}, CAST(x AS BIGINT) AS day_x, cnt,
           base_sum, base_n,
           CASE WHEN base_n = 0 OR base_sum = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {round_double(ratio, round_to)} END AS burst_ratio,
           CASE WHEN base_n = 0 OR base_sum = 0 THEN FALSE
                ELSE ({ratio} >= {flag_ratio!r}) END AS flagged
    FROM _bdw
    ORDER BY {group_col}, day_x
    """


def burst_detect(
    df: DataFrame,
    time_col: str,
    group_col: str,
    *,
    baseline_days: int = 7,
    flag_ratio: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`burst_detect_sql` (every CTE
    referenced once — no staging needed)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_burst_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        burst_detect_sql(_S, view, time_col, group_col,
                         baseline_days=baseline_days,
                         flag_ratio=flag_ratio, round_to=round_to)
    )


def streaming_burst_detect(
    stream_df: DataFrame,
    time_col: str,
    group_col: str,
    *,
    baseline_days: int = 7,
    flag_ratio: float = 2.0,
    round_to: int = 6,
    query_name: str,
) -> DataFrame:
    """Continuous form of :func:`burst_detect` — the
    streaming_distribution_drift recipe applied to the burst baseline:
    per micro-batch the only state is the (group, day) count
    aggregation (complete mode — bounded by the CALENDAR the batch
    plan's bucket relation materializes anyway; an unbounded-horizon
    deployment ages out days beyond ``baseline_days`` behind a
    watermark, the documented dial).  At drain the counts feed the
    batch statement's trailing-window tail VERBATIM through its
    ``staged_counts`` merge entry point, so drain ≡ batch over
    everything that arrived is structural and the registered query's
    oracle IS the batch statement.

    The stream side buckets with the SAME rendered day expression text
    and derives its session from the input frame (the foreachBatch-
    clone discipline)."""
    from pyspark.sql import functions as F

    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK as _S

    for c in (time_col, group_col):
        if c not in stream_df.columns:
            raise ColumnNotFoundError(
                f"column {c!r} not in stream frame {stream_df.columns}"
            )
    spark = stream_df.sparkSession
    day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    cur = (
        stream_df.selectExpr(f"{group_col} AS k", f"{day} AS x")
        .groupBy("k", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from ..streaming.lag_stream import run_stream_to_df

    drained = run_stream_to_df(cur, query_name, output_mode="complete")
    drained.createOrReplaceTempView("_ts_sburst_counts")
    return spark.sql(
        burst_detect_sql(_S, "_ignored_", time_col, group_col,
                         baseline_days=baseline_days,
                         flag_ratio=flag_ratio, round_to=round_to,
                         staged_counts="_ts_sburst_counts")
    )


def hampel_filter(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    order_extra: str | Sequence[str] | None = None,
    half_width: int = 3,
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Hampel identifier + repair over a CENTERED rolling window
    (Hampel 1974; the Pearson et al. 2016 engineering form): for each
    point, the window median and the MAD of deviations FROM THAT median
    over ``2·half_width+1`` centered neighbors; ``|x − med| >
    threshold·1.4826·MAD`` flags the point and the repaired series
    substitutes the window median — the standard sensor-despiking /
    series-cleaning pass, and the ROLLING companion of the global
    :func:`mad_outliers` (a spike in a trending series is invisible to
    a whole-series MAD but obvious to its neighbors).

    The MAD here deviates from mad_outliers' two-window composition ON
    PURPOSE: rolling MAD needs |x_i − med_t| — deviations from the
    CENTER row's median — so it evaluates as array expressions over the
    one collected window (sort → mid → transform → sort → mid), never a
    second window pass.  ONE window exchange total; O(w log w) per row,
    intended for small windows.

    Output: ``{v}_med``, ``{v}_mad``, ``is_spike`` (NULL when the
    window MAD is 0 — the mad_outliers convention), ``{v}_repaired``
    (the rounded window median where flagged, else the original).
    Window edges use the truncated frame (fewer neighbors) — the
    standard streaming-unfriendly centered form; a trailing variant is
    rolling_median + this flag logic.
    """
    parts = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    extra = (
        [] if order_extra is None
        else [order_extra] if isinstance(order_extra, str)
        else list(order_extra)
    )
    if not parts:
        raise ColumnNotFoundError("hampel_filter requires a partition key")
    k = int(half_width)
    if k < 1:
        raise InvalidLagsError(f"half_width must be >= 1, got {half_width}")
    missing = [c for c in (value_col, time_col, *parts, *extra)
               if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    from ._num import round_double

    v = value_col
    order_by = [time_col, *extra]
    frame = (
        Window.partitionBy(*parts).orderBy(*order_by).rowsBetween(-k, k)
    )
    sarr = F.sort_array(F.collect_list(F.col(v)).over(frame))
    staged = df.select(*df.columns, sarr.alias("_sarr")).withColumn(
        "_med", F.expr(_median_mid_exprs("_sarr"))
    )
    madarr = "sort_array(transform(_sarr, e -> abs(e - _med)))"
    staged2 = staged.withColumn(
        "_mad", F.expr(_median_mid_exprs(madarr))
    )
    flag = (
        f"CASE WHEN _mad = 0.0 THEN CAST(NULL AS BOOLEAN) "
        f"ELSE abs({v} - _med) > {threshold} * 1.4826 * _mad END"
    )
    dr = lambda e: round_double(e, round_to)  # noqa: E731
    return staged2.select(
        *parts,
        *order_by,
        F.col(v),
        F.expr(dr("_med")).alias(f"{v}_med"),
        F.expr(dr("_mad")).alias(f"{v}_mad"),
        F.expr(flag).alias("is_spike"),
        F.expr(
            f"CASE WHEN ({flag}) THEN {dr('_med')} ELSE {v} END"
        ).alias(f"{v}_repaired"),
    )


def hampel_filter_oracle_sql(
    table: str,
    value: str,
    part: str,
    order: str,
    *,
    half_width: int = 3,
    threshold: float = 3.0,
    round_to: int = 4,
) -> str:
    """DuckDB oracle: the same one-window + array-expression chain
    (list_sort / list_transform, 1-based indexing, shared interpolation
    and flag text)."""
    from ._num import round_double

    k = int(half_width)
    v = value

    def mid(arr: str) -> str:
        return (
            f"(list_sort({arr})[CAST(floor((len({arr})+1)/2) AS INT)]"
            f" + list_sort({arr})[CAST(floor((len({arr})+2)/2) AS INT)])/2.0"
        )

    frame = (
        f"(PARTITION BY {part} ORDER BY {order} "
        f"ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING)"
    )
    flag = (
        f"CASE WHEN _mad = 0.0 THEN CAST(NULL AS BOOLEAN) "
        f"ELSE abs({v} - _med) > {threshold} * 1.4826 * _mad END"
    )
    dr = lambda e: round_double(e, round_to)  # noqa: E731
    return f"""
    WITH _hp0 AS (
      SELECT {part}, {order}, {v}, list({v}) OVER {frame} AS _arr
      FROM {table}
    ),
    _hp1 AS (
      SELECT {part}, {order}, {v}, {mid('_arr')} AS _med, _arr FROM _hp0
    ),
    _hp2 AS (
      SELECT {part}, {order}, {v}, _med,
             {mid(f'list_transform(_arr, e -> abs(e - _med))')} AS _mad
      FROM _hp1
    )
    SELECT {part}, {order}, {v},
           {dr('_med')} AS {v}_med,
           {dr('_mad')} AS {v}_mad,
           {flag} AS is_spike,
           CASE WHEN ({flag}) THEN {dr('_med')} ELSE {v} END
             AS {v}_repaired
    FROM _hp2
    """
