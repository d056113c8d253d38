"""Autocorrelation / cross-correlation over lag features.

The reference's entire purpose is building lag matrices whose columns
feed serial-dependence analysis (README.md:5-6 positions it for
"time series analysis and feature engineering"); ACF/CCF is the
canonical consumer of that matrix: ``acf_k = corr(v_t, v_{t-k})``.
We compute it directly on the lag plan without materializing anything:

    lag window (1 shuffle on the series key) -> groupBy the SAME key

Catalyst sees the child exchange already hash-partitioned by the group
key, so the aggregation adds NO second shuffle — the whole ACF is one
exchange regardless of how many lags are requested.  At 100 TB the cost
is the lag window's sort; the per-group corr states are a few doubles.

Determinism: built-in ``corr`` accumulates doubles in engine-specific
order, so ``ROUND(corr, 4)`` can flip its last digit between Spark and
DuckDB near rounding boundaries.  Instead the Pearson coefficient is
assembled from DECIMAL-quantized sums (exact, order-independent — the
queries.dsum discipline); the remaining scalar double arithmetic is the
same expression text on both engines, hence bit-identical, and the
final round happens on a DECIMAL where both engines are HALF_UP.

For a single global series (no partition key) the lag side routes
through operators.scale.lag_features_global (halo-bucketed, no
single-task window); the final reduction is a scalar tree-aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError, validate_lags
from .lag import lag_features

__all__ = [
    "acf",
    "ccf_global",
    "season_detect",
    "season_detect_sql",
    "exact_corr_sql",
    "acf_oracle_sql",
    "ccf_oracle_sql",
    "rolling_corr",
    "rolling_corr_oracle_sql",
    "spearman_matrix",
    "spearman_matrix_sql",
]


def _as_list(x) -> list:
    return [] if x is None else [x] if isinstance(x, str) else list(x)


def exact_corr_sql(x: str, y: str, round_to: int = 4, *, width: int = 18) -> str:
    """Pearson correlation as ONE dialect-shaped aggregate expression,
    exact under any execution order.

    Pairwise-complete semantics (rows where either side is NULL are
    skipped) — identical to built-in ``corr`` on both engines.  Zero
    variance or no pairs folds to NULL, also matching ``corr``.

    ``width``: decimal precision of the quantized operands — 18 for
    Spark (19 would trip its precision-loss rescale: (19,6)*(19,6) →
    (38,11), shaving the exact 12th decimal), 19 for DuckDB (18 makes
    it multiply in int64 and overflow; 19 forces hugeint).  The VALUES
    are identical either way — precision widens range, not scale.

    Safe in GROUP BY aggregates only: HashAggregate dedupes the
    textually-repeated SUMs; a WindowExec does NOT — the windowed
    (rolling) form must go through the two-stage
    :func:`_rolling_corr_stats` / :func:`_rolling_corr_combine` split.
    """
    both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
    dx = f"CASE WHEN {both} THEN CAST({x} AS DECIMAL({width},6)) END"
    dy = f"CASE WHEN {both} THEN CAST({y} AS DECIMAL({width},6)) END"
    from ._num import dec_to_double, round_double

    n = f"COUNT(CASE WHEN {both} THEN 1 END)"
    sx = dec_to_double(f"SUM({dx})")
    sy = dec_to_double(f"SUM({dy})")
    sxy = dec_to_double(f"SUM({dx} * {dy})")
    sxx = dec_to_double(f"SUM({dx} * {dx})")
    syy = dec_to_double(f"SUM({dy} * {dy})")
    num = f"({n} * {sxy} - {sx} * {sy})"
    # GREATEST clamp: the sums are exact, but their DOUBLE products can
    # leave a negative epsilon where the true variance is ~0; sqrt(neg)
    # is NaN on Spark — clamp to 0 so both engines fold to NULL via NULLIF
    den = (
        f"(SQRT(GREATEST({n} * {sxx} - {sx} * {sx}, 0.0)) "
        f"* SQRT(GREATEST({n} * {syy} - {sy} * {sy}, 0.0)))"
    )
    return round_double(f"({num} / NULLIF({den}, 0.0))", round_to)


def acf(
    df: DataFrame,
    value_col: str,
    time_col: str,
    lags,
    *,
    partition_by: str | Sequence[str],
    order_extra: str | Sequence[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Per-series autocorrelation function.

    One output row per series key with ``n_obs`` and ``acf_{k}`` =
    Pearson correlation of the series with its own k-step lag (each
    acf_k uses the n-k overlapping pairs).
    """
    parts = _as_list(partition_by)
    if not parts:
        raise ColumnNotFoundError("acf requires a series key; use ccf_global for one series")
    lag_list = validate_lags(lags)
    lagged = lag_features(
        df,
        value_col,
        time_col,
        lag_list,
        partition_by=parts,
        order_extra=order_extra,
        keep_cols=[*parts, value_col],
    )
    aggs = [F.count(F.lit(1)).alias("n_obs")]
    for k in lag_list:
        aggs.append(
            F.expr(exact_corr_sql(value_col, f"{value_col}_lag{k}", round_to)).alias(
                f"acf_{k}"
            )
        )
    return lagged.groupBy(*parts).agg(*aggs)


def acf_oracle_sql(
    table: str,
    value: str,
    part: str,
    order: str,
    lags: Sequence[int],
    *,
    round_to: int = 4,
) -> str:
    """DuckDB oracle rendered from the SAME corr template as the operator."""
    lag_cols = ",\n             ".join(
        f"LAG({value}, {k}) OVER w AS {value}_lag{k}" for k in lags
    )
    corrs = ",\n           ".join(
        f"{exact_corr_sql(value, f'{value}_lag{k}', round_to, width=19)} AS acf_{k}"
        for k in lags
    )
    return f"""
    WITH lagged AS (
      SELECT {part}, {value},
             {lag_cols}
      FROM {table}
      WINDOW w AS (PARTITION BY {part} ORDER BY {order})
    )
    SELECT {part}, COUNT(*) AS n_obs,
           {corrs}
    FROM lagged GROUP BY {part}
    """


def ccf_global(
    df: DataFrame,
    x_col: str,
    y_col: str,
    time_col: str,
    lags,
    *,
    order_extra: str | Sequence[str] | None = None,
    num_buckets: int = 32,
    round_to: int = 4,
) -> DataFrame:
    """Cross-correlation of one global aligned pair of series.

    ``ccf_k = corr(x_t, y_{t-k})`` — "does y lead x by k steps?".
    Returns a single row with ``n_obs`` and one ``ccf_{k}`` per lag.
    The global lag is halo-bucketed (operators/scale.py) so no
    single-task window exists even when the aligned frame is huge.
    """
    missing = [c for c in (x_col, y_col, time_col) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    lag_list = validate_lags(lags)
    from .scale import lag_features_global

    want = sorted(set(lag_list) | {0})
    lagged = lag_features_global(
        df, [x_col, y_col], time_col, want,
        order_extra=order_extra, num_buckets=num_buckets,
    )
    aggs = [F.count(F.lit(1)).alias("n_obs")]
    for k in lag_list:
        aggs.append(
            F.expr(exact_corr_sql(f"{x_col}_lag0", f"{y_col}_lag{k}", round_to)).alias(
                f"ccf_{k}"
            )
        )
    return lagged.agg(*aggs)


def ccf_oracle_sql(
    inner_sql: str,
    x: str,
    y: str,
    order: str,
    lags: Sequence[int],
    *,
    round_to: int = 4,
) -> str:
    """DuckDB oracle for ccf_global over an aligned frame subquery."""
    lag_cols = ",\n             ".join(
        f"LAG({y}, {k}) OVER w AS {y}_lag{k}" for k in lags if k
    )
    corrs = ",\n           ".join(
        f"{exact_corr_sql(f'{x}_lag0', f'{y}_lag{k}', round_to, width=19)} AS ccf_{k}"
        for k in lags
    )
    return f"""
    WITH l AS (
      SELECT {x} AS {x}_lag0,
             {y} AS {y}_lag0,
             {lag_cols}
      FROM ({inner_sql}) WINDOW w AS (ORDER BY {order})
    )
    SELECT COUNT(*) AS n_obs,
           {corrs}
    FROM l
    """


def _rolling_corr_stats(x: str, y: str, over: str, width: int) -> dict[str, str]:
    """The six per-frame statistics as NAMED window expressions.

    WindowExec (unlike HashAggregate, which dedupes identical aggregate
    functions — verified on the acf plan) evaluates every textual
    aggregate occurrence separately: inlining the full corr formula as
    one expression exploded to 150 _we window slots (dec_to_double
    triples each SUM, round_double's CASE duplicates the whole formula
    5x).  Computing the stats ONCE as columns and combining in a scalar
    projection keeps the WindowExec at exactly 6 running aggregates."""
    both = f"({x} IS NOT NULL AND {y} IS NOT NULL)"
    dx = f"CASE WHEN {both} THEN CAST({x} AS DECIMAL({width},6)) END"
    dy = f"CASE WHEN {both} THEN CAST({y} AS DECIMAL({width},6)) END"
    return {
        "_cn": f"COUNT(CASE WHEN {both} THEN 1 END) OVER {over}",
        "_sx": f"SUM({dx}) OVER {over}",
        "_sy": f"SUM({dy}) OVER {over}",
        "_sxy": f"SUM({dx} * {dy}) OVER {over}",
        "_sxx": f"SUM({dx} * {dx}) OVER {over}",
        "_syy": f"SUM({dy} * {dy}) OVER {over}",
    }


def _rolling_corr_combine(round_to: int) -> str:
    """Scalar Pearson assembly over the named stat columns — the same
    arithmetic as exact_corr_sql, same cross-engine determinism
    argument (exact decimal sums -> shared IEEE expression text)."""
    from ._num import dec_to_double, round_double

    n = "_cn"
    sx, sy = dec_to_double("_sx"), dec_to_double("_sy")
    sxy, sxx, syy = dec_to_double("_sxy"), dec_to_double("_sxx"), dec_to_double("_syy")
    num = f"({n} * {sxy} - {sx} * {sy})"
    den = (
        f"(SQRT(GREATEST({n} * {sxx} - {sx} * {sx}, 0.0)) "
        f"* SQRT(GREATEST({n} * {syy} - {sy} * {sy}, 0.0)))"
    )
    return round_double(f"({num} / NULLIF({den}, 0.0))", round_to)


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: str,
    n: int,
    *,
    partition_by: str | Sequence[str] | None = None,
    round_to: int = 4,
) -> DataFrame:
    """Rolling Pearson correlation of two aligned series over a trailing
    ``n``-row frame — the windowed companion of :func:`ccf_global`
    (corr over time, not over lag offset).

    Two-stage plan: the six frame statistics (count + five
    decimal-exact sums) are computed as named columns in ONE WindowExec
    (they share the window spec), then combined by a scalar projection
    — one sort, one (or zero, if already partitioned) exchange,
    regardless of frame width.  Intended for the aggregated domain
    (per-bucket series produced by a groupBy), where an un-partitioned
    ORDER BY is bounded by the bucket calendar, not by raw-event
    cardinality — the same bounded-domain argument as
    resample/deseasonalize.  For raw-event global series, bucket first
    (operators/scale.py) or pass ``partition_by``.
    """
    missing = [c for c in (x_col, y_col, order_col) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    if n < 2:
        raise ValueError(f"rolling_corr needs a frame of >= 2 rows, got {n}")
    parts = _as_list(partition_by)
    pb = f"PARTITION BY {', '.join(parts)} " if parts else ""
    over = (
        f"({pb}ORDER BY {order_col} "
        f"ROWS BETWEEN {int(n) - 1} PRECEDING AND CURRENT ROW)"
    )
    keep = [*parts, order_col, x_col, y_col]
    stats = _rolling_corr_stats(x_col, y_col, over, width=18)
    staged = df.selectExpr(*keep, *[f"{e} AS {name}" for name, e in stats.items()])
    return staged.selectExpr(
        *keep, f"{_rolling_corr_combine(round_to)} AS rolling_corr"
    )


def rolling_corr_oracle_sql(
    inner_sql: str,
    x: str,
    y: str,
    order_col: str,
    n: int,
    *,
    partition_by: Sequence[str] = (),
    round_to: int = 4,
) -> str:
    """DuckDB oracle rendered from the SAME two-stage template."""
    pb = f"PARTITION BY {', '.join(partition_by)} " if partition_by else ""
    over = (
        f"({pb}ORDER BY {order_col} "
        f"ROWS BETWEEN {int(n) - 1} PRECEDING AND CURRENT ROW)"
    )
    keep = [*partition_by, order_col, x, y]
    stats = _rolling_corr_stats(x, y, over, width=19)
    stat_cols = ",\n             ".join(f"{e} AS {name}" for name, e in stats.items())
    return f"""
    SELECT {', '.join(keep)},
           {_rolling_corr_combine(round_to)} AS rolling_corr
    FROM (
      SELECT {', '.join(keep)},
             {stat_cols}
      FROM ({inner_sql})
    )
    """


def _cm_bucket_select(d_name: str, table: str, value_col: str,
                      time_col: str, group_col: str) -> str:
    """Daily-bucket SELECT shared by the inline CTE and the staged
    front-door frame (the engine staging rule — the bucket frame is
    referenced by BOTH arms of the pair self-join)."""
    if d_name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    return (
        f"SELECT {group_col} AS k, {day} AS x, "
        f"CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y "
        f"FROM {table} GROUP BY {group_col}, {day}"
    )


def corr_matrix_sql(
    d_name: str,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 4,
    staged_bucket: str | None = None,
) -> str:
    """Cross-series Pearson correlation matrix (upper triangle): which
    event types move together day to day — the lag-0 companion of
    ccf_global's single-pair lead/lag scan, over ALL series pairs at
    once.

    Series align on SHARED days via a self equi-join of the daily
    bucket frame on the day key (never a cross join; pair count is
    C(|series|, 2) × |shared calendar| — bounded by the bucket
    calendar, the Theil-Sen posture).  The correlation per pair is
    :func:`exact_corr_sql`'s order-independent exact-decimal aggregate.
    Ties: the upper triangle is k_a < k_b by string comparison —
    deterministic on both engines.  Pairs sharing < 3 days are dropped
    (a 2-point correlation is ±1 by construction — noise, documented).
    """
    width = 18 if d_name == "spark" else 19
    bucket = (
        f"SELECT k, x, y FROM {staged_bucket}" if staged_bucket
        else _cm_bucket_select(d_name, table, value_col, time_col, group_col)
    )
    corr = exact_corr_sql("a.y", "b.y", round_to, width=width)
    return f"""
    WITH _cmb AS (
      {bucket}
    )
    SELECT a.k AS type_a, b.k AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           {corr} AS corr
    FROM _cmb a JOIN _cmb b ON a.x = b.x AND a.k < b.k
    GROUP BY a.k, b.k
    HAVING COUNT(*) >= 3
    """


def spearman_matrix_sql(
    d_name: str,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 4,
    staged_rank: str | None = None,
) -> str:
    """Cross-series SPEARMAN rank correlation matrix — the
    monotone-association companion of :func:`corr_matrix_sql` (Pearson
    sees linear co-movement and is dragged by spike days; rank
    correlation sees any monotone relation and is outlier-robust, the
    standard pair for drift/association dashboards).

    Exactness without fractions: Spearman = Pearson over AVERAGE ranks,
    and average ranks under ties are r + (c−1)/2 (r = min-rank, c = tie
    count).  Correlation is invariant under the affine map 2·rank, so
    the surrogate 2r + c − 1 — an exact INTEGER per row — feeds the
    same :func:`exact_corr_sql` aggregate with zero new floating-point
    hazard (the engine's rational-form discipline).  Ranks come from
    one per-series window over the daily bucket frame (RANK + tie
    COUNT share the (k) partition); pairs align on shared days via the
    corr_matrix self equi-join, never a cross join; < 3 shared days
    drop (a 2-point correlation is ±1 by construction).
    """
    width = 18 if d_name == "spark" else 19
    bucket = _cm_bucket_select(d_name, table, value_col, time_col, group_col)
    ranked = (
        f"SELECT k, x, CAST(2 * RANK() OVER (PARTITION BY k ORDER BY y) "
        f"+ COUNT(*) OVER (PARTITION BY k ORDER BY y "
        f"RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1 AS BIGINT) AS yr "
        f"FROM ({bucket}) _smb0"
    )
    src = f"SELECT k, x, yr FROM {staged_rank}" if staged_rank else ranked
    corr = exact_corr_sql("a.yr", "b.yr", round_to, width=width)
    return f"""
    WITH _smr AS (
      {src}
    )
    SELECT a.k AS type_a, b.k AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           {corr} AS spearman
    FROM _smr a JOIN _smr b ON a.x = b.x AND a.k < b.k
    GROUP BY a.k, b.k
    HAVING COUNT(*) >= 3
    """


def spearman_matrix(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 4,
) -> DataFrame:
    """DataFrame front door for :func:`spearman_matrix_sql` — stages
    the ranked frame once (both self-join arms share it, the
    corr_matrix staging)."""
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_smx_in"
    df.createOrReplaceTempView(view)
    bucket = _cm_bucket_select("spark", view, value_col, time_col, group_col)
    ranked = (
        f"SELECT k, x, CAST(2 * RANK() OVER (PARTITION BY k ORDER BY y) "
        f"+ COUNT(*) OVER (PARTITION BY k ORDER BY y "
        f"RANGE BETWEEN CURRENT ROW AND CURRENT ROW) - 1 AS BIGINT) AS yr "
        f"FROM ({bucket}) _smb0"
    )
    rview = "_ts_smx_ranked"
    df.sparkSession.sql(ranked).localCheckpoint(eager=False).createOrReplaceTempView(rview)
    return df.sparkSession.sql(
        spearman_matrix_sql("spark", view, value_col, time_col, group_col,
                            round_to=round_to, staged_rank=rview)
    )


def corr_matrix(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 4,
) -> DataFrame:
    """DataFrame front door for :func:`corr_matrix_sql` — stages the
    bucket frame once (both self-join arms share it)."""
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_cmx_in"
    df.createOrReplaceTempView(view)
    bview = "_ts_cmx_buckets"
    df.sparkSession.sql(
        _cm_bucket_select("spark", view, value_col, time_col, group_col)
    ).localCheckpoint(eager=False).createOrReplaceTempView(bview)
    return df.sparkSession.sql(
        corr_matrix_sql("spark", view, value_col, time_col, group_col,
                        round_to=round_to, staged_bucket=bview)
    )


def season_detect_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    min_lag: int = 2,
    max_lag: int = 10,
    round_to: int = 4,
) -> str:
    """Season-length detection per series: the ACF over the
    day-bucketed series at every candidate lag, and the ARGMAX lag as
    the detected period — the missing front door to the seasonal tier
    (holt_winters/classical_decompose/deseasonalize all ASSUME a
    period; this measures one: "which m do I pass?").  Smallest-lag
    tie-break; NULL period when every candidate ACF is NULL (series
    shorter than min_lag+2 buckets).

    Determinism: each ACF is the exact-decimal Pearson template
    (exact_corr_sql — order-independent quantized sums, one shared
    IEEE tree); the argmax compares the ROUNDED outputs via
    COALESCE(…, −2.0) so NULL candidates lose without engine-specific
    GREATEST-NULL semantics (Spark's GREATEST ignores NULLs, DuckDB's
    propagates — coalescing first makes the question moot).

    Shape: the day bucketing is one exact-decimal groupBy; ONE
    series-key window exchange carries every LAG column; the per-key
    reduce rides the same partitioning (the acf plan over the bucketed
    calendar).  Output is |series| rows.
    """
    if not (1 <= min_lag <= max_lag):
        raise ValueError(f"need 1 <= min_lag <= max_lag, got {min_lag}..{max_lag}")
    width = 18 if d.name == "spark" else 19
    lags = list(range(int(min_lag), int(max_lag) + 1))
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    lag_cols = ",\n             ".join(
        f"LAG(y, {j}) OVER w AS y_l{j}" for j in lags
    )
    corrs = ",\n           ".join(
        f"{exact_corr_sql('y', f'y_l{j}', round_to, width=width)} AS acf_{j}"
        for j in lags
    )
    co = lambda j: f"COALESCE(acf_{j}, -2.0)"  # noqa: E731
    best = "GREATEST(" + ", ".join(co(j) for j in lags) + ")"
    pick = " ".join(
        f"WHEN {co(j)} = _best THEN {j}" for j in lags
    )
    return f"""
    WITH _sdb AS (
      SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}
    ),
    _sdl AS (
      SELECT k, y,
             {lag_cols}
      FROM _sdb
      WINDOW w AS (PARTITION BY k ORDER BY x)
    ),
    _sda AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS n_obs,
             {corrs}
      FROM _sdl GROUP BY k
    ),
    _sdm AS (
      SELECT *, {best} AS _best FROM _sda
    )
    SELECT k AS {group_col}, n_obs,
           {", ".join(f"acf_{j}" for j in lags)},
           CASE WHEN _best = -2.0 THEN CAST(NULL AS INT)
                ELSE CAST(CASE {pick} END AS INT) END AS period,
           CASE WHEN _best = -2.0 THEN CAST(NULL AS DOUBLE)
                ELSE _best END AS period_acf
    FROM _sdm
    """


def season_detect(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    min_lag: int = 2,
    max_lag: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """DataFrame front door for :func:`season_detect_sql`."""
    from ..functions.text_fns import SPARK as _S

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_sdetect_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        season_detect_sql(_S, view, value_col, time_col, group_col,
                          min_lag=min_lag, max_lag=max_lag,
                          round_to=round_to)
    )
