"""Seasonal adjustment: remove a periodic (e.g. hour-of-day) profile.

``value_deseason = value - mean(value | same series, same season slot)``
— the "seasonal naive" decomposition, the standard pre-step before
anomaly scoring on strongly diurnal series.  The profile mean uses
decimal-quantized sums (queries.dsum discipline) so it is exact and
order-independent; both engines then evaluate the identical scalar
double expression.

Plan: one exchange on (series key, season slot) feeding an unordered
window aggregate — no sort needed, no driver work, scales like any
keyed aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

__all__ = ["deseasonalize", "deseasonalize_sql", "SEASON_FNS",
           "holt_winters", "holt_winters_sql",
           "holt_winters_forecast", "holt_winters_forecast_sql",
           "croston", "croston_sql",
           "theta_forecast", "theta_forecast_sql",
           "classical_decompose", "classical_decompose_sql",
           "time_features", "time_features_sql"]

# Season slot expressions valid verbatim AND value-identical in BOTH
# Spark SQL and DuckDB.  dayofweek is deliberately absent: Spark numbers
# Sunday=1..7, DuckDB Sunday=0..6 — no shared-text expression agrees.
SEASON_FNS = {
    "hour": "hour({t})",
    "day": "day({t})",
    "month": "month({t})",
}


def _stat_exprs(value: str, part: str, season_slot: str) -> dict[str, str]:
    """The two per-slot statistics as NAMED window expressions.

    WindowExec evaluates every textual aggregate occurrence separately
    (no dedup, unlike HashAggregate — the rolling_corr finding): the
    inlined form of these expressions expanded to 40 window slots
    (dec_to_double triples the SUM, round_double's CASE duplicates the
    whole formula 5x in two output columns).  Stats once as columns +
    a scalar combine keeps the WindowExec at exactly 2 aggregates."""
    wp = f"(PARTITION BY {part}, {season_slot})"
    return {
        "_n": f"COUNT({value}) OVER {wp}",
        "_sxd": f"SUM(CAST({value} AS DECIMAL(27,6))) OVER {wp}",
    }


def _final_exprs(value: str, round_to: int) -> dict[str, str]:
    # ROUND on a raw DOUBLE diverges between engines at representable
    # near-midpoints (observed: -8.6963 vs -8.6962 at sf0.01) — quantize
    # to DECIMAL first, where ROUND is HALF_UP on both (dsum discipline);
    # the final rounding is the pure-double form (operators/_num.py).
    from ._num import dec_to_double, round_double

    sx = dec_to_double("_sxd")
    return {
        "seasonal_mean": round_double(f"{sx} / _n", round_to),
        "value_deseason": round_double(f"{value} - {sx} / _n", round_to),
    }


def deseasonalize(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    season: str = "hour",
    round_to: int = 4,
) -> DataFrame:
    """Append ``season_slot``, ``seasonal_mean`` and ``value_deseason``
    to each row of a keyed time series."""
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if season not in SEASON_FNS:
        raise ValueError(f"season must be one of {sorted(SEASON_FNS)}, got {season!r}")
    missing = [c for c in (*parts, value_col, time_col) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    slot = SEASON_FNS[season].format(t=time_col)
    stats = _stat_exprs(value_col, ", ".join(parts), slot)
    fin = _final_exprs(value_col, round_to)
    staged = df.select(
        *parts,
        time_col,
        F.col(value_col),
        F.expr(slot).alias("season_slot"),
        *[F.expr(e).alias(name) for name, e in stats.items()],
    )
    return staged.select(
        *parts,
        time_col,
        value_col,
        "season_slot",
        F.expr(fin["seasonal_mean"]).alias("seasonal_mean"),
        F.expr(fin["value_deseason"]).alias("value_deseason"),
    )


def deseasonalize_sql(
    table: str,
    value: str,
    time_col: str,
    part: str,
    *,
    season: str = "hour",
    round_to: int = 4,
) -> str:
    """The identical expressions as ANSI SQL for the DuckDB oracle."""
    slot = SEASON_FNS[season].format(t=time_col)
    stats = _stat_exprs(value, part, slot)
    fin = _final_exprs(value, round_to)
    stat_cols = ",\n             ".join(f"{e} AS {name}" for name, e in stats.items())
    return f"""
    SELECT {part}, {time_col}, {value}, season_slot,
           {fin['seasonal_mean']} AS seasonal_mean,
           {fin['value_deseason']} AS value_deseason
    FROM (
      SELECT {part}, {time_col}, {value},
             {slot} AS season_slot,
             {stat_cols}
      FROM {table}
    )
    """


def _hw_scalar_exprs(
    l: str, b: str, s1: str, yd: str,
    alpha: float, beta: float, gamma: float,
    seasonal: str = "add",
    damping: float | None = None,
) -> dict[str, str]:
    """The four per-step Holt-Winters scalar expressions, parameterized
    by the VARIABLE SPELLING only (Spark fold: acc.l / element_at;
    DuckDB recursion: r.l / [1]) so both engines evaluate the IDENTICAL
    IEEE tree in the identical order — the KM-fold bit-exactness
    discipline applied to a struct-state recurrence.

    ``seasonal='mul'`` swaps the seasonal interactions for the
    ETS(A,A,M) member: the season DIVIDES into the level update and the
    fit MULTIPLIES it back (y/s and y/l replace y−s and y−l) — same
    tree shape, division recurrence, so the bit-equality argument is
    unchanged (one IEEE divide is as correctly-rounded as one subtract).

    ``damping`` (φ ∈ (0, 1]) gives the DAMPED-TREND members (Ad —
    Gardner & McKenzie 1985): every read of the carried trend becomes
    φ·b (fit, level update, AND the trend recurrence's persistence
    term), flattening long-horizon extrapolation — the literal is a
    Python ``repr`` like the smoothing complements, so both engines
    parse the identical double.  ``None`` keeps the undamped tree with
    NO extra multiply (φ=1.0 would change the IEEE tree shape of
    existing grades).

    Complements are Python-computed literals (``repr(1.0 - alpha)``):
    whatever double that parses to, BOTH engines parse the same text to
    the same double — never spelled as an in-SQL ``1 - alpha`` (whose
    folding differs) and never as a hand-rounded constant.  ``lnew`` is
    INLINED into ``bnew``/``snew`` (SQL has no let-binding inside a
    lambda/recursive arm); textual duplication keeps the trees equal.
    """
    a, ca = repr(float(alpha)), repr(1.0 - float(alpha))
    bb, cb = repr(float(beta)), repr(1.0 - float(beta))
    g, cg = repr(float(gamma)), repr(1.0 - float(gamma))
    bterm = b if damping is None else f"({repr(float(damping))} * {b})"
    if seasonal == "mul":
        fit = f"(({l} + {bterm}) * {s1})"
        lnew = f"(({a} * ({yd} / {s1})) + ({ca} * ({l} + {bterm})))"
        snew_src = f"({yd} / {lnew})"
    else:
        fit = f"(({l} + {bterm}) + {s1})"
        lnew = f"(({a} * ({yd} - {s1})) + ({ca} * ({l} + {bterm})))"
        snew_src = f"({yd} - {lnew})"
    bnew = f"(({bb} * ({lnew} - {l})) + ({cb} * {bterm}))"
    snew = f"(({g} * {snew_src}) + ({cg} * {s1}))"
    return {"fit": fit, "lnew": lnew, "bnew": bnew, "snew": snew}


def _hw_init_exprs(m: int) -> tuple[str, str]:
    """(l0, b0) from the exact decimal first/second-season sums
    ``s1m``/``s2m`` (in scope under those names on both engines): each
    is a fixed tree of exact ingredients and 1-3 IEEE divisions."""
    from ._num import dec_to_double

    s1d, s2d, md = dec_to_double("s1m"), dec_to_double("s2m"), f"{m}.0"
    l0 = f"({s1d} / {md})"
    b0 = f"((({s2d} / {md}) - ({s1d} / {md})) / {md})"
    return l0, b0


def holt_winters_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 6,
    seasonal: str = "add",
    damping: float | None = None,
) -> str:
    """Holt-Winters triple exponential smoothing per series over the
    day-bucketed calendar — level + trend + seasonal state, the classic
    operational forecaster (Winters 1960), emitting the one-step-ahead
    in-sample forecast and its error per bucket.  ``seasonal='add'``
    (default) is the ETS(A,A,A) member:

        fit = (l + b) + s_{t−m}
        l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ(y_t − l_t)     + (1−γ)·s_{t−m}

    ``seasonal='mul'`` is ETS(A,A,M) — the season scales with the
    level (retail/traffic patterns whose weekly swing grows with
    volume): fit = (l + b)·s_{t−m}, l_t = α(y_t/s_{t−m}) + …,
    s_t = γ(y_t/l_t) + (1−γ)s_{t−m}, s₀ᵢ = yᵢ/l₀.  The division
    recurrence is only defined on STRICTLY POSITIVE series — the
    zero-value guard the additive form doesn't need: any series with a
    non-positive day bucket drops out loudly via ``HAVING MIN(y) > 0``
    (an exact decimal comparison, deterministic on both engines), the
    same contract as the too-short-series HAVING.

    Init (needs ≥ 2·period buckets; shorter series drop out loudly via
    HAVING): l₀ = mean(first season), b₀ = (mean(second season) −
    mean(first season))/m, s₀ᵢ = yᵢ − l₀ (additive) or yᵢ/l₀
    (multiplicative); the recurrence starts at bucket m+1.  Brown
    (operators/ewma.brown_scan) stays the ROW-level streaming path —
    its recurrence is two cython EWMAs; Holt-Winters' struct state
    needs a genuine scalar fold, affordable here because the DAY-BUCKET
    calendar bounds every series (30 days → 23 steps), the KM-survival
    bounded-fold posture.

    Engine split: Spark folds the sorted per-series bucket array with
    ``aggregate()`` carrying ``named_struct(l, b, seas, fit)`` — JVM-
    side, ONE exchange on the series key, seasonal queue rotated by
    slice+append; DuckDB (no struct-typed list_reduce) runs the same
    recurrence as a recursive CTE stepping rn→rn+1.  Both sides draw
    every scalar from :func:`_hw_scalar_exprs`, so each step is the
    identical IEEE tree on identical inputs → bit-equal doubles (the
    driver's value-hash gate).  y values enter via dec_to_double of the
    exact DECIMAL(18,6) bucket sum.

    Gap-free contract: seasonal index alignment is BY ROW, so it equals
    calendar alignment only on dense calendars (the MASE LAG-by-rows
    contract) — gap-fill first on holey series.
    """
    from ._num import dec_to_double, round_double

    if seasonal not in ("add", "mul"):
        raise ValueError(f"seasonal must be 'add' or 'mul', got {seasonal!r}")
    if damping is not None and not (0.0 < float(damping) <= 1.0):
        raise ValueError(f"damping must be in (0, 1], got {damping}")
    m = int(period)
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    l0, b0 = _hw_init_exprs(m)
    s0_op = "/" if seasonal == "mul" else "-"
    pos_guard = " AND MIN(y) > 0" if seasonal == "mul" else ""
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    bucket = f"""SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}"""
    if d.name == "spark":
        yd_e = dec_to_double("e.y")
        step = _hw_scalar_exprs(
            "acc.l", "acc.b", "element_at(acc.seas, 1)", yd_e,
            alpha, beta, gamma, seasonal, damping,
        )
        yd_out = dec_to_double(f"element_at(arr, pos + {m + 1}).y")
        return f"""
    WITH _hwb AS (
      {bucket}
    ),
    _hwg AS (
      SELECT k, sort_array(collect_list(named_struct('x', x, 'y', y))) AS arr,
             CAST(COUNT(*) AS INT) AS n,
             CAST(SUM(y) FILTER (WHERE rn <= {m}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m} AND rn <= {2 * m}) AS DECIMAL(27,6)) AS s2m
      FROM (SELECT k, x, y,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
            FROM _hwb)
      GROUP BY k
      HAVING COUNT(*) >= {2 * m}{pos_guard}
    ),
    _hwf AS (
      SELECT k, arr, n,
        aggregate(
          slice(arr, {m + 1}, n - {m}),
          named_struct('l', {l0}, 'b', {b0},
                       'seas', transform(slice(arr, 1, {m}),
                                         e -> ({dec_to_double('e.y')} {s0_op} {l0})),
                       'fit', CAST(array() AS ARRAY<DOUBLE>)),
          (acc, e) -> named_struct(
              'l', {step['lnew']}, 'b', {step['bnew']},
              'seas', concat(slice(acc.seas, 2, {m - 1}), array({step['snew']})),
              'fit', concat(acc.fit, array({step['fit']}))),
          acc -> acc.fit) AS fits
      FROM _hwg
    )
    SELECT k AS {group_col},
           CAST(element_at(arr, pos + {m + 1}).x AS BIGINT) AS day_x,
           {yd_out} AS y_val,
           {rd('fitv')} AS hw_fit,
           {rd(f'({yd_out} - fitv)')} AS hw_err
    FROM _hwf LATERAL VIEW posexplode(fits) _t AS pos, fitv
    """
    yd_b = dec_to_double("b.y")
    step = _hw_scalar_exprs("r.l", "r.b", "r.seas[1]", yd_b,
                            alpha, beta, gamma, seasonal, damping)
    return f"""
    WITH RECURSIVE _hwb AS (
      {bucket}
    ),
    _hwr0 AS (
      SELECT k, x, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
      FROM _hwb
    ),
    _hwa AS (
      SELECT k, CAST(COUNT(*) AS INT) AS n,
             CAST(SUM(y) FILTER (WHERE rn <= {m}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m} AND rn <= {2 * m}) AS DECIMAL(27,6)) AS s2m
      FROM _hwr0 GROUP BY k HAVING COUNT(*) >= {2 * m}{pos_guard}
    ),
    _hwi AS (
      SELECT k, n, {l0} AS l0, {b0} AS b0 FROM _hwa
    ),
    _hws AS (
      SELECT b.k AS k,
             list({dec_to_double('b.y')} {s0_op} i.l0 ORDER BY b.rn) AS seas0
      FROM _hwr0 b JOIN _hwi i ON i.k = b.k
      WHERE b.rn <= {m}
      GROUP BY b.k
    ),
    _hwr AS (
      SELECT i.k AS k, CAST({m} AS BIGINT) AS rn, i.l0 AS l, i.b0 AS b,
             s.seas0 AS seas, CAST(NULL AS DOUBLE) AS fit,
             CAST(NULL AS DOUBLE) AS yv, CAST(NULL AS BIGINT) AS x
      FROM _hwi i JOIN _hws s ON s.k = i.k
      UNION ALL
      SELECT r.k, r.rn + 1, {step['lnew']}, {step['bnew']},
             list_append(r.seas[2:{m}], {step['snew']}),
             {step['fit']}, {yd_b}, CAST(b.x AS BIGINT)
      FROM _hwr r JOIN _hwr0 b ON b.k = r.k AND b.rn = r.rn + 1
    )
    SELECT k AS {group_col}, x AS day_x, yv AS y_val,
           {rd('fit')} AS hw_fit,
           {rd('(yv - fit)')} AS hw_err
    FROM _hwr WHERE rn > {m}
    """


def holt_winters(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 6,
    seasonal: str = "add",
    damping: float | None = None,
) -> DataFrame:
    """DataFrame front door for :func:`holt_winters_sql` (Spark
    rendering; every CTE is referenced once, so no staging is needed —
    the chain inlines into one plan with a single series-key
    exchange)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_hw_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        holt_winters_sql(_S, view, value_col, time_col, group_col,
                         period=period, alpha=alpha, beta=beta,
                         gamma=gamma, round_to=round_to, seasonal=seasonal,
                         damping=damping)
    )


def classical_decompose_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    round_to: int = 6,
) -> str:
    """Classical additive seasonal decomposition per series over daily
    buckets (Kendall's moving-average decomposition — the pre-loess
    ancestor of STL, and the deterministic member of that family the
    engine can hash-grade): y = trend + seasonal + resid, where

    * trend    = centered (2h+1)-day moving average (h = period//2),
      emitted only for FULL windows — edges are NULL, never a
      shrunken-window estimate pretending to be a trend;
    * seasonal = per (series, day-of-week) mean of the detrended
      interior (the season profile re-estimated from what the trend
      pass left behind — unlike deseasonalize's raw-slot means, this
      one is trend-adjusted);
    * resid    = y − trend − seasonal (NULL at the edges with trend).

    Determinism: day buckets are exact decimal sums; the MA divides a
    decimal window sum once; detrended values are round_double-
    quantized to DECIMAL(18,6) before the seasonal mean's window sum
    (the dsum discipline for DERIVED doubles); day-of-week comes from
    pure epoch-day arithmetic (((x+3) % 7) + 1 — the time_features
    trick; engine dayofweek() disagrees).  ISO weekday is used for the
    slot; any ``period`` ≠ 7 slots by x % period instead.

    Gap-free contract: the ROWS frame IS the calendar only on dense
    daily series (the MASE/Holt-Winters contract) — gap-fill first on
    holey series.

    Shape: one (k, day) bucket exchange, one k-window (the MA), one
    (k, slot) unordered window for the seasonal mean — window-over-
    frame, no join-back, no staging (every CTE referenced once); the
    bucket relation is |series|·|days| rows, the scale answer.
    """
    from ._num import dec_to_double, round_double

    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    h = m // 2
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    slot = f"(((x + 3) % 7) + 1)" if m == 7 else f"(x % {m})"
    w = f"(PARTITION BY k ORDER BY x ROWS BETWEEN {h} PRECEDING AND {h} FOLLOWING)"
    wd = "(PARTITION BY k, slot)"
    yd = dec_to_double("y")
    ma_sum = dec_to_double(f"SUM(y) OVER {w}")
    det = rd(f"({yd} - trend)")
    seas_sum = dec_to_double(f"SUM(det_d) OVER {wd}")
    return f"""
    WITH _cdb AS (
      SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}
    ),
    _cdt AS (
      SELECT k, x, y,
             CASE WHEN COUNT(*) OVER {w} = {2 * h + 1}
                  THEN ({ma_sum} / {2 * h + 1}.0) END AS trend
      FROM _cdb
    ),
    _cdd AS (
      SELECT k, x, y, trend, {slot} AS slot,
             CASE WHEN trend IS NOT NULL
                  THEN CAST({det} AS DECIMAL(18,6)) END AS det_d
      FROM _cdt
    ),
    _cds AS (
      SELECT k, x, y, trend,
             ({seas_sum} / CAST(COUNT(det_d) OVER {wd} AS DOUBLE)) AS seas
      FROM _cdd
    )
    SELECT k AS {group_col}, CAST(x AS BIGINT) AS day_x, {yd} AS y_val,
           {rd('trend')} AS trend,
           {rd('seas')} AS seasonal,
           {rd(f'(({yd} - trend) - seas)')} AS resid
    FROM _cds
    """


def classical_decompose(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`classical_decompose_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_cd_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        classical_decompose_sql(_S, view, value_col, time_col, group_col,
                                period=period, round_to=round_to)
    )


def time_features_sql(
    d,
    table: str,
    time_col: str,
    keep_cols: Sequence[str] = (),
    *,
    round_to: int = 6,
) -> str:
    """Calendar feature projection — the time-side companion of the lag
    matrix (reference README frames lag matrices as ML feature
    engineering; a supervised model wants WHEN next to WHAT-CAME-
    BEFORE): epoch day index, ISO weekday, weekend flag, day-of-month,
    month, absolute week index, day-of-year, hour, and the fractional
    position within the day.

    The dialect landmine this exists to bury: ``dayofweek`` numbers
    Sunday=1..7 on Spark and Sunday=0..6 on DuckDB (the SEASON_FNS
    exclusion note), and ISO ``weekofyear`` differs at year edges — so
    weekday is derived PURELY ARITHMETICALLY from the epoch-day
    integer: 1970-01-01 was a Thursday, hence
    iso_dow = ((epoch_day + 3) % 7) + 1 (Monday=1..Sunday=7), and the
    week index is the absolute ``epoch_day DIV 7`` bucket (what a
    model wants anyway — a monotone week counter, not a year-wrapped
    one).  day/month/dayofyear/hour are value-identical shared text
    (SEASON_FNS-verified family); day_frac is one exact integer µs
    residue over the literal 86400e6, one IEEE division.

    Plan: pure projection — zero shuffles, pushdown-safe, fuses into
    whatever scan feeds it.  NULL timestamps propagate NULL features.
    """
    from ._num import round_double

    keep = "".join(f"{c}, " for c in keep_cols)
    if d.name == "spark":
        eday = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
        us = f"unix_micros({time_col})"
    else:
        eday = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
        us = f"epoch_us({time_col})"
    day_us = f"({us} - (CAST({eday} AS BIGINT) * 86400000000))"
    day_frac = round_double(
        f"(CAST({day_us} AS DOUBLE) / 86400000000.0)", round_to
    )
    ed = f"CAST({eday} AS BIGINT)"
    wnum = f"({ed} - ((({ed} % 7) + 7) % 7))"
    widx = f"({wnum} DIV 7)" if d.name == "spark" else f"({wnum} // 7)"
    iso_dow = f"(((({eday}) + 3) % 7) + 1)"
    return f"""
    SELECT {keep}{time_col},
           CAST({eday} AS BIGINT) AS epoch_day,
           CAST({iso_dow} AS INT) AS iso_dow,
           ({iso_dow} >= 6) AS is_weekend,
           CAST(day({time_col}) AS INT) AS day_of_month,
           CAST(month({time_col}) AS INT) AS month_of_year,
           CAST({widx} AS BIGINT) AS week_index,
           CAST(dayofyear({time_col}) AS INT) AS day_of_year,
           CAST(hour({time_col}) AS INT) AS hour_of_day,
           {day_frac} AS day_frac
    FROM {table}
    """


def time_features(
    df: DataFrame,
    time_col: str,
    keep_cols: Sequence[str] = (),
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`time_features_sql` (projection
    only — zero shuffles)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (time_col, *keep_cols):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_tfeat_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        time_features_sql(_S, view, time_col, keep_cols, round_to=round_to)
    )


def _croston_scalar_exprs(z: str, p: str, yd: str, q: str, alpha: float) -> dict[str, str]:
    """The two per-step Croston scalar expressions (SES on nonzero
    demand sizes, SES on inter-demand intervals), parameterized by the
    variable spelling only — the _hw_scalar_exprs bit-exactness
    discipline.  Complements are Python-computed ``repr`` literals."""
    a, ca = repr(float(alpha)), repr(1.0 - float(alpha))
    return {
        "znew": f"(({a} * {yd}) + ({ca} * {z}))",
        "pnew": f"(({a} * {q}) + ({ca} * {p}))",
    }


def croston_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    alpha: float = 0.2,
    round_to: int = 6,
) -> str:
    """Croston's method for INTERMITTENT demand per series (Croston
    1972): the forecaster for series that are mostly zero — spare
    parts, long-tail SKUs, rare event types — where SES/Holt-Winters
    smear the zeros into a meaningless small mean.  Croston separates
    the signal into two SES recurrences over the NONZERO day buckets
    only:

        z_t = α·y_t + (1−α)·z_{t−1}        (demand size)
        p_t = α·q_t + (1−α)·p_{t−1}        (inter-demand interval, days)
        rate_t = z_t / p_t                 (demand per day)

    with q_t the day gap since the previous nonzero bucket.  Also
    emitted: the Syntetos-Boylan approximation ``sba_rate =
    (1 − α/2)·rate`` (Syntetos & Boylan 2005), the bias-corrected
    production form.  Init: z₁ = first nonzero demand, p = the first
    gap (x₂ − x₁); the recurrence starts AT the second nonzero bucket
    (q₂ = that same first gap — the standard warm-start; documented,
    identical on both engines).  Series need ≥ 2 nonzero buckets
    (HAVING, loud drop-out) and only y > 0 buckets count as demand
    (exact decimal comparison).

    Engine split and determinism: the holt_winters_sql skeleton —
    Spark folds the sorted nonzero array with ``aggregate()`` carrying
    ``named_struct(z, p, px, fit)``; DuckDB steps the identical
    recurrence as a recursive CTE; both draw every scalar from
    :func:`_croston_scalar_exprs` (y via dec_to_double of the exact
    DECIMAL(18,6) bucket sum, q an exact integer day gap), so each
    step is the identical IEEE tree → bit-equal doubles.

    Scale: ONE exchange on the series key; the fold runs on the
    NONZERO bucket subsequence — for genuinely intermittent series
    that is a small fraction of an already calendar-bounded relation
    (the KM bounded-fold posture).
    """
    from ._num import dec_to_double, round_double

    rd = lambda e: round_double(e, round_to)  # noqa: E731
    sba = repr(1.0 - float(alpha) / 2.0)
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    bucket = f"""SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}"""
    if d.name == "spark":
        step = _croston_scalar_exprs(
            "acc.z", "acc.p", dec_to_double("e.y"),
            "CAST(e.x - acc.px AS DOUBLE)", alpha,
        )
        z0 = dec_to_double("element_at(arr, 1).y")
        # try_element_at: ANSI Spark evaluates the init projection in the
        # same codegen stage as the HAVING filter, so a 1-element group's
        # arr[2] access must be total even though its row is filtered out
        p0 = "CAST(try_element_at(arr, 2).x - element_at(arr, 1).x AS DOUBLE)"
        yd_out = dec_to_double("element_at(arr, pos + 2).y")
        return f"""
    WITH _crb AS (
      {bucket}
    ),
    _crg AS (
      SELECT k, sort_array(collect_list(named_struct('x', x, 'y', y))) AS arr,
             CAST(COUNT(*) AS INT) AS n
      FROM _crb WHERE y > 0
      GROUP BY k HAVING COUNT(*) >= 2
    ),
    _crf AS (
      SELECT k, arr, n,
        aggregate(
          slice(arr, 2, n - 1),
          named_struct('z', {z0}, 'p', {p0},
                       'px', element_at(arr, 1).x,
                       'fit', CAST(array() AS ARRAY<DOUBLE>)),
          (acc, e) -> named_struct(
              'z', {step['znew']}, 'p', {step['pnew']}, 'px', e.x,
              'fit', concat(acc.fit,
                            array(({step['znew']}) / ({step['pnew']})))),
          acc -> acc.fit) AS fits
      FROM _crg
    )
    SELECT k AS {group_col},
           CAST(element_at(arr, pos + 2).x AS BIGINT) AS day_x,
           {yd_out} AS y_val,
           CAST(element_at(arr, pos + 2).x - element_at(arr, pos + 1).x
                AS BIGINT) AS gap_days,
           {rd('fitv')} AS croston_rate,
           {rd(f'(fitv * {sba})')} AS sba_rate
    FROM _crf LATERAL VIEW posexplode(fits) _t AS pos, fitv
    """
    step = _croston_scalar_exprs(
        "r.z", "r.p", dec_to_double("b.y"),
        "CAST(b.x - r.px AS DOUBLE)", alpha,
    )
    z0 = dec_to_double("b1.y")
    p0 = "CAST(b2.x - b1.x AS DOUBLE)"
    return f"""
    WITH RECURSIVE _crb AS (
      {bucket}
    ),
    _crn AS (
      SELECT k, x, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
      FROM _crb WHERE y > 0
    ),
    _cra AS (
      SELECT k, CAST(COUNT(*) AS INT) AS n
      FROM _crn GROUP BY k HAVING COUNT(*) >= 2
    ),
    _cri AS (
      SELECT a.k AS k, {z0} AS z, {p0} AS p, b1.x AS px
      FROM _cra a
      JOIN _crn b1 ON b1.k = a.k AND b1.rn = 1
      JOIN _crn b2 ON b2.k = a.k AND b2.rn = 2
    ),
    _crr AS (
      SELECT k, CAST(1 AS BIGINT) AS rn, z, p, px,
             CAST(NULL AS DOUBLE) AS rate, CAST(NULL AS DOUBLE) AS yv,
             CAST(NULL AS BIGINT) AS x, CAST(NULL AS BIGINT) AS gap
      FROM _cri
      UNION ALL
      SELECT r.k, r.rn + 1, {step['znew']}, {step['pnew']}, b.x,
             ({step['znew']}) / ({step['pnew']}),
             {dec_to_double('b.y')}, CAST(b.x AS BIGINT),
             CAST(b.x - r.px AS BIGINT)
      FROM _crr r JOIN _crn b ON b.k = r.k AND b.rn = r.rn + 1
    )
    SELECT k AS {group_col}, x AS day_x, yv AS y_val, gap AS gap_days,
           {rd('rate')} AS croston_rate,
           {rd(f'(rate * {sba})')} AS sba_rate
    FROM _crr WHERE rn >= 2
    """


def croston(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    alpha: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`croston_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_croston_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        croston_sql(_S, view, value_col, time_col, group_col,
                    alpha=alpha, round_to=round_to)
    )


def _theta_scalar_exprs(z: str, yd: str, x: str, alpha: float) -> dict[str, str]:
    """Per-step Theta scalars, parameterized by variable spelling only
    (the _hw/_croston discipline).  ``a``/``b`` are the per-series OLS
    coefficients, in scope as columns under those names on both
    engines; the trend line evaluates at the CENTERED day index."""
    a_, ca = repr(float(alpha)), repr(1.0 - float(alpha))
    line = f"(a + (b * CAST({x} AS DOUBLE)))"
    zt = f"((2.0 * {yd}) - {line})"
    return {
        "line": line,
        "zt": zt,
        "fit": f"(0.5 * ({z} + {line}))",
        "znew": f"(({a_} * {zt}) + ({ca} * {z}))",
    }


def theta_forecast_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    alpha: float = 0.3,
    round_to: int = 6,
    staged_centered: str | None = None,
) -> str:
    """Theta-method in-sample forecast per series (Assimakopoulos &
    Nikolopoulos 2000 — the M3 competition winner; θ = 2): decompose
    the day-bucketed series into the OLS trend line (θ = 0, pure
    long-run drift) and the theta line Z_t = 2·y_t − line_t (θ = 2,
    doubled curvature), SES-smooth the theta line, and blend the two
    halves equally:

        fit_t = ½·(z_{t−1} + line_t),   z_t = α·Z_t + (1−α)·z_{t−1}

    (z carries the SES state of Z; the fit uses the PRE-update state —
    a genuine one-step-ahead).  Init z = Z₁; emission starts at the
    second bucket.

    Determinism: the OLS coefficients are one/two IEEE ops over EXACT
    decimal sums of the CENTERED day index (x − min(x) per series —
    uncentered epoch-day magnitudes cancel ~10 digits in n·Σxx − Σx²,
    the linear_trend conditioning note), guarded by an exact-decimal
    positive-variance HAVING; every step scalar comes from
    :func:`_theta_scalar_exprs`, so Spark's aggregate() fold and the
    DuckDB recursive CTE run identical IEEE trees (the holt_winters
    skeleton) → bit-equal doubles.

    Scale: the bucket groupBy, a broadcast-sized per-series (min, OLS)
    frame joined back, and ONE series-key exchange carrying the sorted
    collect + fold — linear in the bounded calendar.
    """
    from ._num import dec_to_double, round_double

    rd = lambda e: round_double(e, round_to)  # noqa: E731
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    bucket = f"""SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}"""
    thc_body = (
        f"SELECT k, xc, x, y FROM {staged_centered}" if staged_centered
        else """SELECT b.k AS k, b.x - m.xmin AS xc, b.x AS x, b.y AS y
      FROM _thb b
      JOIN (SELECT k, MIN(x) AS xmin FROM _thb GROUP BY k) m ON m.k = b.k"""
    )
    # exact decimal sufficient statistics over the centered index; the
    # OLS combine runs in DOUBLES over their exact conversions (the
    # linear_trend convention — a products-of-sums decimal would blow
    # DuckDB's 38-digit width cap), deterministic because centering
    # keeps the magnitudes small and the tree is shared text
    sums = """SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(xc AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(27,6)) AS sy,
             CAST(SUM(CAST(xc * xc AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS sxx,
             CAST(SUM(CAST(xc AS DECIMAL(12,0)) * y) AS DECIMAL(32,6)) AS sxy
      FROM _thc GROUP BY k"""
    nd = "CAST(n AS DOUBLE)"
    sxd, syd = dec_to_double("sx"), dec_to_double("sy")
    sxxd, sxyd = dec_to_double("sxx"), dec_to_double("sxy")
    den = f"(({nd} * {sxxd}) - ({sxd} * {sxd}))"
    bexpr = f"((({nd} * {sxyd}) - ({sxd} * {syd})) / {den})"
    aexpr = f"(({syd} - (b * {sxd})) / {nd})"
    fit_guard = f"WHERE n >= 2 AND {den} > 0.0"
    if d.name == "spark":
        step = _theta_scalar_exprs(
            "acc.z", dec_to_double("e.y"), "e.xc", alpha,
        )
        init = _theta_scalar_exprs(
            "0.0", dec_to_double("element_at(arr, 1).y"),
            "element_at(arr, 1).xc", alpha,
        )
        yd_out = dec_to_double("element_at(arr, pos + 2).y")
        return f"""
    WITH _thb AS (
      {bucket}
    ),
    _thc AS (
      {thc_body}
    ),
    _tha AS (
      {sums}
    ),
    _tho AS (
      SELECT k, b, {aexpr} AS a
      FROM (SELECT k, n, sx, sy, {bexpr} AS b FROM _tha {fit_guard})
    ),
    _thg AS (
      SELECT c.k AS k, o.a AS a, o.b AS b,
             sort_array(collect_list(named_struct('xc', c.xc, 'x', c.x,
                                                  'y', c.y))) AS arr,
             CAST(COUNT(*) AS INT) AS n
      FROM _thc c JOIN _tho o ON o.k = c.k
      GROUP BY c.k, o.a, o.b
    ),
    _thf AS (
      SELECT k, a, b, arr, n,
        aggregate(
          slice(arr, 2, n - 1),
          named_struct('z', {init['zt']},
                       'fit', CAST(array() AS ARRAY<DOUBLE>)),
          (acc, e) -> named_struct(
              'z', {step['znew']},
              'fit', concat(acc.fit, array({step['fit']}))),
          acc -> acc.fit) AS fits
      FROM _thg
    )
    SELECT k AS {group_col},
           CAST(element_at(arr, pos + 2).x AS BIGINT) AS day_x,
           {yd_out} AS y_val,
           {rd('fitv')} AS theta_fit,
           {rd(f'({yd_out} - fitv)')} AS theta_err
    FROM _thf LATERAL VIEW posexplode(fits) _t AS pos, fitv
    """
    step = _theta_scalar_exprs("r.z", dec_to_double("c.y"), "c.xc", alpha)
    init = _theta_scalar_exprs(
        "0.0", dec_to_double("b1.y"), "b1.xc", alpha,
    )
    return f"""
    WITH RECURSIVE _thb AS (
      {bucket}
    ),
    _thc AS (
      {thc_body}
    ),
    _thn AS (
      SELECT k, xc, x, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY xc) AS rn
      FROM _thc
    ),
    _tha AS (
      {sums}
    ),
    _tho AS (
      SELECT k, b, {aexpr} AS a
      FROM (SELECT k, n, sx, sy, {bexpr} AS b FROM _tha {fit_guard})
    ),
    _thi AS (
      SELECT o.k AS k, o.a AS a, o.b AS b, {init['zt']} AS z
      FROM _tho o JOIN _thn b1 ON b1.k = o.k AND b1.rn = 1
    ),
    _thr AS (
      SELECT k, a, b, CAST(1 AS BIGINT) AS rn, z,
             CAST(NULL AS DOUBLE) AS fit, CAST(NULL AS DOUBLE) AS yv,
             CAST(NULL AS BIGINT) AS x
      FROM _thi
      UNION ALL
      SELECT r.k, r.a, r.b, r.rn + 1, {step['znew']},
             {step['fit']}, {dec_to_double('c.y')}, CAST(c.x AS BIGINT)
      FROM _thr r JOIN _thn c ON c.k = r.k AND c.rn = r.rn + 1
    )
    SELECT k AS {group_col}, x AS day_x, yv AS y_val,
           {rd('fit')} AS theta_fit,
           {rd('(yv - fit)')} AS theta_err
    FROM _thr WHERE rn >= 2
    """


def theta_forecast(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    alpha: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`theta_forecast_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_theta_in"
    df.createOrReplaceTempView(view)
    # STAGE the centered bucket frame: it feeds the OLS stats AND the
    # fold group, and its own build reads the bucket relation twice
    # (rows + per-key min) — unstaged, Catalyst replans the bucket
    # groupBy + scan per reference (9 exchanges measured).  The staged
    # frame is |series|×|calendar| rows; the oracle keeps the
    # one-statement form.
    day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    cview = "_ts_theta_centered"
    df.sparkSession.sql(f"""
      WITH _thb AS (
        SELECT {group_col} AS k, {day} AS x,
               CAST(SUM(CAST({value_col} AS DECIMAL(18,6)))
                    AS DECIMAL(18,6)) AS y
        FROM {view} GROUP BY {group_col}, {day}
      )
      SELECT b.k AS k, b.x - m.xmin AS xc, b.x AS x, b.y AS y
      FROM _thb b
      JOIN (SELECT k, MIN(x) AS xmin FROM _thb GROUP BY k) m ON m.k = b.k
    """).localCheckpoint(eager=False).createOrReplaceTempView(cview)
    return df.sparkSession.sql(
        theta_forecast_sql(_S, view, value_col, time_col, group_col,
                           alpha=alpha, round_to=round_to,
                           staged_centered=cview)
    )


def holt_winters_forecast_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    horizon: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 6,
    seasonal: str = "add",
    damping: float | None = None,
) -> str:
    """Holt-Winters H-STEP EXTRAPOLATION per series — the actual
    forecast (:func:`holt_winters_sql` emits in-sample one-step fits;
    a user deploying the forecaster wants ŷ_{t+h}).  All four ETS
    members the in-sample family covers:

        ŷ_{n+h} = (l_n + Φ_h·b_n) ⊕ s_{n+h−m}

    with ⊕ = + (``seasonal='add'``) or × (``'mul'``) and Φ_h the
    damped trend ladder Σ_{i=1..h} φ^i (Gardner & McKenzie 1985;
    φ = 1 ⇒ Φ_h = h, the undamped line).  Each Φ_h is a
    Python-computed ``repr`` literal riding the h-relation — both
    engines parse identical doubles, and no in-SQL power function is
    needed (pow stays banned).  The seasonal index wraps the final
    m-slot queue (position ((h−1) mod m) + 1 — slot i of the final
    queue is the state for step i ahead).  Emits ``horizon`` future
    rows per series: (day_x = last bucket + h on the dense-calendar
    contract, h_step, hw_forecast).

    Engine split: the SAME init/step machinery as holt_winters_sql
    (shared _hw_init_exprs/_hw_scalar_exprs text — Spark's
    aggregate() fold finishing with the FULL state struct instead of
    the fit array; DuckDB's recursion filtered to its final row), so
    (l_n, b_n, seas_n) are bit-equal by the existing proof, and the
    forecast is one shared fixed IEEE tree over them.  Same ≥ 2·period
    HAVING dropout (+ the positivity guard for 'mul'); same gap-free
    contract.
    """
    from ._num import dec_to_double, round_double

    if seasonal not in ("add", "mul"):
        raise ValueError(f"seasonal must be 'add' or 'mul', got {seasonal!r}")
    if damping is not None and not (0.0 < float(damping) <= 1.0):
        raise ValueError(f"damping must be in (0, 1], got {damping}")
    m = int(period)
    h_max = int(horizon)
    if h_max < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    l0, b0 = _hw_init_exprs(m)
    s0_op = "/" if seasonal == "mul" else "-"
    s_op = "*" if seasonal == "mul" else "+"
    pos_guard = " AND MIN(y) > 0" if seasonal == "mul" else ""
    phi = 1.0 if damping is None else float(damping)
    ladder, acc_pow, acc_sum = [], 1.0, 0.0
    for h in range(1, h_max + 1):
        acc_pow = acc_pow * phi
        acc_sum = acc_sum + acc_pow
        ladder.append((h, acc_sum))
    hs_rel = " UNION ALL ".join(
        f"SELECT {h} AS h, {ps!r} AS ps" for h, ps in ladder
    )
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    bucket = f"""SELECT {group_col} AS k, {day} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}"""
    if d.name == "spark":
        yd_e = dec_to_double("e.y")
        step = _hw_scalar_exprs(
            "acc.l", "acc.b", "element_at(acc.seas, 1)", yd_e,
            alpha, beta, gamma, seasonal, damping,
        )
        s_h = f"element_at(fin.seas, ((h - 1) % {m}) + 1)"
        fc = f"((fin.l + (ps * fin.b)) {s_op} {s_h})"
        return f"""
    WITH _hfb AS (
      {bucket}
    ),
    _hfg AS (
      SELECT k, sort_array(collect_list(named_struct('x', x, 'y', y))) AS arr,
             CAST(COUNT(*) AS INT) AS n,
             CAST(SUM(y) FILTER (WHERE rn <= {m}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m} AND rn <= {2 * m}) AS DECIMAL(27,6)) AS s2m
      FROM (SELECT k, x, y,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
            FROM _hfb)
      GROUP BY k
      HAVING COUNT(*) >= {2 * m}{pos_guard}
    ),
    _hff AS (
      SELECT k, element_at(arr, n).x AS last_x,
        aggregate(
          slice(arr, {m + 1}, n - {m}),
          named_struct('l', {l0}, 'b', {b0},
                       'seas', transform(slice(arr, 1, {m}),
                                         e -> ({dec_to_double('e.y')} {s0_op} {l0}))),
          (acc, e) -> named_struct(
              'l', {step['lnew']}, 'b', {step['bnew']},
              'seas', concat(slice(acc.seas, 2, {m - 1}), array({step['snew']})))
        ) AS fin
      FROM _hfg
    )
    SELECT k AS {group_col},
           CAST(last_x + h AS BIGINT) AS day_x,
           CAST(h AS INT) AS h_step,
           {rd(fc)} AS hw_forecast
    FROM _hff CROSS JOIN ({hs_rel}) _t
    """
    yd_b = dec_to_double("b.y")
    step = _hw_scalar_exprs("r.l", "r.b", "r.seas[1]", yd_b,
                            alpha, beta, gamma, seasonal, damping)
    s_h = f"fin.seas[((h - 1) % {m}) + 1]"
    fc = f"((fin.l + (ps * fin.b)) {s_op} {s_h})"
    return f"""
    WITH RECURSIVE _hfb AS (
      {bucket}
    ),
    _hfr0 AS (
      SELECT k, x, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
      FROM _hfb
    ),
    _hfa AS (
      SELECT k, CAST(COUNT(*) AS INT) AS n,
             CAST(MAX(x) AS BIGINT) AS last_x,
             CAST(SUM(y) FILTER (WHERE rn <= {m}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m} AND rn <= {2 * m}) AS DECIMAL(27,6)) AS s2m
      FROM _hfr0 GROUP BY k HAVING COUNT(*) >= {2 * m}{pos_guard}
    ),
    _hfi AS (
      SELECT k, n, last_x, {l0} AS l0, {b0} AS b0 FROM _hfa
    ),
    _hfs AS (
      SELECT b.k AS k,
             list({dec_to_double('b.y')} {s0_op} i.l0 ORDER BY b.rn) AS seas0
      FROM _hfr0 b JOIN _hfi i ON i.k = b.k
      WHERE b.rn <= {m}
      GROUP BY b.k
    ),
    _hfr AS (
      SELECT i.k AS k, CAST({m} AS BIGINT) AS rn, i.l0 AS l, i.b0 AS b,
             s.seas0 AS seas
      FROM _hfi i JOIN _hfs s ON s.k = i.k
      UNION ALL
      SELECT r.k, r.rn + 1, {step['lnew']}, {step['bnew']},
             list_append(r.seas[2:{m}], {step['snew']})
      FROM _hfr r JOIN _hfr0 b ON b.k = r.k AND b.rn = r.rn + 1
    ),
    _hff AS (
      SELECT r.k AS k, a.last_x AS last_x,
             {{'l': r.l, 'b': r.b, 'seas': r.seas}} AS fin
      FROM _hfr r JOIN _hfa a ON a.k = r.k AND r.rn = a.n
    )
    SELECT k AS {group_col},
           CAST(last_x + h AS BIGINT) AS day_x,
           CAST(h AS INT) AS h_step,
           {rd(fc)} AS hw_forecast
    FROM _hff CROSS JOIN ({hs_rel}) _t
    """


def holt_winters_forecast(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    horizon: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 6,
    seasonal: str = "add",
    damping: float | None = None,
) -> DataFrame:
    """DataFrame front door for :func:`holt_winters_forecast_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_hwfc_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        holt_winters_forecast_sql(
            _S, view, value_col, time_col, group_col,
            period=period, horizon=horizon,
            alpha=alpha, beta=beta, gamma=gamma, round_to=round_to,
            seasonal=seasonal, damping=damping,
        )
    )


def _hw2_scalar_exprs(
    l: str, b: str, s1: str, s2: str, yd: str,
    alpha: float, beta: float, gamma1: float, gamma2: float,
) -> dict[str, str]:
    """The five per-step DOUBLE-seasonal Holt-Winters scalar
    expressions (Taylor 2003 — ETS(A,A,A×A)-style additive form with
    two seasonal queues), parameterized by the VARIABLE SPELLING only
    (the _hw_scalar_exprs discipline): Spark fold reads acc.l /
    element_at(...), the DuckDB recursion reads r.l / [1], and both
    evaluate the IDENTICAL IEEE tree in the identical order.

        fit  = (l + b) + s1_{t−m1} + s2_{t−m2}
        l_t  = α(y_t − s1_{t−m1} − s2_{t−m2}) + (1−α)(l + b)
        b_t  = β(l_t − l) + (1−β)·b
        s1_t = γ₁(y_t − l_t − s2_{t−m2}) + (1−γ₁)·s1_{t−m1}
        s2_t = γ₂(y_t − l_t − s1_t)     + (1−γ₂)·s2_{t−m2}

    The s2 update reads the JUST-UPDATED s1_t (Taylor's sequential
    decomposition: the intraday queue absorbs what the level left,
    the weekly queue absorbs what intraday left) — ``s1new`` is
    INLINED into ``s2new`` like ``lnew`` into both (SQL has no
    let-binding inside a lambda/recursive arm; textual duplication
    keeps the trees equal).  Complements are Python-computed repr
    literals, never in-SQL ``1 - α``.
    """
    a, ca = repr(float(alpha)), repr(1.0 - float(alpha))
    bb, cb = repr(float(beta)), repr(1.0 - float(beta))
    g1, cg1 = repr(float(gamma1)), repr(1.0 - float(gamma1))
    g2, cg2 = repr(float(gamma2)), repr(1.0 - float(gamma2))
    fit = f"((({l} + {b}) + {s1}) + {s2})"
    lnew = f"(({a} * (({yd} - {s1}) - {s2})) + ({ca} * ({l} + {b})))"
    bnew = f"(({bb} * ({lnew} - {l})) + ({cb} * {b}))"
    s1new = f"(({g1} * (({yd} - {lnew}) - {s2})) + ({cg1} * {s1}))"
    s2new = f"(({g2} * (({yd} - {lnew}) - {s1new})) + ({cg2} * {s2}))"
    return {"fit": fit, "lnew": lnew, "bnew": bnew,
            "s1new": s1new, "s2new": s2new}


def holt_winters_two_season_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    m1: int = 24,
    m2: int = 168,
    alpha: float = 0.25,
    beta: float = 0.05,
    gamma1: float = 0.3,
    gamma2: float = 0.2,
    round_to: int = 6,
) -> str:
    """DOUBLE-seasonal additive Holt-Winters over the HOUR-bucketed
    calendar — Taylor 2003 (the intraday-electricity-load model): a
    level/trend pair plus TWO seasonal queues, the short cycle ``m1``
    (default 24 = hour-of-day) NESTED inside the long cycle ``m2``
    (default 168 = hour-of-week; ``m1`` must divide ``m2``), emitting
    the one-step in-sample fit and error per bucket.  A single-season
    fit at either period mis-fits a series that genuinely carries
    both cycles — the two-queue recurrence is what captures e.g.
    daily shape × weekend depression (pinned by the misfit test in
    tests/test_seasonal_quality.py).

    Init (needs ≥ 2·m2 buckets; shorter series drop out loudly via
    HAVING, the holt_winters_sql contract): l₀/b₀ from the first/
    second m2-bucket means (the _hw_init_exprs trees at m=m2);
    s1₀[j] = (mean of the first-m2 rows in intraday phase j) − l₀ —
    each phase has EXACTLY m2/m1 rows because init is row-aligned;
    s2₀[i] = (yᵢ − l₀) − s1₀[phase(i)] for i = 1..m2 (the long queue
    holds what level + short season leave).  The recurrence starts at
    bucket m2+1, whose intraday phase is 1 because m1 | m2 — so the
    natural phase order IS the correct initial queue order.

    Engine split (the holt_winters_sql machinery with a second queue):
    Spark folds the sorted per-series bucket array with ``aggregate()``
    carrying ``named_struct(l, b, s1[m1], s2[m2], fit)`` — JVM-side,
    the init scalars (l₀, b₀, s1₀ array) computed ONCE as columns of
    the pre-fold CTE; DuckDB runs the same recurrence as a recursive
    CTE stepping rn→rn+1 with two list states.  Both sides draw every
    scalar from :func:`_hw2_scalar_exprs` → bit-equal doubles.  y
    enters via dec_to_double of the exact DECIMAL(18,6) bucket sum.

    Gap-free contract: seasonal alignment is BY ROW (the MASE
    LAG-by-rows rule) — it equals calendar alignment only on dense
    hourly calendars; gap-fill first on holey series.

    Scale: series count × ≤ thousands of hourly buckets bounds the
    fold (the KM bounded-fold posture); ONE exchange on (k, x) for
    the bucket sum, the rn window and per-series collapse ride the
    series key.  State per step is m1+m2+2 doubles — constant.
    """
    from ._num import dec_to_double, round_double

    m1, m2 = int(m1), int(m2)
    if m1 < 2 or m2 <= m1 or m2 % m1 != 0:
        raise ValueError(f"need 2 <= m1 < m2 with m1 | m2, got ({m1}, {m2})")
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    l0, b0 = _hw_init_exprs(m2)
    reps = m2 // m1
    if d.name == "spark":
        hx = f"(unix_micros(CAST({time_col} AS TIMESTAMP)) DIV 3600000000)"
    else:
        hx = f"(epoch_us({time_col}) // 3600000000)"
    bucket = f"""SELECT {group_col} AS k, {hx} AS x,
             CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {hx}"""
    # per-intraday-phase sums over the first m2 rows (phase j = 0-based
    # (rn-1) % m1), each with exactly m2/m1 = reps rows — the s1 init
    phase_sums = ", ".join(
        f"CAST(SUM(y) FILTER (WHERE rn <= {m2} AND ((rn - 1) % {m1}) = {j}) "
        f"AS DECIMAL(27,6)) AS ph{j}"
        for j in range(m1)
    )
    s1_init_elems = ", ".join(
        f"(({dec_to_double(f'ph{j}')} / {float(reps)!r}) - l0)"
        for j in range(m1)
    )
    if d.name == "spark":
        yd_e = dec_to_double("e.y")
        step = _hw2_scalar_exprs(
            "acc.l", "acc.b",
            "element_at(acc.s1, 1)", "element_at(acc.s2, 1)", yd_e,
            alpha, beta, gamma1, gamma2,
        )
        yd_init = dec_to_double("e.y")
        yd_out = dec_to_double(f"element_at(arr, pos + {m2 + 1}).y")
        return f"""
    WITH _h2b AS (
      {bucket}
    ),
    _h2g AS (
      SELECT k, sort_array(collect_list(named_struct('x', x, 'y', y))) AS arr,
             CAST(COUNT(*) AS INT) AS n,
             CAST(SUM(y) FILTER (WHERE rn <= {m2}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m2} AND rn <= {2 * m2}) AS DECIMAL(27,6)) AS s2m,
             {phase_sums}
      FROM (SELECT k, x, y,
                   ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
            FROM _h2b)
      GROUP BY k
      HAVING COUNT(*) >= {2 * m2}
    ),
    _h2i AS (
      SELECT k, arr, n, {l0} AS l0, {b0} AS b0,
             {", ".join(f"ph{j}" for j in range(m1))}
      FROM _h2g
    ),
    _h2s AS (
      SELECT k, arr, n, l0, b0, array({s1_init_elems}) AS s1arr
      FROM _h2i
    ),
    _h2f AS (
      SELECT k, arr, n,
        aggregate(
          slice(arr, {m2 + 1}, n - {m2}),
          named_struct('l', l0, 'b', b0,
                       's1', s1arr,
                       's2', transform(slice(arr, 1, {m2}),
                                       (e, i) -> (({yd_init} - l0)
                                                  - element_at(s1arr, (i % {m1}) + 1))),
                       'fit', CAST(array() AS ARRAY<DOUBLE>)),
          (acc, e) -> named_struct(
              'l', {step['lnew']}, 'b', {step['bnew']},
              's1', concat(slice(acc.s1, 2, {m1 - 1}), array({step['s1new']})),
              's2', concat(slice(acc.s2, 2, {m2 - 1}), array({step['s2new']})),
              'fit', concat(acc.fit, array({step['fit']}))),
          acc -> acc.fit) AS fits
      FROM _h2s
    )
    SELECT k AS {group_col},
           CAST(element_at(arr, pos + {m2 + 1}).x AS BIGINT) AS hour_x,
           {yd_out} AS y_val,
           {rd('fitv')} AS hw2_fit,
           {rd(f'({yd_out} - fitv)')} AS hw2_err
    FROM _h2f LATERAL VIEW posexplode(fits) _t AS pos, fitv
    """
    yd_b = dec_to_double("b.y")
    step = _hw2_scalar_exprs("r.l", "r.b", "r.seas1[1]", "r.seas2[1]", yd_b,
                             alpha, beta, gamma1, gamma2)
    s1_init_list = ", ".join(
        f"(({dec_to_double(f'ph{j}')} / {float(reps)!r}) - l0)"
        for j in range(m1)
    )
    return f"""
    WITH RECURSIVE _h2b AS (
      {bucket}
    ),
    _h2r0 AS (
      SELECT k, x, y, ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS rn
      FROM _h2b
    ),
    _h2a AS (
      SELECT k, CAST(COUNT(*) AS INT) AS n,
             CAST(SUM(y) FILTER (WHERE rn <= {m2}) AS DECIMAL(27,6)) AS s1m,
             CAST(SUM(y) FILTER (WHERE rn > {m2} AND rn <= {2 * m2}) AS DECIMAL(27,6)) AS s2m,
             {phase_sums}
      FROM _h2r0 GROUP BY k HAVING COUNT(*) >= {2 * m2}
    ),
    _h2i AS (
      SELECT k, n, {l0} AS l0, {b0} AS b0, s1m, s2m,
             {", ".join(f"ph{j}" for j in range(m1))}
      FROM _h2a
    ),
    _h2s1 AS (
      SELECT k, n, l0, b0, list_value({s1_init_list}) AS s1arr
      FROM _h2i
    ),
    _h2s2 AS (
      SELECT b.k AS k,
             list(({yd_b} - i.l0) - i.s1arr[(((b.rn - 1) % {m1}) + 1)]
                  ORDER BY b.rn) AS s2arr
      FROM _h2r0 b JOIN _h2s1 i ON i.k = b.k
      WHERE b.rn <= {m2}
      GROUP BY b.k
    ),
    _h2r AS (
      SELECT i.k AS k, CAST({m2} AS BIGINT) AS rn, i.l0 AS l, i.b0 AS b,
             i.s1arr AS seas1, s.s2arr AS seas2, CAST(NULL AS DOUBLE) AS fit,
             CAST(NULL AS DOUBLE) AS yv, CAST(NULL AS BIGINT) AS x
      FROM _h2s1 i JOIN _h2s2 s ON s.k = i.k
      UNION ALL
      SELECT r.k, r.rn + 1, {step['lnew']}, {step['bnew']},
             list_append(r.seas1[2:{m1}], {step['s1new']}),
             list_append(r.seas2[2:{m2}], {step['s2new']}),
             {step['fit']}, {yd_b}, CAST(b.x AS BIGINT)
      FROM _h2r r JOIN _h2r0 b ON b.k = r.k AND b.rn = r.rn + 1
    )
    SELECT k AS {group_col}, x AS hour_x, yv AS y_val,
           {rd('fit')} AS hw2_fit,
           {rd('(yv - fit)')} AS hw2_err
    FROM _h2r WHERE rn > {m2}
    """


def holt_winters_two_season(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    m1: int = 24,
    m2: int = 168,
    alpha: float = 0.25,
    beta: float = 0.05,
    gamma1: float = 0.3,
    gamma2: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`holt_winters_two_season_sql`
    (every CTE referenced once → one inlined plan, single series-key
    exchange after the bucket collapse)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_hw2_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        holt_winters_two_season_sql(
            _S, view, value_col, time_col, group_col,
            m1=m1, m2=m2, alpha=alpha, beta=beta,
            gamma1=gamma1, gamma2=gamma2, round_to=round_to,
        )
    )


def ts_strength_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    round_to: int = 6,
) -> str:
    """Per-series trend / seasonal STRENGTH features (Wang, Smith &
    Hyndman 2006; the tsfeatures panel's two headline numbers, defined
    over an additive decomposition):

        F_T = max(0, 1 − Var(resid) / Var(trend + resid))
        F_S = max(0, 1 − Var(resid) / Var(seasonal + resid))

    both in [0, 1] — ~0 when the component explains nothing, → 1 when
    it explains nearly all interior variance.  The model-selection
    readout for a series fleet: F_S near 0 says don't pay for a
    seasonal model (the season_detect / holt_winters dial), F_T near 0
    says a level-only smoother suffices.

    Composes VERBATIM over :func:`classical_decompose_sql` (the
    deterministic member of the STL family here) as a staged relation:
    strengths aggregate only the decomposition's interior rows (resid
    non-NULL — full MA windows).  Variances are population form
    (Σx² − (Σx)²/n)/n with every derived double round_double-quantized
    to DECIMAL before its SUM (order-independent, the dsum discipline);
    the final ratios are IEEE ops on identical doubles.  Zero-variance
    guards: a constant deseasonalized/detrended series divides by
    1e-300 and clamps into the max(0, ·) floor.

    Shape: the decomposition's exchanges (one bucket groupBy, two
    windows) + ONE per-series aggregation — nothing else.
    """
    from ._num import dec_to_double, round_double

    dec = classical_decompose_sql(
        d, table, value_col, time_col, group_col,
        period=period, round_to=round_to,
    )
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    q18 = lambda e: f"CAST({e} AS DECIMAL(18,6))"  # noqa: E731
    q27 = lambda e: f"CAST({rd(e)} AS DECIMAL(27,6))"  # noqa: E731
    var = lambda s2, s1: (  # noqa: E731
        f"(({dec_to_double(s2)} - {dec_to_double(s1)} * {dec_to_double(s1)}"
        f" / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"
    )
    strength = lambda comp: (  # noqa: E731
        f"greatest(CAST(0 AS DOUBLE), 1.0 - {var('sr2', 'sr1')}"
        f" / greatest({var(f'{comp}2', f'{comp}1')}, 1e-300))"
    )
    return f"""
    WITH _dec AS ({dec}
    ),
    _tsa AS (
      SELECT {group_col} AS k,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM({q18("resid")}) AS sr1,
             SUM({q27("resid * resid")}) AS sr2,
             SUM({q18("(trend + resid)")}) AS st1,
             SUM({q27("(trend + resid) * (trend + resid)")}) AS st2,
             SUM({q18("(seasonal + resid)")}) AS ss1,
             SUM({q27("(seasonal + resid) * (seasonal + resid)")}) AS ss2
      FROM _dec WHERE resid IS NOT NULL
      GROUP BY {group_col}
    )
    SELECT k AS {group_col},
           n AS n_interior,
           {rd(strength("st"))} AS trend_strength,
           {rd(strength("ss"))} AS seasonal_strength
    FROM _tsa
    """


def ts_strength(
    df,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    period: int = 7,
    round_to: int = 6,
):
    """DataFrame front door for :func:`ts_strength_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_tsf_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        ts_strength_sql(
            _S, view, value_col, time_col, group_col,
            period=period, round_to=round_to,
        )
    )
