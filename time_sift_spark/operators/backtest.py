"""Forecast backtesting: seasonal-naive vs naive MAE and the MASE
ratio per series.

The evaluation stage every forecasting pipeline needs before it trusts
a model: score the two canonical zero-parameter baselines on the
observed history — naive (tomorrow = today) and seasonal naive
(tomorrow = same day last week) — and report MASE (Hyndman & Koehler
2006), the scale-free ratio the M-competitions standardize on.  A
candidate model that can't beat mase < 1 has not learned the
seasonality; these two numbers are the yardstick.

Determinism (the driver's value-hash gate): bucket sums and absolute
errors are exact decimals (ABS of a decimal difference is exact); each
MAE is one dec→double cast + one IEEE division; MASE is one further
division of those two doubles — identical expression trees on both
engines.  Plan: day bucketing is one exact-decimal groupBy, then ONE
exchange on the series key feeds both LAG frames and the per-key
reduce rides the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError

__all__ = ["conformal_backtest", "conformal_backtest_sql",
           "mase_backtest", "mase_backtest_sql",
           "naive7_pairs_select",
           "pinball_backtest", "pinball_backtest_sql",
           "regression_report", "regression_report_sql"]


def mase_backtest_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    season: int = 7,
    round_to: int = 6,
) -> str:
    """Per-series naive / seasonal-naive backtest over daily buckets.

    Both forecasters are LAG frames over the bucket index (1 row and
    ``season`` rows); the shared evaluation window keeps only rows
    where BOTH forecasts exist (the standard MASE convention — same
    eval set for numerator and denominator), so series shorter than
    ``season``+1 buckets drop out.  LAG-by-rows equals LAG-by-calendar
    only on gap-free series — gap-fill first (operators/gapfill.py) if
    the calendar has holes; this is the documented contract, not a
    silent assumption.  A constant series has mae_naive = 0 and MASE is
    NULL (undefined, not invented).
    """
    from ._num import dec_to_double, round_double

    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    mae_n = f"({dec_to_double('sae_n')} / CAST(n_eval AS DOUBLE))"
    mae_s = f"({dec_to_double('sae_s')} / CAST(n_eval AS DOUBLE))"
    mase = (
        f"CASE WHEN sae_n = 0 THEN CAST(NULL AS DOUBLE)"
        f" ELSE {round_double(f'({mae_s} / {mae_n})', round_to)} END"
    )
    return f"""
    WITH _btb AS (
      SELECT {group_col} AS k, {day} AS x,
             CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}
    ),
    _btl AS (
      SELECT k, x, y,
             LAG(y, 1) OVER (PARTITION BY k ORDER BY x) AS f_naive,
             LAG(y, {season}) OVER (PARTITION BY k ORDER BY x) AS f_seasonal
      FROM _btb
    ),
    _bte AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(ABS(y - f_naive)) AS DECIMAL(27,6)) AS sae_n,
             CAST(SUM(ABS(y - f_seasonal)) AS DECIMAL(27,6)) AS sae_s
      FROM _btl
      WHERE f_naive IS NOT NULL AND f_seasonal IS NOT NULL
      GROUP BY k
    )
    SELECT k AS {group_col}, n_eval,
           {round_double(mae_n, round_to)} AS mae_naive,
           {round_double(mae_s, round_to)} AS mae_seasonal,
           {mase} AS mase
    FROM _bte
    """


def mase_backtest(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    season: int = 7,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`mase_backtest_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    assert_time_dtype(df, time_col)
    view = "_ts_mase_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        mase_backtest_sql(_S, view, value_col, time_col, group_col,
                          season=season, round_to=round_to)
    )


def _conformal_scores_select(d, table: str, value_col: str, time_col: str,
                             group_col: str, season: int) -> str:
    """The bucket → LAG → nonconformity-score chain as one SELECT — a
    shared text for the inline CTE and the staged front-door frame
    (referenced by BOTH the calibration and evaluation arms, so the
    engine-wide staging rule applies: unstaged, Catalyst replans the
    bucket groupBy and the LAG window per arm)."""
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    return f"""SELECT k, x, CAST(ABS(y - f) AS DECIMAL(18,6)) AS score,
             (x % 2 = 0) AS is_cal
      FROM (
        SELECT k, x, y, LAG(y, {season}) OVER (PARTITION BY k ORDER BY x) AS f
        FROM (
          SELECT {group_col} AS k, {day} AS x,
                 CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y
          FROM {table} GROUP BY {group_col}, {day}
        ) _cbb
      ) _cbl WHERE f IS NOT NULL"""


def conformal_backtest_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    season: int = 7,
    alpha: float = 0.1,
    round_to: int = 6,
    staged_scores: str | None = None,
) -> str:
    """Split-conformal prediction interval for the seasonal-naive
    forecaster, per series (Vovk et al.; the distribution-free
    guarantee every forecast consumer actually wants: ŷ ± q̂ covers the
    truth with probability ≥ 1−α, no model assumptions).

    Calibration = even bucket days, evaluation = odd (deterministic
    split); nonconformity = |y − ŷ|; q̂ is the ⌈(n_cal+1)(1−α)⌉-th
    smallest calibration score (the finite-sample-correct order
    statistic — NOT the naive quantile); the eval half reports the
    EMPIRICAL coverage of ±q̂, which the guarantee lower-bounds.

    Determinism: scores are exact decimals (ABS of decimal LAG
    differences), the order statistic is an element_at into the sorted
    per-series array, and coverage compares decimals exactly — only
    the final ratio is a double.  When the rank exceeds n_cal (too few
    calibration points for the requested α) q̂ and coverage are NULL —
    the honest "not enough data for this guarantee", not a clamped
    pretend-interval.  A series with calibration scores but NO
    evaluation (odd-day) scores still surfaces — q_alpha with NULL
    n_eval/coverage (LEFT JOIN of the eval arm onto the per-series q̂
    relation), never a silent drop-out.  Shape: the MASE plan (bucket groupBy + ONE
    series-key exchange for the LAG frame) plus a broadcast-sized
    per-series q̂ join; the sorted array is per-series calibration
    scores — the bounded-calendar posture.
    """
    from ._num import round_double

    if d.name == "spark":
        arr = "sort_array(collect_list(score))"
        at = "element_at(sarr, rank_q)"
    else:
        arr = "list_sort(list(score))"
        at = "sarr[rank_q]"
    scores = (
        f"SELECT k, x, score, is_cal FROM {staged_scores}" if staged_scores
        else _conformal_scores_select(d, table, value_col, time_col,
                                      group_col, season)
    )
    one_m_a = repr(1.0 - float(alpha))
    cov = "(CAST(e.covered AS DOUBLE) / CAST(e.n_eval AS DOUBLE))"
    return f"""
    WITH _cbs AS (
      {scores}
    ),
    _cbq AS (
      SELECT k, {arr} AS sarr, CAST(COUNT(*) AS BIGINT) AS n_cal,
             CAST(CEIL(CAST(COUNT(*) + 1 AS DOUBLE) * {one_m_a}) AS INT)
               AS rank_q
      FROM _cbs WHERE is_cal GROUP BY k
    ),
    _cbqv AS (
      SELECT k, n_cal,
             CASE WHEN rank_q <= n_cal THEN {at} END AS q_hat
      FROM _cbq
    ),
    _cbe AS (
      SELECT s.k AS k,
             CAST(COUNT(*) AS BIGINT) AS n_eval,
             CAST(SUM(CASE WHEN s.score <= q.q_hat THEN 1 ELSE 0 END)
                  AS BIGINT) AS covered
      FROM _cbs s JOIN _cbqv q ON s.k = q.k
      WHERE NOT s.is_cal
      GROUP BY s.k
    )
    SELECT q.k AS {group_col}, q.n_cal AS n_cal, e.n_eval AS n_eval,
           CAST(q.q_hat AS DOUBLE) AS q_alpha,
           CASE WHEN q.q_hat IS NULL OR e.n_eval IS NULL
                THEN CAST(NULL AS DOUBLE)
                ELSE {round_double(cov, round_to)} END AS coverage
    FROM _cbqv q LEFT JOIN _cbe e ON q.k = e.k
    """


def conformal_backtest(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    season: int = 7,
    alpha: float = 0.1,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`conformal_backtest_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    assert_time_dtype(df, time_col)
    view = "_ts_conf_in"
    df.createOrReplaceTempView(view)
    # STAGE the scored frame once (the engine staging rule): _cbs is
    # referenced by both the calibration and evaluation arms, and
    # Catalyst replans the bucket groupBy + LAG window per reference.
    sview = "_ts_conf_scores"
    df.sparkSession.sql(
        _conformal_scores_select(_S, view, value_col, time_col,
                                 group_col, season)
    ).localCheckpoint(eager=False).createOrReplaceTempView(sview)
    return df.sparkSession.sql(
        conformal_backtest_sql(_S, view, value_col, time_col, group_col,
                               season=season, alpha=alpha,
                               round_to=round_to, staged_scores=sview)
    )


def pinball_backtest_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    taus: tuple[tuple[int, int], ...] = ((1, 2), (9, 10)),
    round_to: int = 6,
    staged_buckets: str | None = None,
) -> str:
    """Quantile-forecast evaluation: the PINBALL (quantile) loss of the
    empirical-quantile forecaster per series and per τ — the proper
    scoring rule for quantile forecasts (the M5-Uncertainty metric),
    completing the backtest family: MASE scores point forecasts,
    coverage audits conformal intervals, pinball scores the quantiles
    themselves.

    Split: even bucket-days calibrate, odd days evaluate (the conformal
    discipline).  q̂_τ is the type-1 empirical quantile — the
    ⌈τ·n_cal⌉-th order statistic, rank computed as EXACT integer
    arithmetic ((num·n + den − 1) intdiv den with τ = num/den, so no
    float-ceil edge case exists by construction).  Loss terms
    max(τ·(y−q̂), (τ−1)·(y−q̂)) are doubles from one decimal
    difference each, quantized before the exact-decimal sum
    (order-independent), one division at the end.

    Plan: ONE bucket groupBy + one series-key exchange for the
    calibration sort; the ≤|series|×|τ| q̂ relation joins the eval arm
    broadcast-sized.  The bucket frame is referenced by BOTH arms, so
    the engine-wide staging rule applies — the Spark front door stages
    it (``staged_buckets``), the oracle keeps the inline text.
    """
    from ._num import dec_to_double, round_double

    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
        arr = "sort_array(collect_list(y))"
        at = "element_at(sarr, rank_q)"
        idiv = lambda a, b: f"({a} DIV {b})"  # noqa: E731
        tvals = "SELECT * FROM VALUES {body} AS _pbt(tau, num, den)"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
        arr = "list_sort(list(y))"
        at = "sarr[rank_q]"
        idiv = lambda a, b: f"({a} // {b})"  # noqa: E731
        tvals = "SELECT * FROM (VALUES {body}) AS _pbt(tau, num, den)"
    body = ", ".join(
        f"(CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE), {num}, {den})"
        for num, den in taus
    )
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    buckets = (
        f"SELECT k, x, y, is_cal FROM {staged_buckets}" if staged_buckets
        else f"""SELECT {group_col} AS k, {day} AS x,
             CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y,
             ({day} % 2 = 0) AS is_cal
      FROM {table} GROUP BY {group_col}, {day}"""
    )
    diff = "CAST(e.y - q.qhat AS DOUBLE)"
    term = f"GREATEST(q.tau * {diff}, (q.tau - 1.0) * {diff})"
    qterm = f"CAST({round_double(term, 9)} AS DECIMAL(27,9))"
    mean_pb = f"({dec_to_double('spb')} / CAST(n_eval AS DOUBLE))"
    return f"""
    WITH _pbb AS (
      {buckets}
    ),
    _pbq AS (
      SELECT k, {arr} AS sarr, CAST(COUNT(*) AS BIGINT) AS n_cal
      FROM _pbb WHERE is_cal GROUP BY k
    ),
    _pbqt AS (
      SELECT q.k AS k, t.tau AS tau, t.num AS num, t.den AS den, q.n_cal AS n_cal,
             CAST({idiv('(t.num * q.n_cal + t.den - 1)', 't.den')} AS INT) AS rank_q
      FROM _pbq q CROSS JOIN ({tvals.format(body=body)}) t
    ),
    _pbqv AS (
      SELECT p.k AS k, p.tau AS tau, p.num AS num, p.den AS den, p.n_cal AS n_cal,
             CASE WHEN p.rank_q >= 1 AND p.rank_q <= p.n_cal
                  THEN {at.replace('sarr', 'q.sarr').replace('rank_q', 'p.rank_q')} END AS qhat
      FROM _pbqt p JOIN _pbq q ON q.k = p.k
    ),
    _pbe AS (
      SELECT q.k AS k, q.tau AS tau, q.num AS num, q.den AS den, q.n_cal AS n_cal,
             CAST(COUNT(e.y) AS BIGINT) AS n_eval,
             CAST(SUM({qterm}) AS DECIMAL(38,9)) AS spb
      FROM _pbqv q LEFT JOIN _pbb e ON e.k = q.k AND NOT e.is_cal
      WHERE q.qhat IS NOT NULL
      GROUP BY q.k, q.tau, q.num, q.den, q.n_cal
    )
    SELECT k AS {group_col}, num, den, n_cal, n_eval,
           CASE WHEN n_eval = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {round_double(mean_pb, round_to)} END AS pinball_loss
    FROM _pbe
    """


def pinball_backtest(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    taus: tuple[tuple[int, int], ...] = ((1, 2), (9, 10)),
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`pinball_backtest_sql` — stages
    the bucket frame once (lazy localCheckpoint; both the calibration
    and evaluation arms reference it)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    spark = df.sparkSession
    view = "_ts_pinball_in"
    df.createOrReplaceTempView(view)
    inline = pinball_backtest_sql(_S, view, value_col, time_col, group_col,
                                  taus=taus, round_to=round_to)
    bucket_sel = inline.split("_pbb AS (", 1)[1].split("\n    ),", 1)[0]
    staged = spark.sql(bucket_sel).localCheckpoint(eager=False)
    sview = "_ts_pinball_buckets"
    staged.createOrReplaceTempView(sview)
    return spark.sql(
        pinball_backtest_sql(_S, view, value_col, time_col, group_col,
                             taus=taus, round_to=round_to,
                             staged_buckets=sview)
    )


def regression_report_sql(
    d,
    pairs_select: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> str:
    """Regression evaluation panel per group over a (g, yhat, y)
    relation: n, bias (mean error), MAE, RMSE, R², and MAPE over the
    nonzero-actual subset (with its own count, so the exclusion is
    visible) — the regression companion of the classification tier
    (AUC / calibration / Brier / report), and the generic scorer any
    forecast in this module can feed.

    ``pairs_select`` is a dialect-rendered SELECT producing
    ``(g, yhat DOUBLE, y DOUBLE)`` — the caller owns the prediction
    join (the point-in-time discipline); this statement owns only the
    metrics.

    Determinism: every accumulated term (error, |error|, error²,
    y, y², |error/y|) quantizes to DECIMAL(27,6)/(38,12) BEFORE its
    SUM (the dsum discipline — double sums reassociate); the final
    metrics are fixed IEEE trees over the exact decimal-backed sums
    (RMSE adds one sqrt; R² = 1 − SSE/SST with a zero-variance NULL
    guard).  Shape: ONE partial-aggregated exchange on the group key;
    output is |groups| rows.
    """
    from ._num import dec_to_double, round_double

    rd = lambda e: round_double(e, round_to)  # noqa: E731
    d6 = lambda e: f"CAST({e} AS DECIMAL(27,6))"  # noqa: E731
    d12 = lambda e: f"CAST({e} AS DECIMAL(38,12))"  # noqa: E731
    nD = "CAST(n AS DOUBLE)"
    se_, sae = dec_to_double("s_err"), dec_to_double("s_abs")
    sq_, sy_ = dec_to_double("s_sq"), dec_to_double("s_y")
    syy_ = dec_to_double("s_yy")
    sape, nnz = dec_to_double("s_ape"), "CAST(n_nz AS DOUBLE)"
    sst = f"({syy_} - ({sy_} * {sy_} / {nD}))"
    return f"""
    WITH _rrp AS (
      {pairs_select}
    ),
    _rra AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM({d6('(yhat - y)')}) AS s_err,
             SUM({d6('ABS(yhat - y)')}) AS s_abs,
             SUM({d12('((yhat - y) * (yhat - y))')}) AS s_sq,
             SUM({d6('y')}) AS s_y,
             SUM({d12('(y * y)')}) AS s_yy,
             CAST(SUM(CASE WHEN y <> 0.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nz,
             SUM(CASE WHEN y <> 0.0
                      THEN {d6('ABS((yhat - y) / y)')}
                      ELSE {d6('0.0')} END) AS s_ape
      FROM _rrp GROUP BY g
    )
    SELECT g AS {group_col}, n, n_nz,
           {rd(f'({se_} / {nD})')} AS bias,
           {rd(f'({sae} / {nD})')} AS mae,
           {rd(f'sqrt({sq_} / {nD})')} AS rmse,
           CASE WHEN {sst} <= 0.0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd(f'(1.0 - ({sq_} / {sst}))')} END AS r2,
           CASE WHEN n_nz = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd(f'({sape} / {nnz})')} END AS mape
    FROM _rra
    """


def naive7_pairs_select(d, table: str, value_col: str, time_col: str,
                        group_col: str) -> str:
    """(g, yhat, y) pairs for the SEASONAL-NAIVE-7 forecast over the
    day-bucketed series (yhat = the bucket 7 ROWS back — the MASE
    LAG-by-rows contract: calendar-correct on dense calendars) — the
    canonical baseline feed for :func:`regression_report_sql`."""
    from ._num import dec_to_double

    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    return f"""SELECT g, yhat, y FROM (
        SELECT k AS g,
               {dec_to_double('LAG(yb, 7) OVER (PARTITION BY k ORDER BY x)')}
                 AS yhat,
               {dec_to_double('yb')} AS y
        FROM (SELECT {group_col} AS k, {day} AS x,
                     CAST(SUM(CAST({value_col} AS DECIMAL(18,6)))
                          AS DECIMAL(18,6)) AS yb
              FROM {table} GROUP BY {group_col}, {day})
      ) WHERE yhat IS NOT NULL"""


def regression_report(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door: score the seasonal-naive-7 baseline on the
    day-bucketed series via :func:`regression_report_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_regr_in"
    df.createOrReplaceTempView(view)
    pairs = naive7_pairs_select(_S, view, value_col, time_col, group_col)
    return df.sparkSession.sql(
        regression_report_sql(_S, pairs, group_col, round_to=round_to)
    )
