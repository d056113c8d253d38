"""Survival analysis: Kaplan-Meier curves per cohort (time-to-event
with right censoring).

The retention question product analytics actually asks — "what fraction
of the users who signed up in week W had purchased within d days?" —
with the censoring handled correctly: users whose observation window
ends before they convert are NOT failures, they leave the at-risk set
(naive conversion-rate-by-day silently treats them as never-converting
and biases every cohort whose tail is still open).

    Ŝ(t) = Π_{t_i ≤ t} (1 − d_i / n_i)        (Kaplan & Meier 1958)

with d_i events and n_i subjects at risk at event time t_i (events at
t precede censorings at t — the standard convention).

Determinism (the driver's value-hash gate): d_i, c_i, n_i are exact
BIGINTs from one groupBy + two window sums; each factor is ONE IEEE
division of exact integers; the survival product folds the ORDERED
per-cohort factor prefix left-to-right on both engines (Spark
``aggregate(arr, 1.0, *)`` vs DuckDB ``list_reduce(list_prepend(1.0,
arr), *)`` — ``1.0·x ≡ x`` exactly, so the multiply sequences are
identical and the doubles bit-equal), then round_double's.

Scale: subjects reduce to per-(cohort, duration) rows BEFORE any
window — the curve relation is |cohorts| × |distinct durations|, never
the subject population; ONE exchange on the cohort key carries the
at-risk sums, the ordered prefix-factor list, and the fold.  The
prefix fold is O(|durations|²) multiplies per cohort — bounded by the
observation calendar (30-day horizon → ≤ 465 multiplies), the
rolling-corr bounded-calendar posture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError

__all__ = ["km_survival", "km_survival_sql", "logrank", "logrank_lge_sql",
           "logrank_sql", "nelson_aalen", "nelson_aalen_sql"]


def km_survival_sql(
    d,
    table: str,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
) -> str:
    """Per-signup-week-cohort KM curve: one row per (cohort, duration)
    with the at-risk count, events, censorings, and Ŝ(duration).

    Subjects are users with a ``start_type`` row at/before
    ``horizon_date``; the event is their first ``event_type`` row at or
    after their start; subjects without one by the horizon are censored
    AT the horizon.  Durations are whole days.
    """
    from ._num import round_double

    base = _surv_at_risk_ctes(d, table, user_col, time_col, type_col,
                              start_type, event_type, horizon_date)
    if d.name == "spark":
        prefix = "collect_list(factor) OVER _wcum"
        fold = (
            "aggregate(pfx, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"
        )
    else:
        prefix = "list(factor) OVER _wcum"
        fold = (
            "list_reduce(list_prepend(CAST(1.0 AS DOUBLE), pfx),"
            " (acc, x) -> acc * x)"
        )
    factor = (
        "(CAST(n_at_risk - d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE))"
    )
    return f"""
    WITH {base},
    _kmf AS (
      SELECT cohort, dur, d_events, c_censored, n_at_risk,
             {factor} AS factor
      FROM _kmr
    ),
    _kmp AS (
      SELECT cohort, dur, d_events, c_censored, n_at_risk,
             {prefix} AS pfx
      FROM _kmf
      WINDOW _wcum AS (PARTITION BY cohort ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT cohort, CAST(dur AS BIGINT) AS duration_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events, c_censored,
           {round_double(fold, round_to)} AS survival
    FROM _kmp
    """


def _surv_at_risk_ctes(
    d,
    table: str,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
) -> str:
    """The subject → (cohort, duration) → at-risk CTE chain shared
    VERBATIM by KM (product of survival factors) and Nelson-Aalen (sum
    of hazard increments): subjects reduce to per-(cohort, duration)
    rows BEFORE any window, so both estimators run on the
    |cohorts| × |durations| relation, never the subject population."""
    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    hz = f"DATE '{horizon_date}'"
    if d.name == "spark":
        day_diff = lambda a, b: f"datediff({a}, {b})"  # noqa: E731
    else:
        day_diff = lambda a, b: f"datediff('day', {b}, {a})"  # noqa: E731
    week = "CAST(date_trunc('week', t0) AS TIMESTAMP)"
    return f"""_kms AS (
      SELECT {user_col} AS uid,
             CAST(MIN(CASE WHEN {type_col} = {q(start_type)}
                           THEN {time_col} END) AS DATE) AS t0
      FROM {table}
      GROUP BY {user_col}
      HAVING MIN(CASE WHEN {type_col} = {q(start_type)}
                 THEN {time_col} END) IS NOT NULL
    ),
    _kmev AS (
      SELECT s.uid AS uid, s.t0 AS t0,
             MIN(CASE WHEN e.ok THEN e.td END) AS te
      FROM _kms s
      LEFT JOIN (
        SELECT {user_col} AS uid, CAST({time_col} AS DATE) AS td,
               ({type_col} = {q(event_type)}) AS ok
        FROM {table}
      ) e ON e.uid = s.uid AND e.ok AND e.td >= s.t0 AND e.td <= {hz}
      GROUP BY s.uid, s.t0
    ),
    _kmsub AS (
      SELECT uid, {week} AS cohort,
             CASE WHEN te IS NOT NULL THEN {day_diff('te', 't0')}
                  ELSE {day_diff(hz, 't0')} END AS dur,
             CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM _kmev
      WHERE t0 <= {hz}
    ),
    _kme AS (
      SELECT cohort, dur,
             CAST(SUM(ev) AS BIGINT) AS d_events,
             CAST(SUM(1 - ev) AS BIGINT) AS c_censored
      FROM _kmsub GROUP BY cohort, dur
    ),
    _kmr AS (
      SELECT cohort, dur, d_events, c_censored,
             (SUM(d_events + c_censored) OVER (PARTITION BY cohort)
              - COALESCE(SUM(d_events + c_censored) OVER (
                  PARTITION BY cohort ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
               AS n_at_risk
      FROM _kme
    )"""


def km_survival(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`km_survival_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (user_col, time_col, type_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_km_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        km_survival_sql(
            _S, view, user_col, time_col, type_col,
            start_type, event_type, horizon_date, round_to=round_to,
        )
    )


def nelson_aalen_sql(
    d,
    table: str,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
) -> str:
    """Nelson-Aalen cumulative hazard per cohort — the additive
    companion of :func:`km_survival_sql` (Nelson 1972; Aalen 1978):

        Ĥ(t) = Σ_{t_i ≤ t} d_i / n_i

    The hazard view of the same data: where Ŝ(t) answers "what fraction
    survives to t", Ĥ(t)'s increments are the per-interval event RATES —
    the quantity rate-regression and competing-risk analyses consume,
    and a better-behaved estimator than −ln(Ŝ) in small samples (and
    ln is banned here anyway — Ĥ is the rational object).

    Determinism: identical skeleton to KM — the shared
    :func:`_surv_at_risk_ctes` chain (VERBATIM text), each increment is
    one IEEE division of exact BIGINTs, and the cumulative sum is the
    ORDERED prefix fold (``aggregate(..., 0.0, acc + x)`` ≡ DuckDB
    ``list_reduce(list_prepend(0.0, ...), acc + x)``, 0.0 + x ≡ x
    exactly) — never a windowed double SUM, whose accumulation order
    engines don't promise.  Scale posture: the KM row (curve relation =
    |cohorts| × |durations|, one cohort-key exchange).
    """
    from ._num import round_double

    base = _surv_at_risk_ctes(d, table, user_col, time_col, type_col,
                              start_type, event_type, horizon_date)
    if d.name == "spark":
        prefix = "collect_list(hinc) OVER _wcum"
        fold = "aggregate(pfx, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    else:
        prefix = "list(hinc) OVER _wcum"
        fold = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), pfx),"
            " (acc, x) -> acc + x)"
        )
    hinc = "(CAST(d_events AS DOUBLE) / CAST(n_at_risk AS DOUBLE))"
    return f"""
    WITH {base},
    _naf AS (
      SELECT cohort, dur, d_events, c_censored, n_at_risk,
             {hinc} AS hinc
      FROM _kmr
    ),
    _nap AS (
      SELECT cohort, dur, d_events, c_censored, n_at_risk,
             {prefix} AS pfx
      FROM _naf
      WINDOW _wcum AS (PARTITION BY cohort ORDER BY dur
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT cohort, CAST(dur AS BIGINT) AS duration_days,
           CAST(n_at_risk AS BIGINT) AS n_at_risk, d_events, c_censored,
           {round_double(fold, round_to)} AS cum_hazard
    FROM _nap
    """


def nelson_aalen(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`nelson_aalen_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (user_col, time_col, type_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_na_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        nelson_aalen_sql(
            _S, view, user_col, time_col, type_col,
            start_type, event_type, horizon_date, round_to=round_to,
        )
    )


def logrank_lge_sql(
    d,
    table: str,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
) -> str:
    """The (cohort, arm, dur) → (d_arm, removed) subject reduction of
    the log-rank statement as a STANDALONE statement — the stageable
    shared frame (referenced by both the pooled-time grid and the
    at-risk union; unstaged, Catalyst replans the whole subject
    reduction — two corpus scans + three aggregations — per
    reference)."""
    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    hz = f"DATE '{horizon_date}'"
    if d.name == "spark":
        day_diff = lambda a, b: f"datediff({a}, {b})"  # noqa: E731
        cast_s = "STRING"
    else:
        day_diff = lambda a, b: f"datediff('day', {b}, {a})"  # noqa: E731
        cast_s = "VARCHAR"
    arm = f"({d.md5_long(f'CAST({user_col} AS {cast_s})')} % 2)"
    week = "CAST(date_trunc('week', t0) AS TIMESTAMP)"
    return f"""
    WITH _lgs AS (
      SELECT {user_col} AS uid, {arm} AS arm,
             CAST(MIN(CASE WHEN {type_col} = {q(start_type)}
                           THEN {time_col} END) AS DATE) AS t0
      FROM {table}
      GROUP BY {user_col}
      HAVING MIN(CASE WHEN {type_col} = {q(start_type)}
                 THEN {time_col} END) IS NOT NULL
    ),
    _lgev AS (
      SELECT s.uid AS uid, s.arm AS arm, s.t0 AS t0,
             MIN(CASE WHEN e.ok THEN e.td END) AS te
      FROM _lgs s
      LEFT JOIN (
        SELECT {user_col} AS uid, CAST({time_col} AS DATE) AS td,
               ({type_col} = {q(event_type)}) AS ok
        FROM {table}
      ) e ON e.uid = s.uid AND e.ok AND e.td >= s.t0 AND e.td <= {hz}
      GROUP BY s.uid, s.arm, s.t0
    ),
    _lgsub AS (
      SELECT uid, arm, {week} AS cohort,
             CASE WHEN te IS NOT NULL THEN {day_diff('te', 't0')}
                  ELSE {day_diff(hz, 't0')} END AS dur,
             CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM _lgev
      WHERE t0 <= {hz}
    )
    SELECT cohort, arm, dur,
           CAST(SUM(ev) AS BIGINT) AS d_arm,
           CAST(COUNT(*) AS BIGINT) AS removed
    FROM _lgsub GROUP BY cohort, arm, dur
    """


def logrank_sql(
    d,
    table: str,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
    staged_lge: str | None = None,
) -> str:
    """Two-sample log-rank test per cohort (Mantel 1966; Peto & Peto
    1972): does arm A's time-to-event distribution differ from arm B's?
    The inferential companion of the KM curve — the question every A/B
    readout over censored durations actually needs answered, and the
    one a naive conversion-rate z-test gets wrong under censoring.
    Arms are md5-parity of the user key (the CUPED assignment — stable,
    cross-engine, never an RNG).

    At each pooled event time t_j (times with ≥ 1 event in either arm):
    with n_j at risk total, n_1j in arm 1, d_j events total, d_1j in
    arm 1,

        E_1j = d_j · n_1j / n_j
        V_j  = d_j (n_j − d_j) · n_1j · n_0j / (n_j² (n_j − 1))
        χ²   = (Σ_j (d_1j − E_1j))² / Σ_j V_j      ~ χ²(1) under H₀

    All rational — no transcendental anywhere (the p-value lookup is a
    one-row table the caller applies; 3.841 is the 5% critical value).

    Determinism: d/n counts are exact BIGINTs; E and V are fixed IEEE
    trees over exact integers (d_j·n_1j and d_j·(n_j−d_j) multiply as
    BIGINTs first — exact below 2^63, i.e. to ~3·10⁹ subjects);
    per-time terms quantize to DECIMAL(27,6) before summing (the dsum
    discipline — double sums reassociate, decimals don't), and χ² is
    two IEEE ops on the exact decimal-backed sums.

    Scale shape: subjects reduce to (cohort, arm, dur) rows before
    anything else; at-risk counts ride ONE cohort-key window exchange
    over the union of removal rows and the pooled-time grid (RANGE …
    1 PRECEDING — removals AT t are still at risk at t); the pivot and
    the test reduce the |cohorts| × |event times| relation.  Never the
    subject population past the first groupBy.
    """
    from ._num import round_double

    if staged_lge:
        lge_body = f"SELECT * FROM {staged_lge}"
    else:
        inner = logrank_lge_sql(d, table, user_col, time_col, type_col,
                                start_type, event_type, horizon_date)
        lge_body = f"SELECT * FROM ({inner})"
    rd = lambda e: round_double(e, round_to)  # noqa: E731
    dsum6 = lambda e: (  # noqa: E731
        f"CAST(ROUND(SUM(CAST({e} AS DECIMAL(27,6))), 6) AS DOUBLE)"
    )
    e1 = "(CAST(dt * n1 AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    vterm = (
        "(CASE WHEN n_tot > 1 THEN"
        " (CAST(dt * (n_tot - dt) AS DOUBLE)"
        "  * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE))"
        " / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)"
        "    * CAST(n_tot - 1 AS DOUBLE))"
        " ELSE 0.0 END)"
    )
    return f"""
    WITH _lge AS (
      {lge_body}
    ),
    _lgt AS (
      SELECT cohort, dur FROM _lge
      GROUP BY cohort, dur HAVING SUM(d_arm) > 0
    ),
    _lgu AS (
      SELECT cohort, arm, dur, d_arm, removed, 0 AS is_grid FROM _lge
      UNION ALL
      SELECT t.cohort, a.arm, t.dur, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 1
      FROM _lgt t CROSS JOIN (SELECT 0 AS arm UNION ALL SELECT 1) a
    ),
    _lgw AS (
      SELECT cohort, arm, dur, d_arm, is_grid,
             COALESCE(SUM(removed) OVER (
               PARTITION BY cohort, arm ORDER BY dur
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_removed,
             SUM(removed) OVER (PARTITION BY cohort, arm) AS n_arm
      FROM _lgu
    ),
    _lgr AS (
      SELECT cohort, arm, dur,
             CAST(SUM(d_arm) AS BIGINT) AS d_arm,
             CAST(MAX(n_arm) - MAX(cum_removed) AS BIGINT) AS n_ar
      FROM _lgw
      GROUP BY cohort, arm, dur
      HAVING MAX(is_grid) = 1
    ),
    _lgp AS (
      SELECT cohort, dur,
             CAST(SUM(CASE WHEN arm = 1 THEN d_arm ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(d_arm) AS BIGINT) AS dt,
             CAST(SUM(CASE WHEN arm = 1 THEN n_ar ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN n_ar ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(n_ar) AS BIGINT) AS n_tot
      FROM _lgr GROUP BY cohort, dur
    ),
    _lgq AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_times,
             CAST(SUM(d1) AS BIGINT) AS o1_events,
             {dsum6(e1)} AS e1_sum,
             {dsum6(f'(CAST(d1 AS DOUBLE) - {e1})')} AS oe_sum,
             {dsum6(vterm)} AS v_sum
      FROM _lgp GROUP BY cohort
    )
    SELECT cohort, n_times, o1_events, e1_sum, oe_sum, v_sum,
           CASE WHEN v_sum > 0
                THEN {rd('((oe_sum * oe_sum) / v_sum)')}
                ELSE CAST(NULL AS DOUBLE) END AS chisq
    FROM _lgq
    """


def logrank(
    df: DataFrame,
    user_col: str,
    time_col: str,
    type_col: str,
    start_type: str,
    event_type: str,
    horizon_date: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`logrank_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (user_col, time_col, type_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_logrank_in"
    df.createOrReplaceTempView(view)
    # STAGE the subject reduction (lazy localCheckpoint): _lge is
    # referenced by both the pooled-time grid and the at-risk union,
    # and Catalyst inlines CTEs per reference — unstaged, the whole
    # reduction (two corpus scans + three aggregations) replans twice
    # (16 exchanges measured).  The staged frame is
    # |cohorts|×|arms|×|durations| rows; the oracle keeps the
    # one-statement form.
    lview = "_ts_logrank_lge"
    df.sparkSession.sql(
        logrank_lge_sql(_S, view, user_col, time_col, type_col,
                        start_type, event_type, horizon_date)
    ).localCheckpoint(eager=False).createOrReplaceTempView(lview)
    return df.sparkSession.sql(
        logrank_sql(
            _S, view, user_col, time_col, type_col,
            start_type, event_type, horizon_date, round_to=round_to,
            staged_lge=lview,
        )
    )
