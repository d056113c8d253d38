"""Per-series linear trend (least-squares slope/intercept/R²).

The natural companion of the lag/ACF family: where ACF measures serial
dependence, the trend line extracts the deterministic drift component
(``value ≈ intercept + slope·t``).  One groupBy per series — fully
partial-aggregatable, one exchange, no window needed.

Determinism discipline (queries.dsum / operators/autocorr.py): every
aggregate a parallel engine could reassociate is a DECIMAL-quantized
sum; the closed-form least-squares arithmetic on those exact sums is an
identical scalar double expression on both engines, so results are
bit-identical and value-hash gradeable.  Time enters as SECONDS since
epoch (µs would overflow the decimal products at 100 TB magnitudes;
seconds keep x·x within DECIMAL(38,12) for any realistic horizon).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError
from ._time import assert_time_dtype

__all__ = ["linear_trend", "linear_trend_oracle_sql",
           "mann_kendall", "mann_kendall_sql", "pettitt", "pettitt_sql",
           "theil_sen", "theil_sen_sql"]

# x in epoch seconds minus a fixed conditioning offset (integer ops,
# exact in both engines). Without the offset, n·Sxx - Sx² cancels ~10 of
# a double's 16 digits for month-scale spans sitting 1.7e9 s from epoch;
# with it, x is O(span) and the cancellation is benign. Slope and R² are
# translation-invariant; the intercept is the fitted value AT the
# offset instant (documented contract).
_X_SPARK = "((unix_micros(CAST({t} AS TIMESTAMP)) DIV 1000000) - {off})"
_X_DUCK = "((epoch_us({t}) // 1000000) - {off})"


def _sum_exprs(x: str, y: str, *, width: int = 18) -> dict[str, str]:
    """Stage 1: the six exact sufficient statistics (aggregates).
    width=18 for Spark, 19 for DuckDB (int64-multiply overflow vs
    Spark precision-loss rescale — values identical either way)."""
    from ._num import dec_to_double

    dx = f"CAST({x} AS DECIMAL({width},0))"
    dy = f"CAST({y} AS DECIMAL({width},6))"
    return {
        "_n": f"COUNT({y})",
        "_sx": dec_to_double(f"SUM({dx})"),
        "_sy": dec_to_double(f"SUM({dy})"),
        "_sxx": dec_to_double(f"SUM({dx} * {dx})"),
        "_sxy": dec_to_double(f"SUM({dx} * {dy})"),
        "_syy": dec_to_double(f"SUM({dy} * {dy})"),
    }


def _fit_exprs(round_to: int) -> dict[str, str]:
    """Stage 2: closed-form OLS over the staged sum COLUMNS — staging
    keeps the expression tree (and codegen) small where inlining the
    sums textually into slope/intercept/R² was measured 5x slower."""
    den = "(_n * _sxx - _sx * _sx)"
    slope = f"((_n * _sxy - _sx * _sy) / NULLIF({den}, 0.0))"
    num2 = "((_n * _sxy - _sx * _sy) * (_n * _sxy - _sx * _sy))"
    den2 = f"({den} * (_n * _syy - _sy * _sy))"

    from ._num import round_double

    def dround(e: str, nd: int) -> str:
        # pure-double rounding: double->decimal casts tie-break HALF_UP
        # on Spark vs HALF_EVEN on DuckDB (_num.round_double docstring)
        return round_double(e, nd)

    return {
        "n_obs": "_n",
        "slope_per_day": dround(f"{slope} * 86400.0", round_to),
        "intercept": dround(f"((_sy - {slope} * _sx) / _n)", round_to),
        "r2": dround(f"({num2} / NULLIF({den2}, 0.0))", round_to),
    }


def linear_trend(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    group_by: str | Sequence[str],
    round_to: int = 4,
    x_offset_epoch_s: int = 1_700_000_000,
) -> DataFrame:
    """Per-group OLS fit of ``value`` against time: ``n_obs``,
    ``slope_per_day``, ``intercept`` (fitted value at the conditioning
    offset instant), ``r2``."""
    groups = [group_by] if isinstance(group_by, str) else list(group_by)
    missing = [c for c in (value_col, time_col, *groups) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    assert_time_dtype(df, time_col)
    sums = _sum_exprs(_X_SPARK.format(t=time_col, off=x_offset_epoch_s), value_col)
    staged = df.groupBy(*groups).agg(
        *[F.expr(e).alias(name) for name, e in sums.items()]
    )
    fit = _fit_exprs(round_to)
    return staged.select(
        *groups, *[F.expr(e).alias(name) for name, e in fit.items()]
    )


def linear_trend_oracle_sql(
    table: str,
    value: str,
    time_col: str,
    group_by: str,
    *,
    round_to: int = 4,
    x_offset_epoch_s: int = 1_700_000_000,
) -> str:
    sums = _sum_exprs(_X_DUCK.format(t=time_col, off=x_offset_epoch_s), value, width=19)
    sums_sel = ", ".join(f"{e} AS {name}" for name, e in sums.items())
    fit = _fit_exprs(round_to)
    fit_sel = ", ".join(f"{e} AS {name}" for name, e in fit.items())
    return f"""
    WITH sums AS (
      SELECT {group_by}, {sums_sel} FROM {table} GROUP BY {group_by}
    )
    SELECT {group_by}, {fit_sel} FROM sums
    """


# -- Theil-Sen robust trend ------------------------------------------------

def _ts_sorted_arr(d, col: str) -> str:
    if d.name == "spark":
        return f"sort_array(collect_list({col}))"
    return f"list_sort(list({col}))"


def _ts_mid(d, arr: str) -> str:
    """Sorted-array middle interpolation (the rolling_median shared
    expression, dialect-dispatched): one add + one division on the same
    two elements in both engines."""
    if d.name == "spark":
        lo = f"element_at({arr}, CAST(floor((size({arr})+1)/2) AS INT))"
        hi = f"element_at({arr}, CAST(floor((size({arr})+2)/2) AS INT))"
    else:
        lo = f"({arr})[CAST(floor((len({arr})+1)/2) AS INT)]"
        hi = f"({arr})[CAST(floor((len({arr})+2)/2) AS INT)]"
    return f"(({lo} + {hi})/2.0)"


def _ts_bucket_select(d, table: str, value_col: str, time_col: str,
                      group_col: str) -> str:
    """The daily-bucket SELECT — one shared text for the inline CTE and
    the staged front-door frame (structural equivalence)."""
    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    return (
        f"SELECT {group_col} AS k, {day} AS x, "
        f"CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y "
        f"FROM {table} GROUP BY {group_col}, {day}"
    )


def theil_sen_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 6,
    staged_bucket: str | None = None,
) -> str:
    """Per-series Theil-Sen robust trend (Theil 1950 / Sen 1968): the
    MEDIAN of all pairwise slopes over the DAILY-bucketed series, plus
    the median-residual intercept — the estimator with a 29% breakdown
    point where OLS (linear_trend) has zero: a single corrupted bucket
    moves the OLS slope arbitrarily but not this one (tested).

    Shape: the day bucketing is one exact-decimal groupBy; pairs come
    from a SELF EQUI-JOIN on the series key (never a cross join across
    keys); medians are sorted-array middles per key.  Pair count is
    C(buckets, 2) per series — quadratic in the BOUNDED bucket
    calendar (the rolling-corr posture), never in row count: 10 years
    of daily buckets is ~6.7M pairs per key, one partition's aggregate
    state.  Determinism: bucket sums are exact decimal; each slope is
    one dec→double cast + one IEEE division of exact integers; the
    median interpolation is the rolling_median shared expression; the
    slope is round_double'd BEFORE the residual multiply so the
    intercept pass consumes the identical double on both engines.

    Output per series: n_points, n_pairs, slope_per_day, intercept
    (median of y − slope·day at day 0 = 1970-01-01).  Series with a
    single bucket drop out (no pairs — nothing to estimate).
    """
    from . import _num

    bucket = (
        f"SELECT k, x, y FROM {staged_bucket}" if staged_bucket
        else _ts_bucket_select(d, table, value_col, time_col, group_col)
    )
    slope_raw = (
        f"({_num.dec_to_double('(b.y - a.y)')} / CAST(b.x - a.x AS DOUBLE))"
    )
    return f"""
    WITH _tsb AS (
      {bucket}
    ),
    _tsp AS (
      SELECT a.k AS k, {slope_raw} AS slope
      FROM _tsb a JOIN _tsb b ON a.k = b.k AND b.x > a.x
    ),
    _tsa AS (
      SELECT k, {_ts_sorted_arr(d, 'slope')} AS sarr,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM _tsp GROUP BY k
    ),
    _tss AS (
      SELECT k, n_pairs,
             {_num.round_double(_ts_mid(d, 'sarr'), round_to)} AS slope
      FROM _tsa
    ),
    _tsr AS (
      SELECT p.k AS k, s.slope AS slope, s.n_pairs AS n_pairs,
             ({_num.dec_to_double('p.y')} - s.slope * CAST(p.x AS DOUBLE))
               AS resid
      FROM _tsb p JOIN _tss s ON p.k = s.k
    ),
    _tsi AS (
      SELECT k, slope, n_pairs, CAST(COUNT(*) AS BIGINT) AS n_points,
             {_ts_sorted_arr(d, 'resid')} AS rarr
      FROM _tsr GROUP BY k, slope, n_pairs
    )
    SELECT k AS {group_col}, n_points, n_pairs, slope AS slope_per_day,
           {_num.round_double(_ts_mid(d, 'rarr'), round_to)} AS intercept
    FROM _tsi
    """


def theil_sen(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`theil_sen_sql`."""
    from ..functions.text_fns import SPARK as _S

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_theilsen_in"
    df.createOrReplaceTempView(view)
    # STAGE the bucket frame once (lazy localCheckpoint): _tsb is
    # referenced three times (both pair arms + the residual pass) and
    # Catalyst inlines CTEs per reference — unstaged, the bucket groupBy
    # and its base-table scan replan 3×.  The staged frame is
    # |series|×|calendar| rows; the oracle keeps the one-statement form.
    bview = "_ts_theilsen_buckets"
    df.sparkSession.sql(
        _ts_bucket_select(_S, view, value_col, time_col, group_col)
    ).localCheckpoint(eager=False).createOrReplaceTempView(bview)
    return df.sparkSession.sql(
        theil_sen_sql(_S, view, value_col, time_col, group_col,
                      round_to=round_to, staged_bucket=bview)
    )


def mann_kendall_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    staged_bucket: str | None = None,
) -> str:
    """Per-series Mann-Kendall trend TEST (Mann 1945; Kendall 1975) over
    the daily-bucketed series: is there a monotone trend at all?  The
    significance companion of Theil-Sen — Sen's slope says how steep,
    this says whether to believe it.  The statistic:

        S = Σ_{i<j} sign(y_j − y_i)
        Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
        Z = (S∓1)/√Var(S)  (continuity-corrected; 0 when S = 0)

    with t the tie-group sizes (ties on the EXACT decimal bucket sum —
    a deterministic equality).  No transcendental: Z needs only one
    sqrt (IEEE-exact) and one division; S, both variance terms, and n
    are exact BIGINTs.  ``significant`` flags |Z| > 1.96 (the 5%
    two-sided normal critical value, a literal).

    Shape: the Theil-Sen posture verbatim — daily buckets via one
    exact-decimal groupBy, pair signs from the SELF EQUI-JOIN on the
    series key (C(buckets, 2) pairs per series, quadratic only in the
    bounded calendar), tie groups one more bounded groupBy.  Series
    with a single bucket drop out (no pairs — no test).
    """
    bucket = (
        f"SELECT k, x, y FROM {staged_bucket}" if staged_bucket
        else _ts_bucket_select(d, table, value_col, time_col, group_col)
    )
    z = ("CASE WHEN var_s <= 0 THEN CAST(0.0 AS DOUBLE)"
         " WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)"
         " WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)"
         " ELSE CAST(0.0 AS DOUBLE) END")
    return f"""
    WITH _mkb AS (
      {bucket}
    ),
    _mkp AS (
      SELECT a.k AS k,
             CASE WHEN b.y > a.y THEN 1
                  WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
      FROM _mkb a JOIN _mkb b ON a.k = b.k AND b.x > a.x
    ),
    _mks AS (
      SELECT k, CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM _mkp GROUP BY k
    ),
    _mkt AS (
      SELECT k,
             CAST(SUM(t) AS BIGINT) AS n_days,
             CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
      FROM (SELECT k, y, CAST(COUNT(*) AS BIGINT) AS t
            FROM _mkb GROUP BY k, y) _mkg
      GROUP BY k
    ),
    _mkv AS (
      SELECT s.k AS k, t.n_days AS n_days, s.n_pairs AS n_pairs,
             s.s_stat AS s_stat,
             (CAST(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5)
                   - t.tie_term AS DOUBLE) / CAST(18 AS DOUBLE)) AS var_s
      FROM _mks s JOIN _mkt t ON t.k = s.k
    )
    SELECT k AS {group_col}, n_days, n_pairs, s_stat, var_s,
           {z} AS z_stat,
           ABS({z}) > 1.96 AS significant
    FROM _mkv
    """


def mann_kendall(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
) -> DataFrame:
    """DataFrame front door for :func:`mann_kendall_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_mk_in"
    df.createOrReplaceTempView(view)
    # STAGE the bucket frame (the theil_sen convention): _mkb is
    # referenced four times (both pair arms, the tie groups) and
    # Catalyst inlines CTEs per reference — unstaged, the bucket
    # groupBy and its scan replanned 4× (12 exchanges measured).
    bview = "_ts_mk_buckets"
    df.sparkSession.sql(
        _ts_bucket_select(_S, view, value_col, time_col, group_col)
    ).localCheckpoint(eager=False).createOrReplaceTempView(bview)
    return df.sparkSession.sql(
        mann_kendall_sql(_S, view, value_col, time_col, group_col,
                         staged_bucket=bview)
    )


def pettitt_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    staged_bucket: str | None = None,
) -> str:
    """Pettitt change-point test per series (Pettitt 1979): the
    rank-based, distribution-free companion of the CUSUM locator
    (changepoint_locate finds the best MEAN split; this asks whether
    ANY distributional shift is significant without assuming
    normality).  Over the daily-bucketed series:

        V_t = Σ_j sign(y_t − y_j)   (against ALL buckets)
        U_t = Σ_{i ≤ t} V_i,   K = max_t |U_t|,  t < n

    with the changepoint located at the earliest argmax.  Significance
    uses the standard approximation p ≈ 2·exp(−6K²/(n³+n²)); exp is
    banned here, so the emitted decision is on the EXPONENT:
    ``k_norm = 6K²/(n³+n²) > 3.6889`` ⟺ p < 0.05 (3.6889 = ln(2/0.05),
    a precomputed literal — the 1.358/1.4826 convention).

    No pair join: V_t comes from rank algebra — V_t = 2·(#less) +
    (#eq) − n with #less = RANK−1 over the VALUE order and #eq a
    (key, value) window count — so the whole test is windows over ONE
    series-key exchange (value order, tie count, time-order prefix
    sum, and the argmax), O(n log n) where the textbook form is O(n²).
    Exact BIGINTs end-to-end; k_norm is a fixed 3-op IEEE tree.
    """
    bucket = (
        f"SELECT k, x, y FROM {staged_bucket}" if staged_bucket
        else _ts_bucket_select(d, table, value_col, time_col, group_col)
    )
    return f"""
    WITH _ptb AS (
      {bucket}
    ),
    _ptv AS (
      SELECT k, x,
             (2 * (RANK() OVER (PARTITION BY k ORDER BY y) - 1)
              + COUNT(*) OVER (PARTITION BY k ORDER BY y
                  RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
              - COUNT(*) OVER (PARTITION BY k)) AS v,
             COUNT(*) OVER (PARTITION BY k) AS n,
             MAX(x) OVER (PARTITION BY k) AS xmax
      FROM _ptb
    ),
    _ptu AS (
      SELECT k, x, n,
             SUM(v) OVER (PARTITION BY k ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u
      FROM _ptv
      WHERE x < xmax
    ),
    _ptm AS (
      SELECT k, x, n, ABS(u) AS au,
             MAX(ABS(u)) OVER (PARTITION BY k) AS k_stat
      FROM _ptu
    )
    SELECT k AS {group_col},
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MAX(k_stat) AS BIGINT) AS k_stat,
           ((6.0 * CAST(MAX(k_stat) AS DOUBLE) * CAST(MAX(k_stat) AS DOUBLE))
            / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
               * (CAST(MAX(n) AS DOUBLE) + 1.0))) AS k_norm,
           ((6.0 * CAST(MAX(k_stat) AS DOUBLE) * CAST(MAX(k_stat) AS DOUBLE))
            / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
               * (CAST(MAX(n) AS DOUBLE) + 1.0))) > 3.6889 AS significant,
           CAST(MIN(CASE WHEN au = k_stat THEN x END) AS BIGINT)
             AS changepoint_day
    FROM _ptm
    GROUP BY k
    """


def pettitt(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
) -> DataFrame:
    """DataFrame front door for :func:`pettitt_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_pettitt_in"
    df.createOrReplaceTempView(view)
    bview = "_ts_pettitt_buckets"
    df.sparkSession.sql(
        _ts_bucket_select(_S, view, value_col, time_col, group_col)
    ).localCheckpoint(eager=False).createOrReplaceTempView(bview)
    return df.sparkSession.sql(
        pettitt_sql(_S, view, value_col, time_col, group_col,
                    staged_bucket=bview)
    )


def streaming_pettitt(
    stream_df,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    query_name: str,
):
    """Continuous form of :func:`pettitt` — the streaming_burst_detect
    recipe applied to the change-point test: per micro-batch the only
    state is the (group, day) DECIMAL bucket-sum aggregation (complete
    mode — bounded by the CALENDAR the batch plan's bucket relation
    materializes anyway; an unbounded-horizon deployment ages out the
    oldest days behind a watermark, accepting that the test then asks
    about the retained window).  No value quantization is needed,
    unlike the KS twin: Pettitt's batch semantics are ALREADY
    day-bucketed, and its rank algebra runs over the ≤ |days| bucket
    sums per series at drain — so the streaming state equals the batch
    statement's own intermediate relation exactly.

    At drain the bucket sums feed :func:`pettitt_sql` VERBATIM through
    its ``staged_bucket`` entry point, so drain ≡ batch over everything
    that arrived is structural and the registered query's oracle IS the
    batch statement.  The stream side buckets with the SAME rendered
    day/decimal text (the foreachBatch-clone discipline).
    """
    from pyspark.sql import functions as F

    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK as _S
    from ..streaming.lag_stream import run_stream_to_df
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in stream_df.columns:
            raise ColumnNotFoundError(
                f"column {c!r} not in stream frame {stream_df.columns}"
            )
    # same contract as the batch front door: a numeric (epoch-long)
    # time column must fail loudly, not CAST per-engine (ADVICE r12)
    assert_time_dtype(stream_df, time_col)
    spark = stream_df.sparkSession
    day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
    cur = (
        stream_df.selectExpr(
            f"{group_col} AS k", f"{day} AS x",
            f"CAST({value_col} AS DECIMAL(18,6)) AS _yd",
        )
        .groupBy("k", "x")
        .agg(F.expr("CAST(SUM(_yd) AS DECIMAL(18,6))").alias("y"))
    )
    drained = run_stream_to_df(cur, query_name, output_mode="complete")
    drained.createOrReplaceTempView("_ts_spettitt_bucket")
    return spark.sql(
        pettitt_sql(_S, "_ignored_", value_col, time_col, group_col,
                    staged_bucket="_ts_spettitt_bucket")
    )
