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

__all__ = ["mase_backtest", "mase_backtest_sql"]


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
