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

__all__ = ["linear_trend", "linear_trend_oracle_sql"]

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
