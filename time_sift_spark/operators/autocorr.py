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

For a single global series (no partition key) the lag side routes
through operators.scale.lag_features_global (halo-bucketed, no
single-task window); the final corr reduction over k scalars per bucket
is a tree-aggregate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError, validate_lags
from .lag import lag_features

__all__ = ["acf", "ccf_global"]


def _as_list(x) -> list:
    return [] if x is None else [x] if isinstance(x, str) else list(x)


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
    Pearson correlation of the series with its own k-step lag
    (null pairs at series starts are skipped by ``corr`` on both
    engines, i.e. each acf_k uses the n-k overlapping pairs).
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
            F.round(F.corr(value_col, f"{value_col}_lag{k}"), round_to).alias(f"acf_{k}")
        )
    return lagged.groupBy(*parts).agg(*aggs)


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
            F.round(F.corr(f"{x_col}_lag0", f"{y_col}_lag{k}"), round_to).alias(f"ccf_{k}")
        )
    return lagged.agg(*aggs)
