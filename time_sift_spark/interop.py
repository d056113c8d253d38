"""Local numpy/pandas interop — the reference's ndarray adapter analogue.

The reference's optional ``ndarray`` feature maps ``Array1``/``Array2`` in
and ``Array2`` out (/root/reference/src/ndarray_support.rs:81-138).  Our
analogue:

* :func:`lag_matrix_np` / :func:`lag_matrix_2d_np` — eager local kernels
  with the full 6-variant validation surface (reference semantics with
  quirks Q1/Q2/Q3 fixed, see SURVEY.md §2.1).  These double as the
  executable semantic model the property tests check the Spark plan
  against.
* :func:`lag_matrix_pd` — routes a local series through the SAME Spark
  plan builder (plans.lag_plan.build_lag_plan) via Arrow and reshapes the
  result to the reference's matrix form, so local and distributed paths
  cannot drift.

Orientation contract (Q3 fixed — one documented orientation per layout,
unlike src/ndarray_support.rs:140-190 which is only self-consistent for
square shapes):

* 1-D / 2-D ``RowMajor``: output shape ``(num_series * num_lags, stride)``,
  rows grouped lag-major then series (src/lib.rs:699-704).
* 2-D ``ColumnMajor``: output shape ``(series_length, stride)`` with
  ``num_cols = num_series * num_lags`` columns grouped lag-major then
  series (src/lib.rs:736), plus ``stride - num_cols`` padding columns.
"""

from __future__ import annotations

import numpy as np

from .errors import (
    EmptyDataError,
    InvalidLagsError,
    InvalidLengthError,
    InvalidMemoryLayoutError,
    InvalidStrideError,
    LagExceedsValueCountError,
    validate_lags,
)

__all__ = ["lag_matrix_np", "lag_matrix_2d_np", "lag_matrix_pd", "lag_matrix_2d_pd"]


def _check_lag_magnitudes(lags: list[int], series_length: int) -> None:
    # Q1 fix: validate magnitude, not count (reference src/lib.rs:504-507
    # checks count and then underflows at :520 for a large single lag).
    bad = [k for k in lags if k >= series_length]
    if bad:
        raise LagExceedsValueCountError(
            f"lag(s) {bad} exceed series length {series_length}"
        )


def lag_matrix_np(data, lags, fill=np.inf, stride: int = 0) -> np.ndarray:
    """1-D lag matrix (reference ``lag_matrix``, src/lib.rs:487-538).

    Row i = series shifted right by ``lags[i]`` (``lags[i]`` fills
    prepended, last ``lags[i]`` values dropped), padded to ``stride``.
    ``stride=0`` → no padding (defaults to the series length,
    src/lib.rs:509-511).
    """
    arr = np.asarray(data, dtype=np.float64).ravel()
    lag_list = validate_lags(lags)
    n = arr.shape[0]
    if n == 0:
        raise EmptyDataError("input series is empty")
    _check_lag_magnitudes(lag_list, n)
    if stride == 0:
        stride = n
    elif stride < n:
        raise InvalidStrideError(f"stride {stride} < series length {n}")
    out = np.full((len(lag_list), stride), fill, dtype=np.float64)
    for i, k in enumerate(lag_list):
        out[i, k:n] = arr[: n - k]
    return out


def lag_matrix_2d_np(data, layout: str, lags, fill=np.inf, row_stride: int = 0) -> np.ndarray:
    """2-D lag matrix (reference ``lag_matrix_2d``, src/lib.rs:660-756).

    ``layout='row'``: input shape ``(num_series, series_length)`` (series
    along rows); output ``(num_series*num_lags, stride)`` rows grouped
    lag-major then series (kernel src/lib.rs:698-711).
    ``layout='col'``: input shape ``(series_length, num_series)`` (series
    along columns); output ``(series_length, stride)`` with columns grouped
    lag-major then series (kernel src/lib.rs:729-741).
    ``row_stride=0`` → no padding in BOTH layouts (Q2 fix; the reference
    defaults to ``num_series*num_lags`` for both, src/lib.rs:688-690,
    contradicting its own docs at :577-579).
    """
    arr = np.asarray(data, dtype=np.float64)
    if arr.ndim != 2:
        raise InvalidMemoryLayoutError(f"expected a 2-D array, got ndim={arr.ndim}")
    lag_list = validate_lags(lags)
    if arr.size == 0:
        raise EmptyDataError("input matrix is empty")
    if layout not in ("row", "col"):
        raise ValueError(f"layout must be 'row' or 'col', got {layout!r}")

    if layout == "row":
        num_series, series_length = arr.shape
        series = arr  # (S, D)
    else:
        series_length, num_series = arr.shape
        series = arr.T  # (S, D)
    if series_length == 0:
        raise InvalidLengthError("series length is zero")
    _check_lag_magnitudes(lag_list, series_length)

    L, S, D = len(lag_list), num_series, series_length
    if layout == "row":
        min_stride = D
    else:
        min_stride = S * L
    if row_stride == 0:
        row_stride = min_stride
    elif row_stride < min_stride:
        raise InvalidStrideError(f"row_stride {row_stride} < logical row length {min_stride}")

    if layout == "row":
        out = np.full((S * L, row_stride), fill, dtype=np.float64)
        for i, k in enumerate(lag_list):
            for s in range(S):
                out[i * S + s, k:D] = series[s, : D - k]
        return out

    out = np.full((D, row_stride), fill, dtype=np.float64)
    for i, k in enumerate(lag_list):
        for s in range(S):
            out[k:D, i * S + s] = series[s, : D - k]
    return out


def lag_matrix_pd(spark, data, lags, fill=np.inf, stride: int = 0) -> np.ndarray:
    """1-D lag matrix through the distributed plan builder.

    Local in / local out (Arrow both ways), but the lag computation is the
    exact same Catalyst plan the DataFrame API produces — the analogue of
    the reference's Array1 adapter delegating to the core kernel
    (src/ndarray_support.rs:81-98).
    """
    import pandas as pd

    from .plans.lag_plan import build_lag_plan, lag_column_names

    arr = np.asarray(data, dtype=np.float64).ravel()
    lag_list = validate_lags(lags)
    n = arr.shape[0]
    if n == 0:
        raise EmptyDataError("input series is empty")
    _check_lag_magnitudes(lag_list, n)
    if stride == 0:
        stride = n
    elif stride < n:
        raise InvalidStrideError(f"stride {stride} < series length {n}")

    pdf = pd.DataFrame({"t": np.arange(n, dtype=np.int64), "v": arr})
    sdf = spark.createDataFrame(pdf)
    wide = build_lag_plan(sdf, "v", "t", lag_list, fill=float(fill), layout="wide")
    res = wide.orderBy("t").toPandas()
    names = lag_column_names(["v"], lag_list)
    # wide result: one row per t, one column per lag → reference row-major
    # matrix is the transpose, padded to stride.
    mat = res[names].to_numpy(dtype=np.float64).T
    if stride > n:
        mat = np.concatenate(
            [mat, np.full((len(lag_list), stride - n), fill, dtype=np.float64)], axis=1
        )
    return mat


def lag_matrix_2d_pd(spark, data, layout: str, lags, fill=np.inf, row_stride: int = 0) -> np.ndarray:
    """2-D lag matrix through the distributed plan builder (reference
    Array2 adapter analogue, src/ndarray_support.rs:100-138; layout
    dispatch is an explicit kwarg instead of memory-order sniffing).

    The multi-series plan is the partitioned window: stack the input to
    long format, one Window.partitionBy(sid) pass, reshape to the
    reference's lag-major orientation (Q3 fixed).
    """
    import pandas as pd

    from .plans.lag_plan import build_lag_plan, lag_column_names

    arr = np.asarray(data, dtype=np.float64)
    if arr.ndim != 2:
        raise InvalidMemoryLayoutError(f"expected a 2-D array, got ndim={arr.ndim}")
    lag_list = validate_lags(lags)
    if arr.size == 0:
        raise EmptyDataError("input matrix is empty")
    if layout not in ("row", "col"):
        raise ValueError(f"layout must be 'row' or 'col', got {layout!r}")
    series = arr if layout == "row" else arr.T  # (S, D)
    S, D = series.shape
    _check_lag_magnitudes(lag_list, D)
    min_stride = D if layout == "row" else S * len(lag_list)
    if row_stride == 0:
        row_stride = min_stride
    elif row_stride < min_stride:
        raise InvalidStrideError(f"row_stride {row_stride} < logical row length {min_stride}")

    long = pd.DataFrame(
        {
            "sid": np.repeat(np.arange(S, dtype=np.int64), D),
            "t": np.tile(np.arange(D, dtype=np.int64), S),
            "v": series.ravel(),
        }
    )
    wide = build_lag_plan(
        spark.createDataFrame(long), "v", "t", lag_list, partition_by="sid", fill=float(fill)
    )
    res = wide.orderBy("sid", "t").toPandas()
    names = lag_column_names(["v"], lag_list)
    # per_series[s] has shape (L, D): row i = series s at lag lag_list[i]
    per_series = [
        res[res.sid == s][names].to_numpy(dtype=np.float64).T for s in range(S)
    ]
    L = len(lag_list)
    if layout == "row":
        out = np.full((S * L, row_stride), fill, dtype=np.float64)
        for i in range(L):
            for s in range(S):
                out[i * S + s, :D] = per_series[s][i]
        return out
    out = np.full((D, row_stride), fill, dtype=np.float64)
    for i in range(L):
        for s in range(S):
            out[:D, i * S + s] = per_series[s][i]
    return out
