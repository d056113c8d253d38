"""Exponentially-weighted moving average per series (applyInPandas).

EWMA's recurrence y_t = α·x_t + (1−α)·y_{t−1} is inherently sequential
per series — not expressible as a SQL window aggregate without
numerically-explosive closed forms, so this is the designed use case for
Arrow-batched ``applyInPandas``: one pandas group per series key,
vectorized ``Series.ewm`` inside, no Python row loop.

Scale: one shuffle on the series key (same partitioning the lag plan
uses); each group must fit in one executor's memory — the same
per-series locality assumption the reference makes (whole series in one
buffer, src/lib.rs:487-488), now bounded per key rather than global.
Unit tests pin values against pandas ``ewm(adjust=False)``; the driver
oracle is a recursive CTE stepping the recurrence per key (bit-exact for
not-null input — see queries.ewma_events).
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError


def _prep(df, value_col, time_col, alpha, partition_by, order_extra):
    """Shared validation + naming for both EWMA strategies — one source of
    truth so the two physical forms can't drift."""
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    missing = [c for c in ([value_col, time_col, *partition_by, *order_extra]) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    sort_cols = [time_col, *order_extra]
    out_name = f"{value_col}_ewma"
    in_cols = [*partition_by, *sort_cols, value_col]
    schema = ", ".join(
        [f"`{c}` {dict(df.dtypes)[c]}" for c in in_cols] + [f"`{out_name}` double"]
    )
    return partition_by, sort_cols, out_name, in_cols, schema


def ewma(
    df: DataFrame,
    value_col: str,
    time_col: str,
    alpha: float,
    *,
    partition_by: str | Sequence[str],
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Append ``{value}_ewma`` (adjust=False recurrence) per series."""
    partition_by, sort_cols, out_name, in_cols, schema = _prep(
        df, value_col, time_col, alpha, partition_by, order_extra
    )

    def _per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        # na_position='first' matches ewma_scan's Spark sortWithinPartitions
        # (ascending NULLS FIRST) so the two strategies order NULL
        # time/order keys identically and stay bit-identical.
        pdf = pdf.sort_values(sort_cols, kind="mergesort", na_position="first")
        pdf[out_name] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[in_cols + [out_name]]

    return df.select(*in_cols).groupBy(*partition_by).applyInPandas(_per_series, schema)


def ewma_scan(
    df: DataFrame,
    value_col: str,
    time_col: str,
    alpha: float,
    *,
    partition_by: str | Sequence[str],
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Same result as :func:`ewma`, different physical strategy: ONE
    Python invocation per partition instead of one per key.

    ``groupBy().applyInPandas`` ships every key group through its own
    JVM→Python Arrow round-trip — per-group overhead dominates when keys
    are many and small (the events table: thousands of users × ~100 rows).
    Here the data is hash-repartitioned and sorted by (key, time) once,
    then ``mapInPandas`` streams each partition's Arrow batches through a
    single iterator: all COMPLETED keys in a batch are computed by pandas'
    cython ``groupby().ewm()`` in one call, while the in-progress last
    key's raw rows are held back and prepended to the next batch, so every
    key is always computed in exactly ONE ewm call. (A carried-scalar
    stitch is NOT sufficient: pandas ``ewm(adjust=False, ignore_na=False)``
    keeps an accumulated-weight state across NaN values that a single
    carried output cannot represent.) Holdback memory is one key's rows —
    the same per-series bound applyInPandas already assumes. NULL keys
    form one group (``dropna=False``), matching Spark's groupBy.
    """
    partition_by, sort_cols, out_name, in_cols, schema = _prep(
        df, value_col, time_col, alpha, partition_by, order_extra
    )

    def _compute(pdf: pd.DataFrame) -> pd.DataFrame:
        y = (
            pdf.groupby(partition_by, sort=False, dropna=False)[value_col]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .to_numpy()
        )
        pdf = pdf.copy()
        pdf[out_name] = y
        return pdf[in_cols + [out_name]]

    def _scan(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if len(pdf) == 0:
                continue
            gid = pdf.groupby(partition_by, sort=False, dropna=False).ngroup()
            done = (gid != gid.iloc[-1]).to_numpy()
            leftover = pdf[~done]
            if done.any():
                yield _compute(pdf[done])
        if leftover is not None and len(leftover):
            yield _compute(leftover)

    parted = (
        df.select(*in_cols)
        .repartition(*partition_by)
        .sortWithinPartitions(*partition_by, *sort_cols)
    )
    return parted.mapInPandas(_scan, schema)


def brown_scan(
    df: DataFrame,
    value_col: str,
    time_col: str,
    alpha: float,
    *,
    partition_by: str | Sequence[str],
    order_extra: Sequence[str] = (),
) -> DataFrame:
    """Brown double exponential smoothing per series — level, trend and
    one-step forecast from TWO chained adjust=False EWMAs (Brown 1959;
    the single-parameter linear-trend member of the Holt family):

        s1_t = α·x_t  + (1−α)·s1_{t−1}
        s2_t = α·s1_t + (1−α)·s2_{t−1}
        level_t    = 2·s1_t − s2_t
        trend_t    = (α/(1−α))·(s1_t − s2_t)
        forecast_t = level_t + trend_t          (x̂_{t+1})

    Because both recurrences are plain EWMAs, the whole operator is two
    vectorized cython ``groupby().ewm()`` passes inside ONE mapInPandas
    partition scan — no Python row loop — reusing :func:`ewma_scan`'s
    strategy (hash-repartition + sort once, stream Arrow batches, hold
    back the in-progress key).  Holt's two-parameter form needs a
    genuinely scalar loop per row; Brown's buys the trend component at
    EWMA cost, which is why it is the production path here.

    Bit-exactness contract (the driver's value-hash gate): pandas'
    adjust=False kernel evaluates fl(fl((1−α)·y) + fl(α·x)) and divides
    by (1−α)+α == 1.0 exactly for α=0.3 (verified — see
    queries.ewma_events); the second pass feeds s1 through the same
    kernel, and the derived columns are elementwise IEEE ops in the SAME
    order as the paired recursive-CTE oracle (2·s1−s2; the α/(1−α)
    constant is written as the division 0.3/(1−0.3) on BOTH sides — its
    fl differs from literal 0.428…, and fl(1−0.3) differs from literal
    0.7, so neither is ever spelled as a folded constant).

    Scale: identical posture to ewma_scan — one shuffle on the series
    key, per-key rows bounded by the series-locality assumption the
    reference makes globally (src/lib.rs:487-488).  Not-null input for
    oracle-grade parity (pandas carries over NaN where SQL propagates
    NULL).
    """
    import numpy as np

    partition_by, sort_cols, _, in_cols, _ = _prep(
        df, value_col, time_col, alpha, partition_by, order_extra
    )
    l_name = f"{value_col}_level"
    t_name = f"{value_col}_trend"
    f_name = f"{value_col}_fcst"
    schema = ", ".join(
        [f"`{c}` {dict(df.dtypes)[c]}" for c in in_cols]
        + [f"`{c}` double" for c in (l_name, t_name, f_name)]
    )
    a = np.float64(alpha)
    coef = a / (np.float64(1.0) - a)  # fl(α/(1−α)) — same division as the oracle

    def _compute(pdf: pd.DataFrame) -> pd.DataFrame:
        # Rows arrive key-contiguous and time-sorted, so group-major ewm
        # output order == row order (the ewma_scan invariant).
        g = pdf.groupby(partition_by, sort=False, dropna=False)
        s1 = g[value_col].ewm(alpha=alpha, adjust=False).mean().to_numpy()
        pdf = pdf.copy()
        pdf["_s1"] = s1
        s2 = (
            pdf.groupby(partition_by, sort=False, dropna=False)["_s1"]
            .ewm(alpha=alpha, adjust=False)
            .mean()
            .to_numpy()
        )
        level = np.float64(2.0) * s1 - s2
        trend = coef * (s1 - s2)
        pdf[l_name] = level
        pdf[t_name] = trend
        pdf[f_name] = level + trend
        return pdf[in_cols + [l_name, t_name, f_name]]

    def _scan(batches):
        leftover = None
        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if len(pdf) == 0:
                continue
            gid = pdf.groupby(partition_by, sort=False, dropna=False).ngroup()
            done = (gid != gid.iloc[-1]).to_numpy()
            leftover = pdf[~done]
            if done.any():
                yield _compute(pdf[done])
        if leftover is not None and len(leftover):
            yield _compute(leftover)

    parted = (
        df.select(*in_cols)
        .repartition(*partition_by)
        .sortWithinPartitions(*partition_by, *sort_cols)
    )
    return parted.mapInPandas(_scan, schema)


def ewma_horizon(
    df,
    value_col: str,
    time_col: str,
    *,
    partition_by: str,
    order_extra=(),
    alpha: float = 0.2,
    horizon: int = 50,
    out_col: str | None = None,
):
    """Horizon-truncated EWMA — the hash-gradeable variant of the
    sequential recurrence.

    The exact adjust=False EWMA needs the full per-key history (the
    mapInPandas partition scan, :func:`ewma_partition_scan`); truncating
    the memory to the last ``horizon`` observations bounds the state the
    way a production streaming feature does (contributions beyond the
    horizon carry weight (1-alpha)^horizon ≈ 0) and turns the operator
    into a per-row fold over a bounded sliding window: collect the frame
    as an ordered array, fold acc*(1-a)+a*x left-to-right. Both engines
    run the SAME sequential double fold over the SAME ordered array, so
    the result is bit-exact cross-engine — no rounding tolerance needed.

    Cost: one window Exchange plus O(horizon) array cells per row — the
    horizon is the explicit memory/accuracy knob.

    NULL semantics (part of the cross-engine contract): NULL values are
    SKIPPED — they occupy a slot in the row-count frame but contribute
    nothing to the fold (Spark's ``collect_list`` drops them; the paired
    DuckDB oracle must filter them identically with
    ``list(v) FILTER (WHERE v IS NOT NULL)``). A row whose entire frame
    is NULL-valued yields NULL (Spark's empty array and DuckDB's NULL
    list are both normalized to NULL before folding).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out_col = out_col or f"{value_col}_ewma{horizon}"
    for c in (partition_by, value_col, time_col, *order_extra):
        if c not in df.columns:
            from ..errors import ColumnNotFoundError

            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    w = (
        Window.partitionBy(partition_by)
        .orderBy(time_col, *order_extra)
        .rowsBetween(-(int(horizon) - 1), 0)
    )
    arr = F.collect_list(value_col).over(w)
    fold = (
        f"CASE WHEN size(_arr) = 0 THEN CAST(NULL AS DOUBLE) ELSE "
        f"aggregate(slice(_arr, 2, size(_arr) - 1), "
        f"element_at(_arr, 1), "
        f"(acc, x) -> acc * CAST({1 - alpha} AS DOUBLE) + CAST({alpha} AS DOUBLE) * x) END"
    )
    return (
        df.withColumn("_arr", arr)
        .withColumn(out_col, F.expr(fold))
        .drop("_arr")
    )
