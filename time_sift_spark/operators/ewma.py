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
Driver check is rows-only (non-SQL-expressible), unit tests pin values
against pandas ``ewm(adjust=False)``.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError


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
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    missing = [c for c in ([value_col, time_col, *partition_by, *order_extra]) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")

    sort_cols = [time_col, *order_extra]
    out_name = f"{value_col}_ewma"
    in_cols = [*partition_by, *sort_cols, value_col]
    schema_parts = [f"`{c}` {dict(df.dtypes)[c]}" for c in in_cols] + [f"`{out_name}` double"]
    schema = ", ".join(schema_parts)

    def _per_series(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        pdf[out_name] = pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        return pdf[in_cols + [out_name]]

    return df.select(*in_cols).groupBy(*partition_by).applyInPandas(_per_series, schema)
