"""Series ↔ array layout conversion (the third layout of SURVEY §1.2).

The reference's RowMajor matrix stores one contiguous row per
(lag × series); the Spark-native analogue of "a whole series in one
container" is a per-series ``ArrayType`` row: time-ordered value arrays
via ``sort_array(collect_list(struct(t, v)))``.  Useful as the export
shape for ML tooling (one training example per series) and as the
reference flat-buffer emulation path (stride padding happens here, on
arrays — never in the distributed plan).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError


def series_to_arrays(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    order_extra: Sequence[str] = (),
    pad_to: int | None = None,
    fill: float | None = None,
) -> DataFrame:
    """Collapse each series to one row: key cols + ``n_points`` +
    time-ordered ``values`` array (optionally right-padded to ``pad_to``
    with ``fill`` — the reference's export-only stride semantics).
    """
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    missing = [c for c in ([value_col, time_col, *partition_by, *order_extra]) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    entry = F.struct(
        F.col(time_col).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_extra)],
        F.col(value_col).alias("_v"),
    )
    agg = df.groupBy(*partition_by).agg(
        F.sort_array(F.collect_list(entry)).alias("_entries")
    )
    values = F.transform(F.col("_entries"), lambda s: s["_v"])
    if pad_to is not None:
        if fill is None:
            raise ValueError("pad_to requires a fill value")
        pad_len = F.greatest(F.lit(pad_to) - F.size(values), F.lit(0))
        values = F.concat(values, F.array_repeat(F.lit(float(fill)), pad_len))
    return agg.select(
        *partition_by,
        F.size(F.col("_entries")).alias("n_points"),
        values.alias("values"),
    )


def arrays_to_series(
    df: DataFrame,
    array_col: str,
    *,
    partition_by: str | Sequence[str],
    time_alias: str = "t",
    value_alias: str = "v",
) -> DataFrame:
    """Inverse: explode value arrays back to long rows with a 0-based
    position-as-time column (the reference's index-is-time model,
    src/lib.rs:445-447)."""
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if array_col not in df.columns:
        raise ColumnNotFoundError(f"column {array_col!r} not in {df.columns}")
    exploded = df.select(*partition_by, F.posexplode(array_col).alias(time_alias, value_alias))
    return exploded.withColumn(time_alias, F.col(time_alias).cast("long"))
