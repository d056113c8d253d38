"""Change-point scan (standardized CUSUM) per series.

``S_t = sum_{i<=t} (v_i - mean) / std`` — the classic cumulative-sum
statistic: a sustained level shift makes |S_t| drift to a peak at the
shift point, while a stable series keeps it near a random walk bridge.

Cross-engine determinism (the driver value-hashes against DuckDB) is
engineered the same way as queries.dsum: every aggregation that a
parallel engine could reassociate (the per-series mean/variance sums and
the ordered running sum) is computed over DECIMAL-quantized addends, so
the result is exact and order-independent; the remaining scalar double
arithmetic is an identical expression tree on both engines, hence
bit-identical IEEE results.  The statistic is built in two stages
(per-key stats window, then the ordered running sum over the quantized
deviation) because nesting one window call inside another is illegal
SQL on DuckDB.

Plan shape: ONE exchange on the series key feeds both window frames
(unordered per-key stats + the ordered running sum); at 100 TB this is
a single shuffle + per-partition sort, no driver-side work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

__all__ = ["cusum", "cusum_stage_exprs", "cusum_oracle_sql"]


def _as_list(x) -> list:
    return [] if x is None else [x] if isinstance(x, str) else list(x)


def cusum_stage_exprs(
    value: str, part: str, order: str, threshold: float = 3.0, round_to: int = 4
) -> dict[str, str]:
    """Shared SQL fragments (valid verbatim in Spark and DuckDB).

    Three stages: ``stats`` (per-key window aggregates), ``dev`` (scalar
    standardized deviation quantized to DECIMAL — computed FROM the
    stats columns so no window nests inside another), and the final
    ``cusum`` / ``is_shift`` running-sum expressions over ``_dev``.
    One template used by both the operator and the oracle renderer, so
    the scalar double expression trees match token-for-token.
    """
    wp = f"(PARTITION BY {part})"
    wo = (
        f"(PARTITION BY {part} ORDER BY {order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    dev = (
        f"CAST(({value} - (_sx / _n)) / "
        "NULLIF(SQRT((_sxx - _sx * _sx / _n) / (_n - 1)), 0.0) "
        "AS DECIMAL(18,6))"
    )
    return {
        "n": f"COUNT({value}) OVER {wp}",
        "sx": f"CAST(SUM(CAST({value} AS DECIMAL(18,6))) OVER {wp} AS DOUBLE)",
        "sxx": (
            f"CAST(SUM(CAST({value} AS DECIMAL(18,6)) * CAST({value} AS DECIMAL(18,6))) "
            f"OVER {wp} AS DOUBLE)"
        ),
        "dev": dev,
        "cusum": f"CAST(ROUND(SUM(_dev) OVER {wo}, {round_to}) AS DOUBLE)",
        "is_shift": (
            f"ABS(CAST(ROUND(SUM(_dev) OVER {wo}, {round_to}) AS DOUBLE)) "
            f"> {threshold} * SQRT(_n)"
        ),
    }


def cusum_oracle_sql(
    table: str,
    value: str,
    part: str,
    order: str,
    *,
    keep: str,
    threshold: float = 3.0,
    round_to: int = 4,
) -> str:
    """ANSI-SQL rendering of the same staged plan for the DuckDB oracle."""
    ex = cusum_stage_exprs(value, part, order, threshold, round_to)
    return f"""
    WITH stats AS (
      SELECT {keep}, {value},
             {ex['n']} AS _n, {ex['sx']} AS _sx, {ex['sxx']} AS _sxx
      FROM {table}
    ),
    dev AS (
      SELECT {keep}, {value}, _n, {ex['dev']} AS _dev FROM stats
    )
    SELECT {keep}, {value}, {ex['cusum']} AS cusum, {ex['is_shift']} AS is_shift
    FROM dev
    """


def cusum(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    order_extra: str | Sequence[str] | None = None,
    threshold: float = 3.0,
    round_to: int = 4,
) -> DataFrame:
    """Append ``cusum`` and ``is_shift`` (|S_t| > threshold * sqrt(n))
    to each row of a keyed time series."""
    parts = _as_list(partition_by)
    extra = _as_list(order_extra)
    missing = [c for c in (*parts, value_col, time_col, *extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    if not parts:
        raise ColumnNotFoundError("cusum requires a series key (partition_by)")
    ex = cusum_stage_exprs(
        value_col, ", ".join(parts), ", ".join([time_col, *extra]), threshold, round_to
    )
    keep = [*parts, time_col, *extra]
    stats = df.select(
        *keep,
        F.col(value_col),
        F.expr(ex["n"]).alias("_n"),
        F.expr(ex["sx"]).alias("_sx"),
        F.expr(ex["sxx"]).alias("_sxx"),
    )
    dev = stats.select(*keep, value_col, "_n", F.expr(ex["dev"]).alias("_dev"))
    return dev.select(
        *keep,
        F.col(value_col),
        F.expr(ex["cusum"]).alias("cusum"),
        F.expr(ex["is_shift"]).alias("is_shift"),
    )
