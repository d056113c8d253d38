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
    value: str,
    part: str,
    order: str,
    threshold: float = 3.0,
    round_to: int = 4,
    *,
    width: int = 18,
) -> dict[str, str]:
    """Shared SQL fragments (valid verbatim in Spark and DuckDB).

    Three stages: ``stats`` (per-key window aggregates), ``dev`` (scalar
    standardized deviation quantized to DECIMAL — computed FROM the
    stats columns so no window nests inside another), and the final
    ``cusum`` / ``is_shift`` running-sum expressions over ``_dev``.
    One template used by both the operator and the oracle renderer, so
    the scalar double expression trees match token-for-token.
    """
    from ._num import dec_to_double, round_double

    wp = f"(PARTITION BY {part})"
    wo = (
        f"(PARTITION BY {part} ORDER BY {order} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    # quantize the deviation in DOUBLE space first (round_double): a
    # direct double->decimal cast breaks ties HALF_UP on Spark but
    # HALF_EVEN on DuckDB; after the shared rounding the value sits on
    # the decimal grid and the cast is tie-free on both
    raw_dev = (
        f"(({value} - (_sx / _n)) / "
        "NULLIF(SQRT(GREATEST((_sxx - _sx * _sx / _n) / NULLIF(_n - 1, 0), 0.0)), 0.0))"
    )
    dev = f"CAST({round_double(raw_dev, 6)} AS DECIMAL(18,6))"
    return {
        "n": f"COUNT({value}) OVER {wp}",
        "sx": dec_to_double(f"SUM(CAST({value} AS DECIMAL({width},6))) OVER {wp}"),
        "sxx": dec_to_double(
            f"SUM(CAST({value} AS DECIMAL({width},6)) * CAST({value} AS DECIMAL({width},6))) "
            f"OVER {wp}"
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
    """ANSI-SQL rendering of the same staged plan for the DuckDB oracle.
    width=19: DuckDB multiplies width-18 decimals in int64 and overflows;
    19 forces hugeint. Values identical (precision widens range, not scale)."""
    ex = cusum_stage_exprs(value, part, order, threshold, round_to, width=19)
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
