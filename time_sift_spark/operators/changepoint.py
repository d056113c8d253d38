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


def changepoint_locate_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> str:
    """AMOC (at-most-one-changepoint) mean-shift LOCATOR per series —
    the companion of the CUSUM flag above: CUSUM says *whether* the
    level shifted, this says *where* and *by how much*.  For every
    candidate split i of the daily-bucketed series it scores the
    classic two-segment separation statistic

        gain(i) = i·(n−i)/n · (mean_left − mean_right)²

    (the likelihood-ratio statistic for a single mean shift under fixed
    variance — exactly what binary segmentation maximizes) and returns
    the argmax split: its day, both segment means, and the gain.

    Shape: day bucketing is one exact-decimal groupBy; ONE exchange on
    the series key then feeds all three window frames (row index,
    ordered cumulative sum, per-key total) — the cusum plan; the argmax
    is a per-key rank window over the ≤ |bucket calendar| candidate
    rows.  Quadratic in NOTHING: unlike Theil-Sen's pairwise slopes,
    the scan is linear in buckets.

    Determinism: bucket sums, cumulative and total sums are exact
    decimals; each mean is one dec→double cast + one IEEE division; the
    gain is pure double arithmetic on those two quotients, round_double'd
    BEFORE the rank, and ties break on the earlier split — both engines
    rank identical doubles identically.  Series with a single bucket
    have no candidate split and drop out (nothing to locate).
    """
    from ._num import dec_to_double, round_double

    if d.name == "spark":
        day = f"datediff(CAST({time_col} AS DATE), DATE '1970-01-01')"
        # TIMESTAMP, not DATE: pandas reads Spark DATE as date objects but
        # DuckDB DATE as datetime64 — the harness's representation-kind gate
        cp_day = "CAST(date_add(DATE '1970-01-01', CAST(x AS INT)) AS TIMESTAMP)"
    else:
        day = f"datediff('day', DATE '1970-01-01', CAST({time_col} AS DATE))"
        cp_day = "CAST((DATE '1970-01-01' + CAST(x AS INT)) AS TIMESTAMP)"
    ydec = f"CAST({value_col} AS DECIMAL(18,6))"
    m1 = f"({dec_to_double('cs')} / CAST(i AS DOUBLE))"
    m2 = f"({dec_to_double('(st - cs)')} / CAST(n - i AS DOUBLE))"
    gain = (
        f"((CAST(i AS DOUBLE) * CAST(n - i AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * ({m1} - {m2}) * ({m1} - {m2}))"
    )
    return f"""
    WITH _cpb AS (
      SELECT {group_col} AS k, {day} AS x,
             CAST(SUM({ydec}) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {group_col}, {day}
    ),
    _cpw AS (
      SELECT k, x, y,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY x) AS i,
             CAST(SUM(y) OVER (PARTITION BY k ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(27,6)) AS cs,
             COUNT(*) OVER (PARTITION BY k) AS n,
             CAST(SUM(y) OVER (PARTITION BY k) AS DECIMAL(27,6)) AS st
      FROM _cpb
    ),
    _cpg AS (
      SELECT k, x, i, n,
             {round_double(m1, round_to)} AS mean_before,
             {round_double(m2, round_to)} AS mean_after,
             {round_double(gain, round_to)} AS gain
      FROM _cpw WHERE i < n
    ),
    _cpr AS (
      SELECT k, x, i, n, mean_before, mean_after, gain,
             ROW_NUMBER() OVER (PARTITION BY k
               ORDER BY gain DESC, i ASC) AS rnk
      FROM _cpg
    )
    SELECT k AS {group_col}, CAST(n AS BIGINT) AS n_buckets,
           CAST(i AS BIGINT) AS cp_index, {cp_day} AS cp_last_day_before,
           mean_before, mean_after, gain
    FROM _cpr WHERE rnk = 1
    """


def changepoint_locate(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`changepoint_locate_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_cploc_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        changepoint_locate_sql(_S, view, value_col, time_col, group_col,
                               round_to=round_to)
    )
