"""Resample / downsample: time-bucketed aggregation.

Extension operator (SURVEY.md §2.2).  Pure groupBy over a truncated time
column → partial (map-side) aggregation before the single shuffle; at
100 TB this is the cheapest possible shape because combiners collapse
each bucket locally first.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

_TRUNC_UNITS = {"year", "quarter", "month", "week", "day", "hour", "minute", "second"}


def resample(
    df: DataFrame,
    time_col: str,
    every: str,
    aggs: dict[str, tuple[str, str]],
    *,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Aggregate into calendar buckets.

    Parameters
    ----------
    every
        A date_trunc unit: 'hour', 'day', 'week', ...
    aggs
        ``{output_name: (stat, column)}`` with stat in
        sum/avg/min/max/count/count_distinct. Every output is aliased to
        ``output_name`` (oracle naming contract).
    """
    if every not in _TRUNC_UNITS:
        raise ValueError(f"every must be one of {sorted(_TRUNC_UNITS)}, got {every!r}")
    partition_by = (
        [] if partition_by is None else [partition_by] if isinstance(partition_by, str) else list(partition_by)
    )
    needed = [time_col, *partition_by, *[c for _, c in aggs.values()]]
    missing = [c for c in needed if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    stat_fns = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "count_distinct": F.countDistinct,
    }
    agg_exprs = []
    for name, (stat, col) in aggs.items():
        if stat not in stat_fns:
            raise ValueError(f"unknown stat {stat!r}; supported: {sorted(stat_fns)}")
        agg_exprs.append(stat_fns[stat](F.col(col)).alias(name))

    bucket = F.date_trunc(every, F.col(time_col)).alias("bucket")
    return df.groupBy(*partition_by, bucket).agg(*agg_exprs)


def hopping_window_agg(
    df: DataFrame,
    time_col: str,
    window: str,
    hop: str,
    aggs: dict[str, tuple[str, str]],
    *,
    partition_by: str | Sequence[str] | None = None,
) -> DataFrame:
    """Overlapping (hopping/sliding) window aggregation in BATCH.

    ``F.window(t, window, hop)`` assigns each row to the window/hop
    overlapping slots (epoch-aligned, same semantics as the streaming
    windowed aggregations in streaming/), then one groupBy per slot —
    the row-explosion factor is window/hop, priced explicitly by the
    caller.  Output carries ``window_start`` / ``window_end``.

    Plan: Explode(window slots) -> partial agg -> ONE exchange on
    (keys, window) — identical scale shape to resample, ×(window/hop)
    input rows.
    """
    from ._time import assert_time_dtype

    parts = (
        [] if partition_by is None
        else [partition_by] if isinstance(partition_by, str)
        else list(partition_by)
    )
    missing = [c for c in (time_col, *parts) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    assert_time_dtype(df, time_col)
    stat_fns = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "count": F.count,
        "count_distinct": F.countDistinct,
    }
    agg_cols = []
    for name, (stat, col) in aggs.items():
        if stat not in stat_fns:
            raise ValueError(f"unknown stat {stat!r}; supported: {sorted(stat_fns)}")
        agg_cols.append(stat_fns[stat](F.col(col)).alias(name))
    win = F.window(F.col(time_col).cast("timestamp"), window, hop)
    return (
        df.groupBy(*parts, win.alias("_w"))
        .agg(*agg_cols)
        .select(
            *parts,
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            *[F.col(name) for name in aggs],
        )
    )


def m4_downsample_sql(
    dialect: str,
    table: str,
    time_col: str,
    value_col: str,
    id_col: str,
    *,
    num_buckets: int = 100,
    group_by: Sequence[str] = (),
) -> str:
    """M4 visualization-grade downsampling (Jugel et al., VLDB 2014):
    per time bucket keep the rows realizing min/max VALUE and min/max
    TIME (≤4 rows per bucket) — the smallest subset that renders a
    pixel-perfect line chart at ``num_buckets`` horizontal pixels.
    Unlike LTTB this has no sequential dependency between buckets, so it
    parallelizes as ONE Exchange on (group, bucket) + four ROW_NUMBER
    orderings inside it.

    Buckets are equal-width over the GLOBAL [min, max] epoch-µs span
    (one tree-aggregated bounds row broadcast back — the
    histogram_quantiles_auto pattern); all bucket arithmetic is int64
    (exact, cross-engine).  Every role pick is total-ordered with
    (time, id) tiebreaks, so the selected rows are deterministic even
    under duplicate values/timestamps.  Output: one row per selected
    input row with its bucket and role flags (a row may hold several
    roles).
    """
    ep = (
        (lambda c: f"unix_micros(CAST({c} AS TIMESTAMP))")
        if dialect == "spark"
        else (lambda c: f"epoch_us({c})")
    )
    idiv = "div" if dialect == "spark" else "//"
    groups = list(group_by)
    g = ", ".join(groups)
    gsel = f"{g}, " if g else ""
    part = f"{gsel}_bkt"
    roles = {
        "is_tmin": f"ORDER BY _t_us ASC, {id_col} ASC",
        "is_tmax": f"ORDER BY _t_us DESC, {id_col} DESC",
        "is_vmin": f"ORDER BY {value_col} ASC, _t_us ASC, {id_col} ASC",
        "is_vmax": f"ORDER BY {value_col} DESC, _t_us ASC, {id_col} ASC",
    }
    rns = ",\n             ".join(
        f"ROW_NUMBER() OVER (PARTITION BY {part} {o}) AS _rn_{n}"
        for n, o in roles.items()
    )
    flags = ", ".join(f"_rn_{n} = 1 AS {n}" for n in roles)
    anyrole = " OR ".join(f"_rn_{n} = 1" for n in roles)
    return f"""
    WITH pts AS (
      SELECT {gsel}{id_col}, {time_col}, {value_col}, {ep(time_col)} AS _t_us
      FROM {table} WHERE {value_col} IS NOT NULL AND {time_col} IS NOT NULL
    ),
    b AS (
      SELECT MIN(_t_us) AS _lo, MAX(_t_us) AS _hi FROM pts
    ),
    bucketed AS (
      SELECT pts.*,
             CAST((( _t_us - _lo) * {num_buckets}) {idiv} (_hi - _lo + 1) AS INT) AS _bkt
      FROM pts CROSS JOIN b
    ),
    ranked AS (
      SELECT {gsel}{id_col}, {time_col}, {value_col}, _bkt,
             {rns}
      FROM bucketed
    )
    SELECT {gsel}_bkt AS bucket, {id_col}, {time_col}, {value_col}, {flags}
    FROM ranked
    WHERE {anyrole}
    """


def m4_downsample(
    df: DataFrame,
    time_col: str,
    value_col: str,
    id_col: str,
    *,
    num_buckets: int = 100,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """DataFrame entry point for :func:`m4_downsample_sql` (the Spark
    dialect renders the same logical plan the DuckDB oracle runs)."""
    from ._time import assert_time_dtype

    missing = [c for c in (time_col, value_col, id_col, *group_by) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    assert_time_dtype(df, time_col)
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    sql = m4_downsample_sql(
        "spark", "_ts_m4_in", time_col, value_col, id_col,
        num_buckets=num_buckets, group_by=group_by,
    )
    df.createOrReplaceTempView("_ts_m4_in")
    return df.sparkSession.sql(sql)
