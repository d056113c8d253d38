"""Seasonal adjustment: remove a periodic (e.g. hour-of-day) profile.

``value_deseason = value - mean(value | same series, same season slot)``
— the "seasonal naive" decomposition, the standard pre-step before
anomaly scoring on strongly diurnal series.  The profile mean uses
decimal-quantized sums (queries.dsum discipline) so it is exact and
order-independent; both engines then evaluate the identical scalar
double expression.

Plan: one exchange on (series key, season slot) feeding an unordered
window aggregate — no sort needed, no driver work, scales like any
keyed aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

__all__ = ["deseasonalize", "deseasonalize_sql", "SEASON_FNS"]

# Season slot expressions valid verbatim AND value-identical in BOTH
# Spark SQL and DuckDB.  dayofweek is deliberately absent: Spark numbers
# Sunday=1..7, DuckDB Sunday=0..6 — no shared-text expression agrees.
SEASON_FNS = {
    "hour": "hour({t})",
    "day": "day({t})",
    "month": "month({t})",
}


def _stat_exprs(value: str, part: str, season_slot: str) -> dict[str, str]:
    """The two per-slot statistics as NAMED window expressions.

    WindowExec evaluates every textual aggregate occurrence separately
    (no dedup, unlike HashAggregate — the rolling_corr finding): the
    inlined form of these expressions expanded to 40 window slots
    (dec_to_double triples the SUM, round_double's CASE duplicates the
    whole formula 5x in two output columns).  Stats once as columns +
    a scalar combine keeps the WindowExec at exactly 2 aggregates."""
    wp = f"(PARTITION BY {part}, {season_slot})"
    return {
        "_n": f"COUNT({value}) OVER {wp}",
        "_sxd": f"SUM(CAST({value} AS DECIMAL(27,6))) OVER {wp}",
    }


def _final_exprs(value: str, round_to: int) -> dict[str, str]:
    # ROUND on a raw DOUBLE diverges between engines at representable
    # near-midpoints (observed: -8.6963 vs -8.6962 at sf0.01) — quantize
    # to DECIMAL first, where ROUND is HALF_UP on both (dsum discipline);
    # the final rounding is the pure-double form (operators/_num.py).
    from ._num import dec_to_double, round_double

    sx = dec_to_double("_sxd")
    return {
        "seasonal_mean": round_double(f"{sx} / _n", round_to),
        "value_deseason": round_double(f"{value} - {sx} / _n", round_to),
    }


def deseasonalize(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_by: str | Sequence[str],
    season: str = "hour",
    round_to: int = 4,
) -> DataFrame:
    """Append ``season_slot``, ``seasonal_mean`` and ``value_deseason``
    to each row of a keyed time series."""
    parts = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if season not in SEASON_FNS:
        raise ValueError(f"season must be one of {sorted(SEASON_FNS)}, got {season!r}")
    missing = [c for c in (*parts, value_col, time_col) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    slot = SEASON_FNS[season].format(t=time_col)
    stats = _stat_exprs(value_col, ", ".join(parts), slot)
    fin = _final_exprs(value_col, round_to)
    staged = df.select(
        *parts,
        time_col,
        F.col(value_col),
        F.expr(slot).alias("season_slot"),
        *[F.expr(e).alias(name) for name, e in stats.items()],
    )
    return staged.select(
        *parts,
        time_col,
        value_col,
        "season_slot",
        F.expr(fin["seasonal_mean"]).alias("seasonal_mean"),
        F.expr(fin["value_deseason"]).alias("value_deseason"),
    )


def deseasonalize_sql(
    table: str,
    value: str,
    time_col: str,
    part: str,
    *,
    season: str = "hour",
    round_to: int = 4,
) -> str:
    """The identical expressions as ANSI SQL for the DuckDB oracle."""
    slot = SEASON_FNS[season].format(t=time_col)
    stats = _stat_exprs(value, part, slot)
    fin = _final_exprs(value, round_to)
    stat_cols = ",\n             ".join(f"{e} AS {name}" for name, e in stats.items())
    return f"""
    SELECT {part}, {time_col}, {value}, season_slot,
           {fin['seasonal_mean']} AS seasonal_mean,
           {fin['value_deseason']} AS value_deseason
    FROM (
      SELECT {part}, {time_col}, {value},
             {slot} AS season_slot,
             {stat_cols}
      FROM {table}
    )
    """
