"""Distributed global prefix sum (exact, no single-task window).

``SUM(v) OVER (ORDER BY t ... ROWS UNBOUNDED PRECEDING)`` with no
partition key sends every row to ONE task — the same scaling cliff the
halo-bucket lag path removes (operators/scale.py), but a running sum
needs *prefix state*, not a fixed-width halo.  Classic two-pass scan:

1. range-bucket rows on the order column (approxQuantile boundaries —
   one cheap stats job);
2. per-bucket ordered running sums (windows partitioned by bucket);
3. per-bucket TOTALS (num_buckets scalar rows) come to the driver,
   exclusive-prefix them, and broadcast the offsets back as a literal
   array lookup;
4. row result = local running sum + own bucket's offset.

Every addend is DECIMAL-quantized, so the sums are exact and
order-independent — the distributed result equals the single-task
window bit-for-bit, which is what lets a DuckDB oracle check it.

Cost at 100 TB: one shuffle (the bucket exchange) + per-partition sort
+ an O(num_buckets) driver reduction.  The classic Blelloch scan, in
DataFrame clothes.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError
from .scale import _numeric_time

__all__ = ["prefix_sum_global", "shuffle_rank_global"]


def prefix_sum_global(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    order_extra: str | Sequence[str] | None = None,
    num_buckets: int = 32,
    relative_error: float = 0.001,
    out_col: str = "running_sum",
) -> DataFrame:
    """Append the exact global running sum of ``value_col`` in
    ``(time_col, *order_extra)`` order.  Output column is DOUBLE (cast
    from the exact decimal)."""
    extra = (
        [] if order_extra is None
        else [order_extra] if isinstance(order_extra, str)
        else list(order_extra)
    )
    missing = [c for c in (value_col, time_col, *extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    dec = F.col(value_col).cast("decimal(27,6)")
    order_cols = [time_col, *extra]

    num_df = df.withColumn("_t_num", _numeric_time(df, time_col))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(num_df.stat.approxQuantile("_t_num", probs, relative_error)))
    if not bounds:
        # degenerate tiny/constant ordering column — plain global window
        w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
        return df.withColumn(out_col, F.sum(dec).over(w).cast("double"))

    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col("_t_num") > F.lit(b), 1).otherwise(0)
    # localCheckpoint, NOT persist: TWO jobs read this frame (the totals
    # collect below and the caller's ranking job), and on a
    # non-deterministic source they must read IDENTICAL rows — offsets
    # from one draw and local sums from another silently corrupt the
    # global prefix.  persist() only caches best-effort: under memory
    # pressure Spark evicts partitions and RECOMPUTES them from the
    # source, re-opening exactly that divergence.  localCheckpoint
    # severs the lineage — an evicted/lost partition is an error, never
    # a silent recompute (lazy: the totals collect materializes it).
    bucketed = (
        num_df.withColumn("_bucket", bucket).drop("_t_num").localCheckpoint(eager=False)
    )

    # pass 1: per-bucket local running sums (bucket-partitioned windows)
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = bucketed.withColumn("_local", F.sum(dec).over(w_local))

    # pass 2: exclusive prefix of bucket totals — O(num_buckets) driver rows
    totals = {
        r["_bucket"]: (r["t"] if r["t"] is not None else Decimal(0))
        for r in bucketed.groupBy("_bucket").agg(F.sum(dec).alias("t")).collect()
    }
    offsets: list[Decimal] = []
    acc = Decimal(0)
    for b in range(len(bounds) + 1):
        offsets.append(acc)
        acc += totals.get(b, Decimal(0))
    lookup = F.array(*[F.lit(str(o)).cast("decimal(27,6)") for o in offsets])

    return (
        local.withColumn(
            out_col,
            (F.col("_local") + F.element_at(lookup, F.col("_bucket") + 1)).cast("double"),
        )
        .drop("_bucket", "_local")
    )


def shuffle_rank_global(
    df: DataFrame,
    id_col: str,
    *,
    num_buckets: int = 256,
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """Global deterministic shuffle rank: every row's 1-based position in
    ``md5(id)`` order — the epoch-shuffle primitive of a training-data
    pipeline (write-out in shuffle_rank order = a reproducible global
    permutation, no RNG state, identical on any cluster size).

    ``ROW_NUMBER() OVER (ORDER BY md5(id))`` is a single-task global
    sort; instead the md5 key is RANGE-bucketed on its first 4 hex
    digits (md5 is uniform, so static equal-width key ranges — no
    quantile job needed, unlike prefix_sum_global's data-dependent
    order column), ranked per bucket, and the per-bucket COUNTS
    (num_buckets scalar rows) are exclusive-prefixed on the driver and
    folded back as a literal lookup.  Rank = bucket offset + local
    rank: exact, total, and collision-free (ties broken by id, which
    md5 already determines uniquely per distinct id).
    """
    if id_col not in df.columns:
        raise ColumnNotFoundError(f"column {id_col!r} not in DataFrame")
    if num_buckets < 1 or num_buckets > 65536 or (num_buckets & (num_buckets - 1)):
        raise ValueError(f"num_buckets must be a power of two in [1, 65536], got {num_buckets}")

    key = f"md5(CAST({id_col} AS STRING))"
    stride = 65536 // num_buckets
    # localCheckpoint for the same reason as prefix_sum_global's bucketed
    # frame: the counts collect and the caller's rank job must read the
    # SAME materialized rows (a non-deterministic source would otherwise
    # yield duplicate or gapped global ranks) — persist() can evict and
    # silently recompute under memory pressure; lineage truncation is
    # the real guarantee (lazy: the counts collect materializes it).
    keyed = df.selectExpr(
        "*",
        f"{key} AS _skey",
        f"CAST(conv(substr({key}, 1, 4), 16, 10) AS INT) DIV {stride} AS _bucket",
    ).localCheckpoint(eager=False)
    w_local = Window.partitionBy("_bucket").orderBy("_skey", id_col)
    local = keyed.withColumn("_local", F.row_number().over(w_local))

    counts = {
        r["_bucket"]: r["c"]
        for r in keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets: list[int] = []
    acc = 0
    for b in range(num_buckets):
        offsets.append(acc)
        acc += counts.get(b, 0)
    # long literals: at corpus scale the offsets exceed int32
    lookup = F.array(*[F.lit(o).cast("long") for o in offsets])

    return (
        local.withColumn(
            out_col,
            F.col("_local").cast("long")
            + F.element_at(lookup, (F.col("_bucket") + 1).cast("int")),
        )
        .drop("_skey", "_bucket", "_local")
    )
