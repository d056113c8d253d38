"""Scale path for UN-partitioned (single global series) lag features.

``Window.orderBy(t)`` with no partitionBy sends every row to ONE task —
the scaling cliff called out in SURVEY.md §4/§7.  This operator removes
it with chunked range repartitioning + halo overlap:

1. one cheap stats pass picks ~equi-depth time boundaries
   (``approxQuantile``, driver-side scalar list);
2. each row gets a range-bucket id (O(num_buckets) literal comparisons,
   codegen'd — no join);
3. the trailing ``max(lags)`` rows of every bucket are DUPLICATED into
   the next bucket (the "halo"), tagged;
4. lags are computed per bucket — every real row sees its true
   predecessors, either locally or via the halo;
5. halo rows are dropped.

Cost: 2 shuffles (halo ranking + the window itself) and a ~max_lag ×
num_buckets row duplication — constant overhead, versus a single-task
sort at any scale.  Exactness is guaranteed when every non-final bucket
is non-empty (equi-depth boundaries drawn from real data values make
middle buckets non-empty by construction); property-tested against the
naive global window.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError, EmptyDataError, validate_lags
from ..plans.lag_plan import lag_column_names


def _numeric_time(df: DataFrame, time_col: str) -> Column:
    """Time column as double for approxQuantile bucketing. TIMESTAMP_NTZ
    rejects a direct numeric cast (DATATYPE_MISMATCH), so re-tag it as
    TIMESTAMP first (UTC session pin makes that value-preserving);
    numeric/long time columns cast straight through unchanged."""
    c = F.col(time_col)
    if dict(df.dtypes).get(time_col) == "timestamp_ntz":
        c = c.cast("timestamp")
    return c.cast("double")


def lag_features_global(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    lags,
    *,
    order_extra: str | Sequence[str] | None = None,
    fill=None,
    num_buckets: int = 32,
    relative_error: float = 0.001,
) -> DataFrame:
    """Exact global-order lag features without a single-task window.

    Same output contract as operators.lag.lag_features(wide) with
    ``partition_by=None``; use this one when the series is large.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    order_extra = (
        [] if order_extra is None else [order_extra] if isinstance(order_extra, str) else list(order_extra)
    )
    lag_list = validate_lags(lags)
    max_lag = max(lag_list)
    missing = [c for c in (value_cols + [time_col] + order_extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    num_df = df.withColumn("_t_num", _numeric_time(df, time_col))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(num_df.stat.approxQuantile("_t_num", probs, relative_error)))
    if not bounds:
        # degenerate tiny/constant series — plain global window is fine
        w = Window.orderBy(time_col, *order_extra)
        return _project(df, value_cols, time_col, order_extra, lag_list, w, fill)

    bucket: Column = reduce(
        lambda acc, b: acc + F.when(F.col("_t_num") > F.lit(b), 1).otherwise(0),
        bounds,
        F.lit(0),
    )
    raw = num_df.withColumn("_bucket_raw", bucket).drop("_t_num")

    # A bucket smaller than max_lag would need halo rows from DEEPER than
    # its immediate predecessor. Rather than cascade halos, merge adjacent
    # raw buckets left-to-right until each closed bucket holds >= max_lag
    # rows (one cheap count-by-bucket job, ~num_buckets driver rows).
    counts = {r["_bucket_raw"]: r["count"] for r in raw.groupBy("_bucket_raw").count().collect()}
    mapping: list[int] = [0] * (len(bounds) + 1)
    merged_id, acc = 0, 0
    for rb in range(len(bounds) + 1):
        mapping[rb] = merged_id
        acc += counts.get(rb, 0)
        if acc >= max_lag:
            merged_id, acc = merged_id + 1, 0
    if merged_id == 0:  # everything merged into one bucket: tiny series
        w = Window.orderBy(time_col, *order_extra)
        return _project(df, value_cols, time_col, order_extra, lag_list, w, fill)

    lookup = F.array(*[F.lit(m) for m in mapping])
    bucketed = raw.withColumn(
        "_bucket", F.element_at(lookup, F.col("_bucket_raw") + 1)
    ).drop("_bucket_raw")
    n_merged = mapping[-1]

    # halo: trailing max_lag rows of each bucket, replicated into the next
    w_desc = Window.partitionBy("_bucket").orderBy(
        F.col(time_col).desc(), *[F.col(c).desc() for c in order_extra]
    )
    tail = (
        bucketed.withColumn("_rn", F.row_number().over(w_desc))
        .where((F.col("_rn") <= max_lag) & (F.col("_bucket") < n_merged))
        .drop("_rn")
        .withColumn("_bucket", F.col("_bucket") + 1)
        .withColumn("_halo", F.lit(True))
    )
    unioned = bucketed.withColumn("_halo", F.lit(False)).unionByName(tail)

    w_bucket = Window.partitionBy("_bucket").orderBy(time_col, *order_extra)
    out = _project(
        unioned, value_cols, time_col, order_extra, lag_list, w_bucket, fill, extra_keep=["_halo"]
    )
    return out.where(~F.col("_halo")).drop("_halo")


def lag_features_hotkey(
    df: DataFrame,
    value_cols: str | Sequence[str],
    time_col: str,
    lags,
    *,
    partition_by: str,
    order_extra: str | Sequence[str] | None = None,
    fill=None,
    hot_threshold: int = 5_000_000,
    num_buckets: int = 32,
    relative_error: float = 0.001,
) -> DataFrame:
    """Per-key lag features where PATHOLOGICALLY hot keys decompose into
    (key, bucket) halo windows — the per-key generalization of
    :func:`lag_features_global` (SCALE.md lag-family first cliff).

    ``Window.partitionBy(key)`` sends ALL of a key's rows to one task; a
    single key with billions of rows is therefore the same cliff the
    un-partitioned global window has, one level down. This operator:

    1. counts rows per key and collects ONLY keys above ``hot_threshold``
       (the filter runs before the collect — driver traffic is
       O(n_hot_keys), never O(n_keys));
    2. cold keys take the plain single-window path unchanged;
    3. hot-key rows are range-bucketed on shared equi-depth time
       boundaries (``approxQuantile`` over hot rows only), buckets are
       merged left-to-right PER KEY until each closed bucket holds >=
       max_lag rows (the driver sees n_hot_keys × num_buckets count rows;
       the per-key raw→merged mapping goes back as a broadcast join), and
       the trailing max_lag rows of every (key, bucket) are duplicated
       into the key's next bucket as halo rows;
    4. lags run per (key, bucket) — every real row sees its true
       predecessors locally or via the halo — and halo rows are dropped.

    Output contract and values are identical to
    ``lag_features(df, ..., partition_by=key)`` (property-tested); only
    the physical partitioning differs: the hot key's work is spread over
    ~num_buckets tasks instead of one.
    """
    value_cols = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    order_extra = (
        [] if order_extra is None else [order_extra] if isinstance(order_extra, str) else list(order_extra)
    )
    if not isinstance(partition_by, str):
        raise ColumnNotFoundError("lag_features_hotkey takes a single key column name")
    key = partition_by
    lag_list = validate_lags(lags)
    max_lag = max(lag_list)
    missing = [c for c in (value_cols + [key, time_col] + order_extra) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")

    out_cols = [key, time_col, *order_extra, *lag_column_names(value_cols, lag_list)]

    def _naive(part: DataFrame) -> DataFrame:
        w = Window.partitionBy(key).orderBy(time_col, *order_extra)
        return _project(
            part, value_cols, time_col, order_extra, lag_list, w, fill, extra_keep=[key]
        ).select(*out_cols)

    hot_rows = (
        df.groupBy(key).count().where(F.col("count") >= hot_threshold).select(key).collect()
    )
    hot_keys = [r[0] for r in hot_rows]
    if not hot_keys:
        return _naive(df)

    is_hot = F.col(key).isin(hot_keys) & F.col(key).isNotNull()
    cold = _naive(df.where(~is_hot | F.col(key).isNull()))
    hot = df.where(is_hot)

    num_df = hot.withColumn("_t_num", _numeric_time(hot, time_col))
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(set(num_df.stat.approxQuantile("_t_num", probs, relative_error)))
    if not bounds:
        return cold.unionByName(_naive(hot))

    bucket: Column = reduce(
        lambda acc, b: acc + F.when(F.col("_t_num") > F.lit(b), 1).otherwise(0),
        bounds,
        F.lit(0),
    )
    raw = num_df.withColumn("_bucket_raw", bucket).drop("_t_num")

    # per-key left-to-right merge (same invariant as the global form:
    # every CLOSED bucket of a key holds >= max_lag rows, so the next
    # bucket's halo never has to reach deeper than one predecessor)
    counts: dict[object, dict[int, int]] = {}
    for r in raw.groupBy(key, "_bucket_raw").count().collect():
        counts.setdefault(r[0], {})[r[1]] = r[2]
    map_rows = []
    for k, per_bucket in counts.items():
        merged_id, acc = 0, 0
        key_map = []
        for rb in range(len(bounds) + 1):
            key_map.append((k, rb, merged_id))
            acc += per_bucket.get(rb, 0)
            if acc >= max_lag:
                merged_id, acc = merged_id + 1, 0
        # _n_merged = id of the key's final (possibly short) bucket; halo
        # rows flow only out of buckets strictly below it
        final_id = key_map[-1][2]
        map_rows.extend((k, rb, m, final_id) for (k, rb, m) in key_map)
    mapping = df.sparkSession.createDataFrame(
        map_rows,
        schema=df.select(key)
        .schema.add("_bucket_raw", "integer")
        .add("_bucket", "integer")
        .add("_n_merged", "integer"),
    )
    bucketed = raw.join(
        F.broadcast(mapping), on=[key, "_bucket_raw"], how="inner"
    ).drop("_bucket_raw")

    w_desc = Window.partitionBy(key, "_bucket").orderBy(
        F.col(time_col).desc(), *[F.col(c).desc() for c in order_extra]
    )
    tail = (
        bucketed.withColumn("_rn", F.row_number().over(w_desc))
        .where((F.col("_rn") <= max_lag) & (F.col("_bucket") < F.col("_n_merged")))
        .drop("_rn")
        .withColumn("_bucket", F.col("_bucket") + 1)
        .withColumn("_halo", F.lit(True))
    )
    unioned = bucketed.withColumn("_halo", F.lit(False)).unionByName(tail)

    w_bucket = Window.partitionBy(key, "_bucket").orderBy(time_col, *order_extra)
    hot_out = (
        _project(
            unioned, value_cols, time_col, order_extra, lag_list, w_bucket, fill,
            extra_keep=[key, "_halo"],
        )
        .where(~F.col("_halo"))
        .select(*out_cols)
    )
    return cold.unionByName(hot_out)


def _project(df, value_cols, time_col, order_extra, lag_list, w, fill, extra_keep=()):
    names = lag_column_names(value_cols, lag_list)
    exprs = []
    i = 0
    for k in lag_list:
        for v in value_cols:
            e = F.lag(F.col(v), k).over(w) if k else F.col(v)
            if fill is not None and k:
                e = F.coalesce(e, F.lit(fill))
            exprs.append(e.alias(names[i]))
            i += 1
    return df.select(time_col, *order_extra, *extra_keep, *exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-hardened shuffle join: spread each hot join key over
    ``salt`` reducer partitions.

    The left (large, skewed) side gets a deterministic per-row salt —
    ``pmod(xxhash64(all columns), salt)`` — so a hot key's rows fan out
    over ``salt`` reducers; the right side is replicated ``salt`` times
    (one copy per salt value, via a literal ``explode(sequence(...))`` —
    no Python, no cartesian operator), so every left row still meets
    every matching right row exactly once.  Result rows are identical to
    the plain join (property-tested, incl. key multiplicity).

    When to reach for this instead of AQE's skew-join split: AQE can
    only split what it can measure at a stage boundary — a first-stage
    map-side skew (straight scan into join) or a key so hot one
    partition exceeds every split threshold still lands on one reducer.
    Salting moves the decision to plan time at the cost of a ``salt``×
    replication of the right side — so keep the right side the smaller
    input.  (A right side small enough to broadcast should broadcast
    instead; salting is for mid-size rights that fit memory ``salt``
    times but not per-executor.)

    ``how``: "inner" or "left" (replication preserves multiplicity for
    both; full/right outer would multiply unmatched right rows and are
    rejected).
    """
    keys = [on] if isinstance(on, str) else list(on)
    missing = [k for k in keys if k not in left.columns or k not in right.columns]
    if missing:
        raise ColumnNotFoundError(f"join key(s) not on both sides: {missing}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    hash_cols = ", ".join(left.columns)
    lsalt = left.withColumn(
        "_salt", F.expr(f"pmod(xxhash64({hash_cols}), {int(salt)})").cast("int")
    )
    rsalt = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {int(salt) - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return lsalt.join(rsalt, [*keys, "_salt"], how).drop("_salt")


# --------------------------------------------------------------------------
# Z-order (Morton) data layout
# --------------------------------------------------------------------------


def zvalue_expr(d, xcol: str, ycol: str, *, bits: int = 8) -> str:
    """Morton interleave of two ``bits``-bit non-negative bucket columns
    (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER layout key): bit i
    of x lands at position 2i+1, bit i of y at 2i, so sorting by the
    z-value clusters rows that are close in BOTH dimensions — a range
    predicate on EITHER column prunes most blocks, which a single-column
    sort only achieves for its leading column.

    Dialect-paired pure-integer arithmetic (shift/mod — no UDF, no
    lookup join); ``d`` is a functions.text_fns.Dialect.
    """
    terms = []
    for i in range(bits):
        if d.name == "spark":
            terms.append(f"shiftleft(shiftright({xcol}, {i}) % 2, {2 * i + 1})")
            terms.append(f"shiftleft(shiftright({ycol}, {i}) % 2, {2 * i})")
        else:
            terms.append(f"((({xcol} >> {i}) % 2) << {2 * i + 1})")
            terms.append(f"((({ycol} >> {i}) % 2) << {2 * i})")
    return "(" + " + ".join(terms) + ")"


def zorder_block_stats_sql(
    d,
    table: str,
    x_expr: str,
    y_expr: str,
    *,
    bits: int = 8,
    rows_per_block_shift: int = 6,
) -> str:
    """Per-z-block clustering audit: bucket both dimensions, interleave,
    group rows into blocks of 2^shift consecutive z-values (the file/
    row-group analogue), and report each block's row count and min/max
    extent in BOTH dimensions.  Small per-block spans in x AND y are
    the measurable clustering property that makes z-ordered files
    prunable by either predicate — the audit a layout job runs after
    OPTIMIZE ZORDER, expressed engine-natively.

    At 100 TB the layout itself is ``repartitionByRange(zv) +
    sortWithinPartitions(zv)`` on the write path; this statement is the
    read-side proof, ONE shuffle on the block id.
    """
    from .dedup import _int_div

    z = zvalue_expr(d, "_zx", "_zy", bits=bits)
    block = _int_div(d, "_zv", 1 << rows_per_block_shift)
    return f"""
    WITH _zb AS (
      SELECT {x_expr} AS _zx, {y_expr} AS _zy FROM {table}
    ),
    _zv AS (
      SELECT _zx, _zy, {z} AS _zv FROM _zb
    )
    SELECT {block} AS block_id,
           COUNT(*) AS n_rows,
           MIN(_zx) AS x_min, MAX(_zx) AS x_max,
           MIN(_zy) AS y_min, MAX(_zy) AS y_max,
           MAX(_zx) - MIN(_zx) AS x_span,
           MAX(_zy) - MIN(_zy) AS y_span
    FROM _zv
    GROUP BY {block}
    ORDER BY block_id
    """
