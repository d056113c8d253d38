"""Ordered-funnel analysis over an event stream.

``funnel(df, steps=[("signup", ...), ("click", ...), ("purchase", ...)])``
computes, per user, the earliest time each step was completed STRICTLY
AFTER the previous step's completion — the standard product-analytics
funnel (a user who purchased before ever clicking does not count as a
step-3 conversion).

Plan shape: one Exchange on the user key feeds N chained unordered
window aggregates (step i's MIN is a plain column before step i+1's
window consumes it — no window nests inside another, the same staging
discipline as operators/changepoint.py), then the per-user collapse
reuses the same partitioning.  Events are scanned ONCE regardless of
step count; no self-joins.

The DuckDB oracle is rendered from the same staged template.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import ColumnNotFoundError

__all__ = ["funnel", "funnel_oracle_sql", "sequence_ngrams",
           "session_paths_sql", "streaming_top_paths",
           "top_paths", "top_paths_sql", "transition_matrix"]


def _step_exprs(
    steps: Sequence[tuple[str, str]], time_col: str, part: str
) -> list[tuple[str, str]]:
    """[(t_col_name, window_expr_sql)] — step i's predicate is ANDed with
    strict progression past step i-1's completion time."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = []
    prev = None
    for name, pred in steps:
        cond = pred if prev is None else f"({pred}) AND {time_col} > t_{prev}"
        out.append(
            (
                f"t_{name}",
                f"MIN(CASE WHEN {cond} THEN {time_col} END) OVER (PARTITION BY {part})",
            )
        )
        prev = name
    return out


def funnel(
    df: DataFrame,
    time_col: str,
    partition_by: str,
    steps: Sequence[tuple[str, str]],
) -> DataFrame:
    """One row per user: ``t_{step}`` completion times (NULL where the
    funnel broke) and ``funnel_stage`` = number of steps completed in
    order."""
    missing = [c for c in (time_col, partition_by) if c not in df.columns]
    if missing:
        raise ColumnNotFoundError(f"columns not in DataFrame: {missing}")
    exprs = _step_exprs(steps, time_col, partition_by)
    cur = df
    for t_name, sql in exprs:
        cur = cur.withColumn(t_name, F.expr(sql))
    t_cols = [t for t, _ in exprs]
    stage = " + ".join(f"CASE WHEN MIN({t}) IS NOT NULL THEN 1 ELSE 0 END" for t in t_cols)
    return cur.groupBy(partition_by).agg(
        *[F.min(t).alias(t) for t in t_cols],
        F.expr(f"({stage})").alias("funnel_stage"),
    )


def funnel_oracle_sql(
    table: str,
    time_col: str,
    part: str,
    steps: Sequence[tuple[str, str]],
) -> str:
    exprs = _step_exprs(steps, time_col, part)
    ctes, prev = [], table
    for i, (t_name, sql) in enumerate(exprs):
        ctes.append(f"s{i} AS (SELECT *, {sql} AS {t_name} FROM {prev})")
        prev = f"s{i}"
    t_cols = [t for t, _ in exprs]
    mins = ", ".join(f"MIN({t}) AS {t}" for t in t_cols)
    stage = " + ".join(f"CASE WHEN MIN({t}) IS NOT NULL THEN 1 ELSE 0 END" for t in t_cols)
    return f"""
    WITH {', '.join(ctes)}
    SELECT {part}, {mins}, ({stage}) AS funnel_stage
    FROM {prev} GROUP BY {part}
    """


def sequence_ngrams_sql(
    table: str,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    n: int = 3,
    min_keys: int = 2,
) -> str:
    """Frequent behavioral n-grams (PrefixSpan-lite, Pei et al. 2001,
    restricted to CONTIGUOUS n-grams — which is what makes it pure
    relational algebra): for every key's event stream ordered by
    (time, tiebreak), count each length-n contiguous item pattern
    globally, keep patterns supported by at least ``min_keys`` distinct
    keys.  Dialect-neutral text: LEAD windows + GROUP BY parse
    identically on Spark and DuckDB (the engine's LEAD-window n-gram
    convention — never a per-row transform lambda).

    Output: (g1..gn, n_occurrences, n_keys), support-ordered with a
    full deterministic tiebreak.

    Scale shape: ONE shuffle on key (the window), ONE on the n-gram
    pattern (the count) — the same two-exchange plan as the hopping/
    session analytics; min_keys is the df-cap that keeps the output
    bounded under vocabulary skew (a bot replaying one pattern can
    inflate n_occurrences but never n_keys).
    """
    grams = ", ".join(
        f"LEAD({item_col}, {i}) OVER w AS g{i + 1}" if i else f"{item_col} AS g1"
        for i in range(n)
    )
    gcols = ", ".join(f"g{i + 1}" for i in range(n))
    notnull = " AND ".join(f"g{i + 1} IS NOT NULL" for i in range(n))
    return f"""
    WITH seq AS (
      SELECT {key_col} AS _k, {grams}
      FROM {table}
      WINDOW w AS (PARTITION BY {key_col} ORDER BY {time_col}, {order_extra})
    )
    SELECT {gcols},
           COUNT(*) AS n_occurrences,
           COUNT(DISTINCT _k) AS n_keys
    FROM seq
    WHERE {notnull}
    GROUP BY {gcols}
    HAVING COUNT(DISTINCT _k) >= {min_keys}
    ORDER BY n_keys DESC, n_occurrences DESC, {gcols}
    """


def sequence_ngrams(
    df: DataFrame,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    n: int = 3,
    min_keys: int = 2,
) -> DataFrame:
    """DataFrame front door for :func:`sequence_ngrams_sql`."""
    for c in (key_col, item_col, time_col, order_extra):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_seqng_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        sequence_ngrams_sql(
            view, key_col, item_col, time_col, order_extra, n=n, min_keys=min_keys
        )
    )


def transition_matrix_sql(
    table: str,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    min_transitions: int = 1,
) -> str:
    """First-order Markov transition matrix over per-key event streams:
    P(dst | src) estimated from consecutive pairs (the LEAD-window
    convention — one window pass builds every (src, dst) step, never a
    self-join on adjacent rows).

    Determinism: ``transitions`` and the per-src totals are exact
    integers; ``prob`` is ONE IEEE division of two exactly-represented
    BIGINTs — bit-identical cross-engine, no quantization needed.  The
    per-src denominator is a window SUM over the already-grouped matrix
    (|src types| × |dst types| rows), not a join-back — saving an
    exchange (the window-over-frame convention).

    Scale shape: ONE shuffle on key (the LEAD window), ONE on
    (src, dst) (the count); the denominator window repartitions only the
    tiny grouped matrix.  ``min_transitions`` bounds output under item
    vocabulary explosion (URLs-as-states); at web scale the state space
    itself must be capped upstream (domain_cap / top-k states) — the
    matrix is dense in |states|².
    """
    return f"""
    WITH steps AS (
      SELECT {item_col} AS src_type,
             LEAD({item_col}) OVER (
               PARTITION BY {key_col} ORDER BY {time_col}, {order_extra}
             ) AS dst_type
      FROM {table}
    )
    SELECT src_type, dst_type,
           COUNT(*) AS transitions,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY src_type) AS DOUBLE) AS prob
    FROM steps
    WHERE dst_type IS NOT NULL
    GROUP BY src_type, dst_type
    HAVING COUNT(*) >= {min_transitions}
    ORDER BY src_type, dst_type
    """


def transition_matrix(
    df: DataFrame,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    min_transitions: int = 1,
) -> DataFrame:
    """DataFrame front door for :func:`transition_matrix_sql`."""
    for c in (key_col, item_col, time_col, order_extra):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_markov_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        transition_matrix_sql(
            view, key_col, item_col, time_col, order_extra,
            min_transitions=min_transitions,
        )
    )


def top_paths_sql(
    d,
    table: str,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    max_steps: int = 8,
    top_k: int = 20,
) -> str:
    """Top-k ENTRY PATHS: each key's first ``max_steps`` events in time
    order collapse to one '>'-joined path string, and the most common
    paths rank by user count — the whole-journey companion of the
    n-gram (sequence_ngrams) and pairwise (transition_matrix) views:
    n-grams see local motifs, the matrix sees one step, this sees the
    full head of the journey (the product-analytics "paths" report).

    Determinism: step order is (time, ``order_extra``) — a unique total
    order; Spark reassembles via the array_sort(collect_list(struct))
    idiom over the rank-prefixed struct (integer rank leads, so struct
    ordering is the integer ordering — no timestamp/struct dialect
    hazard), DuckDB via string_agg ORDER BY the same rank; counts are
    exact integers and the final top-k orders by (n_keys DESC, path) —
    a deterministic total order.

    Scale shape: ONE window exchange on the key (rank), the per-key
    reassembly reuses that partitioning, ONE exchange on the path
    string (the count), and the top-k is a TakeOrdered — no sort of the
    full path relation.  ``max_steps`` bounds the path string; the path
    vocabulary is capped by the top-k, never materialized wholesale.
    """
    if d.name == "spark":
        reasm = ("concat_ws('>', transform(array_sort(collect_list("
                 "struct(rn, it))), s -> s.it))")
    else:
        reasm = "string_agg(it, '>' ORDER BY rn)"
    return f"""
    WITH _tpa AS (
      SELECT {key_col} AS k, {item_col} AS it, {time_col} AS t,
             {order_extra} AS o
      FROM {table}
    ),
    _tp0 AS (
      SELECT k, it,
             ROW_NUMBER() OVER (PARTITION BY k ORDER BY t, o) AS rn
      FROM _tpa
    ),
    _tp1 AS (
      SELECT k, {reasm} AS path
      FROM _tp0 WHERE rn <= {int(max_steps)} GROUP BY k
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM _tp1 GROUP BY path
    ORDER BY n_keys DESC, path
    LIMIT {int(top_k)}
    """


def top_paths(
    df: DataFrame,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    max_steps: int = 8,
    top_k: int = 20,
) -> DataFrame:
    """DataFrame front door for :func:`top_paths_sql`."""
    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK as _S

    for c in (key_col, item_col, time_col, order_extra):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_tp_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        top_paths_sql(_S, view, key_col, item_col, time_col, order_extra,
                      max_steps=max_steps, top_k=top_k)
    )


def session_paths_sql(
    d,
    table: str,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    gap_minutes: int = 30,
    max_steps: int = 8,
    top_k: int = 20,
) -> str:
    """Top-k SESSION journey paths: events sessionize under an
    inactivity gap (lag + running-sum, the operators/sessionize
    formulation), each session's first ``max_steps`` events in
    (time, ``order_extra``) order collapse to one '>'-joined path, and
    the most common session journeys rank by session count.  top_paths
    sees each key's whole-history head; this sees the per-VISIT journey
    — the batch statement that doubles as the streaming twin's oracle
    (drain ≡ batch: Spark's ``session_window`` gap semantics coincide
    with the lag/running-sum sessionizer on finalized replay, the
    equivalence streaming_session_windows already pins).

    Determinism: (time, order_extra) is a unique total order within a
    key; counts are exact integers; the final top-k orders by
    (n_sessions DESC, path) — a deterministic total order.

    Scale shape: ONE window exchange on the key serves BOTH the session
    boundary lag and the running session id (same partitioning, no
    second exchange); the per-session rank and reassembly reuse it
    ((key, sess) is a refinement of the key partitioning); ONE exchange
    on the path string; the top-k is a TakeOrdered.
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    if d.name == "spark":
        reasm = ("concat_ws('>', transform(array_sort(collect_list("
                 "struct(rn, it))), s -> s.it))")
        ep = "unix_micros"
    else:
        reasm = "string_agg(it, '>' ORDER BY rn)"
        ep = "epoch_us"
    return f"""
    WITH _spa AS (
      SELECT {key_col} AS k, {item_col} AS it, {time_col} AS t,
             {order_extra} AS o
      FROM {table}
    ),
    _sp0 AS (
      SELECT k, it, t, o,
             CASE WHEN LAG(t) OVER w IS NULL
                       OR {ep}(t) - {ep}(LAG(t) OVER w) > {gap_us}
                  THEN 1 ELSE 0 END AS is_start
      FROM _spa
      WINDOW w AS (PARTITION BY k ORDER BY t, o)
    ),
    _sp1 AS (
      SELECT k, it, t, o,
             SUM(is_start) OVER (PARTITION BY k ORDER BY t, o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
      FROM _sp0
    ),
    _sp2 AS (
      SELECT k, sess, it,
             ROW_NUMBER() OVER (PARTITION BY k, sess ORDER BY t, o) AS rn
      FROM _sp1
    ),
    _sp3 AS (
      SELECT k, sess, {reasm} AS path
      FROM _sp2 WHERE rn <= {int(max_steps)} GROUP BY k, sess
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM _sp3 GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {int(top_k)}
    """


def streaming_top_paths(
    stream_df: DataFrame,
    key_col: str,
    item_col: str,
    time_col: str,
    order_extra: str,
    *,
    gap_minutes: int = 30,
    max_steps: int = 8,
    top_k: int = 20,
    query_name: str = "ts_stream_paths",
) -> DataFrame:
    """Streaming twin of :func:`session_paths_sql`: per-session journey
    strings assembled under Spark's native ``session_window`` gap state,
    ranked by a batch tail at drain.

    Stream stage: ``groupBy(session_window(gap), key)`` collects each
    session's (time, order, item) structs — the ONLY streaming state is
    the open sessions themselves (closed sessions finalize and leave the
    store once the watermark passes; state per session is bounded by
    session length, and a production deploy would additionally cap
    collected steps — the journey only needs ``max_steps``).  Batch
    tail: array_sort → slice(max_steps) → '>'-join → path count → top-k,
    exactly :func:`session_paths_sql`'s reassembly tail, so drain ≡
    batch is structural and the registered oracle IS the batch
    statement.

    Struct sort note: structs sort field-major, so (t, o, it) orders by
    the unique (time, order_extra) key — ``it`` never participates.
    """
    from ..errors import ColumnNotFoundError
    from ..streaming.lag_stream import run_stream_to_df

    for c in (key_col, item_col, time_col, order_extra):
        if c not in stream_df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {stream_df.columns}")
    sess = (
        stream_df.withWatermark(time_col, "1 hour")
        .groupBy(
            F.session_window(time_col, f"{int(gap_minutes)} minutes"),
            key_col,
        )
        .agg(
            F.collect_list(
                F.struct(
                    F.col(time_col).alias("t"),
                    F.col(order_extra).alias("o"),
                    F.col(item_col).alias("it"),
                )
            ).alias("evs")
        )
    )
    drained = run_stream_to_df(sess, query_name, output_mode="complete")
    paths = drained.select(
        F.concat_ws(
            ">",
            F.expr(f"transform(slice(array_sort(evs), 1, {int(max_steps)}), s -> s.it)"),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(int(top_k))
    )
