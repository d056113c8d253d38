"""Snapshot reconciliation: row-level diff between two versions of a
keyed table.

The ETL acceptance gate nothing else in the contract family covers:
after a backfill / migration / CDC replay, WHICH rows appeared,
vanished, or changed — and in which columns?  (The expectation
contracts say whether each snapshot is internally valid; SCD2 tracks
history of a stream; this compares two materialized states directly.)

Shape: ONE full outer equi-join on the key — both sides shuffle once
on the key and the verdict is a projection; per-column comparison uses
``IS DISTINCT FROM`` (NULL-safe, identical semantics on both engines),
and unchanged rows are dropped before the result leaves the join
stage, so the output is bounded by the CHANGE volume, not the table.
Keys are assumed unique per snapshot (the snapshot-table contract);
duplicate keys would fan out the join — run the `unique` expectation
contract first, which is exactly its job.

At 100 TB: the two scans prune to key + compared columns; the join is
the one shuffle (bucketed snapshot tables co-locate it to zero
Exchange — the sources/catalog bucketing pattern); verdict counts are
a partial-aggregated afterthought.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError

__all__ = ["snapshot_diff", "snapshot_diff_sql", "merge_upsert", "merge_upsert_sql"]


def snapshot_diff_sql(
    d,
    old_table: str,
    new_table: str,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """Row-level diff: one row per key present in either snapshot whose
    state differs — verdict ``added`` / ``removed`` / ``changed`` plus
    ``changed_cols`` (comma-joined, declaration order) and the change
    count.  Unchanged rows never leave the join."""
    keys = list(key_cols)
    cols = list(compare_cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    key_out = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    o_present = f"o.{keys[0]} IS NOT NULL"
    n_present = f"n.{keys[0]} IS NOT NULL"
    diffs = [f"(o.{c} IS DISTINCT FROM n.{c})" for c in cols]
    n_changed = " + ".join(f"CASE WHEN {x} THEN 1 ELSE 0 END" for x in diffs)
    changed_cols = (
        "CONCAT_WS(',', "
        + ", ".join(f"CASE WHEN {x} THEN '{c}' END" for x, c in zip(diffs, cols))
        + ")"
    )
    any_diff = " OR ".join(diffs)
    return f"""
    WITH _sd AS (
      SELECT {key_out},
             CASE WHEN NOT {o_present} THEN 'added'
                  WHEN NOT {n_present} THEN 'removed'
                  WHEN {any_diff} THEN 'changed'
                  ELSE 'unchanged' END AS verdict,
             CASE WHEN {o_present} AND {n_present}
                  THEN CAST({n_changed} AS INT) ELSE CAST(0 AS INT)
             END AS n_cols_changed,
             CASE WHEN {o_present} AND {n_present}
                  THEN {changed_cols} ELSE '' END AS changed_cols
      FROM {old_table} o
      FULL OUTER JOIN {new_table} n ON {on}
    )
    SELECT * FROM _sd WHERE verdict <> 'unchanged'
    """


def snapshot_diff(
    df_old: DataFrame,
    df_new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """DataFrame front door for :func:`snapshot_diff_sql`."""
    from ..functions.text_fns import SPARK as _S

    for frame, tag in ((df_old, "old"), (df_new, "new")):
        missing = [c for c in (*key_cols, *compare_cols)
                   if c not in frame.columns]
        if missing:
            raise ColumnNotFoundError(
                f"columns not in {tag} frame: {missing}"
            )
    if not key_cols or not compare_cols:
        raise ValueError("key_cols and compare_cols must be non-empty")
    df_old.createOrReplaceTempView("_ts_sd_old")
    df_new.createOrReplaceTempView("_ts_sd_new")
    return df_old.sparkSession.sql(
        snapshot_diff_sql(_S, "_ts_sd_old", "_ts_sd_new",
                          key_cols, compare_cols)
    )


def merge_upsert_sql(
    d,
    snapshot_table: str,
    changes_table: str,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> str:
    """CDC MERGE apply — the missing third leg of the CDC family
    (scd2 builds history, snapshot_diff compares states, this PRODUCES
    the next state): fold a change batch of I/U/D operations into a
    keyed snapshot, exactly the semantics of ``MERGE INTO`` with
    last-writer-wins per key (Delta/Iceberg upsert, Kafka compacted-
    topic materialization).

    Rules, all deterministic:

    * per key, only the HIGHEST-``seq_col`` change applies (ROW_NUMBER
      over (key ORDER BY seq DESC) — ties forbidden by the CDC
      contract: seq is a log offset, unique per key);
    * ``op`` ∈ ('I', 'U', 'D'): D deletes the key, I/U upsert the
      change row's values (I on an existing key and U on an absent key
      both resolve to the upsert — the tolerant MERGE convention, since
      a replayed log cannot distinguish them);
    * snapshot keys untouched by the batch pass through unchanged;
    * NON-NULL-KEY CDC CONTRACT: change rows must carry non-NULL keys.
      A NULL key can never address a snapshot row (the equi-join never
      matches NULL), so such a row would otherwise emit an output row
      whose key AND value columns are all NULL — silent garbage.  The
      ``_mrg_last`` CTE filters NULL-keyed change rows out explicitly
      (they are contract violations, not data), and the behavior is
      part of the documented contract alongside unique-seq.

    Shape: the change batch collapses to ≤ |batch keys| rows BEFORE the
    join (one batch-key exchange); the apply is ONE full outer equi-join
    on the key — the snapshot_diff plan; output is the new snapshot.
    At 100 TB: changes ≪ snapshot, so the collapsed batch broadcasts
    and the snapshot never shuffles (AQE decides, the soft_dedup rule).
    """
    keys = list(key_cols)
    cols = list(value_cols)
    keys_not_null = " AND ".join(f"{k} IS NOT NULL" for k in keys)
    on = " AND ".join(f"s.{k} = c.{k}" for k in keys)
    key_out = ", ".join(f"COALESCE(c.{k}, s.{k}) AS {k}" for k in keys)
    val_out = ", ".join(
        f"CASE WHEN c.{keys[0]} IS NOT NULL THEN c.{v} ELSE s.{v} END AS {v}"
        for v in cols
    )
    return f"""
    WITH _mrg_last AS (
      SELECT * FROM (
        SELECT {", ".join(keys)}, {", ".join(cols)}, {op_col},
               ROW_NUMBER() OVER (PARTITION BY {", ".join(keys)}
                                  ORDER BY {seq_col} DESC) AS _rn
        FROM {changes_table}
        WHERE {keys_not_null}
      ) _mc WHERE _rn = 1
    )
    SELECT {key_out}, {val_out}
    FROM {snapshot_table} s
    FULL OUTER JOIN _mrg_last c ON {on}
    WHERE COALESCE(c.{op_col}, '') <> 'D'
    """


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """DataFrame front door for :func:`merge_upsert_sql`."""
    from ..functions.text_fns import SPARK as _S

    for c in [*key_cols, *value_cols]:
        if c not in snapshot.columns:
            raise ColumnNotFoundError(f"snapshot column {c!r} not in {snapshot.columns}")
    for c in [*key_cols, *value_cols, op_col, seq_col]:
        if c not in changes.columns:
            raise ColumnNotFoundError(f"changes column {c!r} not in {changes.columns}")
    sview, cview = "_ts_mrg_snap", "_ts_mrg_chg"
    snapshot.createOrReplaceTempView(sview)
    changes.createOrReplaceTempView(cview)
    return snapshot.sparkSession.sql(
        merge_upsert_sql(_S, sview, cview, key_cols, value_cols,
                         op_col=op_col, seq_col=seq_col)
    )
