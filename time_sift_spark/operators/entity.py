"""Entity resolution: blocked edit-distance record matching.

The classic data-integration workload (Fellegi–Sunter 1969; surveyed in
Christen 2012): find records that denote the same real-world entity
despite dirty values.  Exact-duplicate and shingle-Jaccard machinery
(operators/dedup.py) misses single-character typos in SHORT strings — a
name with one dropped character shares almost no 3-shingles with its
original, but has Levenshtein distance 1.  Both engines ship the same
classic DP ``levenshtein``, making the verify step engine-native and
cross-engine deterministic.

Never all-pairs: candidates come from an equi-join on a BLOCKING key
(the MinHash-LSH discipline applied to record linkage), or from a
sorted neighborhood WITHIN a block (Hernández & Stolfo 1995 — adjacency
in sort order finds pairs whose blocking key a typo broke, without the
un-partitioned global sort window the naive SNM formulation implies).
The two strategies are complementary and both are O(candidates), with
the block structure bounding the quadratic term.

Scale shape: blocking is one shuffle on the block key; the sorted
neighborhood is one window over (block, sortkey) — LEAD expressions,
never a self-join; verification is a per-candidate scalar expression.
A hot block (skewed key) is the documented hazard: cap or salt the
block key exactly as lsh_neardup_capped_docs does for band buckets.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect

__all__ = [
    "entity_match_sql",
    "entity_match",
    "sorted_neighborhood_sql",
    "sorted_neighborhood",
]


def _lev_verify(d: Dialect, a: str, b: str, max_distance: int) -> tuple[str, str]:
    """(distance_expr, keep_pred) for the levenshtein verify step.

    Spark (3.5+) exposes the BANDED form ``levenshtein(a, b, t)`` — the
    DP early-exits outside the ±t diagonal band (O(len·t) per pair, not
    O(len²)) and returns −1 when the distance exceeds t. For kept rows
    (distance ≤ t) it returns the true distance, so the output values
    are identical to the classic form; rows beyond t are filtered either
    way. DuckDB has no threshold arg — the oracle keeps the classic DP
    text, so engine ≡ oracle stays value-identical (guide §1: same
    result, cheaper per-task work on the engine side only).
    """
    t = int(max_distance)
    if d.name == "spark":
        e = f"levenshtein({a}, {b}, {t})"
        return e, f"{e} BETWEEN 0 AND {t}"
    e = f"levenshtein({a}, {b})"
    return e, f"{e} <= {t}"


def entity_match_sql(
    d: Dialect,
    table: str,
    id_col: str,
    name_col: str,
    *,
    block_exprs: Sequence[str],
    max_distance: int = 2,
) -> str:
    """Blocked pairwise match: records sharing every blocking expression
    pair up, the pair survives iff ``levenshtein(name_a, name_b) <=
    max_distance``.  Output: (id_a, id_b, name_a, name_b, distance)
    with id_a < id_b, ordered.  The block equi-join is the whole scale
    story — identical names in different blocks are NOT compared (the
    recall/cost dial every production linkage pipeline exposes)."""
    bk = list(block_exprs)
    on = " AND ".join(f"a._b{i} = b._b{i}" for i in range(len(bk)))
    bsel = ", ".join(f"{e} AS _b{i}" for i, e in enumerate(bk))
    dist, keep = _lev_verify(d, "a.rname", "b.rname", max_distance)
    return f"""
    WITH _er AS (
      SELECT {id_col} AS rid, {name_col} AS rname, {bsel} FROM {table}
    )
    SELECT a.rid AS id_a, b.rid AS id_b,
           a.rname AS name_a, b.rname AS name_b,
           {dist} AS distance
    FROM _er a JOIN _er b ON {on} AND a.rid < b.rid
    WHERE {keep}
    ORDER BY id_a, id_b
    """


def _snm_stage_sql(
    d: Dialect,
    table: str,
    id_col: str,
    name_col: str,
    *,
    block_expr: str,
    window: int,
) -> str:
    """The sort-and-LEAD stage: one window over (block, name) producing
    each record plus its next ``window`` neighbors as columns."""
    leads = ", ".join(
        f"LEAD(rid, {i}) OVER w AS _nid{i}, LEAD(rname, {i}) OVER w AS _nn{i}"
        for i in range(1, window + 1)
    )
    return f"""
    SELECT rid, rname, {leads}
    FROM (
      SELECT {id_col} AS rid, {name_col} AS rname, {block_expr} AS _blk
      FROM {table}
    ) _snb
    WINDOW w AS (PARTITION BY _blk ORDER BY rname, rid)
    """


def _snm_tail_sql(d: Dialect, sn_table: str, *, window: int, max_distance: int) -> str:
    """Neighbor-arm unfold + levenshtein verify over a staged LEAD
    relation — shared by the one-statement oracle and the staged Spark
    path (value-identical; the Spark text uses the banded levenshtein,
    see :func:`_lev_verify`)."""
    arms = " UNION ALL ".join(
        f"SELECT rid, rname, _nid{i} AS nid, _nn{i} AS nn FROM {sn_table}"
        for i in range(1, window + 1)
    )
    dist, keep = _lev_verify(d, "rname", "nn", max_distance)
    return f"""
    WITH _cand AS ({arms})
    SELECT LEAST(rid, nid) AS id_a, GREATEST(rid, nid) AS id_b,
           CASE WHEN rid < nid THEN rname ELSE nn END AS name_a,
           CASE WHEN rid < nid THEN nn ELSE rname END AS name_b,
           {dist} AS distance
    FROM _cand
    WHERE nid IS NOT NULL AND {keep}
    ORDER BY id_a, id_b
    """


def sorted_neighborhood_sql(
    d: Dialect,
    table: str,
    id_col: str,
    name_col: str,
    *,
    block_expr: str,
    window: int = 3,
    max_distance: int = 2,
) -> str:
    """Sorted-neighborhood match WITHIN blocks: records sorted by name
    inside each ``block_expr`` partition; each record is compared to its
    next ``window`` neighbors via LEAD — no self-join, no global
    un-partitioned sort (the block partition keeps the window
    distributed).  Catches pairs whose fine blocking key a trailing-edit
    typo broke, because lexicographically-adjacent names stay adjacent.
    Output: (id_a, id_b, name_a, name_b, distance), id-ordered pairs.

    NOTE: this one-statement form is the ORACLE text; the DataFrame
    front door stages the window once (Spark inlines each union arm's
    CTE reference, which would recompute the sort ``window``× — the
    pagerank unrolled-plan lesson).
    """
    stage = _snm_stage_sql(
        d, table, id_col, name_col, block_expr=block_expr, window=window
    )
    tail = _snm_tail_sql(d, "_sn", window=window, max_distance=max_distance)
    # splice the staged relation in as the tail's leading CTE
    return tail.replace(
        "WITH _cand AS (", f"WITH _sn AS ({stage}),\n    _cand AS (", 1
    )


_VIEW_SEQ = [0]


def _run(df: DataFrame, sql_fn, *args, **kwargs) -> DataFrame:
    _VIEW_SEQ[0] += 1
    view = f"_ts_er_in_{_VIEW_SEQ[0]}"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(sql_fn(SPARK, view, *args, **kwargs))


def entity_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_exprs: Sequence[str],
    max_distance: int = 2,
) -> DataFrame:
    for c in (id_col, name_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    return _run(
        df, entity_match_sql, id_col, name_col,
        block_exprs=block_exprs, max_distance=max_distance,
    )


def sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    block_expr: str,
    window: int = 3,
    max_distance: int = 2,
) -> DataFrame:
    """Staged execution: the sort-and-LEAD window materializes ONCE
    (localCheckpoint, lazy) and the union arms read the staged frame —
    Spark would otherwise inline the window CTE into every arm and
    recompute the sort ``window`` times.  The tail text is shared
    verbatim with the one-statement oracle form."""
    for c in (id_col, name_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    _VIEW_SEQ[0] += 1
    view = f"_ts_er_in_{_VIEW_SEQ[0]}"
    df.createOrReplaceTempView(view)
    spark = df.sparkSession
    sn = spark.sql(
        _snm_stage_sql(
            SPARK, view, id_col, name_col, block_expr=block_expr, window=window
        )
    ).localCheckpoint(eager=False)
    _VIEW_SEQ[0] += 1
    sn_view = f"_ts_er_sn_{_VIEW_SEQ[0]}"
    sn.createOrReplaceTempView(sn_view)
    return spark.sql(
        _snm_tail_sql(SPARK, sn_view, window=window, max_distance=max_distance)
    )


def _symspell_variants_select(
    d: Dialect, table: str, id_col: str, name_col: str, *, max_deletions: int
) -> str:
    """(rid, rname, v) — each record exploded over its deduplicated
    deletion-neighborhood blocking keys (the record's name plus every
    ≤``max_deletions``-character-deletion variant).  ONE rendering
    shared by the inline statement (both dialects — the oracle text)
    and the Spark front door's staging statement, so staged ≡ inline is
    structural (the containment_join `_cjs_hdist_select` discipline).

    The Spark branch explodes via LATERAL VIEW OUTER + a null-filter on
    the generate OUTPUT: a select-clause ``explode(_vars)`` makes
    Catalyst infer a ``size(_vars) > 0`` constraint and push it into the
    scan Filter, where the whole neighborhood array (O(|name|²/2)
    substr/concat lambdas at d2) is built a second time per row at scan
    parallelism.  Row-identical: ``_vars`` is NULL only for a NULL name
    (OUTER emits one NULL element, the filter drops it — plain explode
    dropped the row) and otherwise holds ≥ 1 non-NULL string (the name
    itself; substr/concat of a non-NULL string are non-NULL)."""
    if max_deletions not in (1, 2):
        raise ValueError(f"max_deletions must be 1 or 2, got {max_deletions}")
    n = f"length({name_col})"
    if d.name == "spark":
        seq = f"sequence(1, {n})"
        dels = (
            f"transform({seq}, i -> concat(substr({name_col}, 1, i - 1),"
            f" substr({name_col}, i + 1)))"
        )
        dels2 = (
            f"CASE WHEN {n} >= 2 THEN "
            f"flatten(transform(sequence(1, {n} - 1), i -> "
            f"transform(sequence(i + 1, {n}), j -> "
            f"concat(substr({name_col}, 1, i - 1),"
            f" substr({name_col}, i + 1, j - i - 1),"
            f" substr({name_col}, j + 1))))) "
            f"ELSE CAST(array() AS ARRAY<STRING>) END"
        )
        arr = f"concat(array({name_col}), {dels})"
        if max_deletions == 2:
            arr = f"concat({arr}, {dels2})"
        arr = f"array_distinct({arr})"
        return f"""SELECT rid, rname, v FROM (
        SELECT {id_col} AS rid, {name_col} AS rname, {arr} AS _vars
        FROM {table}
      ) _sy0 LATERAL VIEW OUTER explode(_vars) _syt AS v
      WHERE v IS NOT NULL"""
    seq = f"generate_series(1, {n})"
    dels = (
        f"list_transform({seq}, i -> substr({name_col}, 1, i - 1)"
        f" || substr({name_col}, i + 1))"
    )
    dels2 = (
        f"CASE WHEN {n} >= 2 THEN "
        f"flatten(list_transform(generate_series(1, {n} - 1), i -> "
        f"list_transform(generate_series(i + 1, {n}), j -> "
        f"substr({name_col}, 1, i - 1)"
        f" || substr({name_col}, i + 1, j - i - 1)"
        f" || substr({name_col}, j + 1)))) "
        f"ELSE [] END"
    )
    arr = f"list_prepend({name_col}, {dels})"
    if max_deletions == 2:
        arr = f"list_concat({arr}, {dels2})"
    arr = f"list_distinct({arr})"
    return f"""SELECT rid, rname, unnest(_vars) AS v FROM (
        SELECT {id_col} AS rid, {name_col} AS rname, {arr} AS _vars
        FROM {table}
      ) _sy0"""


def symspell_match_sql(
    d: Dialect,
    table: str,
    id_col: str,
    name_col: str,
    *,
    max_distance: int = 1,
    max_deletions: int = 1,
    variant_df_cap: int | None = None,
    staged_variants: str | None = None,
) -> str:
    """Typo-tolerant record linkage by DELETION-NEIGHBORHOOD blocking —
    the SymSpell discipline (Garbe 2012; the spell-checker industry's
    answer to edit-distance search): each name emits itself plus its
    |name| one-character-deletion variants as BLOCKING KEYS, candidates
    equi-join on a shared variant, and levenshtein verifies.

    The guarantee the suffix-block and sorted-neighborhood tiers lack:
    ANY pair within edit distance 1 (one insert, delete, or substitute,
    anywhere in the string) shares a deletion variant — a deletion pair
    shares the short form, an insertion pair is its mirror, and a
    substitution pair shares the variant that deletes the differing
    position.  ``max_deletions=2`` extends the neighborhood to all
    two-position deletions (C(|name|,2) extra keys — the documented
    |name|²-key dial): any pair within edit distance 2 shares a
    depth-≤2 deletion variant (each side deletes its ≤2 edited
    positions; a transposition is 2 substitutions under classic
    levenshtein and shares the variant deleting both swapped slots), so
    the d2 form catches every DOUBLE-typo twin the d1 key provably
    cannot block on.

    ``variant_df_cap`` drops variants shared by more than that many
    records before pairing — the hot-key mitigation for short or
    formulaic names (the LSH band-cap discipline); long structured
    names (the registered query's customer keys) need none at d1, but
    the d2 neighborhood of FORMULAIC names (shared templates, digit
    runs) makes the cap mandatory: it bounds every candidate bucket at
    cap rows BEFORE the self-join, the same recall-for-cost contract as
    lsh_neardup_capped.

    Variants are DEDUPLICATED per record before exploding (deleting any
    character of an equal-character run yields the same string — a
    zero-padded id's run of 8 zeros emits 1 variant, not 8), which
    shrinks both the explode and every downstream bucket at zero recall
    cost (the pair set is DISTINCT anyway).

    Plan: one explode (≤ |name|+1 variants per record at d1,
    O(|name|²/2) at d2), one variant-key equi-join, levenshtein only on
    candidates.  The variant relation is referenced by BOTH self-join
    sides — the engine staging rule; the Spark front door stages it
    (``staged_variants``), the oracle keeps the inline text.
    """
    variants = (
        f"SELECT rid, rname, v FROM {staged_variants}" if staged_variants
        else _symspell_variants_select(d, table, id_col, name_col,
                                       max_deletions=max_deletions)
    )
    src = "_syv"
    if variant_df_cap is not None:
        src = "_syc"
    capped = (
        f""",
    _syc AS (
      SELECT rid, rname, v FROM (
        SELECT rid, rname, v, COUNT(*) OVER (PARTITION BY v) AS dfc
        FROM _syv
      ) _sy1 WHERE dfc <= {int(variant_df_cap)}
    )""" if variant_df_cap is not None else ""
    )
    dist, keep = _lev_verify(d, "a.rname", "b.rname", max_distance)
    # Verify BEFORE the pair DISTINCT (r14): hot variant buckets from
    # formulaic names (digit runs) make ~1M raw candidates at sf0.1 but
    # only a handful survive the distance filter — filtering first means
    # the dedup exchange carries survivors (dozens of rows), not a
    # million (id, id, name, name) tuples. distance is a pure function
    # of the pair, so DISTINCT-then-filter ≡ filter-then-DISTINCT row
    # for row (both dialects restructured identically; guide §2.3:
    # shuffle fewer bytes).
    #
    # REPARTITION(v) on the probe side (Spark only): AQE coalesces the
    # variant join's post-shuffle partitions by INPUT BYTES (~15 MB →
    # 1-2 partitions) but the stage fans out to ~1M candidate pairs ×
    # one levenshtein each — measured 7.1 s single-threaded vs 2.4 s
    # with the user-pinned hash partitioning (count follows
    # spark.sql.shuffle.partitions, the cluster-sized conf; AQE keeps
    # user-specified partitioning and co-partitions the build side).
    # (capped path excluded: its df-window already paid a full hash(v)
    # exchange over the variant stream and the cap bounds the verify
    # volume — measured 5.7 s without vs 7.4 s with the extra exchange)
    src_a = (
        f"(SELECT /*+ REPARTITION(v) */ rid, rname, v FROM {src})"
        if d.name == "spark" and variant_df_cap is None else src
    )
    return f"""
    WITH _syv AS (
      {variants}
    ){capped}
    SELECT DISTINCT a.rid AS id_a, b.rid AS id_b,
           a.rname AS name_a, b.rname AS name_b,
           {dist} AS distance
    FROM {src_a} a JOIN {src} b ON a.v = b.v AND a.rid < b.rid
    WHERE {keep}
    ORDER BY id_a, id_b
    """


def symspell_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    *,
    max_distance: int = 1,
    max_deletions: int = 1,
    variant_df_cap: int | None = None,
) -> DataFrame:
    """DataFrame front door for :func:`symspell_match_sql` — stages the
    variant relation once (lazy localCheckpoint; the pair self-join
    reads it twice and Catalyst replans the explode per side)."""
    from ..functions.text_fns import SPARK as _S

    for c in (id_col, name_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_sym_in"
    df.createOrReplaceTempView(view)
    # The staged text is rendered by the SAME helper the inline
    # statement uses (never split out of the rendered SQL — the
    # containment_join _cjs_hdist_select discipline), so staged ≡
    # inline cannot drift on a formatting edit.
    var_sel = _symspell_variants_select(_S, view, id_col, name_col,
                                        max_deletions=max_deletions)
    staged = spark.sql(var_sel).localCheckpoint(eager=False)
    _VIEW_SEQ[0] += 1
    sview = f"_ts_sym_vars_{_VIEW_SEQ[0]}"
    staged.createOrReplaceTempView(sview)
    return spark.sql(
        symspell_match_sql(_S, view, id_col, name_col,
                           max_distance=max_distance,
                           max_deletions=max_deletions,
                           variant_df_cap=variant_df_cap,
                           staged_variants=sview)
    )
