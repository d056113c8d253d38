"""Leakage-safe categorical target encoding (LOO + K-fold).

Target encoding replaces a high-cardinality categorical feature with
the mean of the label over that category — the classic trick for
tree/linear models over web-scale categoricals (Micci-Barreca, 2001,
"A preprocessing scheme for high-cardinality categorical attributes").
Done naively it LEAKS: row i's own label contributes to its feature.
Two standard leakage-safe forms, both here:

* leave-one-out: enc_i = (S_c − y_i + m·prior) / (n_c − 1 + m)
* K-fold:        enc_i = (S_c − S_cf + m·prior) / (n_c − n_cf + m)
  (row i in fold f gets statistics from the OTHER folds only)

with additive smoothing toward the global prior (m pseudo-counts) so
rare categories shrink to the prior instead of memorizing noise.

Determinism (the driver's value-hash gate): labels quantize to
DECIMAL(18,6) at the scan (the dsum discipline), category / fold sums
stay exact decimal, subtractions are exact decimal ops, and each
output value is ONE dec→double cast + one multiply-add + one IEEE
division with the op order spelled identically in both dialects.
Folds come from the engine's md5 hash-range discipline — never an
RNG — so the assignment is reproducible cross-engine and stable under
corpus growth.

Scale posture (SCALE.md: target encoding): the per-category and
per-(category, fold) statistics are window aggregates over ONE hash
exchange on the category key (hash partitioning on ``cat`` co-locates
every (cat, fold) group, so the finer window rides the same exchange);
the global prior is a one-row aggregate STATE cross join.  No joins,
no second shuffle, output is per-row.  A mega-category is one
partition's window state — bounded: the window computes two decimal
sums + counts, not an array.

Reference parity note: the reference (Rust lag-matrix crate,
src/lib.rs) has no feature-encoding surface; charter extension
(SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect
from . import _num

__all__ = [
    "target_encode_loo_sql",
    "target_encode_loo",
    "target_encode_kfold_sql",
    "robust_scale",
    "robust_scale_sql",
    "robust_scale_sketch",
    "robust_scale_sketch_sql",
    "robust_scale_auto",
    "frequency_encode",
    "frequency_encode_sql",
]


def _prior_cte(table: str, ydec: str) -> str:
    return f"""
    _tprior AS (
      SELECT CAST(SUM({ydec}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS prior
      FROM {table}
    )"""


def target_encode_loo_sql(
    d: Dialect,
    table: str,
    id_col: str,
    cat_col: str,
    label_col: str,
    *,
    smoothing: float = 10.0,
) -> str:
    """Per-row leave-one-out encoding: (id, cat, te_loo)."""
    ydec = f"CAST({label_col} AS DECIMAL(18,6))"
    m = repr(float(smoothing))
    num = (
        f"({_num.dec_to_double(f'(sc - y)')} + {m} * prior)"
    )
    den = f"(CAST(nc - 1 AS DOUBLE) + {m})"
    enc = (
        f"CASE WHEN (nc - 1) = 0 AND {m} = 0.0 THEN prior "
        f"ELSE {num} / {den} END"
    )
    return f"""
    WITH _trows AS (
      SELECT {id_col} AS id, {cat_col} AS cat, {ydec} AS y,
             SUM({ydec}) OVER (PARTITION BY {cat_col}) AS sc,
             COUNT(*) OVER (PARTITION BY {cat_col}) AS nc
      FROM {table}
    ),{_prior_cte(table, ydec).lstrip().lstrip(',')}
    SELECT id AS {id_col}, cat AS {cat_col}, {enc} AS te_loo
    FROM _trows CROSS JOIN _tprior
    """


def target_encode_kfold_sql(
    d: Dialect,
    table: str,
    id_col: str,
    cat_col: str,
    label_col: str,
    *,
    folds: int = 5,
    smoothing: float = 10.0,
) -> str:
    """Per-row K-fold out-of-fold encoding: (id, cat, fold, te_oof).

    The fold is the md5 hash range of the id — deterministic,
    cross-engine, stable under appends (a new row never reshuffles
    existing folds).
    """
    cast = "STRING" if d.name == "spark" else "VARCHAR"
    fold = (
        f"((({d.md5_long(f'CAST({id_col} AS {cast})')}) % {folds})"
        f" + {folds}) % {folds}"
    )
    ydec = f"CAST({label_col} AS DECIMAL(18,6))"
    m = repr(float(smoothing))
    num = f"({_num.dec_to_double('(sc - scf)')} + {m} * prior)"
    den = f"(CAST(nc - ncf AS DOUBLE) + {m})"
    enc = (
        f"CASE WHEN (nc - ncf) = 0 AND {m} = 0.0 THEN prior "
        f"ELSE {num} / {den} END"
    )
    return f"""
    WITH _tf AS (
      SELECT {id_col} AS id, {cat_col} AS cat, {ydec} AS y,
             {fold} AS fold
      FROM {table}
    ),
    _trows AS (
      SELECT id, cat, fold,
             SUM(y) OVER (PARTITION BY cat) AS sc,
             COUNT(*) OVER (PARTITION BY cat) AS nc,
             SUM(y) OVER (PARTITION BY cat, fold) AS scf,
             COUNT(*) OVER (PARTITION BY cat, fold) AS ncf
      FROM _tf
    ),{_prior_cte(table, ydec).lstrip().lstrip(',')}
    SELECT id AS {id_col}, cat AS {cat_col}, fold, {enc} AS te_oof
    FROM _trows CROSS JOIN _tprior
    """


def target_encode_loo(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    label_col: str,
    *,
    smoothing: float = 10.0,
) -> DataFrame:
    """DataFrame front door for :func:`target_encode_loo_sql`."""
    for c in (id_col, cat_col, label_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    view = "_ts_te_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        target_encode_loo_sql(
            SPARK, view, id_col, cat_col, label_col, smoothing=smoothing
        )
    )


def _rs_sorted_arr(d: Dialect, col: str) -> str:
    if d.name == "spark":
        return f"sort_array(collect_list({col}))"
    return f"list_sort(list({col}))"


def _rs_q_exprs(d: Dialect, arr: str, q: float) -> str:
    """Type-7 (R default) linear-interpolated quantile over a sorted
    decimal array: position (n−1)·q, lo/hi element accesses through
    dec_to_double, one multiply-add — identical scalar text on both
    engines."""
    from . import _num

    n = f"CAST({'size' if d.name == 'spark' else 'len'}({arr}) AS DOUBLE)"
    pos = f"(({n} - 1.0) * {q!r})"
    lo_i = f"(CAST(FLOOR({pos}) AS INT) + 1)"
    hi_i = f"(CAST(CEIL({pos}) AS INT) + 1)"
    if d.name == "spark":
        lo = _num.dec_to_double(f"element_at({arr}, {lo_i})")
        hi = _num.dec_to_double(f"element_at({arr}, {hi_i})")
    else:
        lo = _num.dec_to_double(f"({arr})[{lo_i}]")
        hi = _num.dec_to_double(f"({arr})[{hi_i}]")
    frac = f"({pos} - FLOOR({pos}))"
    return f"({lo} + ({hi} - {lo}) * {frac})"


def robust_scale_sql(
    d: Dialect,
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    round_to: int = 6,
) -> str:
    """Per-group robust scaling: (x − median) / IQR — the feature
    transform that survives the outliers z-score normalization is
    destroyed by (one corrupted reading moves a mean/std arbitrarily;
    it moves the median/IQR not at all — the winsorize/MAD rationale
    applied to SCALING rather than flagging).

    Output: one row per input row with the group's median, IQR, and
    the scaled value; a zero-IQR group (constant values) yields NULL
    robust_z — undefined, not a division blow-up.

    Determinism: values quantize to DECIMAL(18,6) at the scan, the
    per-group sorted array is exact, quantiles are type-7 interpolated
    through dec_to_double element reads (one multiply-add), and the
    final ratio round_double's.  Shape: ONE group exchange builds the
    |groups|-row stats relation; it joins back broadcast-sized.  The
    per-group sorted array is the mad_outliers bound — use
    :func:`robust_scale_auto` when group sizes are unknown: it probes
    and routes groups past ``exact_max_group_rows`` (default 1e6) to
    the bounded histogram-sketch form (:func:`robust_scale_sketch`).
    """
    from . import _num

    vdec = f"CAST({value_col} AS DECIMAL(18,6))"
    med = _rs_q_exprs(d, "arr", 0.5)
    q1 = _rs_q_exprs(d, "arr", 0.25)
    q3 = _rs_q_exprs(d, "arr", 0.75)
    z = f"(({_num.dec_to_double('b.v')} - s.med) / s.iqr)"
    return f"""
    WITH _rsb AS (
      SELECT {id_col} AS i, {group_col} AS k, {vdec} AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    _rsa AS (
      SELECT k, {_rs_sorted_arr(d, 'v')} AS arr,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM _rsb GROUP BY k
    ),
    _rsq AS (
      SELECT k, n, {med} AS med,
             ({q3} - {q1}) AS iqr
      FROM _rsa
    )
    SELECT b.i AS {id_col}, b.k AS {group_col},
           CAST(b.v AS DOUBLE) AS value_q,
           {_num.round_double('s.med', round_to)} AS group_median,
           {_num.round_double('s.iqr', round_to)} AS group_iqr,
           CASE WHEN s.iqr = 0.0 THEN CAST(NULL AS DOUBLE)
                ELSE {_num.round_double(z, round_to)} END AS robust_z
    FROM _rsb b JOIN _rsq s ON b.k = s.k
    """


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`robust_scale_sql`."""
    for c in (value_col, group_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_rscale_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        robust_scale_sql(SPARK, view, value_col, group_col, id_col,
                         round_to=round_to)
    )


def robust_scale_sketch_sql(
    d: Dialect,
    table: str,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    bins: int = 4096,
    round_to: int = 6,
) -> str:
    """The SKETCH form of :func:`robust_scale_sql` — per-group
    median/IQR from the mergeable fixed-bin histogram
    (``sketch.histogram_quantiles`` machinery: one global (min, max)
    bounds pass, then per-(group, bin) counts with exact decimal
    crossing thresholds and double interpolation), joined back per-row.

    This is the 100 TB path: per-group state is ≤ ``bins`` counter rows
    — BOUNDED, unlike the exact form's ``sort_array(collect_list(...))``
    whose single-task array grows with the group.  Error ≤ one bin
    width of the GLOBAL value range (global bounds keep the sketch
    merge-compatible across groups/partitions/days).  Contract matches
    the exact form: one output row per non-NULL input row, NULL
    robust_z for a zero-IQR (or width-degenerate) group.

    Cross-engine determinism: MIN/MAX move values unchanged, the bin
    width is one IEEE division, crossing decisions are exact decimal,
    and the interpolation + final ratio are shared expression text.
    """
    from ._num import round_double
    from .sketch import _hq_estimate

    if bins < 2:
        raise ValueError(f"need >= 2 bins, got {bins}")
    vdec = f"CAST({value_col} AS DECIMAL(18,6))"
    bin_expr = (
        f"LEAST(GREATEST(CAST(FLOOR(CASE WHEN _w > 0 THEN "
        f"(CAST(v AS DOUBLE) - _lo) / _w ELSE 0.0 END) AS INT), 0), {bins - 1})"
    )
    picks = []
    for p in (0.25, 0.5, 0.75):
        pred, est = _hq_estimate(p, "_lo", "_w", round_to)
        picks.append(
            f"MAX(CASE WHEN {pred} THEN {est} END) AS est_p{str(p).replace('0.', '')}"
        )
    z = "((CAST(b.v AS DOUBLE) - s.med) / s.iqr)"
    return f"""
    WITH _rkb AS (
      SELECT {id_col} AS i, {group_col} AS k, {vdec} AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    _rkw AS (
      SELECT _lo, _hi, ((_hi - _lo) / CAST({bins} AS DOUBLE)) AS _w
      FROM (SELECT CAST(MIN(v) AS DOUBLE) AS _lo,
                   CAST(MAX(v) AS DOUBLE) AS _hi FROM _rkb) _rkbnds
    ),
    _rkh AS (
      SELECT k, _bin, _lo, _w, COUNT(*) AS _c
      FROM (SELECT k, {bin_expr} AS _bin, _lo, _w
            FROM _rkb CROSS JOIN _rkw)
      GROUP BY k, _bin, _lo, _w
    ),
    _rkc AS (
      SELECT k, _bin, _lo, _w, _c,
             SUM(_c) OVER (PARTITION BY k ORDER BY _bin) AS _cum,
             SUM(_c) OVER (PARTITION BY k) AS _n
      FROM _rkh
    ),
    _rkq AS (
      SELECT k, CAST(MAX(_n) AS BIGINT) AS n, {", ".join(picks)}
      FROM _rkc GROUP BY k
    ),
    _rks AS (
      SELECT k, n, est_p5 AS med, (est_p75 - est_p25) AS iqr FROM _rkq
    )
    SELECT b.i AS {id_col}, b.k AS {group_col},
           CAST(b.v AS DOUBLE) AS value_q,
           {round_double('s.med', round_to)} AS group_median,
           {round_double('s.iqr', round_to)} AS group_iqr,
           CASE WHEN s.iqr = 0.0 THEN CAST(NULL AS DOUBLE)
                ELSE {round_double(z, round_to)} END AS robust_z
    FROM _rkb b JOIN _rks s ON b.k = s.k
    """


def robust_scale_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    bins: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`robust_scale_sketch_sql`."""
    for c in (value_col, group_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_rsk_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        robust_scale_sketch_sql(SPARK, view, value_col, group_col, id_col,
                                bins=bins, round_to=round_to)
    )


def robust_scale_auto(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    *,
    exact_max_group_rows: int = 1_000_000,
    bins: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """Strategy-picking robust scaling — the ONE entry point callers
    should use when they have not sized their groups (the
    ``asof_join_auto`` pattern): groups at or under
    ``exact_max_group_rows`` get the EXACT type-7 sorted-array form
    (:func:`robust_scale`); any larger group routes the whole frame to
    the bounded histogram-sketch form (:func:`robust_scale_sketch`),
    whose per-group state is ≤ ``bins`` counters — so a single hot
    group can never materialize an unbounded single-task array (the
    r9 VERDICT scale cliff).

    Probe cost: first a BOUNDED total-row probe (``limit(bound+1)`` —
    if the whole frame fits, no group can exceed it: one cheap job that
    never scans past ``bound + 1`` rows); only past that, one
    partial-aggregated per-group count (map-side combined, |groups|-row
    shuffle) for the true max group size."""
    for c in (value_col, group_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    from pyspark.sql import functions as F

    exact = lambda: robust_scale(  # noqa: E731
        df, value_col, group_col, id_col, round_to=round_to
    )
    if df.limit(exact_max_group_rows + 1).count() <= exact_max_group_rows:
        return exact()
    mx = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .collect()[0][0]
    )
    if mx is not None and mx <= exact_max_group_rows:
        return exact()
    return robust_scale_sketch(df, value_col, group_col, id_col,
                               bins=bins, round_to=round_to)


def frequency_encode_sql(
    d: Dialect,
    table: str,
    id_col: str,
    cat_col: str,
    *,
    min_count: int = 5,
    round_to: int = 6,
) -> str:
    """Frequency encoding with rare-category collapse — the third leg
    of the categorical-encoding surface (target encoding carries label
    signal, this carries pure prevalence, and the ``__rare__`` bucket
    is how production feature pipelines stop the long tail of
    once-seen categories from exploding the model's vocabulary).

    Output per row: the original category, the collapsed category
    (categories with fewer than ``min_count`` rows map to
    ``'__rare__'``), the collapsed bucket's row count, and its
    frequency n_bucket/N.  The rare bucket's count is the SUM of its
    members' counts (post-collapse semantics — what the model will
    actually see), not the per-member count.

    Determinism: counts are exact BIGINTs; the frequency is one IEEE
    division round_double'd.  Shape: ONE category-key exchange builds
    the count relation; the collapse is a projection over it; both the
    per-category and the collapsed relation are |categories|-row and
    join back broadcast-sized; N is one-row state.

    NULL categories are first-class: ``_fec`` groups them (GROUP BY
    keeps a NULL group), and the join-back is NULL-safe (``<=>`` on
    Spark / ``IS NOT DISTINCT FROM`` on DuckDB), so the one-row-per-
    input contract holds for NULL-category rows too — they collapse
    into ``'__rare__'`` when below ``min_count`` like any other
    category (an equi-join would silently drop them while n_total
    still counted them, skewing every frequency).
    """
    from . import _num

    null_eq = (
        f"t.{cat_col} <=> m.cat"
        if d.name == "spark"
        else f"t.{cat_col} IS NOT DISTINCT FROM m.cat"
    )
    freq = "(CAST(n_bucket AS DOUBLE) / CAST(n_total AS DOUBLE))"
    return f"""
    WITH _fec AS (
      SELECT {cat_col} AS cat, CAST(COUNT(*) AS BIGINT) AS n_cat
      FROM {table} GROUP BY {cat_col}
    ),
    _fem AS (
      SELECT cat,
             CASE WHEN n_cat < {min_count} THEN '__rare__'
                  ELSE CAST(cat AS {'STRING' if d.name == 'spark' else 'VARCHAR'})
             END AS cat_enc,
             n_cat
      FROM _fec
    ),
    _feb AS (
      SELECT cat_enc, CAST(SUM(n_cat) AS BIGINT) AS n_bucket
      FROM _fem GROUP BY cat_enc
    ),
    _fen AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM {table})
    SELECT t.{id_col} AS {id_col}, t.{cat_col} AS {cat_col},
           m.cat_enc AS cat_enc, b.n_bucket AS n_bucket,
           {_num.round_double(freq, round_to)} AS freq_enc
    FROM {table} t
    JOIN _fem m ON {null_eq}
    JOIN _feb b ON {"m.cat_enc <=> b.cat_enc" if d.name == "spark" else "m.cat_enc IS NOT DISTINCT FROM b.cat_enc"}
    CROSS JOIN _fen
    """


def frequency_encode(
    df: DataFrame,
    id_col: str,
    cat_col: str,
    *,
    min_count: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`frequency_encode_sql`."""
    for c in (id_col, cat_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_freqenc_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        frequency_encode_sql(SPARK, view, id_col, cat_col,
                             min_count=min_count, round_to=round_to)
    )
