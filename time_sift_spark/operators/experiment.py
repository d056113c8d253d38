"""Experiment analysis — CUPED variance-reduced A/B readout.

CUPED (Controlled-experiment Using Pre-Experiment Data; Deng, Xu,
Kohavi & Walker, WSDM 2013) adjusts each unit's experiment-period
metric Y with its pre-period covariate X:

    Y_adj = Y − θ·(X − mean(X)),   θ = cov(X, Y) / var(X)

removing the X-explained variance from the treatment comparison —
the standard way to shrink A/B confidence intervals without touching
the randomization.  Arms are assigned by the engine's deterministic
md5 hash-range discipline (never an RNG), so assignment is stable
under corpus growth and reproducible cross-engine.

Determinism (the driver's value-hash gate): per-user X/Y are EXACT
decimal sums of DECIMAL(18,6)-quantized values (the dsum discipline —
raw-column quantize, one deterministic rounding per addend); the
moment sums Σx, Σy, Σxy, Σxx stay in exact decimal — each product is
DECIMAL(18,6)×DECIMAL(19,6): Spark's result lands EXACTLY at the
(18+19+1 = 38, 12) boundary and DuckDB's at (37,12) int128, so neither
engine enters its precision-loss regime and the scale-12 product is
exact on both —
and θ, means, and adjusted means are computed from one decimal→double
cast each (the same IEEE value on both engines) with the op order
spelled identically on both sides.  The arm means use the algebraic
identity mean(Y − θ·(X − mx)) = mean(Y) − θ·(mean(X) − mx): no
per-row double accumulation anywhere, so nothing reassociates.

Scale posture (SCALE.md: experiment): ONE shuffle on the unit key
builds the per-user (x, y) frame with partial aggregation; the global
and per-arm moment reductions are one-row / |arms|-row aggregate STATE
(the SinglePartition-of-state convention).  The DECIMAL(38,12) moment
headroom bounds Σxy at 10^26 — per-unit metrics up to 10^9 across
10^8 units; beyond that, shard the moment sums by unit-hash and merge
(the sketch-rollup pattern).

Reference parity note: the reference (Rust lag-matrix crate,
src/lib.rs) has no experimentation surface; charter extension
(SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect

__all__ = [
    "cuped_sql", "cuped", "ranked_auc",
    "calibration_bins_sql", "brier_decomposition_sql",
    "lift_gains", "lift_gains_sql",
    "prop_ztest", "prop_ztest_sql",
]


def cuped_sql(
    d: Dialect,
    table: str,
    user_col: str,
    time_col: str,
    value_col: str,
    *,
    cutoff: str,
) -> str:
    """Full CUPED statement: pre-period covariate before ``cutoff``,
    experiment metric from ``cutoff`` on, md5-parity arm assignment.

    Output: (arm, n_users, theta, mean_post, mean_adj), ordered by arm.
    """
    cast = "STRING" if d.name == "spark" else "VARCHAR"
    arm = f"{d.md5_long(f'CAST({user_col} AS {cast})')} % 2"
    dec = f"CAST({value_col} AS DECIMAL(18,6))"
    return f"""
    WITH peruser AS (
      SELECT {user_col} AS uid, {arm} AS arm,
             CAST(COALESCE(SUM(CASE WHEN {time_col} < TIMESTAMP '{cutoff}'
                                    THEN {dec} END), 0) AS DECIMAL(18,6)) AS x,
             CAST(COALESCE(SUM(CASE WHEN {time_col} >= TIMESTAMP '{cutoff}'
                                    THEN {dec} END), 0) AS DECIMAL(18,6)) AS y
      FROM {table}
      GROUP BY {user_col}
    ),
    gmoments AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(CAST(x * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxy,
             SUM(CAST(x * CAST(x AS DECIMAL(19,6)) AS DECIMAL(38,12))) AS sxx
      FROM peruser
    ),
    coeffs AS (
      SELECT
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS theta,
        CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
      FROM gmoments
    ),
    perarm AS (
      SELECT arm, COUNT(*) AS n_users, SUM(x) AS sxa, SUM(y) AS sya
      FROM peruser
      GROUP BY arm
    )
    SELECT arm, n_users, c.theta,
           CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
           CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
             - c.theta * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE) - c.mx)
             AS mean_adj
    FROM perarm CROSS JOIN coeffs c
    ORDER BY arm
    """


def cuped(
    df: DataFrame,
    user_col: str,
    time_col: str,
    value_col: str,
    *,
    cutoff: str,
) -> DataFrame:
    """DataFrame front door for :func:`cuped_sql`."""
    for c in (user_col, time_col, value_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_cuped_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        cuped_sql(SPARK, view, user_col, time_col, value_col, cutoff=cutoff)
    )


def ranked_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    pred_col: str | None = None,
) -> DataFrame:
    """ROC AUC (+ optional accuracy) for a scored, binary-labeled frame
    — the Mann-Whitney U formulation with tie-aware ½ credit, computed
    WITHOUT a global rank window: rows reduce to one group per DISTINCT
    score (n_pos, n_neg), the cumulative negative count comes from the
    engine's distributed prefix scan (operators/prefix.prefix_sum_global
    — bucketed two-pass Blelloch, no single-task window), and

        AUC = Σ_g [ n_pos_g · (2·cum_neg_before_g + n_neg_g) ]
              / (2 · n_pos · n_neg)

    where the ×2 keeps tie credit in EXACT integer arithmetic until one
    final IEEE division — hash-exact cross-engine (the oracle's window
    formulation computes the identical integers).

    Scale: one shuffle groups by score, the prefix scan's bucket pass
    orders the (distinct-score)-sized frame, and the final reduce is
    one-row aggregate STATE.  |distinct scores| ≤ |rows| and is
    typically tiny for quantized/rounded scores — the relation the
    global order touches is the REDUCED one, never the row population.

    Output (one row): n_eval, n_pos, n_neg, auc [, accuracy].
    """
    from pyspark.sql import functions as F

    from .prefix import prefix_sum_global

    need = [score_col, label_col] + ([pred_col] if pred_col else [])
    for c in need:
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    ev = df.select(
        F.col(score_col).alias("_s"),
        F.expr(f"CASE WHEN {label_col} = 1 THEN 1 ELSE 0 END").alias("_y"),
        *(
            [F.expr(
                f"CASE WHEN ({pred_col} AND {label_col} = 1)"
                f" OR ((NOT {pred_col}) AND {label_col} = 0)"
                " THEN 1 ELSE 0 END"
            ).alias("_ok")]
            if pred_col
            else []
        ),
    ).localCheckpoint(eager=False)
    grp = ev.groupBy("_s").agg(
        F.sum("_y").alias("np"),
        (F.count("*") - F.sum("_y")).alias("nn"),
    )
    cum = prefix_sum_global(grp, "nn", "_s", out_col="_cn")
    agg = cum.selectExpr(
        "np", "nn", "CAST(_cn AS BIGINT) AS cn"
    ).selectExpr(
        "CAST(SUM(np * (2 * (cn - nn) + nn)) AS BIGINT) AS num2",
        "CAST(SUM(np) AS BIGINT) AS n_pos",
        "CAST(SUM(nn) AS BIGINT) AS n_neg",
    )
    out = agg.selectExpr(
        "n_pos + n_neg AS n_eval",
        "n_pos",
        "n_neg",
        "CAST(num2 AS DOUBLE) / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc",
    )
    if pred_col:
        acc = ev.selectExpr(
            "CAST(SUM(_ok) AS BIGINT) AS n_correct",
            "COUNT(*) AS n_rows",
        ).selectExpr(
            "CAST(n_correct AS DOUBLE) / CAST(n_rows AS DOUBLE) AS accuracy"
        )
        out = out.crossJoin(acc)
    return out


def calibration_bins_sql(
    d: Dialect,
    table: str,
    score_col: str,
    label_col: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> str:
    """Reliability-curve bins for a probability-like score: per bin,
    the count, exact-decimal mean score, empirical positive fraction,
    and their gap — the table a calibration plot (and Platt/isotonic
    recalibration decision) reads.  Determinism: the score quantizes to
    DECIMAL(18,6) at the scan, bin sums stay exact decimal, and each
    output double is one dec→double cast + one IEEE division; the gap
    is round_double'd in pure double arithmetic.  Scale: ONE shuffle on
    the (≤ ``bins``-valued) bin key with partial aggregation.
    """
    from . import _num

    sdec = f"CAST({score_col} AS DECIMAL(18,6))"
    b = (
        f"LEAST(CAST(FLOOR(CAST({score_col} AS DOUBLE) * {bins}.0) AS INT),"
        f" {bins - 1})"
    )
    mean_s = f"({_num.dec_to_double('ssum')} / CAST(n_bin AS DOUBLE))"
    frac = "(CAST(ny AS DOUBLE) / CAST(n_bin AS DOUBLE))"
    return f"""
    WITH _cb AS (
      SELECT {b} AS bin, {sdec} AS s,
             CASE WHEN {label_col} = 1 THEN 1 ELSE 0 END AS y
      FROM {table}
    ),
    _cg AS (
      SELECT bin, COUNT(*) AS n_bin, SUM(s) AS ssum,
             CAST(SUM(y) AS BIGINT) AS ny
      FROM _cb GROUP BY bin
    )
    SELECT bin, n_bin,
           {_num.round_double(mean_s, round_to)} AS mean_score,
           {_num.round_double(frac, round_to)} AS frac_pos,
           {_num.round_double(f"({frac} - {mean_s})", round_to)} AS gap
    FROM _cg
    """


def brier_decomposition_sql(
    d: Dialect,
    table: str,
    score_col: str,
    label_col: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> str:
    """Brier score + Murphy (1973) decomposition into reliability −
    resolution + uncertainty, computed bin-wise.  The per-row squared
    error (p−y)² is an EXACT decimal product (the CUPED moment
    discipline: DECIMAL(18,6) × DECIMAL(19,6) → scale-12, inside both
    engines' exact range), so the Brier sum never reassociates; the
    per-bin decomposition terms are rounded in pure double arithmetic
    and quantized to decimal BEFORE their ≤ ``bins``-row sum, which
    makes the k-term additions exact too.  One shuffle on the bin key;
    the global moments are one-row aggregate STATE.
    Output (one row): n_eval, brier, reliability, resolution,
    uncertainty.
    """
    from . import _num

    sdec = f"CAST({score_col} AS DECIMAL(18,6))"
    b = (
        f"LEAST(CAST(FLOOR(CAST({score_col} AS DOUBLE) * {bins}.0) AS INT),"
        f" {bins - 1})"
    )
    sq = (
        "CAST((s - y) * CAST((s - y) AS DECIMAL(19,6)) AS DECIMAL(38,12))"
    )
    pbar_k = f"({_num.dec_to_double('ssum')} / CAST(n_k AS DOUBLE))"
    ybar_k = "(CAST(ny AS DOUBLE) / CAST(n_k AS DOUBLE))"
    ybar = "(CAST(gy AS DOUBLE) / CAST(gn AS DOUBLE))"
    rel_t = _num.round_double(
        f"(CAST(n_k AS DOUBLE) * ({pbar_k} - {ybar_k}) * ({pbar_k} - {ybar_k}))",
        8,
    )
    res_t = _num.round_double(
        f"(CAST(n_k AS DOUBLE) * ({ybar_k} - {ybar}) * ({ybar_k} - {ybar}))",
        8,
    )
    return f"""
    WITH _bb AS (
      SELECT {b} AS bin, {sdec} AS s,
             CASE WHEN {label_col} = 1 THEN 1 ELSE 0 END AS y
      FROM {table}
    ),
    _bg AS (
      SELECT bin, COUNT(*) AS n_k, SUM(s) AS ssum,
             CAST(SUM(y) AS BIGINT) AS ny,
             SUM({sq}) AS sq_k
      FROM _bb GROUP BY bin
    ),
    _bglob AS (
      SELECT CAST(SUM(n_k) AS BIGINT) AS gn, CAST(SUM(ny) AS BIGINT) AS gy,
             CAST(SUM(sq_k) AS DECIMAL(38,12)) AS gsq
      FROM _bg
    ),
    _bterms AS (
      SELECT CAST(SUM(CAST({rel_t} AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS rel_sum,
             CAST(SUM(CAST({res_t} AS DECIMAL(28,10))) AS DECIMAL(38,10)) AS res_sum
      FROM _bg CROSS JOIN _bglob
    )
    SELECT gn AS n_eval,
           {_num.round_double(f"({_num.dec_to_double('gsq')} / CAST(gn AS DOUBLE))", round_to)} AS brier,
           {_num.round_double(f"({_num.dec_to_double('rel_sum')} / CAST(gn AS DOUBLE))", round_to)} AS reliability,
           {_num.round_double(f"({_num.dec_to_double('res_sum')} / CAST(gn AS DOUBLE))", round_to)} AS resolution,
           {_num.round_double(f"({ybar} * (1.0 - {ybar}))", round_to)} AS uncertainty
    FROM _bglob CROSS JOIN _bterms
    """


def classification_report_sql(
    d: Dialect,
    table: str,
    pred_expr: str,
    actual_expr: str,
    *,
    round_to: int = 6,
) -> str:
    """Multi-class classification report: per-class TP/FP/FN with
    precision, recall, and F1 — the evaluation table AUC/Brier (binary,
    score-based) cannot produce for a hard multi-class predictor.

    Rational throughout: the confusion matrix is exact BIGINT counts,
    precision/recall are one IEEE division each, and F1 uses the
    harmonic form 2·tp / (2·tp + fp + fn) — a SINGLE division of exact
    integers (algebraically equal to 2PR/(P+R) but with no intermediate
    rounding), so the report hashes to the digit.  Classes with no
    predictions (or no support) report 0 for the undefined ratio — the
    sklearn zero_division=0 convention, documented not invented.

    Shape: one (pred, actual) groupBy collapses the row population to a
    ≤|classes|² matrix; the class roll-up and per-class sums all run on
    that tiny relation (a classes × matrix cross join, both sides
    broadcast-sized).
    """
    from . import _num

    prec = "(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))"
    rec = "(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))"
    f1 = "(CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE))"
    z = lambda cond, e: (  # noqa: E731
        f"CASE WHEN {cond} THEN CAST(0.0 AS DOUBLE) "
        f"ELSE {_num.round_double(e, round_to)} END"
    )
    return f"""
    WITH _cr AS (
      SELECT {pred_expr} AS pred, {actual_expr} AS actual FROM {table}
    ),
    _cm AS (
      SELECT pred, actual, CAST(COUNT(*) AS BIGINT) AS n
      FROM _cr GROUP BY pred, actual
    ),
    _cls AS (
      SELECT actual AS c FROM _cm GROUP BY actual
      UNION
      SELECT pred AS c FROM _cm GROUP BY pred
    ),
    _cagg AS (
      SELECT _cls.c AS c,
             CAST(SUM(CASE WHEN _cm.pred = _cls.c AND _cm.actual = _cls.c
                           THEN _cm.n ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN _cm.pred = _cls.c AND _cm.actual <> _cls.c
                           THEN _cm.n ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN _cm.pred <> _cls.c AND _cm.actual = _cls.c
                           THEN _cm.n ELSE 0 END) AS BIGINT) AS fn
      FROM _cls CROSS JOIN _cm
      GROUP BY _cls.c
    )
    SELECT c AS class, tp, fp, fn,
           (tp + fn) AS support,
           {z('tp + fp = 0', prec)} AS precision_score,
           {z('tp + fn = 0', rec)} AS recall_score,
           {z('2 * tp + fp + fn = 0', f1)} AS f1
    FROM _cagg
    """


def classification_report(
    df: DataFrame,
    pred_col: str,
    actual_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`classification_report_sql`."""
    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK

    for c in (pred_col, actual_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_clsrep_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        classification_report_sql(SPARK, view, pred_col, actual_col,
                                  round_to=round_to)
    )


def welch_ttest_sql(
    d: Dialect,
    table: str,
    user_col: str,
    value_col: str,
    *,
    crit: float = 1.96,
    round_to: int = 6,
) -> str:
    """Welch's unequal-variance two-sample t on per-unit metric sums,
    md5-parity arms (the CUPED assignment — stable, cross-engine, never
    an RNG): the significance readout CUPED's variance reduction feeds.

    Reports the t statistic and the Welch-Satterthwaite degrees of
    freedom; the decision column compares |t| against an explicit
    critical-value LITERAL (1.96 ≈ two-sided 5% for the large df this
    readout targets) — the normal-tail CDF itself needs erf(), which
    the no-transcendentals rule bans, so the statistic is the output
    and the literal threshold is the documented decision rule.

    Numerics: per-unit sums and the arm moments (n, Σy, Σy²) are exact
    decimals (the CUPED DECIMAL(18,6)×DECIMAL(19,6) product headroom);
    means/variances are dec→double casts + IEEE arithmetic in one
    shared expression tree; SQRT is IEEE-correctly-rounded on both
    engines.  Sample variance uses the (Σy² − (Σy)²/n)/(n−1) form ON
    EXACT DECIMAL INPUTS — the catastrophic-cancellation caveat of that
    form applies to accumulated floats, not exact sums cast once.
    Shape: one unit-key exchange, then a 2-row arm-moment STATE reduce.
    """
    from . import _num

    cast = "STRING" if d.name == "spark" else "VARCHAR"
    arm = f"{d.md5_long(f'CAST({user_col} AS {cast})')} % 2"
    dec = f"CAST({value_col} AS DECIMAL(18,6))"
    m = lambda a: f"({_num.dec_to_double(f'sy{a}')} / CAST(n{a} AS DOUBLE))"  # noqa: E731
    # sample variance from exact decimal moments
    v = lambda a: (  # noqa: E731
        f"(({_num.dec_to_double(f'syy{a}')} - {_num.dec_to_double(f'sy{a}')}"
        f" * {_num.dec_to_double(f'sy{a}')} / CAST(n{a} AS DOUBLE))"
        f" / CAST(n{a} - 1 AS DOUBLE))"
    )
    se2 = f"({v(0)} / CAST(n0 AS DOUBLE) + {v(1)} / CAST(n1 AS DOUBLE))"
    t = f"(({m(1)} - {m(0)}) / SQRT({se2}))"
    dfw = (
        f"(({se2} * {se2}) / "
        f"(({v(0)} / CAST(n0 AS DOUBLE)) * ({v(0)} / CAST(n0 AS DOUBLE))"
        f" / CAST(n0 - 1 AS DOUBLE)"
        f" + ({v(1)} / CAST(n1 AS DOUBLE)) * ({v(1)} / CAST(n1 AS DOUBLE))"
        f" / CAST(n1 - 1 AS DOUBLE)))"
    )
    return f"""
    WITH _wu AS (
      SELECT {user_col} AS uid, {arm} AS arm,
             CAST(COALESCE(SUM({dec}), 0) AS DECIMAL(18,6)) AS y
      FROM {table} GROUP BY {user_col}
    ),
    _wm AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS DECIMAL(27,6)) AS sy,
             CAST(SUM(CAST(y * CAST(y AS DECIMAL(19,6)) AS DECIMAL(38,12)))
                  AS DECIMAL(38,12)) AS syy
      FROM _wu GROUP BY arm
    ),
    _wp AS (
      SELECT MAX(CASE WHEN arm = 0 THEN n END) AS n0,
             MAX(CASE WHEN arm = 1 THEN n END) AS n1,
             MAX(CASE WHEN arm = 0 THEN sy END) AS sy0,
             MAX(CASE WHEN arm = 1 THEN sy END) AS sy1,
             MAX(CASE WHEN arm = 0 THEN syy END) AS syy0,
             MAX(CASE WHEN arm = 1 THEN syy END) AS syy1
      FROM _wm
    )
    SELECT n0, n1,
           {_num.round_double(m(0), round_to)} AS mean_0,
           {_num.round_double(m(1), round_to)} AS mean_1,
           {_num.round_double(f"({m(1)} - {m(0)})", round_to)} AS diff,
           {_num.round_double(t, round_to)} AS t_stat,
           {_num.round_double(dfw, round_to)} AS df_welch,
           (ABS({t}) > {crit!r}) AS significant
    FROM _wp
    """


def welch_ttest(
    df: DataFrame,
    user_col: str,
    value_col: str,
    *,
    crit: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`welch_ttest_sql`."""
    from ..errors import ColumnNotFoundError
    from ..functions.text_fns import SPARK

    for c in (user_col, value_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_welch_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        welch_ttest_sql(SPARK, view, user_col, value_col,
                        crit=crit, round_to=round_to)
    )


def lift_gains_sql(
    d: Dialect,
    table: str,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    n_tiles: int = 10,
    round_to: int = 6,
    staged_tiles: str | None = None,
) -> str:
    """Decile lift & cumulative-gains table for a classifier score —
    the campaign-targeting readout ("contact the top 20% by model
    score; how many of the positives do we capture?") completing the
    eval family: AUC ranks, calibration/Brier audit confidence, the
    gains table prices a CUTOFF.  Per descending-score ``n_tiles``-tile:
    count, positives, per-tile lift over the base rate, cumulative
    capture (gain) and cumulative lift.

    Determinism: tiles come from ``NTILE`` over the TOTAL order
    (score DESC, then ``id_col`` — score ties alone would let the two
    engines split a tie group across tiles differently, the hash-gate
    trap); all counts are exact BIGINTs and every output double is a
    fixed division tree of exact-in-double integers, round_double'd.

    Scale: the global NTILE is a total sort — correct on EVAL-SLICE
    volumes (bounded by the labeling budget, the posture of every
    query on this view).  For full-corpus deciles, compute boundary
    scores with the mergeable histogram-quantile sketch and broadcast
    them instead (the robust_scale_auto escape hatch) — same output
    contract, no total sort.  The per-tile relation is referenced by
    BOTH the totals state and the cumulative window, so the engine-wide
    staging rule applies: the Spark front door stages it
    (``staged_tiles``), the oracle keeps the inline text.
    """
    from . import _num

    tiles = (
        f"SELECT tile, n, pos FROM {staged_tiles}" if staged_tiles
        else f"""SELECT tile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM (
        SELECT CASE WHEN {label_col} = 1 THEN 1 ELSE 0 END AS y,
               NTILE({n_tiles}) OVER (ORDER BY {score_col} DESC, {id_col}) AS tile
        FROM {table}
      ) _lgr
      GROUP BY tile"""
    )
    rd = lambda e: _num.round_double(e, round_to)  # noqa: E731
    base = "(CAST(pos_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))"
    lift = f"((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) / {base})"
    cgain = "(CAST(cum_pos AS DOUBLE) / CAST(pos_tot AS DOUBLE))"
    clift = f"((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) / {base})"
    return f"""
    WITH _lga AS (
      {tiles}
    ),
    _lgt AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_tot,
             CAST(SUM(pos) AS BIGINT) AS pos_tot
      FROM _lga
    ),
    _lgc AS (
      SELECT tile, n, pos,
             CAST(SUM(n) OVER (ORDER BY tile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
             CAST(SUM(pos) OVER (ORDER BY tile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
      FROM _lga
    )
    SELECT tile, n, pos, cum_n, cum_pos,
           CASE WHEN pos_tot = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd(lift)} END AS tile_lift,
           CASE WHEN pos_tot = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd(cgain)} END AS cum_gain,
           CASE WHEN pos_tot = 0 THEN CAST(NULL AS DOUBLE)
                ELSE {rd(clift)} END AS cum_lift
    FROM _lgc CROSS JOIN _lgt
    ORDER BY tile
    """


def lift_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    n_tiles: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`lift_gains_sql` — stages the
    per-tile counts frame once (lazy localCheckpoint; the totals state
    and the cumulative window both reference it)."""
    for c in (score_col, label_col, id_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_lift_in"
    df.createOrReplaceTempView(view)
    inline = lift_gains_sql(SPARK, view, score_col, label_col, id_col,
                            n_tiles=n_tiles, round_to=round_to)
    tiles_sel = inline.split("_lga AS (", 1)[1].split("\n    ),", 1)[0]
    staged = spark.sql(tiles_sel).localCheckpoint(eager=False)
    sview = "_ts_lift_tiles"
    staged.createOrReplaceTempView(sview)
    return spark.sql(
        lift_gains_sql(SPARK, view, score_col, label_col, id_col,
                       n_tiles=n_tiles, round_to=round_to,
                       staged_tiles=sview)
    )


def prop_ztest_sql(
    d: Dialect,
    table: str,
    user_col: str,
    type_col: str,
    convert_type: str,
    *,
    crit: float = 1.96,
    power_z: float = 0.8416,
    round_to: int = 6,
) -> str:
    """Two-proportion z-test on CONVERSION (did the unit ever emit a
    ``convert_type`` event?), md5-parity arms — the most-used A/B
    statistic there is, and the binary companion of :func:`welch_ttest`
    (means need Welch; conversion needs this).  Pooled-variance form:

        z = (p₁ − p₀) / √( p̂(1−p̂)·(1/n₀ + 1/n₁) )

    The decision compares |z| against the explicit ``crit`` literal
    (1.96 ≈ two-sided 5%; the normal CDF needs erf, which stays
    banned).  Also emitted: ``required_n_per_arm`` — the classic
    sample-size formula n = (z_{α/2}+z_β)²·(p₀q₀+p₁q₁)/Δ² at 80% power
    (``power_z`` = 0.8416, a literal), the "how much longer must this
    test run" readout, NULL when the observed Δ is 0.

    Numerics: conversions and arm sizes are exact BIGINTs; every
    ratio/√ is a fixed shared-text IEEE tree over their exact
    conversions.  Shape: one unit-key aggregation (conversion is a
    MAX(CASE) over the unit's events), then a 2-row arm reduce —
    aggregate STATE, not data.
    """
    from . import _num

    q = lambda s: "'" + s.replace("'", "''") + "'"  # noqa: E731
    cast = "STRING" if d.name == "spark" else "VARCHAR"
    arm = f"{d.md5_long(f'CAST({user_col} AS {cast})')} % 2"
    rd = lambda e: _num.round_double(e, round_to)  # noqa: E731
    p = lambda a: f"(CAST(x{a} AS DOUBLE) / CAST(n{a} AS DOUBLE))"  # noqa: E731
    pool = "(CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))"
    se = (
        f"sqrt(({pool} * (1.0 - {pool}))"
        " * ((1.0 / CAST(n0 AS DOUBLE)) + (1.0 / CAST(n1 AS DOUBLE))))"
    )
    diff = f"({p(1)} - {p(0)})"
    zexpr = f"({diff} / {se})"
    req_n = (
        f"ceil((({crit!r} + {power_z!r}) * ({crit!r} + {power_z!r}))"
        f" * (({p(0)} * (1.0 - {p(0)})) + ({p(1)} * (1.0 - {p(1)})))"
        f" / ({diff} * {diff}))"
    )
    return f"""
    WITH _pzu AS (
      SELECT {user_col} AS uid, {arm} AS arm,
             MAX(CASE WHEN {type_col} = {q(convert_type)} THEN 1 ELSE 0 END)
               AS conv
      FROM {table} GROUP BY {user_col}
    ),
    _pza AS (
      SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x0,
             CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x1
      FROM _pzu
    )
    SELECT n0, n1, x0, x1,
           {rd(p(0))} AS p0,
           {rd(p(1))} AS p1,
           {rd(diff)} AS p_diff,
           CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1
                THEN CAST(NULL AS DOUBLE)
                ELSE {rd(zexpr)} END AS z_stat,
           CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1
                THEN CAST(NULL AS BOOLEAN)
                ELSE ABS({zexpr}) > {crit!r} END AS significant,
           CASE WHEN {diff} = 0.0 THEN CAST(NULL AS BIGINT)
                ELSE CAST({req_n} AS BIGINT) END AS required_n_per_arm
    FROM _pza
    """


def prop_ztest(
    df: DataFrame,
    user_col: str,
    type_col: str,
    convert_type: str,
    *,
    crit: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`prop_ztest_sql`."""
    from ..functions.text_fns import SPARK as _S

    for c in (user_col, type_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    view = "_ts_propz_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        prop_ztest_sql(_S, view, user_col, type_col, convert_type,
                       crit=crit, round_to=round_to)
    )
