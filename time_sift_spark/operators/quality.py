"""Data-quality expectation checks (Deequ/dbt-test style, charter
extension): declare constraints on a table, get back one row per
constraint with the measured value, the threshold, and a pass flag —
the data-contract gate a 100 TB ingestion pipeline runs before
publishing a partition.

Supported expectation kinds (all pure aggregations — ONE pass over the
table, partial-aggregated, no shuffle beyond the final collapse):

* ``not_null(col)``              — fraction of NULLs ≤ threshold
* ``unique(col)``                — duplicate rows on col ≤ threshold
* ``accepted_values(col, vals)`` — rows outside the value set ≤ threshold
* ``between(col, lo, hi)``       — rows outside [lo, hi] ≤ threshold
* ``row_count_min(n)``           — table has at least n rows
* ``freshness(col, max_age)``    — max(col) within max_age seconds of a
                                   caller-supplied reference time (NEVER
                                   wall-clock: determinism)

Every metric is an exact integer count or an integer ratio (IEEE
division of exact counts) — cross-engine hashable with zero rounding
machinery.  Referential integrity (``foreign_key``) is the one
expectation needing a second table: a broadcast left-anti probe counting
orphans.

Scale: the single-pass design matters — Deequ calls this "metric
computation batching".  All expectations over one table compile into ONE
aggregate projection (each expectation contributes 1-2 SUM/COUNT/MAX
slots), so adding the 20th check costs a column, not a scan.  The
result is a tiny constraints × 6 frame, unioned per table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError


@dataclass(frozen=True)
class Expectation:
    """One declared constraint. ``kind`` selects the metric; ``metric``
    is what gets measured (a fraction for the ≤-threshold kinds, a count
    for row_count_min, seconds for freshness)."""

    name: str
    kind: str
    col: str | None = None
    threshold: float = 0.0
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    min_rows: int | None = None
    ref_time: str | None = None  # SQL timestamp literal text
    max_age_seconds: int | None = None


def not_null(col: str, *, max_null_frac: float = 0.0, name: str | None = None) -> Expectation:
    return Expectation(name or f"not_null_{col}", "not_null", col, max_null_frac)


def unique(col: str, *, max_dup_frac: float = 0.0, name: str | None = None) -> Expectation:
    return Expectation(name or f"unique_{col}", "unique", col, max_dup_frac)


def accepted_values(
    col: str, values: Sequence, *, max_bad_frac: float = 0.0, name: str | None = None
) -> Expectation:
    return Expectation(
        name or f"accepted_values_{col}", "accepted_values", col, max_bad_frac,
        values=tuple(values),
    )


def between(
    col: str, lo: float, hi: float, *, max_bad_frac: float = 0.0, name: str | None = None
) -> Expectation:
    return Expectation(name or f"between_{col}", "between", col, max_bad_frac, lo=lo, hi=hi)


def row_count_min(n: int, *, name: str | None = None) -> Expectation:
    return Expectation(name or "row_count_min", "row_count_min", None, min_rows=n)


def freshness(col: str, *, ref_time: str, max_age_seconds: int) -> Expectation:
    """``ref_time`` is an explicit timestamp literal (e.g.
    ``TIMESTAMP '2001-09-01 00:00:00'``) — never now(): a data contract
    must evaluate identically on re-run."""
    return Expectation(
        f"freshness_{col}", "freshness", col,
        ref_time=ref_time, max_age_seconds=max_age_seconds,
    )


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _metric_expr(dialect: str, e: Expectation) -> tuple[str, str, str]:
    """(metric_agg_sql, threshold_literal, comparison_op) — the metric is
    ONE aggregate expression in DOUBLE (exact integer counts cast
    exactly; ratios are exact-count IEEE divisions); passed is
    ``metric <op> threshold``."""
    n = "COUNT(*)"

    def frac(bad: str) -> str:
        # COALESCE: SUM over ZERO rows is NULL, so on an empty table every
        # ≤-threshold metric would be NULL and `passed` NULL — a contract
        # gate filtering on passed = false would silently miss the
        # violation exactly when a partition arrives empty.  An empty
        # table has zero bad rows: metric 0.0, a definite verdict.
        return f"(CAST(COALESCE({bad}, 0) AS DOUBLE) / CAST(greatest({n}, 1) AS DOUBLE))"

    if e.kind == "not_null":
        return frac(f"SUM(CASE WHEN {e.col} IS NULL THEN 1 ELSE 0 END)"), repr(float(e.threshold)), "<="
    if e.kind == "unique":
        return frac(f"({n} - COUNT(DISTINCT {e.col}))"), repr(float(e.threshold)), "<="
    if e.kind == "accepted_values":
        vals = ", ".join(_sql_literal(v) for v in e.values)
        bad = f"SUM(CASE WHEN {e.col} IS NOT NULL AND {e.col} NOT IN ({vals}) THEN 1 ELSE 0 END)"
        return frac(bad), repr(float(e.threshold)), "<="
    if e.kind == "between":
        bad = (
            f"SUM(CASE WHEN {e.col} IS NOT NULL AND "
            f"({e.col} < {e.lo!r} OR {e.col} > {e.hi!r}) THEN 1 ELSE 0 END)"
        )
        return frac(bad), repr(float(e.threshold)), "<="
    if e.kind == "row_count_min":
        return f"CAST({n} AS DOUBLE)", f"CAST({e.min_rows} AS DOUBLE)", ">="
    if e.kind == "freshness":
        if dialect == "spark":
            ep = lambda x: f"unix_micros(CAST({x} AS TIMESTAMP))"  # noqa: E731
        else:
            ep = lambda x: f"epoch_us({x})"  # noqa: E731
        age = f"({ep(e.ref_time)} - {ep(f'MAX({e.col})')})"
        return (
            f"(CAST({age} AS DOUBLE) / 1000000.0)",
            f"CAST({e.max_age_seconds} AS DOUBLE)",
            "<=",
        )
    raise ValueError(f"unknown expectation kind {e.kind!r}")


def expectations_sql(
    dialect: str, table: str, expectations: Sequence[Expectation]
) -> str:
    """All declared metrics compile into ONE aggregate row (a single
    table scan regardless of expectation count — Deequ's batched-metric
    design), then fan out to one report row per expectation from that
    1-row frame.  Every metric is exact-count-derived, so the report is
    cross-engine hashable.  Dialect differences: epoch extraction only."""
    aggs, rows = [], []
    for i, e in enumerate(expectations):
        metric, thr, op = _metric_expr(dialect, e)
        aggs.append(f"{metric} AS m{i}")
        fields = [
            ("expectation", f"'{e.name}'"),
            ("kind", f"'{e.kind}'"),
            ("metric", f"m{i}"),
            ("threshold", thr),
            # COALESCE(..., FALSE): a metric that is still NULL (freshness
            # over an empty table — MAX of nothing) must FAIL the gate, not
            # evaporate into a NULL verdict a passed=false filter skips.
            ("passed", f"COALESCE((m{i} {op} {thr}), FALSE)"),
        ]
        if dialect == "spark":
            body = ", ".join(f"'{n}', {v}" for n, v in fields)
            rows.append(f"named_struct({body})")
        else:
            body = ", ".join(f"{n} := {v}" for n, v in fields)
            rows.append(f"struct_pack({body})")
    # one report row per expectation fanned out FROM THE ONE AGG ROW via
    # explode/unnest — a UNION ALL of per-expectation selects reads nicer
    # but Catalyst inlines the agg CTE into every branch, re-scanning the
    # source once per expectation (observed in the optimized plan); the
    # struct-array fan-out keeps exactly one Aggregate over one scan.
    arr = ", ".join(rows)
    if dialect == "spark":
        return f"""
    WITH agg AS (SELECT {", ".join(aggs)} FROM {table})
    SELECT r.expectation, r.kind, r.metric, r.threshold, r.passed
    FROM (SELECT explode(array({arr})) AS r FROM agg)
    """
    return f"""
    WITH agg AS (SELECT {", ".join(aggs)} FROM {table})
    SELECT r.expectation, r.kind, r.metric, r.threshold, r.passed
    FROM (SELECT unnest([{arr}]) AS r FROM agg)
    """


def check_expectations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """Evaluate the declared expectations; one result row per
    expectation: (expectation, kind, metric, threshold, passed)."""
    if not expectations:
        raise ValueError("check_expectations needs at least one expectation")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(
            f"duplicate expectation names {dupes}: same-column/same-kind "
            "expectations need an explicit name= to keep report rows "
            "distinguishable"
        )
    cols = set(df.columns)
    for e in expectations:
        if e.col is not None and e.col not in cols:
            raise ColumnNotFoundError(f"column {e.col!r} not in {df.columns}")
    df.createOrReplaceTempView("_ts_dq_in")
    return df.sparkSession.sql(expectations_sql("spark", "_ts_dq_in", expectations))


def foreign_key_orphans(
    child: DataFrame, parent: DataFrame, *, child_col: str, parent_col: str
) -> DataFrame:
    """Referential-integrity probe: child rows whose key has no parent —
    a broadcast LEFT ANTI join (the parent key set is the small side in
    every star schema); returns (orphan_count, child_count, orphan_frac)."""
    from pyspark.sql import functions as F

    if child_col not in child.columns:
        raise ColumnNotFoundError(f"column {child_col!r} not in {child.columns}")
    if parent_col not in parent.columns:
        raise ColumnNotFoundError(f"column {parent_col!r} not in {parent.columns}")
    orphans = child.join(
        F.broadcast(parent.select(parent_col).distinct()),
        child[child_col] == parent[parent_col],
        "left_anti",
    )
    n_orphan = orphans.count()
    n_child = child.count()
    return child.sparkSession.createDataFrame(
        [(n_orphan, n_child, float(n_orphan) / max(n_child, 1))],
        "orphan_count long, child_count long, orphan_frac double",
    )


def streaming_contract(
    stream_df: DataFrame,
    expectations: Sequence[Expectation],
    *,
    query_name: str,
) -> DataFrame:
    """Continuous data-contract monitoring: the same declared
    expectations evaluated INCREMENTALLY over a stream — every metric is
    one slot of a global streaming aggregation (complete output mode),
    so the monitor's state is a single row regardless of stream volume,
    and at drain the report equals the batch contract over everything
    that arrived (the equivalence the registered query's oracle checks).

    ``unique`` expectations are rejected: exact COUNT(DISTINCT) is not
    streamable (unbounded state) — that is precisely the job of the
    cardinality sketch (operators/sketch, streaming form); run key-
    uniqueness monitoring through it and accept the estimate, or check
    exact uniqueness in the batch contract.
    """
    from pyspark.sql import functions as F

    from ..streaming.lag_stream import run_stream_to_df

    if not expectations:
        raise ValueError("streaming_contract needs at least one expectation")
    for e in expectations:
        if e.kind == "unique":
            raise ValueError(
                "unique expectations are not streamable (exact COUNT(DISTINCT) "
                "needs unbounded state) — use the streaming cardinality sketch "
                "or the batch contract"
            )
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError("duplicate expectation names")
    cols = set(stream_df.columns)
    for e in expectations:
        if e.col is not None and e.col not in cols:
            raise ColumnNotFoundError(f"column {e.col!r} not in {stream_df.columns}")

    metrics = []
    rows = []
    for i, e in enumerate(expectations):
        metric, thr, op = _metric_expr("spark", e)
        metrics.append(F.expr(metric).alias(f"m{i}"))
        fields = ", ".join(
            [
                f"'expectation', '{e.name}'",
                f"'kind', '{e.kind}'",
                f"'metric', m{i}",
                f"'threshold', {thr}",
                f"'passed', COALESCE((m{i} {op} {thr}), FALSE)",
            ]
        )
        rows.append(f"named_struct({fields})")
    agg_stream = stream_df.agg(*metrics)
    drained = run_stream_to_df(agg_stream, query_name, output_mode="complete")
    arr = ", ".join(rows)
    return drained.selectExpr(f"explode(array({arr})) AS r").select(
        "r.expectation", "r.kind", "r.metric", "r.threshold", "r.passed"
    )


def _drift_bin_case(bins: int, v: str, vmin: str, vmax: str) -> str:
    """The shared bin expression (batch SQL, DuckDB oracle, and the
    streaming twin all render THIS text — structural equivalence, the
    _qc_exprs rule): ``bins`` fixed-width cells over the reference
    envelope, out-of-range values clamped into the edge bins, constant
    envelope collapsed to bin 0."""
    from ._num import dec_to_double

    width = f"({dec_to_double(f'({vmax} - {vmin})')} / {bins}.0)"
    ratio = f"({dec_to_double(f'({v} - {vmin})')} / {width})"
    return (
        f"CASE WHEN {vmax} = {vmin} THEN 0 "
        f"ELSE LEAST(GREATEST(CAST(FLOOR({ratio}) AS INT), 0), {bins - 1}) END"
    )


def _drift_combine_sql(counts: str, group_col: str, round_to: int) -> str:
    """Final drift arithmetic over a ``counts`` relation of
    (k, bin, c_ref, c_cur) — shared verbatim by the batch statement and
    the streaming twin's post-drain combine.  Returns a CTE-list +
    SELECT fragment (no leading WITH) so callers splice it into their
    own WITH chain."""
    from ._num import dec_to_double, round_double

    p = "(CAST(c_ref AS DOUBLE) / CAST(n_ref AS DOUBLE))"
    q = "(CAST(c_cur AS DOUBLE) / CAST(n_cur AS DOUBLE))"
    tv_term = round_double(f"ABS({p} - {q})", 9)
    e_cur = f"(CAST(n_cur AS DOUBLE) * {p})"
    chi_term = round_double(
        f"((CAST(c_cur AS DOUBLE) - {e_cur}) * (CAST(c_cur AS DOUBLE) - {e_cur})"
        f" / {e_cur})",
        9,
    )
    return f"""
    _dn AS (
      SELECT k, CAST(SUM(c_ref) AS BIGINT) AS n_ref,
             CAST(SUM(c_cur) AS BIGINT) AS n_cur
      FROM {counts} GROUP BY k
    ),
    _dt AS (
      SELECT c.k AS k, n.n_ref AS n_ref, n.n_cur AS n_cur,
             CASE WHEN n.n_cur = 0 THEN CAST(NULL AS DECIMAL(20,9))
                  ELSE CAST({tv_term} AS DECIMAL(20,9)) END AS tv_term,
             CASE WHEN n.n_cur = 0 THEN CAST(NULL AS DECIMAL(20,9))
                  WHEN c.c_ref = 0 THEN CAST(0.0 AS DECIMAL(20,9))
                  ELSE CAST({chi_term} AS DECIMAL(20,9)) END AS chi_term
      FROM {counts} c JOIN _dn n ON c.k = n.k
    )
    SELECT k AS {group_col}, n_ref, n_cur,
           {round_double(f"(0.5 * {dec_to_double('SUM(tv_term)')})", round_to)}
             AS tv_distance,
           {round_double(dec_to_double('SUM(chi_term)'), round_to)}
             AS chisq_drift
    FROM _dt GROUP BY k, n_ref, n_cur
    """


def distribution_drift_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> str:
    """Distribution-drift monitor per group: total-variation distance
    and the chi-square drift statistic between the REFERENCE window
    (rows before ``split_date``) and the CURRENT window (rows at/after)
    — the companion of the expectation contracts above for the question
    they can't answer: the column is still valid, but is it still
    *distributed* like the data the model was trained on?

    PSI — the industry habit — needs ln(); under the engine-wide
    no-transcendentals rule the monitor reports the two rational
    measures that bound the same decision: TV = ½·Σ|p_i − q_i| (the
    worst-case probability gap any event can see) and
    χ² = Σ (c_cur − n_cur·p_i)²/(n_cur·p_i) over reference-supported
    bins (the test-statistic form; mass on NOVEL bins is invisible to
    χ² by construction and shows up in TV via the clamped edge bins).

    Binning is ``bins`` fixed-width cells over the REFERENCE min/max
    per group (exact decimals); current rows outside the reference
    range clamp into the edge bins — exactly where range drift should
    land.  A constant reference (min = max) puts all mass in bin 0.
    Groups with no reference rows drop out (nothing to compare
    against); a group with no current rows reports NULL drift
    (undefined, not zero).

    Determinism: bin ids come from one shared double expression over
    exact-decimal differences; p/q are exact-integer divisions; each
    per-bin term is round_double'd then DECIMAL-quantized so the ≤bins
    -row sums are exact — order-independent on both engines.  Shape:
    one groupBy for the reference envelope (broadcast-sized, |groups|
    rows), one (group, bin) count shuffle, one per-group reduce.
    """
    on_or_after = f"(CAST({time_col} AS DATE) >= DATE '{split_date}')"
    vdec = f"CAST({value_col} AS DECIMAL(18,6))"
    bin_expr = _drift_bin_case(bins, "b.v", "m.vmin", "m.vmax")
    return f"""
    WITH _db AS (
      SELECT {group_col} AS k,
             CASE WHEN {on_or_after} THEN 1 ELSE 0 END AS cur,
             {vdec} AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    _dmm AS (
      SELECT k, MIN(v) AS vmin, MAX(v) AS vmax
      FROM _db WHERE cur = 0 GROUP BY k
    ),
    _dbin AS (
      SELECT b.k AS k, b.cur AS cur, {bin_expr} AS bin
      FROM _db b JOIN _dmm m ON b.k = m.k
    ),
    _dc AS (
      SELECT k, bin,
             CAST(SUM(1 - cur) AS BIGINT) AS c_ref,
             CAST(SUM(cur) AS BIGINT) AS c_cur
      FROM _dbin GROUP BY k, bin
    ),
    {_drift_combine_sql('_dc', group_col, round_to).strip()}
    """


def distribution_drift(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`distribution_drift_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    assert_time_dtype(df, time_col)
    view = "_ts_drift_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        distribution_drift_sql(
            _S, view, value_col, time_col, group_col, split_date,
            bins=bins, round_to=round_to,
        )
    )


def streaming_distribution_drift(
    stream_df: DataFrame,
    static_df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    bins: int = 10,
    round_to: int = 6,
    query_name: str,
) -> DataFrame:
    """Continuous form of :func:`distribution_drift`: the CURRENT window
    arrives as a stream while the reference envelope and counts come
    from the static frame the monitor was armed with.  Per micro-batch
    the only state is the (group, bin) count aggregation (complete
    mode, ≤ |groups|·bins rows — bounded regardless of stream volume);
    at drain the combine over (static reference counts ⟗ drained
    current counts) must equal the batch monitor over everything that
    arrived, which IS the registered query's oracle.

    Structural equivalence, not re-derivation: the bin expression and
    the final combine are the SAME rendered SQL text as the batch
    statement (`_drift_bin_case` / `_drift_combine_sql` — the
    _qc_exprs rule), and the stream side derives its session from the
    input frame (the foreachBatch-clone discipline).
    """
    from pyspark.sql import functions as F

    for c in (value_col, time_col, group_col):
        for frame, tag in ((stream_df, "stream"), (static_df, "static")):
            if c not in frame.columns:
                raise ColumnNotFoundError(
                    f"column {c!r} not in {tag} frame {frame.columns}"
                )
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    spark = static_df.sparkSession

    on_or_after = f"(CAST({time_col} AS DATE) >= DATE '{split_date}')"
    vdec = f"CAST({value_col} AS DECIMAL(18,6))"

    # reference side (batch): envelope + (k, bin) counts
    sview = "_ts_sdrift_static"
    static_df.createOrReplaceTempView(sview)
    env = spark.sql(f"""
        SELECT {group_col} AS k, MIN({vdec}) AS vmin, MAX({vdec}) AS vmax
        FROM {sview}
        WHERE {value_col} IS NOT NULL AND NOT {on_or_after}
        GROUP BY {group_col}
    """)
    env.createOrReplaceTempView("_ts_sdrift_env")
    ref_counts = spark.sql(f"""
        SELECT b.k AS k, {_drift_bin_case(bins, 'b.v', 'm.vmin', 'm.vmax')} AS bin,
               CAST(COUNT(*) AS BIGINT) AS c_ref
        FROM (
          SELECT {group_col} AS k, {vdec} AS v FROM {sview}
          WHERE {value_col} IS NOT NULL AND NOT {on_or_after}
        ) b JOIN _ts_sdrift_env m ON b.k = m.k
        GROUP BY b.k, {_drift_bin_case(bins, 'b.v', 'm.vmin', 'm.vmax')}
    """)

    # current side (stream): filter, stream-static join the envelope,
    # bin with the SAME expression text, count in complete mode
    cur = (
        stream_df.where(F.expr(f"{value_col} IS NOT NULL AND {on_or_after}"))
        .selectExpr(f"{group_col} AS k", f"{vdec} AS v")
        .alias("b")
        .join(env.alias("m"), "k")
        .selectExpr("k", f"{_drift_bin_case(bins, 'b.v', 'm.vmin', 'm.vmax')} AS bin")
        .groupBy("k", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c_cur"))
    )
    from ..streaming.lag_stream import run_stream_to_df

    drained = run_stream_to_df(cur, query_name, output_mode="complete")

    # combine: full outer join of the two count relations, then the
    # shared final arithmetic
    ref_counts.createOrReplaceTempView("_ts_sdrift_ref")
    drained.createOrReplaceTempView("_ts_sdrift_cur")
    return spark.sql(f"""
    WITH _dc AS (
      SELECT COALESCE(r.k, c.k) AS k, COALESCE(r.bin, c.bin) AS bin,
             COALESCE(r.c_ref, 0) AS c_ref, COALESCE(c.c_cur, 0) AS c_cur
      FROM _ts_sdrift_ref r
      FULL OUTER JOIN _ts_sdrift_cur c ON r.k = c.k AND r.bin = c.bin
    ),
    {_drift_combine_sql('_dc', group_col, round_to).strip()}
    """)


def benford_screen_sql(d, table: str, value_col: str, group_col: str,
                       *, round_to: int = 6,
                       staged_counts: str | None = None) -> str:
    """Benford first-digit screen per group: observed leading-digit
    distribution of ``value_col`` vs the Benford expectation, reported
    as the χ² statistic (8 df) and total-variation distance, with a
    flag at the 0.05 critical value — the classic forensic test for
    fabricated or truncated numeric columns, here as a data-quality
    monitor next to distribution_drift (which needs a reference WINDOW;
    Benford needs only the law).

    Determinism: log10 appears ONLY as nine Python-computed literals
    (the engine's transcendental discipline); leading digit extraction
    FLOORs before the BIGINT cast (Spark truncates decimal→int casts,
    DuckDB rounds — FLOOR first removes the dialect divergence); every
    χ²/TV term is one double expression over exact BIGINT counts and a
    literal, quantized before the exact-decimal 9-term sum.  Absent
    digits contribute their full expected mass via the digit-relation
    LEFT JOIN (a group missing digit d still pays (n·p_d)² / n·p_d).
    Rows with value < 1 are excluded (no leading digit in Benford's
    domain).  Plan: one (group, digit) groupBy, then the ≤9-row-per-
    group reduce; the digit relation is a 9-row literal VALUES.  The
    counts CTE is referenced twice (group totals + the digit LEFT
    JOIN), so the engine-wide staging rule applies — the Spark front
    door stages it (``staged_counts``; unstaged, Catalyst re-plans the
    table scan per reference), the oracle keeps the inline text.
    """
    import math

    from ._num import dec_to_double, round_double

    body = ", ".join(
        f"({dig}, CAST({math.log10(1.0 + 1.0 / dig)!r} AS DOUBLE))"
        for dig in range(1, 10)
    )
    if d.name == "spark":
        dvals = f"SELECT * FROM VALUES {body} AS _bfd(dig, p)"
    else:
        dvals = f"SELECT * FROM (VALUES {body}) AS _bfd(dig, p)"
    digit = (
        f"CAST(substr(CAST(CAST(FLOOR({value_col}) AS BIGINT) AS STRING), 1, 1)"
        f" AS INT)"
    )
    exp = "(CAST(g.n AS DOUBLE) * d.p)"
    chi_term = f"(((CAST(COALESCE(c.n_d, 0) AS DOUBLE) - {exp}) * (CAST(COALESCE(c.n_d, 0) AS DOUBLE) - {exp})) / {exp})"
    tv_term = f"ABS((CAST(COALESCE(c.n_d, 0) AS DOUBLE) / CAST(g.n AS DOUBLE)) - d.p)"
    q9 = lambda e: f"CAST({round_double(e, 9)} AS DECIMAL(27,9))"  # noqa: E731
    counts = (
        f"SELECT grp, dig, n_d FROM {staged_counts}" if staged_counts
        else f"""SELECT {group_col} AS grp, {digit} AS dig,
             CAST(COUNT(*) AS BIGINT) AS n_d
      FROM (SELECT {group_col}, {value_col} FROM {table}
            WHERE {value_col} >= 1) _bfx
      GROUP BY {group_col}, {digit}"""
    )
    chi2 = dec_to_double("chi_s")
    tv = f"({dec_to_double('tv_s')} / 2.0)"
    return f"""
    WITH _bfc AS (
      {counts}
    ),
    _bfg AS (
      SELECT grp, CAST(SUM(n_d) AS BIGINT) AS n FROM _bfc GROUP BY grp
    ),
    _bft AS (
      SELECT g.grp AS grp, g.n AS n,
             CAST(SUM({q9(chi_term)}) AS DECIMAL(38,9)) AS chi_s,
             CAST(SUM({q9(tv_term)}) AS DECIMAL(38,9)) AS tv_s
      FROM _bfg g
      CROSS JOIN ({dvals}) d
      LEFT JOIN _bfc c ON c.grp = g.grp AND c.dig = d.dig
      GROUP BY g.grp, g.n
    )
    SELECT grp AS {group_col}, n,
           {round_double(chi2, round_to)} AS chi2,
           {round_double(tv, round_to)} AS tv_dist,
           ({dec_to_double('chi_s')} > 15.507) AS flagged
    FROM _bft
    """


def benford_screen(df: DataFrame, value_col: str, group_col: str,
                   *, round_to: int = 6) -> DataFrame:
    """DataFrame front door for :func:`benford_screen_sql` — stages the
    (group, digit) counts frame once (lazy localCheckpoint; group
    totals and the 9-digit LEFT JOIN both reference it)."""
    from ..functions.text_fns import SPARK as _S

    for c in (value_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_benford_in"
    df.createOrReplaceTempView(view)
    inline = benford_screen_sql(_S, view, value_col, group_col,
                                round_to=round_to)
    counts_sel = inline.split("_bfc AS (", 1)[1].split("\n    ),", 1)[0]
    staged = spark.sql(counts_sel).localCheckpoint(eager=False)
    sview = "_ts_benford_counts"
    staged.createOrReplaceTempView(sview)
    return spark.sql(
        benford_screen_sql(_S, view, value_col, group_col,
                           round_to=round_to, staged_counts=sview)
    )


def key_skew_profile_sql(d, table: str, key_col: str,
                         *, round_to: int = 6) -> str:
    """Partition-key SKEW profile: the distribution of per-key row
    counts, bucketed by power of two — the diagnostic to read BEFORE
    choosing a shuffle key at scale (a hot key shows up as mass in the
    top buckets; the salting / hot-key-halo decision in SCALE.md is
    made from exactly this table).  Per bucket ⌊log₂(count)⌋: how many
    keys land there, how many rows they carry, the min/max per-key
    count, and the bucket's share of all rows.

    Determinism: ⌊log₂ n⌋ is computed as ``LENGTH(bin(n)) − 1`` — an
    exact INTEGER string-length identity on both engines, never a
    floating log (the transcendental ban); counts are exact BIGINTs;
    the share is one IEEE division against a window total.

    Scale: one shuffle on the key (the per-key count — partial-
    aggregated map-side), then a ≤64-row bucket reduce; the window
    total runs over the ≤64-row bucket relation (a scalar-state final
    stage, not a data-volume SinglePartition).
    """
    from ._num import round_double

    return f"""
    WITH _skc AS (
      SELECT {key_col} AS k, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {table} GROUP BY {key_col}
    ),
    _skb AS (
      SELECT CAST(LENGTH(bin(cnt)) - 1 AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(MIN(cnt) AS BIGINT) AS min_cnt,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM _skc GROUP BY CAST(LENGTH(bin(cnt)) - 1 AS INT)
    ),
    _skt AS (
      SELECT bucket, n_keys, n_rows, min_cnt, max_cnt,
             CAST(SUM(n_rows) OVER () AS BIGINT) AS total_rows
      FROM _skb
    )
    SELECT bucket, n_keys, n_rows, min_cnt, max_cnt,
           {round_double('(CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE))', round_to)} AS rows_share
    FROM _skt
    ORDER BY bucket
    """


def key_skew_profile(df: DataFrame, key_col: str,
                     *, round_to: int = 6) -> DataFrame:
    """DataFrame front door for :func:`key_skew_profile_sql` (every CTE
    referenced once — no staging needed)."""
    from ..functions.text_fns import SPARK as _S

    if key_col not in df.columns:
        raise ColumnNotFoundError(f"column {key_col!r} not in {df.columns}")
    view = "_ts_skew_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        key_skew_profile_sql(_S, view, key_col, round_to=round_to)
    )


_QQ_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9)


def _qq_tail(group_col: str, flag_shift: float, round_to: int) -> str:
    """The pivot + shift + flag tail over a ``_qqs`` relation
    ({group_col}, is_base, n, est_p10..est_p90) — shared VERBATIM by
    the batch statement and the streaming twin's drain combine (the
    _drift_combine_sql discipline), so drain ≡ batch is structural."""
    from ._num import round_double

    names = [f"est_p{str(p).replace('0.', '')}" for p in _QQ_PROBS]
    picks = []
    for nm in names:
        tag = nm.replace("est_", "")
        picks.append(f"MAX(CASE WHEN is_base THEN {nm} END) AS base_{tag}")
        picks.append(f"MAX(CASE WHEN NOT is_base THEN {nm} END) AS cur_{tag}")
    shift_cols = ", ".join(
        f"{round_double(f'(cur_{nm[4:]} - base_{nm[4:]})', round_to)} AS shift_{nm[4:]}"
        for nm in names
    )
    abs_terms = ", ".join(f"ABS(cur_{nm[4:]} - base_{nm[4:]})" for nm in names)
    return f"""
    _qqp AS (
      SELECT {group_col},
             CAST(MAX(CASE WHEN is_base THEN n END) AS BIGINT) AS n_base,
             CAST(MAX(CASE WHEN NOT is_base THEN n END) AS BIGINT) AS n_cur,
             {", ".join(picks)}
      FROM _qqs GROUP BY {group_col}
    )
    SELECT {group_col}, n_base, n_cur,
           {shift_cols},
           (GREATEST({abs_terms}) > {flag_shift!r}) AS flagged
    FROM _qqp
    ORDER BY {group_col}
    """


def quantile_drift_sql(d, table: str, value_col: str, time_col: str,
                       group_col: str, split_date: str,
                       *, lo: float = 0.0, hi: float = 1000.0,
                       bins: int = 500, flag_shift: float = 50.0,
                       round_to: int = 4) -> str:
    """Quantile (QQ) drift monitor: per group, the p10/p25/p50/p75/p90
    sketch estimates BEFORE vs FROM ``split_date``, their shifts, and a
    flag when any quantile moved more than ``flag_shift`` — the
    LOCATION/SCALE half of the drift family (distribution_drift's
    TV/χ² sees mass moved between bins; a pure median shift inside wide
    bins can hide from it, and conversely a reshuffle that keeps every
    quantile fixed hides from this one — run both, which is why they
    share a module).

    Mechanics: ONE (group, side, bin) histogram pass over the fixed
    [lo, hi) domain (the mergeable sketch — exact decimal crossing
    decisions, double interpolation, histogram_quantiles machinery
    verbatim via its SQL builder's group_by hook), then the two sides
    PIVOT onto one row per group with MAX(CASE) — no self-join, no
    staging hazard (the sketch relation is referenced once).

    Scale: the sketch is the scale answer (mergeable bin counts,
    partial aggregation); the pivot runs on 2 rows per group.
    """
    from .sketch import histogram_quantiles_sql as _hqs

    side = (f"(CAST({time_col} AS DATE) < DATE '{split_date}')")
    src = (f"(SELECT {group_col}, {value_col}, {side} AS is_base "
           f"FROM {table} WHERE {value_col} IS NOT NULL) _qqd0")
    inner = _hqs(src, value_col, lo=lo, hi=hi, bins=bins, probs=_QQ_PROBS,
                 group_by=(group_col, "is_base"))
    return f"""
    WITH _qqs AS (
      {inner}
    ),
    {_qq_tail(group_col, flag_shift, round_to).strip()}
    """


def quantile_drift(df: DataFrame, value_col: str, time_col: str,
                   group_col: str, split_date: str,
                   *, lo: float = 0.0, hi: float = 1000.0,
                   bins: int = 500, flag_shift: float = 50.0,
                   round_to: int = 4) -> DataFrame:
    """DataFrame front door for :func:`quantile_drift_sql` (single
    sketch reference — no staging needed)."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_qqd_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        quantile_drift_sql(_S, view, value_col, time_col, group_col,
                           split_date, lo=lo, hi=hi, bins=bins,
                           flag_shift=flag_shift, round_to=round_to)
    )


def streaming_quantile_drift(
    stream_df: DataFrame,
    static_df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 500,
    flag_shift: float = 50.0,
    round_to: int = 4,
    query_name: str,
) -> DataFrame:
    """Continuous form of :func:`quantile_drift` — the
    streaming_distribution_drift recipe applied to the quantile
    sketch's bin counts: the CURRENT window arrives as a stream whose
    per-micro-batch state is the bounded (group, bin) count aggregation
    (complete mode, ≤ |groups|·bins rows regardless of stream volume);
    the BASE side's bin counts come from the static frame the monitor
    was armed with.  At drain, base ∪ drained-current counts feed the
    histogram sketch's merge entry point
    (``histogram_quantiles_sql(staged_counts=...)``) and the SAME
    pivot/shift/flag tail as the batch statement (``_qq_tail`` — the
    _qc_exprs shared-text rule), so drain ≡ batch over everything that
    arrived is structural, and the registered query's oracle IS the
    batch statement.

    The stream side bins values with the SAME rendered bin expression
    (``_hq_parts`` text) before aggregating, and derives its session
    from the input frame (the foreachBatch-clone discipline).
    """
    from pyspark.sql import functions as F

    from .sketch import _hq_parts, histogram_quantiles_sql as _hqs

    for c in (value_col, time_col, group_col):
        for frame, tag in ((stream_df, "stream"), (static_df, "static")):
            if c not in frame.columns:
                raise ColumnNotFoundError(
                    f"column {c!r} not in {tag} frame {frame.columns}"
                )
    spark = static_df.sparkSession
    before = f"(CAST({time_col} AS DATE) < DATE '{split_date}')"
    bin_expr, _ = _hq_parts(value_col, lo, hi, bins)

    # base side (batch): (k, is_base=true, _bin, _c)
    sview = "_ts_sqq_static"
    static_df.createOrReplaceTempView(sview)
    base_counts = spark.sql(f"""
        SELECT {group_col} AS k, {bin_expr} AS _bin,
               CAST(COUNT(*) AS BIGINT) AS _c
        FROM {sview}
        WHERE {value_col} IS NOT NULL AND {before}
        GROUP BY {group_col}, {bin_expr}
    """)

    # current side (stream): same bin text, bounded complete-mode counts
    cur = (
        stream_df.where(F.expr(f"{value_col} IS NOT NULL AND NOT {before}"))
        .selectExpr(f"{group_col} AS k", f"{bin_expr} AS _bin")
        .groupBy("k", "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    from ..streaming.lag_stream import run_stream_to_df

    drained = run_stream_to_df(cur, query_name, output_mode="complete")

    # merge: union the two tagged count relations, then the shared
    # sketch tail + pivot tail (both rendered text, not re-derivations)
    base_counts.createOrReplaceTempView("_ts_sqq_base")
    drained.createOrReplaceTempView("_ts_sqq_cur")
    counts_union = (
        "(SELECT k AS _qqk, TRUE AS is_base, _bin, _c FROM _ts_sqq_base"
        " UNION ALL "
        "SELECT k AS _qqk, FALSE AS is_base, _bin, _c FROM _ts_sqq_cur) _sqqu"
    )
    sketch = _hqs("_ignored_", value_col, lo=lo, hi=hi, bins=bins,
                  probs=_QQ_PROBS, group_by=("_qqk", "is_base"),
                  staged_counts=counts_union)
    # the tail names columns by the caller's group_col; alias in _qqs
    return spark.sql(f"""
    WITH _qqs AS (
      SELECT _qqk AS {group_col}, is_base, n,
             {", ".join(f"est_p{str(p).replace('0.', '')}" for p in _QQ_PROBS)}
      FROM ({sketch}) _sqqs
    ),
    {_qq_tail(group_col, flag_shift, round_to).strip()}
    """)


def _ks_tail(group_col: str, round_to: int) -> str:
    """The cumulative-ECDF / max-gap / decision tail over a ``_ks0``
    relation (g, v, c_ref, c_cur) — shared VERBATIM by the exact form
    (:func:`ks_test_sql`, v = raw value), the binned form
    (:func:`ks_test_binned_sql`, v = bin index), and the streaming
    twin's drain combine (the _qq_tail shared-text discipline), so
    every KS spelling computes the identical IEEE tree."""
    from ._num import round_double

    rd = lambda e: round_double(e, round_to)  # noqa: E731
    ecdf_gap = (
        "ABS((CAST(cum_ref AS DOUBLE) / CAST(n_ref AS DOUBLE))"
        " - (CAST(cum_cur AS DOUBLE) / CAST(n_cur AS DOUBLE)))"
    )
    return f"""_ks1 AS (
      SELECT g, v,
             SUM(c_ref) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ref,
             SUM(c_cur) OVER (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cur,
             SUM(c_ref) OVER (PARTITION BY g) AS n_ref,
             SUM(c_cur) OVER (PARTITION BY g) AS n_cur
      FROM _ks0
    ),
    _ks2 AS (
      SELECT g,
             CAST(MAX(n_ref) AS BIGINT) AS n_ref,
             CAST(MAX(n_cur) AS BIGINT) AS n_cur,
             MAX({ecdf_gap}) AS d_stat
      FROM _ks1
      WHERE n_ref > 0 AND n_cur > 0
      GROUP BY g
    )
    SELECT g AS {group_col}, n_ref, n_cur,
           {rd('d_stat')} AS d_stat,
           {rd('(1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE) '
               '/ CAST(n_ref * n_cur AS DOUBLE)))')} AS d_crit,
           d_stat > (1.358 * sqrt(CAST(n_ref + n_cur AS DOUBLE)
                     / CAST(n_ref * n_cur AS DOUBLE))) AS drifted
    FROM _ks2"""


def ks_test_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    round_to: int = 6,
) -> str:
    """Two-sample Kolmogorov-Smirnov drift test per group: D = the
    maximum gap between the reference (before ``split_date``) and
    current empirical CDFs of ``value_col`` — the EXACT, binning-free
    member of the drift family (TV/χ² quantize into bins and can hide
    a shift smaller than a bin; the quantile monitor watches five fixed
    points; D sees the supremum over EVERY observed value).  The 5%
    decision compares D to the large-sample critical value
    c(α)·√((n₁+n₂)/(n₁·n₂)) with c(0.05) = 1.358 (a literal — the
    Smirnov asymptotic constant, no transcendental evaluated here).

    Determinism: the ECDFs are cumulative EXACT BIGINT counts over the
    pooled distinct values (grouping on raw double bits — a
    deterministic equality both engines share); each ECDF value is one
    IEEE division; the gap is one subtract + ABS, and MAX over doubles
    is order-free.  √ is IEEE-exact.

    Scale shape: one (group, value) partial-aggregated exchange
    collapses duplicates BEFORE the window (the percentile_rank
    posture); the cumulative counts and the final MAX ride ONE window
    exchange on the group key; output is |groups| rows.
    """
    split = f"TIMESTAMP '{split_date} 00:00:00'"
    return f"""
    WITH _ks0 AS (
      SELECT {group_col} AS g, {value_col} AS v,
             CAST(SUM(CASE WHEN {time_col} < {split} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_ref,
             CAST(SUM(CASE WHEN {time_col} >= {split} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_cur
      FROM {table}
      GROUP BY {group_col}, {value_col}
    ),
    {_ks_tail(group_col, round_to)}
    """


def ks_test(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`ks_test_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_ks_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        ks_test_sql(_S, view, value_col, time_col, group_col, split_date,
                    round_to=round_to)
    )


def ks_test_binned_sql(
    d,
    table: str,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 500,
    round_to: int = 6,
) -> str:
    """QUANTIZED two-sample KS drift test: the max ECDF gap evaluated
    at the ``bins`` right edges of a fixed [lo, hi) histogram instead
    of at every observed value — the bounded-state member of the KS
    pair, and the batch statement the streaming twin
    (:func:`streaming_ks_test`) drains into (its oracle).

    Contract vs the exact form (:func:`ks_test_sql`) — the quantized
    statistic is a LOWER BOUND: D̂ = max over bin edges ≤ D = sup over
    all values (the sup ranges over a subset of thresholds), so

    * any drift D̂ detects is REAL (no new false positives — the
      decision threshold is unchanged and the test only gets more
      conservative);
    * drift concentrated STRICTLY INSIDE one bin is invisible: D̂
      underestimates D by at most the larger side's within-bin ECDF
      mass, so detection granularity is the bin width
      (hi − lo)/bins — 2 value units at the defaults.  Size bins to
      the shift you must catch.

    Same _ks0-shape head as the exact form with v = the bin index
    (the histogram sketch's clamped-bin expression, _hq_parts text);
    the cumulative/max/decision tail is the SHARED ``_ks_tail`` —
    identical IEEE tree.  State/shape: the (group, bin) relation is
    ≤ |groups|·bins rows regardless of input volume (the mergeable-
    sketch posture), partial-aggregated map-side; one window exchange
    on the group key; |groups| rows out.
    """
    from .sketch import _hq_parts

    split = f"TIMESTAMP '{split_date} 00:00:00'"
    bin_expr, _ = _hq_parts(value_col, lo, hi, bins)
    return f"""
    WITH _ks0 AS (
      SELECT {group_col} AS g, {bin_expr} AS v,
             CAST(SUM(CASE WHEN {time_col} < {split} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_ref,
             CAST(SUM(CASE WHEN {time_col} >= {split} THEN 1 ELSE 0 END)
                  AS BIGINT) AS c_cur
      FROM {table}
      WHERE {value_col} IS NOT NULL
      GROUP BY {group_col}, {bin_expr}
    ),
    {_ks_tail(group_col, round_to)}
    """


def ks_test_binned(
    df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 500,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`ks_test_binned_sql`."""
    from ..functions.text_fns import SPARK as _S
    from ._time import assert_time_dtype

    for c in (value_col, time_col, group_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    assert_time_dtype(df, time_col)
    view = "_ts_ksb_in"
    df.createOrReplaceTempView(view)
    return df.sparkSession.sql(
        ks_test_binned_sql(_S, view, value_col, time_col, group_col,
                           split_date, lo=lo, hi=hi, bins=bins,
                           round_to=round_to)
    )


def streaming_ks_test(
    stream_df: DataFrame,
    static_df: DataFrame,
    value_col: str,
    time_col: str,
    group_col: str,
    split_date: str,
    *,
    lo: float = 0.0,
    hi: float = 1000.0,
    bins: int = 500,
    round_to: int = 6,
    query_name: str,
) -> DataFrame:
    """Continuous KS drift — the streaming_quantile_drift recipe
    applied to the KS statistic: the CURRENT window arrives as a
    stream whose per-micro-batch state is the bounded (group, bin)
    count aggregation (complete mode, ≤ |groups|·bins rows regardless
    of stream volume — the contract an exact streaming KS cannot make,
    since a raw-value ECDF's support grows with the stream); the
    REFERENCE side's bin counts come from the static frame the monitor
    was armed with.  At drain, base ∪ drained-current counts rebuild
    the ``_ks0`` relation and the SHARED ``_ks_tail`` computes the
    identical quantized statistic, so drain ≡ batch over everything
    that arrived is structural and the registered query's oracle IS
    :func:`ks_test_binned_sql`'s statement.  What the quantized D̂ can
    and cannot detect is that function's documented contract (lower
    bound; granularity = bin width).

    The stream side bins values with the SAME rendered bin expression
    (``_hq_parts`` text) before aggregating, and derives its session
    from the input frame (the foreachBatch-clone discipline).
    """
    from pyspark.sql import functions as F

    from ._time import assert_time_dtype
    from .sketch import _hq_parts

    for c in (value_col, time_col, group_col):
        for frame, tag in ((stream_df, "stream"), (static_df, "static")):
            if c not in frame.columns:
                raise ColumnNotFoundError(
                    f"column {c!r} not in {tag} frame {frame.columns}"
                )
    # same contract as ks_test_binned's front door: a numeric
    # (epoch-long) time column fails loudly on BOTH sides (ADVICE r12)
    assert_time_dtype(stream_df, time_col)
    assert_time_dtype(static_df, time_col)
    spark = static_df.sparkSession
    before = f"({time_col} < TIMESTAMP '{split_date} 00:00:00')"
    bin_expr, _ = _hq_parts(value_col, lo, hi, bins)

    # reference side (batch): (k, _bin, _c)
    sview = "_ts_sks_static"
    static_df.createOrReplaceTempView(sview)
    base_counts = spark.sql(f"""
        SELECT {group_col} AS k, {bin_expr} AS _bin,
               CAST(COUNT(*) AS BIGINT) AS _c
        FROM {sview}
        WHERE {value_col} IS NOT NULL AND {before}
        GROUP BY {group_col}, {bin_expr}
    """)

    # current side (stream): same bin text, bounded complete-mode counts
    cur = (
        stream_df.where(F.expr(f"{value_col} IS NOT NULL AND NOT {before}"))
        .selectExpr(f"{group_col} AS k", f"{bin_expr} AS _bin")
        .groupBy("k", "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    from ..streaming.lag_stream import run_stream_to_df

    drained = run_stream_to_df(cur, query_name, output_mode="complete")

    # merge: the two tagged count relations rebuild _ks0, then the
    # shared tail (rendered text, not a re-derivation)
    base_counts.createOrReplaceTempView("_ts_sks_base")
    drained.createOrReplaceTempView("_ts_sks_cur")
    return spark.sql(f"""
    WITH _ks0 AS (
      SELECT COALESCE(b.k, c.k) AS g,
             COALESCE(b._bin, c._bin) AS v,
             CAST(COALESCE(b._c, 0) AS BIGINT) AS c_ref,
             CAST(COALESCE(c._c, 0) AS BIGINT) AS c_cur
      FROM _ts_sks_base b
      FULL OUTER JOIN _ts_sks_cur c ON c.k = b.k AND c._bin = b._bin
    ),
    {_ks_tail(group_col, round_to)}
    """)
