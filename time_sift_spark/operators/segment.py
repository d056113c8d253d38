"""RFM customer segmentation — recency / frequency / monetary scoring.

The canonical marketing-analytics segmentation (Hughes 1994; every CDP
and CRM ships it): each customer gets a 1-5 score per dimension —
how recently they ordered, how often, how much — and the concatenated
segment drives campaign targeting ("555" = champions, "1xx" = lapsed).

Scoring is QUANTILE-based (score 5 = top quintile), and that is where
the scale design lives: the naive NTILE(5) OVER (ORDER BY ...) is a
GLOBAL single-partition sort — the exact cliff the engine's quantile
sketch exists to avoid.  Here each dimension's four quintile cuts come
from the mergeable adaptive-bounds histogram sketch
(``operators/sketch.py`` machinery: one (dim, bin) counter pass,
exact decimal crossing decisions, double interpolation), returned as a
ONE-ROW relation and broadcast back; scores are then pure CASE
comparisons — no global sort anywhere, |customers|-row work end to end.

Determinism: the per-customer aggregate uses exact decimal sums and
integer day diffs; sketch estimates are shared-expression-text doubles
(the histogram_quantiles contract); comparisons of identical doubles
are exact.  Error ≤ one bin of each dimension's range (bins=4096) —
which moves only customers within one bin of a cut, deterministically
on BOTH engines (the same estimate text), so cross-engine hashes hold.

Reference parity note: the reference (Rust lag-matrix crate) has no
segmentation surface; charter extension (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError
from ..functions.text_fns import SPARK, Dialect

__all__ = ["rfm_segments_sql", "rfm_segments"]


def _rfm_cuts(dim_col: str, prefix: str, bins: int) -> str:
    """Four quintile cuts of ``dim_col`` over the ``_rfmb`` relation as
    a one-row CTE body — the adaptive-bounds histogram sketch chain
    (sketch.histogram_quantiles_auto_sql specialized to this module's
    staged base)."""
    from .sketch import _hq_estimate

    bin_expr = (
        f"LEAST(GREATEST(CAST(FLOOR(CASE WHEN _w > 0 THEN "
        f"(CAST({dim_col} AS DOUBLE) - _lo) / _w ELSE 0.0 END) AS INT), 0), {bins - 1})"
    )
    picks = []
    for p in (0.2, 0.4, 0.6, 0.8):
        pred, est = _hq_estimate(p, "_lo", "_w", 9)
        picks.append(
            f"MAX(CASE WHEN {pred} THEN {est} END) AS {prefix}{str(p).replace('0.', 'q')}"
        )
    return f"""
      SELECT {", ".join(picks)} FROM (
        SELECT _bin, _c,
               SUM(_c) OVER (PARTITION BY 1 ORDER BY _bin) AS _cum,
               SUM(_c) OVER (PARTITION BY 1) AS _n,
               _lo, _w
        FROM (
          SELECT _bin, _lo, _w, COUNT(*) AS _c FROM (
            SELECT {bin_expr} AS _bin, _lo, _w
            FROM _rfmb CROSS JOIN (
              SELECT _lo, _hi, ((_hi - _lo) / CAST({bins} AS DOUBLE)) AS _w
              FROM (SELECT CAST(MIN({dim_col}) AS DOUBLE) AS _lo,
                           CAST(MAX({dim_col}) AS DOUBLE) AS _hi FROM _rfmb) _b
            ) _wn
          ) GROUP BY _bin, _lo, _w
        )
      )"""


def rfm_segments_sql(
    d: Dialect,
    table: str,
    cust_col: str,
    date_col: str,
    amount_col: str,
    anchor_date: str,
    *,
    bins: int = 4096,
    staged_base: str | None = None,
) -> str:
    """Per-customer RFM scores: (customer, recency_days, frequency,
    monetary, r_score, f_score, m_score, segment).

    Score convention: 5 = best quintile — LOW recency (bought
    yesterday) and HIGH frequency/monetary.  ``segment`` is the
    concatenated ``r||f||m`` digit string.
    """
    adec = f"CAST({amount_col} AS DECIMAL(27,6))"
    if d.name == "spark":
        rec = f"datediff(DATE '{anchor_date}', MAX(CAST({date_col} AS DATE)))"
    else:
        rec = f"datediff('day', MAX(CAST({date_col} AS DATE)), DATE '{anchor_date}')"

    def _score(col: str, p: str, invert: bool) -> str:
        hits = " + ".join(
            f"(CASE WHEN CAST({col} AS DOUBLE) > {p}{q} THEN 1 ELSE 0 END)"
            for q in ("q2", "q4", "q6", "q8")
        )
        return f"(5 - ({hits}))" if invert else f"(1 + ({hits}))"

    rs = _score("b.rec", "rc.rc", invert=True)
    fs = _score("b.freq", "fc.fc", invert=False)
    ms = _score("b.mon", "mc.mc", invert=False)
    cast = "STRING" if d.name == "spark" else "VARCHAR"
    base = (
        f"SELECT ck, rec, freq, mon FROM {staged_base}" if staged_base
        else f"""SELECT {cust_col} AS ck, {rec} AS rec,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM({adec}) AS DECIMAL(27,6)) AS mon
      FROM {table}
      WHERE CAST({date_col} AS DATE) <= DATE '{anchor_date}'
      GROUP BY {cust_col}"""
    )
    return f"""
    WITH _rfmb AS (
      {base}
    ),
    _rfmrc AS ({_rfm_cuts("rec", "rc", bins)}),
    _rfmfc AS ({_rfm_cuts("freq", "fc", bins)}),
    _rfmmc AS ({_rfm_cuts("mon", "mc", bins)})
    SELECT b.ck AS {cust_col},
           CAST(b.rec AS BIGINT) AS recency_days,
           b.freq AS frequency,
           CAST(b.mon AS DOUBLE) AS monetary,
           {rs} AS r_score, {fs} AS f_score, {ms} AS m_score,
           concat(CAST({rs} AS {cast}), CAST({fs} AS {cast}),
                  CAST({ms} AS {cast})) AS segment
    FROM _rfmb b
    CROSS JOIN _rfmrc rc CROSS JOIN _rfmfc fc CROSS JOIN _rfmmc mc
    """


def rfm_segments(
    df: DataFrame,
    cust_col: str,
    date_col: str,
    amount_col: str,
    anchor_date: str,
    *,
    bins: int = 4096,
) -> DataFrame:
    """DataFrame front door for :func:`rfm_segments_sql` — stages the
    per-customer base ONCE (lazy localCheckpoint): the three dimension
    sketches and the final scoring all reference it, and Catalyst would
    replan the customer aggregate per reference (the engine staging
    rule; 4 references)."""
    for c in (cust_col, date_col, amount_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    view = "_ts_rfm_in"
    df.createOrReplaceTempView(view)
    # stage the per-customer base once (4 references downstream)
    inline = rfm_segments_sql(SPARK, view, cust_col, date_col, amount_col,
                              anchor_date, bins=bins)
    base_body = inline.split("WITH _rfmb AS (", 1)[1].split("\n    ),", 1)[0]
    sview = "_ts_rfm_base"
    spark.sql(base_body).localCheckpoint(eager=False).createOrReplaceTempView(sview)
    return spark.sql(
        rfm_segments_sql(SPARK, view, cust_col, date_col, amount_col,
                         anchor_date, bins=bins, staged_base=sview)
    )
