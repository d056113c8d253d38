"""Market-basket co-occurrence — pairwise item affinity within baskets.

The classic association-mining primitive (Agrawal & Srikant 1994's
frequent-pair stage): for items grouped into baskets (parts within an
order, products within a session), count each unordered item pair's
co-occurrence across baskets and score it with lift
P(ab) / (P(a)·P(b)).  Pure relational algebra: a self-equi-join on the
basket key — the engine's blocked-pairs discipline (MinHash bands, IVF
cells) applied to transactions, never an all-pairs item join.

Determinism: every count is an exact integer; lift is computed as
fl(fl(n_pair·n_baskets) / fl(n_a·n_b)) — both products are exact while
counts stay below 2^26.5 (always, for pair counts at any realistic
basket cap), and the one division is the same IEEE op on both engines.
No quantization needed.

Scale posture (SCALE.md: basket): the pair generation shuffles ONCE on
the basket key; a basket of k items emits C(k,2) pairs, so the
``max_basket`` cap is the skew guard — a degenerate mega-basket (one
user's crawl session with 10^5 items) would otherwise emit 5·10^9 pairs
from a single key.  Capped baskets are DROPPED (the Gopher-rule
convention: filter the pathological row, don't truncate it silently —
truncation would bias which pairs survive).  min_pairs is the df-cap
bounding the output relation under vocabulary skew.

Reference parity note: the reference (Rust lag-matrix crate,
src/lib.rs) has no association-mining surface; charter extension
(SURVEY.md §2.5), the transactional sibling of the sequential
sequence-mining operator (operators/funnel.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..errors import ColumnNotFoundError

__all__ = ["basket_pairs_sql", "basket_pairs"]


def basket_pairs_sql(
    table: str,
    basket_col: str,
    item_col: str,
    *,
    min_pairs: int = 2,
    max_basket: int = 20,
    topk: int | None = 50,
) -> str:
    """Dialect-neutral co-occurrence statement over ``table``.

    Output: (item_a, item_b, n_pairs, lift), ordered
    (n_pairs DESC, item_a, item_b) with an optional deterministic top-k.
    """
    tail = f" LIMIT {topk}" if topk is not None else ""
    return f"""
    WITH raw_items AS (
      SELECT DISTINCT {basket_col} AS bk, {item_col} AS it FROM {table}
    ),
    sized AS (
      SELECT bk, COUNT(*) AS basket_n FROM raw_items GROUP BY bk
    ),
    items AS (
      SELECT r.bk, r.it
      FROM raw_items r JOIN sized s ON s.bk = r.bk
      WHERE s.basket_n <= {max_basket}
    ),
    nb AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM items),
    supp AS (SELECT it, COUNT(*) AS n FROM items GROUP BY it),
    pairs AS (
      SELECT a.it AS item_a, b.it AS item_b, COUNT(*) AS n_pairs
      FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
      GROUP BY a.it, b.it
      HAVING COUNT(*) >= {min_pairs}
    )
    SELECT p.item_a, p.item_b, p.n_pairs,
           CAST(p.n_pairs AS DOUBLE) * CAST(nb.n_baskets AS DOUBLE)
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
    FROM pairs p
    JOIN supp sa ON sa.it = p.item_a
    JOIN supp sb ON sb.it = p.item_b
    CROSS JOIN nb
    ORDER BY p.n_pairs DESC, p.item_a, p.item_b{tail}
    """


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pairs: int = 2,
    max_basket: int = 20,
    topk: int | None = 50,
) -> DataFrame:
    """DataFrame front door — same relational shape as
    :func:`basket_pairs_sql`, but the capped ``items`` relation
    materializes ONCE (``localCheckpoint(eager=False)``, the triangle/
    pagerank convention): Spark inlines a CTE at every reference, and
    ``items`` is referenced four times (pair join ×2, support, basket
    count), which re-ran the dedup+cap subtree 4× (measured 19
    exchanges as one statement vs 7 staged)."""
    from pyspark.sql import functions as F

    for c in (basket_col, item_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    raw = df.selectExpr(f"{basket_col} AS bk", f"{item_col} AS it").distinct()
    w = "COUNT(*) OVER (PARTITION BY bk)"
    items = (
        raw.selectExpr("bk", "it", f"{w} AS basket_n")
        .where(f"basket_n <= {int(max_basket)}")
        .select("bk", "it")
        .localCheckpoint(eager=False)
    )
    nb = items.selectExpr("COUNT(DISTINCT bk) AS n_baskets")
    supp = items.groupBy("it").count().withColumnRenamed("count", "n")
    a = items.selectExpr("bk", "it AS item_a")
    b = items.selectExpr("bk", "it AS item_b")
    pairs = (
        a.join(b, "bk")
        .where("item_a < item_b")
        .groupBy("item_a", "item_b")
        .count()
        .withColumnRenamed("count", "n_pairs")
        .where(f"n_pairs >= {int(min_pairs)}")
    )
    out = (
        pairs.join(supp.selectExpr("it AS item_a", "n AS na"), "item_a")
        .join(supp.selectExpr("it AS item_b", "n AS nb_"), "item_b")
        .crossJoin(nb)
        .selectExpr(
            "item_a", "item_b", "n_pairs",
            "CAST(n_pairs AS DOUBLE) * CAST(n_baskets AS DOUBLE)"
            " / (CAST(na AS DOUBLE) * CAST(nb_ AS DOUBLE)) AS lift",
        )
        .orderBy(F.desc("n_pairs"), "item_a", "item_b")
    )
    return out.limit(topk) if topk is not None else out


def item_similarity_sql(
    table: str,
    basket_col: str,
    item_col: str,
    *,
    min_pairs: int = 2,
    max_basket: int = 20,
    k: int = 3,
    round_to: int = 6,
) -> str:
    """Item-item COSINE similarity from basket co-occurrence — the
    classic neighborhood recommender ("customers who bought X"):
    cos(i, j) = n_ij / (√n_i · √n_j) over binary basket incidence,
    top-``k`` neighbors per item.  Completes the basket family: lift
    measures association strength, cosine gives the normalized
    neighbor ranking a recommender serves.

    Deterministic: counts are exact BIGINTs; the cosine is one fixed
    double expression (SQRT is IEEE-correctly-rounded and allowed);
    each unordered pair's cosine is computed ONCE and reused for both
    orientations, ties break to the smaller neighbor id.  Same
    scale shape as basket_pairs_sql: the C(k,2) basket cap bounds the
    self-join, mega-baskets drop (documented, not silent — the cap is
    the Jaccard-shingle band-cap discipline).
    """
    from ._num import round_double

    cos = (
        "(CAST(p.n_pairs AS DOUBLE) / "
        "(SQRT(CAST(sa.n AS DOUBLE)) * SQRT(CAST(sb.n AS DOUBLE))))"
    )
    return f"""
    WITH raw_items AS (
      SELECT DISTINCT {basket_col} AS bk, {item_col} AS it FROM {table}
    ),
    sized AS (
      SELECT bk, COUNT(*) AS basket_n FROM raw_items GROUP BY bk
    ),
    items AS (
      SELECT r.bk, r.it
      FROM raw_items r JOIN sized s ON s.bk = r.bk
      WHERE s.basket_n <= {max_basket}
    ),
    supp AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY it),
    pairs AS (
      SELECT a.it AS item_a, b.it AS item_b,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM items a JOIN items b ON a.bk = b.bk AND a.it < b.it
      GROUP BY a.it, b.it
      HAVING COUNT(*) >= {min_pairs}
    ),
    scored AS (
      SELECT p.item_a, p.item_b, p.n_pairs,
             {round_double(cos, round_to)} AS cosine_sim
      FROM pairs p
      JOIN supp sa ON sa.it = p.item_a
      JOIN supp sb ON sb.it = p.item_b
    ),
    oriented AS (
      SELECT item_a AS item, item_b AS neighbor, n_pairs, cosine_sim FROM scored
      UNION ALL
      SELECT item_b AS item, item_a AS neighbor, n_pairs, cosine_sim FROM scored
    )
    SELECT item, neighbor, n_pairs, cosine_sim FROM (
      SELECT item, neighbor, n_pairs, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY cosine_sim DESC, neighbor) AS rn
      FROM oriented
    ) _isr WHERE rn <= {k}
    """


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pairs: int = 2,
    max_basket: int = 20,
    k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """DataFrame front door for :func:`item_similarity_sql` — stages
    the capped ``items`` relation (referenced 3×: pair join ×2 +
    support) AND the ``scored`` pair relation (referenced 2× by the
    orientation union), per the engine-wide staging rule (the
    basket_pairs convention)."""
    for c in (basket_col, item_col):
        if c not in df.columns:
            raise ColumnNotFoundError(f"column {c!r} not in {df.columns}")
    spark = df.sparkSession
    raw = df.selectExpr(f"{basket_col} AS bk", f"{item_col} AS it").distinct()
    items = (
        raw.selectExpr("bk", "it", "COUNT(*) OVER (PARTITION BY bk) AS basket_n")
        .where(f"basket_n <= {int(max_basket)}")
        .select("bk", "it")
        .localCheckpoint(eager=False)
    )
    items.createOrReplaceTempView("_ts_isim_items")
    from ._num import round_double

    cos = (
        "(CAST(p.n_pairs AS DOUBLE) / "
        "(SQRT(CAST(sa.n AS DOUBLE)) * SQRT(CAST(sb.n AS DOUBLE))))"
    )
    scored = spark.sql(f"""
      WITH supp AS (
        SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM _ts_isim_items GROUP BY it
      ),
      pairs AS (
        SELECT a.it AS item_a, b.it AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM _ts_isim_items a JOIN _ts_isim_items b
          ON a.bk = b.bk AND a.it < b.it
        GROUP BY a.it, b.it
        HAVING COUNT(*) >= {int(min_pairs)}
      )
      SELECT p.item_a, p.item_b, p.n_pairs,
             {round_double(cos, round_to)} AS cosine_sim
      FROM pairs p
      JOIN supp sa ON sa.it = p.item_a
      JOIN supp sb ON sb.it = p.item_b
    """).localCheckpoint(eager=False)
    scored.createOrReplaceTempView("_ts_isim_scored")
    return spark.sql(f"""
      WITH oriented AS (
        SELECT item_a AS item, item_b AS neighbor, n_pairs, cosine_sim
        FROM _ts_isim_scored
        UNION ALL
        SELECT item_b AS item, item_a AS neighbor, n_pairs, cosine_sim
        FROM _ts_isim_scored
      )
      SELECT item, neighbor, n_pairs, cosine_sim FROM (
        SELECT item, neighbor, n_pairs, cosine_sim,
               ROW_NUMBER() OVER (PARTITION BY item
                                  ORDER BY cosine_sim DESC, neighbor) AS rn
        FROM oriented
      ) _isr WHERE rn <= {int(k)}
    """)
