"""Entity-resolution tests: planted-typo recall per strategy,
cross-engine levenshtein agreement, and the blocking recall/cost dial."""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators.entity import (
    entity_match,
    entity_match_sql,
    sorted_neighborhood,
    sorted_neighborhood_sql,
)


def _people():
    return pd.DataFrame(
        {
            "rid": [1, 2, 3, 4, 5, 6],
            "name": [
                "jane smith 0421",
                "jane smth 0421",   # dropped char, same suffix → block match
                "john doe 7788",
                "john doe 778X",    # trailing edit, suffix broken → SNM match
                "alice wong 5555",
                "zz unrelated 9999",
            ],
        }
    )


def test_block_match_finds_drop_not_trailing(spark):
    out = entity_match(
        spark.createDataFrame(_people()), "rid", "name",
        block_exprs=("substr(name, length(name) - 3)",), max_distance=2,
    ).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (1, 2) in pairs          # suffix survived the dropped char
    assert (3, 4) not in pairs      # suffix block broken by the trailing edit
    assert out.distance.max() <= 2


def test_snm_finds_trailing_edit(spark):
    out = sorted_neighborhood(
        spark.createDataFrame(_people()), "rid", "name",
        block_expr="substr(name, 1, 6)", window=3, max_distance=2,
    ).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert (3, 4) in pairs          # adjacent in sort order within block
    assert (5, 6) not in pairs      # different blocks, never compared


def test_cross_engine_agreement(spark):
    pdf = _people()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_er_t")
    con = duckdb.connect()
    con.register("_er_t", pdf)
    for builder, kw in [
        (entity_match_sql, dict(block_exprs=("substr(name, length(name) - 3)",))),
        (sorted_neighborhood_sql, dict(block_expr="substr(name, 1, 6)", window=2)),
    ]:
        qs = builder(SPARK, "_er_t", "rid", "name", **kw)
        qd = builder(DUCK, "_er_t", "rid", "name", **kw)
        got = spark.sql(qs).toPandas().reset_index(drop=True)
        exp = con.execute(qd).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_levenshtein_semantics_match():
    """Both engines ship CLASSIC Levenshtein (no transposition unit op)
    — pinned so an engine swap to Damerau would fail loudly."""
    con = duckdb.connect()
    assert con.execute("SELECT levenshtein('abcd', 'acbd')").fetchone()[0] == 2
    from tests.test_dialect_fuzz import _get_session

    spark = _get_session()
    assert spark.sql("SELECT levenshtein('abcd', 'acbd') AS d").collect()[0].d == 2


def test_entity_match_bad_column(spark):
    sdf = spark.createDataFrame(_people())
    with pytest.raises(ColumnNotFoundError):
        entity_match(sdf, "nope", "name", block_exprs=("name",))


def _typo_corpus():
    """Zero-padded formulaic names: a hot-variant regime (digit-suffix
    deletions shared by many siblings) plus one single-typo twin and
    one DOUBLE-SUBSTITUTION twin.  Two substitutions is the d1-blind
    shape: every single deletion of either side keeps at least one
    substituted position, so NO depth-1 keys can match (a drop+insert
    double typo, by contrast, shares the mutual single-deletion and d1
    still blocks it); deleting BOTH substituted positions from both
    sides yields the shared depth-2 key."""
    rows = [(i, f"Account#{i:06d}") for i in range(1, 41)]
    rows.append((101, "Acount#000007"))      # 1 deletion of id 7
    rows.append((102, "Axcount#000097"))     # two substitutions of id 7
    return pd.DataFrame(rows, columns=["rid", "name"])


def test_symspell_cap_prunes_variants_before_pairing(spark):
    """variant_df_cap must (a) drop hot variant buckets BEFORE the
    self-join — visible in the plan as a window-count filter below the
    join — and (b) therefore lose exactly the pairs whose only shared
    keys are hot, while cheap rare-key pairs survive."""
    from time_sift_spark.operators.entity import symspell_match, symspell_match_sql

    sdf = spark.createDataFrame(_typo_corpus())
    full = symspell_match(sdf, "rid", "name", max_distance=1).toPandas()
    capped = symspell_match(
        sdf, "rid", "name", max_distance=1, variant_df_cap=5
    ).toPandas()
    full_pairs = set(zip(full.id_a, full.id_b))
    capped_pairs = set(zip(capped.id_a, capped.id_b))
    # the genuine typo twin rides the rare 'Acount#000007' key: kept
    assert (7, 101) in full_pairs and (7, 101) in capped_pairs
    # capped is a subset and strictly smaller (hot digit buckets pruned)
    assert capped_pairs <= full_pairs
    assert len(capped_pairs) < len(full_pairs)
    # plan: the dfc window-filter sits BELOW the pair join
    sdf.createOrReplaceTempView("_sym_cap_t")
    plan = spark.sql(
        symspell_match_sql(SPARK, "_sym_cap_t", "rid", "name",
                           max_distance=1, variant_df_cap=5)
    )._jdf.queryExecution().executedPlan().toString()
    join_at = plan.find("SortMergeJoin")
    if join_at < 0:
        join_at = plan.find("Join")
    dfc_at = plan.find("dfc")
    assert dfc_at >= 0 and join_at >= 0 and dfc_at > join_at, (
        "dfc filter must appear in the subtree BELOW the join "
        "(physical plans print top-down)"
    )


def test_symspell_d2_catches_double_typo_d1_misses(spark):
    """The 2-deletion neighborhood guarantee: a distance-2 pair whose
    edits are separated shares NO single-deletion variant (d1 blocking
    provably misses it even with a distance-2 verify) but shares a
    depth-2 variant (d2 catches it)."""
    from time_sift_spark.operators.entity import symspell_match

    sdf = spark.createDataFrame(_typo_corpus())
    d1 = symspell_match(sdf, "rid", "name",
                        max_distance=2, max_deletions=1).toPandas()
    d2 = symspell_match(sdf, "rid", "name",
                        max_distance=2, max_deletions=2).toPandas()
    d1_pairs = set(zip(d1.id_a, d1.id_b))
    d2_pairs = set(zip(d2.id_a, d2.id_b))
    assert (7, 102) not in d1_pairs     # no shared 1-deletion key
    assert (7, 102) in d2_pairs         # shared depth-2 key
    assert (101, 102) in d2_pairs       # the two typos are distance ≤ 2 apart
    assert d1_pairs <= d2_pairs         # d1 keys are a subset of d2 keys


def test_symspell_d2_cross_engine(spark):
    from time_sift_spark.operators.entity import symspell_match_sql

    pdf = _typo_corpus()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_sym_d2_t")
    con = duckdb.connect()
    con.register("_sym_d2_t", pdf)
    kw = dict(max_distance=2, max_deletions=2, variant_df_cap=8)
    got = spark.sql(
        symspell_match_sql(SPARK, "_sym_d2_t", "rid", "name", **kw)
    ).toPandas().reset_index(drop=True)
    exp = con.execute(
        symspell_match_sql(DUCK, "_sym_d2_t", "rid", "name", **kw)
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_symspell_bad_max_deletions(spark):
    from time_sift_spark.operators.entity import symspell_match

    with pytest.raises(ValueError):
        symspell_match(spark.createDataFrame(_typo_corpus()), "rid", "name",
                       max_deletions=3)
