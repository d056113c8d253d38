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
