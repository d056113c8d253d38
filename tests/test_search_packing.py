"""Unit tests: BM25 lexical retrieval, sequence packing, SCD2 history,
rolling correlation (the round-6b additions)."""

import math

import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.corpus import pack_sequences
from time_sift_spark.operators.search import bm25_topk


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_higher_tf_first(spark):
    docs = _docs(
        spark,
        [
            (1, "cat cat cat dog"),
            (2, "cat dog mouse bird"),
            (3, "dog dog dog dog"),
            (4, "bird bird mouse mouse"),
        ],
    )
    out = bm25_topk(docs, "text", "doc_id", ["cat"], k=4).collect()
    # only docs containing "cat" score at all
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score > out[1].score
    assert out[0].n_terms == 1


def test_bm25_multi_term_sums_partials(spark):
    docs = _docs(
        spark,
        [
            (1, "cat dog"),
            (2, "cat cat"),
            (3, "fish fish"),
        ],
    )
    out = {r.doc_id: r for r in bm25_topk(docs, "text", "doc_id", ["cat", "dog"], k=3).collect()}
    assert out[1].n_terms == 2
    assert out[2].n_terms == 1
    assert 3 not in out


def test_bm25_rare_term_outranks_common(spark):
    # idf: term in 1 doc beats term in all docs, equal tf/dl
    rows = [(i, "common filler") for i in range(1, 9)]
    rows.append((9, "rare filler"))
    docs = _docs(spark, rows)
    out = bm25_topk(docs, "text", "doc_id", ["common", "rare"], k=9).collect()
    assert out[0].doc_id == 9


def test_bm25_hand_computed_score(spark):
    # one doc, one term, corpus of two: check the exact rational-BM25 value
    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    out = bm25_topk(docs, "text", "doc_id", ["a"], k=1).collect()[0]
    n_docs, df, tf, dl, avgdl, k1, b = 2, 1, 1, 2, 2.0, 1.2, 0.75
    idf = (n_docs - df + 0.5) / (df + 0.5)
    expect = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert math.isclose(out.score, round(expect, 4), abs_tol=1e-9)


def test_bm25_validation(spark):
    docs = _docs(spark, [(1, "x")])
    with pytest.raises(ColumnNotFoundError):
        bm25_topk(docs, "nope", "doc_id", ["x"])
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", [])


def test_bm25_tiebreak_and_k_boundary(spark):
    # identical docs -> identical scores; k cuts by doc_id ascending
    docs = _docs(spark, [(i, "tie word") for i in range(1, 6)])
    out = bm25_topk(docs, "text", "doc_id", ["tie"], k=3).collect()
    assert [r.doc_id for r in out] == [1, 2, 3]


def test_bm25_plan_broadcasts_and_no_python(spark):
    docs = _docs(spark, [(1, "a b"), (2, "b c")])
    plan = bm25_topk(docs, "text", "doc_id", ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------------------
# Sequence packing
# --------------------------------------------------------------------------


def _pack_rows(spark, rows):
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", "doc_id", budget=10, group_by=["source"])
    return {(r.source, r.doc_id): r.bin_id for r in out.collect()}


def test_pack_greedy_boundaries(spark):
    got = _pack_rows(
        spark,
        [("s", 1, 4), ("s", 2, 4), ("s", 3, 4), ("s", 4, 9), ("s", 5, 1)],
    )
    # 4+4 fits (8<=10), +4 overflows -> bin 1; 4+9 overflows -> bin 2; 9+1 fits
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 1, ("s", 4): 2, ("s", 5): 2}


def test_pack_oversized_doc_gets_own_bin(spark):
    got = _pack_rows(spark, [("s", 1, 25), ("s", 2, 3), ("s", 3, 3)])
    assert got == {("s", 1): 0, ("s", 2): 1, ("s", 3): 1}


def test_pack_groups_independent(spark):
    got = _pack_rows(spark, [("a", 1, 8), ("b", 2, 8), ("a", 3, 8), ("b", 4, 8)])
    assert got == {("a", 1): 0, ("a", 3): 1, ("b", 2): 0, ("b", 4): 1}


def test_pack_zero_token_docs_join_open_bin(spark):
    got = _pack_rows(spark, [("s", 1, 0), ("s", 2, 10), ("s", 3, 0)])
    # leading empty doc keeps fill 0 -> doc 2 joins bin 0; trailing empty
    # doc overflows the exactly-full bin (fill 10 + 0 > 10 is false) -> stays
    assert got == {("s", 1): 0, ("s", 2): 0, ("s", 3): 0}


def test_pack_budget_validation(spark):
    df = spark.createDataFrame([("s", 1, 1)], "source string, doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tokens", "doc_id", budget=0)
    with pytest.raises(ColumnNotFoundError):
        pack_sequences(df, "missing", "doc_id", budget=5)


def test_pack_never_splits_and_respects_budget(spark):
    import random

    rng = random.Random(7)
    rows = [("s", i, rng.randint(1, 6)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = pack_sequences(df, "n_tokens", "doc_id", budget=10).collect()
    fills = {}
    for r in out:
        fills.setdefault(r.bin_id, 0)
        fills[r.bin_id] += r.n_tokens
    assert all(v <= 10 for v in fills.values())
    # bins are contiguous 0..max
    assert sorted(fills) == list(range(len(fills)))


# --------------------------------------------------------------------------
# SCD2 / rolling corr (registry-level shape checks; value parity is
# covered by test_oracle_parity over the registry)
# --------------------------------------------------------------------------


def test_scd2_intervals_tile_history(spark, sf_dir):
    from time_sift_spark.queries import REGISTRY

    out = REGISTRY["scd2_user_event_type"].spark_fn(spark, sf_dir).toPandas()
    one = out[out.user_id == out.user_id.iloc[0]].sort_values("version")
    # versions are 1..n, exactly one open interval per user, intervals chain
    assert list(one.version) == list(range(1, len(one) + 1))
    assert int(one.is_current.sum()) == 1
    assert one.valid_to.iloc[:-1].tolist() == one.valid_from.iloc[1:].tolist()
    # consecutive versions always change type
    assert (one.event_type.iloc[:-1].values != one.event_type.iloc[1:].values).all()


def test_rolling_corr_bounds_and_window(spark, sf_dir):
    from time_sift_spark.queries import REGISTRY

    out = REGISTRY["rolling_corr_click_purchase"].spark_fn(spark, sf_dir).toPandas()
    vals = out.rolling_corr.dropna()
    assert ((vals >= -1.0000001) & (vals <= 1.0000001)).all()
    assert len(out) > 0


def test_rolling_corr_validation(spark):
    from time_sift_spark.operators.autocorr import rolling_corr

    df = spark.createDataFrame([(1.0, 2.0, 1)], "x double, y double, t long")
    with pytest.raises(ColumnNotFoundError):
        rolling_corr(df, "x", "nope", "t", 5)
    with pytest.raises(ValueError):
        rolling_corr(df, "x", "y", "t", 1)


# --------------------------------------------------------------------------
# Persisted inverted index
# --------------------------------------------------------------------------


def test_text_index_persisted_equals_inline(spark, tmp_path):
    from time_sift_spark.operators.search import build_text_index, query_text_index

    docs = _docs(
        spark,
        [
            (1, "cat cat dog"),
            (2, "cat mouse"),
            (3, "dog dog fish"),
            (4, "mouse mouse mouse cat"),
        ],
    )
    path = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", path)
    inline = bm25_topk(docs, "text", "doc_id", ["cat", "dog"], k=4).collect()
    served = query_text_index(spark, path, ["cat", "dog"], k=4).collect()
    assert [(r.doc_id, r.n_terms, r.score) for r in inline] == [
        (r.doc_id, r.n_terms, r.score) for r in served
    ]


def test_text_index_scan_pushes_term_filter(spark, tmp_path):
    from time_sift_spark.operators.search import build_text_index, query_text_index

    docs = _docs(spark, [(1, "aa bb"), (2, "bb cc")])
    path = str(tmp_path / "tidx2")
    build_text_index(docs, "text", "doc_id", path)
    plan = (
        query_text_index(spark, path, ["aa"], k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # single-term isin folds to EqualTo; multi-term stays In — accept both
    assert "PushedFilters" in plan, plan
    assert "EqualTo(term,aa)" in plan or "In(term" in plan, plan


def test_text_index_empty_terms_raises(spark, tmp_path):
    from time_sift_spark.operators.search import build_text_index, query_text_index

    docs = _docs(spark, [(1, "x")])
    path = str(tmp_path / "tidx3")
    build_text_index(docs, "text", "doc_id", path)
    with pytest.raises(ValueError):
        query_text_index(spark, path, [])


def test_bm25_df_cap_drops_stop_word(spark):
    """max_df_frac: a term present in (nearly) every doc is dropped from
    scoring; the remaining terms still rank. Docs 1-3 all contain
    'the' (df=1.0); only doc 3 contains 'rare'."""
    docs = _docs(
        spark,
        [
            (1, "the alpha beta"),
            (2, "the gamma delta"),
            (3, "the rare epsilon"),
        ],
    )
    capped = bm25_topk(
        docs, "text", "doc_id", ["the", "rare"], k=10, max_df_frac=0.5
    ).toPandas()
    # 'the' dropped -> only docs matching 'rare' are scored at all
    assert capped.doc_id.tolist() == [3]
    assert capped.n_terms.tolist() == [1]
    uncapped = bm25_topk(docs, "text", "doc_id", ["the", "rare"], k=10).toPandas()
    assert set(uncapped.doc_id) == {1, 2, 3}


def test_bm25_df_cap_all_terms_dropped_returns_empty(spark):
    docs = _docs(spark, [(1, "the cat"), (2, "the dog")])
    out = bm25_topk(docs, "text", "doc_id", ["the"], k=5, max_df_frac=0.5)
    assert out.count() == 0


def test_bm25_df_cap_validation_and_index_parity(spark, tmp_path):
    from time_sift_spark.operators.search import build_text_index, query_text_index

    docs = _docs(
        spark,
        [(1, "the alpha beta"), (2, "the gamma delta"), (3, "the rare epsilon")],
    )
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", ["x"], max_df_frac=0.0)
    with pytest.raises(ValueError):
        bm25_topk(docs, "text", "doc_id", ["x"], max_df_frac=1.5)
    path = str(tmp_path / "idx")
    build_text_index(docs, "text", "doc_id", path)
    inline = bm25_topk(
        docs, "text", "doc_id", ["the", "rare"], k=10, max_df_frac=0.5
    ).toPandas()
    served = query_text_index(
        spark, path, ["the", "rare"], k=10, max_df_frac=0.5
    ).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(served, inline)



# --------------------------------------------------------------------------
# Repetition filters
# --------------------------------------------------------------------------


def test_repetition_stats_flags_loops_and_stutter(spark):
    from time_sift_spark.operators.text import repetition_stats

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "spam ham spam ham spam ham spam ham spam ham spam ham"),  # 2-gram loop
            (3, "go go go go go go go go go go go go"),                    # stutter
        ],
    )
    out = (
        repetition_stats(docs, "text", "doc_id")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert bool(out.loc[1, "keep"])
    assert not bool(out.loc[2, "keep"])       # "spam ham"/"ham spam" dominate
    assert out.loc[2, "top_2gram_frac"] > 0.4
    assert not bool(out.loc[3, "keep"])
    assert out.loc[3, "repeat_token_frac"] == 1.0
    # a block copied wholesale trips the long-gram rule even without
    # short-gram dominance
    long_doc = " ".join(f"w{i}" for i in range(30))
    copied = long_doc + " " + long_doc
    docs2 = _docs(spark, [(9, copied)])
    row = repetition_stats(docs2, "text", "doc_id").collect()[0]
    assert row.dup_5gram_frac > 0.5 and not row.r_dup_5gram


def test_repetition_stats_validation(spark):
    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.text import repetition_stats

    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ColumnNotFoundError):
        repetition_stats(docs, "nope", "doc_id")


def test_bigram_fluency_ranks_fluent_above_garbled(spark):
    """A doc reusing the corpus' common transitions outranks a doc of
    one-off transitions (Laplace smoothing — unsmoothed, a one-off
    transition in a one-off context scores a perfect 1.0); a loop is
    the most predictable of all."""
    from time_sift_spark.operators.text import bigram_fluency

    docs = _docs(
        spark,
        [
            (1, "the cat sat on the mat and the cat ran"),
            (2, "the cat sat on the mat again and again"),
            (3, "zx qv jj pw lk mn bv cx za qq"),        # one-off transitions
            (4, "go go go go go go go go"),              # loop -> P(go|go) ~ 1
        ],
    )
    out = bigram_fluency(docs, "text", "doc_id").toPandas().set_index("doc_id")
    # smoothed ordering: loop (most predictable) > natural reuse > garbage
    assert out.loc[4, "fluency"] > out.loc[1, "fluency"] > out.loc[3, "fluency"]
    # probabilities are proper: every score in (0, 1]
    assert ((out.fluency > 0) & (out.fluency <= 1.0)).all()


def test_bigram_fluency_short_docs_drop_out(spark):
    from time_sift_spark.operators.text import bigram_fluency

    docs = _docs(spark, [(1, "solo"), (2, "two words")])
    out = bigram_fluency(docs, "text", "doc_id").toPandas()
    assert set(out.doc_id) == {2}  # the 1-token doc has no bigram to score


def test_dsir_weights_favor_target_distribution(spark):
    """Docs whose transitions match the target exemplars outscore docs
    from a different distribution; target-unseen transitions degrade
    gracefully (smoothing), never zero a document."""
    from time_sift_spark.operators.text import dsir_weights

    rows = [
        # target-style docs (is_t selects source='good')
        (1, "good", "the quick brown fox jumps over the lazy dog"),
        (2, "good", "the quick brown cat jumps over the lazy fox"),
        # in-distribution candidate (not in target set)
        (3, "cand", "the quick brown dog jumps over the lazy cat"),
        # out-of-distribution candidate
        (4, "cand", "stock prices fell sharply amid market turmoil today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = (
        dsir_weights(df, "text", "doc_id", target_pred="source = 'good'")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[3, "dsir_weight"] > out.loc[4, "dsir_weight"]
    assert (out.dsir_weight > 0).all()


def test_append_text_index_equals_full_rebuild(spark, tmp_path):
    """build(A) + append(B) must answer queries exactly like
    build(A ∪ B) — postings append, stats sum, df recomputed per query."""
    import pandas as pd

    from time_sift_spark.operators.search import (
        append_text_index,
        build_text_index,
        query_text_index,
    )

    a = _docs(spark, [(1, "spark window functions"), (2, "window frames and lag")])
    b = _docs(spark, [(3, "lag features over window specs"), (4, "totally other words")])
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    build_text_index(a, "text", "doc_id", inc)
    append_text_index(b, inc)
    build_text_index(a.unionByName(b), "text", "doc_id", full)
    for terms in (["window"], ["lag", "window"], ["other"]):
        got = query_text_index(spark, inc, terms, k=10).toPandas()
        want = query_text_index(spark, full, terms, k=10).toPandas()
        pd.testing.assert_frame_equal(got, want)


def test_append_text_index_validates_columns(spark, tmp_path):
    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.search import append_text_index, build_text_index

    a = _docs(spark, [(1, "alpha beta")])
    path = str(tmp_path / "idx2")
    build_text_index(a, "text", "doc_id", path)
    bad = spark.createDataFrame([(2,)], "doc_id long")
    with pytest.raises(ColumnNotFoundError):
        append_text_index(bad, path)
