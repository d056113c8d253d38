"""Text operator unit tests + cross-engine primitive parity pins."""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators.text import fingerprint, lang_id, text_stats

SAMPLES = [
    "The quick brown fox jumps over the lazy dog, and it is happy!",
    "el perro es una mascota que vive en la casa por las tardes con",
    "le chat est dans la maison et il est pour le moment au calme les",
    "der hund ist nicht mit der katze und das ist ein problem zu den",
    "你好世界这是一个测试文档内容相当长",
    "12345 67890 !!!",
    "",
    "   ",
    "word",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(SAMPLES)), "text": SAMPLES})
    )


def _duck_eval(expr: str, texts):
    con = duckdb.connect()
    con.register("d", pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    return con.execute(f"SELECT {expr} AS v FROM d ORDER BY doc_id").df()["v"].tolist()


@pytest.mark.parametrize(
    "builder",
    ["ws_token_count", "bpe_token_count", "punct_count", "digit_count", "cjk_count",
     "mean_token_len", "quality_score", "lang_id"],
)
def test_primitive_parity(spark, builder):
    """Each dialect-paired expression produces identical values in Spark
    and DuckDB on adversarial samples (empty, blank, CJK, digits-only)."""
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(SAMPLES)), "text": SAMPLES}))
    sdf.createOrReplaceTempView("d_txt")
    spark_vals = [
        r.v
        for r in spark.sql(
            f"SELECT {getattr(SPARK, builder)('text')} AS v FROM d_txt ORDER BY doc_id"
        ).collect()
    ]
    duck_vals = _duck_eval(getattr(DUCK, builder)("text"), SAMPLES)
    assert spark_vals == duck_vals, f"{builder}: {spark_vals} != {duck_vals}"


def test_fingerprint_parity(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(SAMPLES)), "text": SAMPLES}))
    sdf.createOrReplaceTempView("d_txt2")
    spark_vals = [
        r.v for r in spark.sql(f"SELECT {SPARK.fingerprint('text', 3)} AS v FROM d_txt2 ORDER BY doc_id").collect()
    ]
    duck_vals = _duck_eval(DUCK.fingerprint("text", 3), SAMPLES)
    assert spark_vals == duck_vals


def test_lang_id_labels(docs):
    out = lang_id(docs, "text", keep_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert out.lang_pred.tolist()[:5] == ["en", "es", "fr", "de", "zh"]
    assert out.lang_pred.tolist()[5] == "und"  # digits only


def test_text_stats_values(docs):
    out = text_stats(docs, "text", keep_cols=("doc_id",)).orderBy("doc_id").toPandas()
    row0 = out.iloc[0]
    assert row0.n_tokens_ws == 13
    assert row0.n_tokens_alnum == 13
    assert 0 < row0.quality_score <= 1
    empty = out.iloc[6]
    assert empty.n_tokens_ws == 0 and empty.n_chars_txt == 0


def test_fingerprint_properties(docs, spark):
    out = fingerprint(docs, "text", keep_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert out.fingerprint.notna().all()
    # identical text → identical fingerprint; 1-word docs use the fallback
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": [0, 1], "text": [SAMPLES[0], SAMPLES[0]]}))
    fp2 = fingerprint(df2, "text", keep_cols=("doc_id",)).toPandas()
    assert fp2.fingerprint.nunique() == 1


def test_quality_classifier_discriminates_and_is_deterministic(spark):
    """The hashed-bigram NB classifier must separate the labeled class:
    on the sf0.001 corpus (shared vocabulary — the worst case) en docs
    score above the trained prior far more often than non-en docs, and
    two runs return identical frames (no RNG anywhere)."""
    from time_sift_spark.functions.text_fns import SPARK as _S
    from time_sift_spark.operators.text import quality_classifier_score
    from time_sift_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    train_pred = f"({_S.md5_long('CAST(doc_id AS STRING)')} % 2 = 0)"
    out = quality_classifier_score(
        docs, "text", "doc_id", label_pred="lang = 'en'", train_pred=train_pred
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    langs = docs.select("doc_id", "lang").toPandas()
    m = out.merge(langs, on="doc_id")
    en_rate = m[m.lang == "en"].predicted.mean()
    other_rate = m[m.lang != "en"].predicted.mean()
    assert en_rate > other_rate + 0.2  # measured ~0.82 vs ~0.40 at sf0.01
    assert m[m.lang == "en"].quality_score.mean() > m[m.lang != "en"].quality_score.mean()

    out2 = quality_classifier_score(
        docs, "text", "doc_id", label_pred="lang = 'en'", train_pred=train_pred
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_quality_classifier_feature_hashing_bounds_weight_table(spark):
    """The fastText hashing trick: with tiny n_buckets the weight table
    is bounded (collisions fold features together) but the pipeline
    still runs and scores every >=2-token doc — the property that keeps
    the weight relation broadcastable at any corpus size."""
    from time_sift_spark.operators.text import quality_classifier_score
    from time_sift_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    out = quality_classifier_score(
        docs, "text", "doc_id", label_pred="lang = 'en'",
        train_pred="doc_id >= 0", n_buckets=64,
    ).toPandas()
    assert len(out) == docs.where("size(split(text, ' ')) >= 2").count()
    assert out.quality_score.between(0, 1).all()


def test_quality_model_persisted_equals_inline(spark, tmp_path):
    """build_quality_model → score_quality_model must return EXACTLY what
    the inline one-statement classifier returns (integer counts persist,
    the posterior/prior doubles are recomputed from the same shared
    expression text), and the serve plan must contain no training
    subtree (the weight aggregation was paid at build time)."""
    from time_sift_spark.functions.text_fns import SPARK as _S
    from time_sift_spark.operators.text import (
        build_quality_model,
        quality_classifier_score,
        score_quality_model,
    )
    from time_sift_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    train_pred = f"({_S.md5_long('CAST(doc_id AS STRING)')} % 2 = 0)"
    path = str(tmp_path / "qc_model")
    build_quality_model(
        docs, "text", "doc_id", path,
        label_pred="lang = 'en'", train_pred=train_pred,
    )
    inline = quality_classifier_score(
        docs, "text", "doc_id", label_pred="lang = 'en'", train_pred=train_pred
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    served = score_quality_model(spark, path, docs) \
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(served, inline)

    # weight table bounded by construction; serve plan has no training agg
    import pyarrow.parquet as pq

    n_weights = pq.read_table(f"{path}/weights").num_rows
    assert n_weights <= 65536
    plan = score_quality_model(spark, path, docs) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "is_t" not in plan


def test_keyword_extract_ranks_rare_terms(spark):
    """Planted corpus: a term concentrated in one doc outranks the
    ubiquitous filler; stop-word cap and min_df prune as documented."""
    import pandas as pd

    from time_sift_spark.operators.search import keyword_extract

    docs = ["common rare rare", "common xyz", "common xyz", "common only"]
    pdf = pd.DataFrame({"id": range(4), "txt": docs})
    out = keyword_extract(
        spark.createDataFrame(pdf), "id", "txt", topn=2, min_df=1, max_df_frac=0.9
    ).toPandas()
    # 'common' (df=4 = 1.0·N > 0.9·N) is capped out everywhere
    assert "common" not in set(out.term)
    d0 = out[out.id == 0]
    assert list(d0.term) == ["rare"]          # tf=2, df=1 -> top (and only) keyword
    assert d0.iloc[0].rnk == 1
    # hapax pruning: min_df=2 removes 'rare'/'only' but keeps 'xyz' (df=2)
    out2 = keyword_extract(
        spark.createDataFrame(pdf), "id", "txt", topn=2, min_df=2, max_df_frac=0.9
    ).toPandas()
    assert set(out2.term) == {"xyz"} and set(out2.id) == {1, 2}


def test_readability_sentences_and_syllables(spark):
    from time_sift_spark.operators.text import readability

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    # 2 sentences, 6 words; known vowel groups
                    "The cat sat. The dog ran!",
                    # no punctuation -> one sentence (the corpus case)
                    "alpha beta gamma",
                    # vowel-less tokens floor at 1 syllable each
                    "zzz brr tsk",
                    # repeated token -> high simpson_rep, low ttr
                    "spark spark spark spark",
                ],
            }
        )
    )
    rows = {r["doc_id"]: r for r in readability(df, "text", "doc_id").collect()}

    r0 = rows[0]
    assert r0["n_sentences"] == 2 and r0["n_words"] == 6
    # the/cat/sat/the/dog/ran -> 1 vowel group each
    assert r0["n_syllables"] == 6
    # W/S = 3, Syl/W = 1 -> flesch = 206.835 - 3.045 - 84.6
    assert rows[0]["flesch"] == pytest.approx(119.19, abs=1e-6)

    assert rows[1]["n_sentences"] == 1
    assert rows[1]["n_syllables"] == 2 + 2 + 2  # al-pha, be-ta(+a? groups: a/a, e/a, a/a) = 6

    assert rows[2]["n_syllables"] == 3  # floor 1 per vowel-less token
    assert rows[3]["ttr"] == pytest.approx(0.25)
    assert rows[3]["simpson_rep"] == pytest.approx(1.0)
    # zero-token docs drop out
    empty = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["!!! ..."]}))
    assert readability(empty, "text", "doc_id").count() == 0


def test_token_label_chisq_known_table(spark):
    from time_sift_spark.operators.text import token_label_chisq

    # 4 docs: "yes" appears exactly in the 2 positives, "no" in the 2
    # negatives, "the" in all 4 (c+d = 0 -> guarded to 0.0).
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "lang": ["en", "en", "fr", "fr"],
                "text": ["the yes yes", "the yes", "the no", "the no no"],
            }
        )
    )
    out = {
        r["token"]: r
        for r in token_label_chisq(
            df, "text", "doc_id", "lang = 'en'", min_df=2
        ).collect()
    }
    # perfect association: chi2 == N
    assert out["yes"]["chisq"] == pytest.approx(4.0)
    assert out["no"]["chisq"] == pytest.approx(4.0)
    assert out["yes"]["df_pos"] == 2 and out["yes"]["df_neg"] == 0
    # token in every doc carries no signal
    assert out["the"]["chisq"] == 0.0
    # repeats inside one doc count once (presence, not tf)
    assert out["yes"]["df"] == 2
