"""Cross-engine fuzz: every dialect-paired SQL generator on RANDOM corpora.

test_oracle_parity checks Spark==DuckDB on the fixed testdata; this suite
drives the same generators over hypothesis-built corpora (empty strings,
NULLs, punctuation, digits, repeated tokens) so tokenizer/hash/aggregation
dialect differences surface before a driver corpus change does.
"""

import duckdb
import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators import dedup as dd

_spark = None


def _get_session():
    global _spark
    if _spark is None:
        from time_sift_spark.session import get_spark

        _spark = get_spark("time_sift_spark_tests", master="local[4]", shuffle_partitions=4)
    return _spark


WORD = st.sampled_from(
    ["alpha", "Beta", "GAMMA", "x1", "y2y", "a", "the", "42", "don't", "foo-bar", "...", ""]
)


@st.composite
def corpus(draw):
    n = draw(st.integers(min_value=1, max_value=16))
    texts = draw(
        st.lists(
            st.one_of(st.none(), st.lists(WORD, min_size=0, max_size=10).map(" ".join)),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _run_both(pdf: pd.DataFrame, spark_sql: str, duck_sql: str, view: str, schema=None):
    spark = _get_session()
    # explicit schema where given: an all-NULL column otherwise infers
    # VOID in Spark (createDataFrame artifact, not a real typed source)
    sdf = spark.createDataFrame(pdf, schema) if schema else spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView(view)
    got = spark.sql(spark_sql).toPandas()
    con = duckdb.connect()
    con.register(view, pdf)
    exp = con.execute(duck_sql).df()
    return got, exp


def _compare(got: pd.DataFrame, exp: pd.DataFrame):
    assert sorted(got.columns) == sorted(exp.columns)
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    exp = exp[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    assert len(got) == len(exp), f"rows: spark={len(got)} duck={len(exp)}"
    for c in cols:
        g, e = got[c], exp[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            ga, ea = g.astype(float).to_numpy(), e.astype(float).to_numpy()
            both_nan = np.isnan(ga) & np.isnan(ea)
            assert ((ga == ea) | both_nan).all(), f"{c}: {ga} vs {ea}"
        else:
            assert g.astype("object").fillna("<N>").tolist() == e.astype("object").fillna(
                "<N>"
            ).tolist(), f"{c}"


FUZZ_SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_exact_dedup(pdf):
    got, exp = _run_both(
        pdf,
        dd.exact_dedup_sql(SPARK, "_fz1", "doc_id", "text"),
        dd.exact_dedup_sql(DUCK, "_fz1", "doc_id", "text"),
        "_fz1",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus(), st.sampled_from([0.0, 0.4, 0.8]))
def test_fuzz_ngram_jaccard(pdf, threshold):
    got, exp = _run_both(
        pdf,
        dd.ngram_jaccard_sql(SPARK, "_fz2", "doc_id", "text", threshold=threshold),
        dd.ngram_jaccard_sql(DUCK, "_fz2", "doc_id", "text", threshold=threshold),
        "_fz2",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_minhash_signatures(pdf):
    got, exp = _run_both(
        pdf,
        dd.minhash_signatures_sql(SPARK, "_fz3", "doc_id", "text", num_perm=8),
        dd.minhash_signatures_sql(DUCK, "_fz3", "doc_id", "text", num_perm=8),
        "_fz3",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_lsh_verified(pdf):
    got, exp = _run_both(
        pdf,
        dd.lsh_verified_neardup_sql(SPARK, "_fz4", "doc_id", "text", threshold=0.5),
        dd.lsh_verified_neardup_sql(DUCK, "_fz4", "doc_id", "text", threshold=0.5),
        "_fz4",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_simhash(pdf):
    got, exp = _run_both(
        pdf,
        dd.simhash_sql(SPARK, "_fz5", "doc_id", "text"),
        dd.simhash_sql(DUCK, "_fz5", "doc_id", "text"),
        "_fz5",
    )
    _compare(got, exp)


# ---------------------------------------------------------------------------
# Text-analysis dialect pairs (same pattern, richer alphabet incl. unicode)
# ---------------------------------------------------------------------------

TEXT_WORD = st.sampled_from(
    [
        "the", "and", "is", "le", "la", "der", "und", "el", "de",
        "Hello", "WORLD", "x1", "42", "don't", "a-b", "...", "", "émigré", "naïve",
    ]
)


@st.composite
def text_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    texts = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.just(""),
                st.just("   "),
                st.lists(TEXT_WORD, min_size=0, max_size=12).map(" ".join),
            ),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


def _text_sql(d, fn, *args, **kw):
    expr = getattr(d, fn)("text", *args, **kw)
    return f"SELECT doc_id, {expr} AS out FROM _fzt"


@FUZZ_SETTINGS
@given(text_corpus(), st.sampled_from(["char_count", "fingerprint", "lang_id"]))
def test_fuzz_text_scalar_exprs(pdf, fn):
    got, exp = _run_both(
        pdf, _text_sql(SPARK, fn), _text_sql(DUCK, fn), "_fzt"
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(text_corpus())
def test_fuzz_quality_score(pdf):
    got, exp = _run_both(
        pdf, _text_sql(SPARK, "quality_score"), _text_sql(DUCK, "quality_score"), "_fzt"
    )
    _compare(got, exp)


# ---------------------------------------------------------------------------
# Vector dialect pairs (cosine fold, kNN, blocked near-dup)
# ---------------------------------------------------------------------------

from time_sift_spark.functions.vector_fns import VDUCK, VSPARK
from time_sift_spark.operators.similarity import embedding_neardup_sql, knn_topk_sql


@st.composite
def vectors(draw):
    n = draw(st.integers(min_value=2, max_value=12))
    dim = draw(st.sampled_from([2, 4]))
    vecs = draw(
        st.lists(
            st.one_of(
                st.none(),
                st.just([0.0] * dim),  # zero vector: exercises the norm guard
                st.lists(
                    st.floats(-10, 10, allow_nan=False).map(lambda x: round(x, 3)),
                    min_size=dim,
                    max_size=dim,
                ),
            ),
            min_size=n,
            max_size=n,
        )
    )
    labels = draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    return pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": vecs, "label": labels}
    )


@FUZZ_SETTINGS
@given(vectors())
def test_fuzz_knn_topk(pdf):
    got, exp = _run_both(
        pdf,
        knn_topk_sql(VSPARK, "_fzv1", "vec_id", "embedding", query_pred="vec_id < 3", k=3),
        knn_topk_sql(VDUCK, "_fzv1", "vec_id", "embedding", query_pred="vec_id < 3", k=3),
        "_fzv1",
        schema="vec_id long, embedding array<double>, label long",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(vectors())
def test_fuzz_embedding_neardup(pdf):
    got, exp = _run_both(
        pdf,
        embedding_neardup_sql(
            VSPARK, "_fzv2", "vec_id", "embedding", threshold=0.5, block_col="label"
        ),
        embedding_neardup_sql(
            VDUCK, "_fzv2", "vec_id", "embedding", threshold=0.5, block_col="label"
        ),
        "_fzv2",
        schema="vec_id long, embedding array<double>, label long",
    )
    _compare(got, exp)


# ---- round-6 exact numeric templates over adversarial float corpora ----

FLOAT = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    st.sampled_from([0.0, 1.0, -1.0, 0.5, 0.12345, 99999.99999, 1e-6]),
)


@st.composite
def series_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=24))
    return pd.DataFrame(
        {
            "sid": [draw(st.integers(min_value=0, max_value=2)) for _ in range(n)],
            "t": range(n),
            "v": [round(draw(FLOAT), 6) for _ in range(n)],
        }
    )


@FUZZ_SETTINGS
@given(series_corpus())
def test_fuzz_exact_corr_template(pdf):
    from time_sift_spark.operators.autocorr import exact_corr_sql

    tpl = (
        "WITH l AS (SELECT sid, v, LAG(v, 1) OVER "
        "(PARTITION BY sid ORDER BY t) AS v1 FROM _fzc) "
        "SELECT sid, {corr} AS c FROM l GROUP BY sid"
    )
    got, exp = _run_both(
        pdf,
        tpl.format(corr=exact_corr_sql("v", "v1", width=18)),   # Spark width
        tpl.format(corr=exact_corr_sql("v", "v1", width=19)),   # DuckDB width
        "_fzc",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(series_corpus())
def test_fuzz_cusum_template(pdf):
    from time_sift_spark.operators.changepoint import cusum, cusum_oracle_sql

    spark = _get_session()
    got = cusum(spark.createDataFrame(pdf), "v", "t", partition_by="sid").toPandas()
    con = duckdb.connect()
    con.register("_fzs", pdf)
    exp = con.execute(cusum_oracle_sql("_fzs", "v", "sid", "t", keep="sid, t")).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(series_corpus())
def test_fuzz_rolling_median_template(pdf):
    """Spark operator vs DuckDB oracle (the two dialect renderings)."""
    from time_sift_spark.operators.rolling import rolling_median, rolling_median_oracle_sql

    spark = _get_session()
    got = (
        rolling_median(spark.createDataFrame(pdf), "v", "t", 4, partition_by="sid")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("_fzm", pdf)
    exp = con.execute(rolling_median_oracle_sql("_fzm", "v", "sid", "t", 4)).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(series_corpus())
def test_fuzz_linear_trend_template(pdf):
    import datetime as dt

    from time_sift_spark.operators.trend import linear_trend, linear_trend_oracle_sql

    pdf = pdf.assign(
        ts=[dt.datetime(2024, 1, 1) + dt.timedelta(minutes=int(i)) for i in pdf.t]
    )
    spark = _get_session()
    got = (
        linear_trend(spark.createDataFrame(pdf), "v", "ts", group_by="sid").toPandas()
    )
    con = duckdb.connect()
    con.register("_fzt", pdf)
    exp = con.execute(linear_trend_oracle_sql("_fzt", "v", "ts", "sid")).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_bm25_template(pdf):
    """bm25_topk (Spark op) vs its DuckDB oracle on random corpora —
    score determinism of the rational-idf arithmetic + decimal sum."""
    from time_sift_spark.operators.search import bm25_topk, bm25_topk_oracle_sql

    pdf = pdf.dropna(subset=["text"]).reset_index(drop=True)
    if pdf.empty:
        return
    spark = _get_session()
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    got = bm25_topk(sdf, "text", "doc_id", ["alpha", "the", "42"], k=50).toPandas()
    con = duckdb.connect()
    con.register("_fzb", pdf)
    exp = con.execute(
        bm25_topk_oracle_sql("_fzb", "text", "doc_id", ["alpha", "the", "42"], k=50)
    ).df()
    _compare(got, exp)


@st.composite
def value_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    vals = st.one_of(
        st.none(),
        st.floats(min_value=-50.0, max_value=1050.0, allow_nan=False).map(
            lambda x: round(x, 4)
        ),
        st.sampled_from([0.0, 2.0, 1000.0, 999.9999, -0.0001, 0.0078125]),
    )
    return pd.DataFrame(
        {
            "g": [draw(st.integers(min_value=0, max_value=1)) for _ in range(n)],
            "v": [draw(vals) for _ in range(n)],
        }
    )


@FUZZ_SETTINGS
@given(value_corpus())
def test_fuzz_histogram_quantiles_template(pdf):
    """Histogram-quantile sketch: bin edges, clamps, exact-decimal
    crossing decisions, interpolation — adversarial values sit ON bin
    boundaries and outside [lo, hi)."""
    from time_sift_spark.operators.sketch import (
        histogram_quantiles,
        histogram_quantiles_sql,
    )

    if pdf.v.dropna().empty:
        return
    spark = _get_session()
    got = histogram_quantiles(
        spark.createDataFrame(pdf, "g long, v double"),
        "v", lo=0.0, hi=1000.0, bins=50, group_by=("g",),
    ).toPandas()
    con = duckdb.connect()
    con.register("_fzq", pdf)
    exp = con.execute(
        histogram_quantiles_sql(
            "_fzq", "v", lo=0.0, hi=1000.0, bins=50, group_by=("g",)
        )
    ).df()
    # DuckDB SUM(BIGINT) -> object/float n; normalize before compare
    exp["n"] = exp["n"].astype("int64")
    _compare(got, exp)


@st.composite
def mixture_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    return pd.DataFrame(
        {
            "doc_id": range(n),
            "source": [draw(st.sampled_from(["a", "b", "c"])) for _ in range(n)],
        }
    )


@FUZZ_SETTINGS
@given(mixture_corpus(), st.sampled_from([0.0, 0.5, 1.0]))
def test_fuzz_temperature_resample_template(pdf, alpha):
    from time_sift_spark.operators.corpus import (
        temperature_resample,
        temperature_resample_oracle_sql,
    )

    spark = _get_session()
    got = temperature_resample(
        spark.createDataFrame(pdf, "doc_id long, source string"),
        "source", "doc_id", alpha=alpha,
    ).toPandas()
    con = duckdb.connect()
    con.register("_fzt", pdf)
    exp = con.execute(
        temperature_resample_oracle_sql(
            "_fzt", "source", "doc_id", ("doc_id", "source"), alpha=alpha
        )
    ).df()
    _compare(got, exp)


@given(corpus())
@FUZZ_SETTINGS
def test_fuzz_bigram_fluency_template(pdf):
    """Fluency + DSIR ratios are DERIVED doubles quantized to decimal —
    the round-before-quantize discipline must hold on adversarial
    corpora (repeated tokens drive the ratios toward boundary values)."""
    from time_sift_spark.operators.text import (
        bigram_fluency,
        bigram_fluency_sql,
        dsir_weights,
        dsir_weights_sql,
    )

    spark = _get_session()
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    con = duckdb.connect()
    con.register("_fzf", pdf)
    got = bigram_fluency(sdf, "text", "doc_id").toPandas()
    exp = con.execute(bigram_fluency_sql(DUCK, "_fzf", "text", "doc_id")).df()
    exp["n_bigrams"] = exp["n_bigrams"].astype("int64")
    _compare(got, exp)
    # DSIR with an arbitrary target split (even docs)
    got2 = dsir_weights(sdf, "text", "doc_id", target_pred="doc_id % 2 = 0").toPandas()
    exp2 = con.execute(
        dsir_weights_sql(DUCK, "_fzf", "text", "doc_id", target_pred="doc_id % 2 = 0")
    ).df()
    exp2["n_bigrams"] = exp2["n_bigrams"].astype("int64")
    _compare(got2, exp2)


# ---------------------------------------------------------------------------
# Round-8 operators: line dedup (multi-line corpora), quality classifier,
# DSIR resampling — fuzzed over NULLs/empties/blank lines/unicode-ish tokens.
# ---------------------------------------------------------------------------

LINE = st.lists(WORD, min_size=0, max_size=6).map(" ".join)


@st.composite
def multiline_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=10))
    texts = draw(
        st.lists(
            st.one_of(st.none(), st.lists(LINE, min_size=0, max_size=5).map("\n".join)),
            min_size=n,
            max_size=n,
        )
    )
    return pd.DataFrame({"doc_id": range(len(texts)), "text": texts})


@FUZZ_SETTINGS
@given(multiline_corpus(), st.sampled_from([1, 2]), st.sampled_from([1, 6]))
def test_fuzz_line_dedup(pdf, cap, min_chars):
    got, exp = _run_both(
        pdf,
        dd.line_dedup_sql(SPARK, "_fz_ld", "doc_id", "text",
                          max_line_docs=cap, min_line_chars=min_chars),
        dd.line_dedup_sql(DUCK, "_fz_ld", "doc_id", "text",
                          max_line_docs=cap, min_line_chars=min_chars),
        "_fz_ld",
        schema="doc_id long, text string",
    )
    _compare(got, exp)


@st.composite
def labeled_corpus(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    texts = draw(
        st.lists(
            st.one_of(st.none(), st.lists(WORD, min_size=0, max_size=8).map(" ".join)),
            min_size=n,
            max_size=n,
        )
    )
    langs = draw(st.lists(st.sampled_from(["en", "de", "zh"]), min_size=n, max_size=n))
    return pd.DataFrame({"doc_id": range(n), "text": texts, "lang": langs})


@FUZZ_SETTINGS
@given(labeled_corpus())
def test_fuzz_quality_classifier(pdf):
    from time_sift_spark.operators.text import quality_classifier_sql

    kw = dict(label_pred="lang = 'en'", train_pred="doc_id % 2 = 0", n_buckets=32)
    got, exp = _run_both(
        pdf,
        quality_classifier_sql(SPARK, "_fz_qc", "text", "doc_id", **kw),
        quality_classifier_sql(DUCK, "_fz_qc", "text", "doc_id", **kw),
        "_fz_qc",
        schema="doc_id long, text string, lang string",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(labeled_corpus())
def test_fuzz_dsir_resample(pdf):
    from time_sift_spark.operators.text import dsir_resample_sql

    got, exp = _run_both(
        pdf,
        dsir_resample_sql(SPARK, "_fz_dr", "text", "doc_id", target_pred="lang = 'en'"),
        dsir_resample_sql(DUCK, "_fz_dr", "text", "doc_id", target_pred="lang = 'en'"),
        "_fz_dr",
        schema="doc_id long, text string, lang string",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus(), corpus())
def test_fuzz_decontaminate_fuzzy(train_pdf, bench_pdf):
    from time_sift_spark.operators.corpus import decontaminate_fuzzy_sql

    spark = _get_session()
    schema = "doc_id long, text string"
    sdf_t = spark.createDataFrame(train_pdf, schema)
    sdf_b = spark.createDataFrame(bench_pdf, schema)
    sdf_t.createOrReplaceTempView("_fz_dc_t")
    sdf_b.createOrReplaceTempView("_fz_dc_b")
    got = spark.sql(
        decontaminate_fuzzy_sql(SPARK, "_fz_dc_t", "_fz_dc_b", "text", threshold=0.4)
    ).toPandas()
    con = duckdb.connect()
    con.register("_fz_dc_t", train_pdf)
    con.register("_fz_dc_b", bench_pdf)
    exp = con.execute(
        decontaminate_fuzzy_sql(DUCK, "_fz_dc_t", "_fz_dc_b", "text", threshold=0.4)
    ).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(vectors())
def test_fuzz_cluster_balanced_sample(pdf):
    from time_sift_spark.operators.similarity import cluster_balanced_sample_sql

    got, exp = _run_both(
        pdf,
        cluster_balanced_sample_sql(
            VSPARK, "_fzv3", "vec_id", "embedding", num_cells=3, cap=2
        ),
        cluster_balanced_sample_sql(
            VDUCK, "_fzv3", "vec_id", "embedding", num_cells=3, cap=2
        ),
        "_fzv3",
        schema="vec_id long, embedding array<double>, label long",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=30))
def test_fuzz_countmin_cells(ids):
    """The streaming count-min oracle's cell construction (row-mixed md5
    buckets + GROUP BY) must agree cell-for-cell across engines on
    arbitrary integer key streams, including negatives (the %-sign
    normalization in cm_bucket_expr)."""
    from time_sift_spark.operators.sketch import cm_bucket_expr
    from time_sift_spark.functions.text_fns import DUCK as _D, SPARK as _S

    pdf = pd.DataFrame({"user_id": ids})
    sp = " UNION ALL ".join(
        f"SELECT {i} AS row, {cm_bucket_expr(_S, 'user_id', i, 16)} AS bucket FROM _fzcm"
        for i in range(3)
    )
    du = " UNION ALL ".join(
        f"SELECT {i} AS row, {cm_bucket_expr(_D, 'user_id', i, 16)} AS bucket FROM _fzcm"
        for i in range(3)
    )
    got, exp = _run_both(
        pdf,
        f"WITH rb AS ({sp}) SELECT row, bucket, COUNT(*) AS cell FROM rb GROUP BY row, bucket",
        f"WITH rb AS ({du}) SELECT row, bucket, COUNT(*) AS cell FROM rb GROUP BY row, bucket",
        "_fzcm",
        schema="user_id long",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus(), corpus())
def test_fuzz_dedup_incremental_fuzzy(corpus_pdf, new_pdf):
    """The incremental fuzzy screen's inline form must agree cell-for-
    cell across engines on arbitrary corpora — including empty shingle
    sets, duplicate texts, and within-batch near-dup chains."""
    from time_sift_spark.operators.dedup import dedup_incremental_fuzzy_sql

    spark = _get_session()
    schema = "doc_id long, text string"
    sdf_c = spark.createDataFrame(corpus_pdf, schema)
    sdf_n = spark.createDataFrame(new_pdf, schema)
    sdf_c.createOrReplaceTempView("_fz_if_c")
    sdf_n.createOrReplaceTempView("_fz_if_n")
    got = spark.sql(
        dedup_incremental_fuzzy_sql(
            SPARK, "_fz_if_c", "_fz_if_n", "doc_id", "text", threshold=0.4
        )
    ).toPandas()
    con = duckdb.connect()
    con.register("_fz_if_c", corpus_pdf)
    con.register("_fz_if_n", new_pdf)
    exp = con.execute(
        dedup_incremental_fuzzy_sql(
            DUCK, "_fz_if_c", "_fz_if_n", "doc_id", "text", threshold=0.4
        )
    ).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus(), corpus())
def test_fuzz_decontaminate_exact(train_pdf, bench_pdf):
    """Exact k-gram decontamination on arbitrary corpora — short texts
    (< k tokens, zero shingles) and NULL texts must flag nothing, in
    both engines."""
    from time_sift_spark.operators.corpus import decontaminate_sql

    spark = _get_session()
    schema = "doc_id long, text string"
    spark.createDataFrame(train_pdf, schema).createOrReplaceTempView("_fz_de_t")
    spark.createDataFrame(bench_pdf, schema).createOrReplaceTempView("_fz_de_b")
    got = spark.sql(
        decontaminate_sql(SPARK, "_fz_de_t", "_fz_de_b", "text", k=3)
    ).toPandas()
    con = duckdb.connect()
    con.register("_fz_de_t", train_pdf)
    con.register("_fz_de_b", bench_pdf)
    exp = con.execute(decontaminate_sql(DUCK, "_fz_de_t", "_fz_de_b", "text", k=3)).df()
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_chunk_documents(pdf):
    """Sliding-window chunking boundary arithmetic (size/overlap/last
    partial chunk) must agree across engines on arbitrary texts."""
    from time_sift_spark.operators.corpus import chunk_documents_sql

    got, exp = _run_both(
        pdf,
        chunk_documents_sql(SPARK, "_fz_ch", "text", size=7, overlap=3),
        chunk_documents_sql(DUCK, "_fz_ch", "text", size=7, overlap=3),
        "_fz_ch",
        schema="doc_id long, text string",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=40))
def test_fuzz_linear_count_distinct(ids):
    """Linear-counting register construction (md5 bucket bitmap) must
    agree register-for-register across engines, negatives included."""
    from time_sift_spark.operators.sketch import linear_count_distinct_sql

    pdf = pd.DataFrame({"user_id": ids})
    got, exp = _run_both(
        pdf,
        linear_count_distinct_sql(SPARK, "_fz_lc", "user_id", k=64),
        linear_count_distinct_sql(DUCK, "_fz_lc", "user_id", k=64),
        "_fz_lc",
        schema="user_id long",
    )
    _compare(got, exp)


@FUZZ_SETTINGS
@given(corpus())
def test_fuzz_count_min_token_freq(pdf):
    """Count-min heavy-hitter probe (tokenize -> cells -> min-over-rows
    estimate) must agree across engines on arbitrary corpora."""
    from time_sift_spark.operators.sketch import count_min_token_freq_sql

    got, exp = _run_both(
        pdf,
        count_min_token_freq_sql(SPARK, "_fz_cmt", "text", width=32, depth=2, top_n=5),
        count_min_token_freq_sql(DUCK, "_fz_cmt", "text", width=32, depth=2, top_n=5),
        "_fz_cmt",
        schema="doc_id long, text string",
    )
    _compare(got, exp)
