"""Unit tests for corpus-preparation operators (chunk / redact / decontaminate)."""

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.corpus import (
    chunk_documents,
    decontaminate,
    redact_pii,
)


def test_chunk_shapes_and_overlap(spark):
    text = "abcdefghij" * 5  # 50 chars
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [text]}))
    out = (
        chunk_documents(df, "text", size=20, overlap=5)
        .orderBy("chunk_start")
        .toPandas()
    )
    # step 15: starts 1, 16, 31, 46
    assert out.chunk_start.tolist() == [1, 16, 31, 46]
    assert out.chunk.iloc[0] == text[0:20]
    assert out.chunk.iloc[1] == text[15:35]          # 5-char overlap
    assert out.chunk.iloc[-1] == text[45:]           # final partial chunk
    assert out.n_chars_chunk.tolist() == [20, 20, 20, 5]


def test_chunk_reassembles_document(spark):
    text = "".join(chr(97 + i % 26) for i in range(137))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [7], "text": [text]}))
    out = chunk_documents(df, "text", size=30, overlap=0).orderBy("chunk_start").toPandas()
    assert "".join(out.chunk) == text


def test_chunk_empty_doc_yields_one_empty_chunk(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [""]}))
    out = chunk_documents(df, "text", size=10, overlap=2).toPandas()
    assert len(out) == 1 and out.chunk.iloc[0] == "" and out.n_chars_chunk.iloc[0] == 0


def test_chunk_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=10, overlap=10)
    with pytest.raises(ColumnNotFoundError):
        chunk_documents(df, "body")


def test_redact_pii_kinds(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "mail a.b-c_d%x@sub.example.co.uk and b@y.io now",
                    "call 555-123-4567 or ssn 123-45-6789",
                    "clean text, no pii at all 12-34",
                ],
            }
        )
    )
    out = redact_pii(df, "text", keep_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert out.text_redacted.iloc[0] == "mail <EMAIL> and <EMAIL> now"
    assert out.n_emails.tolist() == [2, 0, 0]
    assert out.text_redacted.iloc[1] == "call <PHONE> or ssn <SSN>"
    assert out.n_phones.tolist() == [0, 1, 0]
    assert out.n_ssns.tolist() == [0, 1, 0]
    assert out.text_redacted.iloc[2] == "clean text, no pii at all 12-34"


def test_redact_word_boundary(spark):
    # digits embedded in longer runs must NOT match the phone shape
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["id 9555-123-45678 stays"]})
    )
    out = redact_pii(df, "text").toPandas()
    assert out.n_phones.iloc[0] == 0
    assert out.text_redacted.iloc[0] == "id 9555-123-45678 stays"


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the quick brown fox jumps over the lazy dog",  # contains bench span
                    "completely different words here entirely",
                    "quick brown fox appears again with more text",  # shares 3-gram
                ],
            }
        )
    )
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "text": ["a quick brown fox ran away"]})
    )
    out = (
        decontaminate(train, bench, "text", k=3).orderBy("doc_id").toPandas()
    )
    assert out.contaminated.tolist() == [True, False, True]
    assert out.n_contaminated_ngrams.iloc[1] == 0
    assert out.n_contaminated_ngrams.iloc[0] >= 1


def test_decontaminate_counts_distinct_grams(spark):
    # the shared gram appears twice in the train doc -> still counted once
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["x y z pad pad pad x y z"]})
    )
    bench = spark.createDataFrame(pd.DataFrame({"doc_id": [9], "text": ["x y z"]}))
    out = decontaminate(train, bench, "text", k=3).toPandas()
    assert out.n_contaminated_ngrams.iloc[0] == 1


def test_decontaminate_broadcast_plan(spark):
    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["a b c d e"]})
    )
    bench = spark.createDataFrame(pd.DataFrame({"doc_id": [2], "text": ["c d e f"]}))
    plan = (
        decontaminate(train, bench, "text", k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Temperature mixture resampling
# --------------------------------------------------------------------------


def _mix_df(spark, sizes):
    rows = []
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_alpha1_keeps_everything(spark):
    from time_sift_spark.operators.corpus import temperature_resample

    df = _mix_df(spark, {"a": 40, "b": 10})
    out = temperature_resample(df, "source", "doc_id", alpha=1.0)
    assert out.count() == 50


def test_temperature_alpha0_equalizes_expected_counts(spark):
    from time_sift_spark.operators.corpus import temperature_resample

    df = _mix_df(spark, {"a": 400, "b": 100})
    out = temperature_resample(df, "source", "doc_id", alpha=0.0).toPandas()
    by = out.groupby("source").size()
    # smallest group kept in full; larger group downsampled toward it
    assert by["b"] == 100
    assert 60 <= by["a"] <= 140  # expectation 100, hash-binomial spread


def test_temperature_alpha_half_targets_sqrt_shares(spark):
    from time_sift_spark.operators.corpus import temperature_resample

    df = _mix_df(spark, {"a": 900, "b": 100})
    out = temperature_resample(df, "source", "doc_id", alpha=0.5).toPandas()
    by = out.groupby("source").size()
    assert by["b"] == 100  # min group kept in full
    # expectation: 900 * sqrt(100/900) = 300
    assert 240 <= by["a"] <= 360


def test_temperature_deterministic_and_partition_invariant(spark):
    from time_sift_spark.operators.corpus import temperature_resample

    df1 = _mix_df(spark, {"a": 200, "b": 50}).repartition(3)
    df2 = _mix_df(spark, {"a": 200, "b": 50}).repartition(13)
    r1 = sorted(r.doc_id for r in temperature_resample(df1, "source", "doc_id").collect())
    r2 = sorted(r.doc_id for r in temperature_resample(df2, "source", "doc_id").collect())
    assert r1 == r2 and len(r1) > 0


def test_temperature_validation(spark):
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.corpus import temperature_resample

    df = _mix_df(spark, {"a": 3})
    with pytest.raises(ValueError):
        temperature_resample(df, "source", "doc_id", alpha=0.7)
    with pytest.raises(ValueError):
        temperature_resample(df, "source", "doc_id", resolution=0)
    with pytest.raises(ColumnNotFoundError):
        temperature_resample(df, "nope", "doc_id")


def test_temperature_fact_side_never_shuffles(spark):
    from time_sift_spark.operators.corpus import temperature_resample

    df = _mix_df(spark, {"a": 30, "b": 20})
    plan = (
        temperature_resample(df, "source", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan


def test_epoch_upsample_repeat_counts(spark):
    """w=3.0 gives exactly 3 copies; w=2.5 gives 2 or 3 with the exact
    md5 coin (≈half each over many ids); unlisted groups stay at 1;
    repeated invocation is bit-identical; w<1 rejected."""
    import pandas as pd
    import pytest

    from time_sift_spark.operators.corpus import epoch_upsample

    pdf = pd.DataFrame({
        "doc_id": range(400),
        "src": ["a"] * 100 + ["b"] * 200 + ["c"] * 100,
    })
    df = spark.createDataFrame(pdf)
    out = epoch_upsample(df, "doc_id", "src", {"a": 3.0, "b": 2.5}).toPandas()
    per_doc = out.groupby("doc_id").size()
    a_docs = per_doc[pdf.set_index("doc_id").src == "a"]
    b_docs = per_doc[pdf.set_index("doc_id").src == "b"]
    c_docs = per_doc[pdf.set_index("doc_id").src == "c"]
    assert (a_docs == 3).all()
    assert set(b_docs.unique()) <= {2, 3}
    assert 0.3 < (b_docs == 3).mean() < 0.7  # ≈ frac(2.5)
    assert (c_docs == 1).all()
    # rep index is 1..n per doc
    reps = out[out.doc_id == 0].rep.sort_values().tolist()
    assert reps == list(range(1, len(reps) + 1))
    # determinism
    out2 = epoch_upsample(df, "doc_id", "src", {"a": 3.0, "b": 2.5}).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["doc_id", "rep"]).reset_index(drop=True),
        out2.sort_values(["doc_id", "rep"]).reset_index(drop=True),
    )
    with pytest.raises(ValueError):
        epoch_upsample(df, "doc_id", "src", {"a": 0.5})
    with pytest.raises(ValueError):
        epoch_upsample(df, "doc_id", "src", {})
