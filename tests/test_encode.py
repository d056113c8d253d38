import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.encode import target_encode_loo


def test_loo_excludes_own_label(spark):
    """m=0, category with two rows: each row's encoding IS the other
    row's label — the leakage-free property, exactly."""
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "cat": ["a", "a", "b", "b"],
        "y": [10.0, 20.0, 5.0, 7.0],
    })
    out = (
        target_encode_loo(spark.createDataFrame(pdf), "id", "cat", "y",
                          smoothing=0.0)
        .toPandas().set_index("id").sort_index()
    )
    assert out.loc[1, "te_loo"] == pytest.approx(20.0)
    assert out.loc[2, "te_loo"] == pytest.approx(10.0)
    assert out.loc[3, "te_loo"] == pytest.approx(7.0)
    assert out.loc[4, "te_loo"] == pytest.approx(5.0)


def test_loo_singleton_falls_back_to_prior(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 3],
        "cat": ["a", "a", "solo"],
        "y": [10.0, 20.0, 99.0],
    })
    out = (
        target_encode_loo(spark.createDataFrame(pdf), "id", "cat", "y",
                          smoothing=0.0)
        .toPandas().set_index("id")
    )
    # singleton category with m=0: prior = mean of all labels
    assert out.loc[3, "te_loo"] == pytest.approx((10 + 20 + 99) / 3)


def test_loo_smoothing_shrinks_to_prior(spark):
    """Huge m: every encoding approaches the global prior."""
    pdf = pd.DataFrame({
        "id": list(range(6)),
        "cat": ["a", "a", "a", "b", "b", "b"],
        "y": [1.0, 2.0, 3.0, 100.0, 200.0, 300.0],
    })
    prior = pdf.y.mean()
    out = target_encode_loo(
        spark.createDataFrame(pdf), "id", "cat", "y", smoothing=1e6
    ).toPandas()
    assert (out.te_loo - prior).abs().max() < 0.01


def test_kfold_uses_other_folds_only(spark):
    """Hand-check one row of the K-fold form: its encoding equals the
    mean over its category EXCLUDING its own fold's rows."""
    from time_sift_spark.functions.text_fns import SPARK as D
    from time_sift_spark.operators.encode import target_encode_kfold_sql

    pdf = pd.DataFrame({
        "id": list(range(40)),
        "cat": ["a"] * 40,
        "y": [float(i) for i in range(40)],
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("_te_t")
    out = spark.sql(
        target_encode_kfold_sql(D, "_te_t", "id", "cat", "y",
                                folds=4, smoothing=0.0)
    ).toPandas().set_index("id")
    for i in (0, 7, 23):
        f = out.loc[i, "fold"]
        others = out[out.fold != f].index
        expect = pdf.set_index("id").loc[others, "y"].mean()
        assert out.loc[i, "te_oof"] == pytest.approx(expect, rel=1e-9)


def test_encode_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": [1], "cat": ["a"], "y": [1.0]}))
    with pytest.raises(ColumnNotFoundError):
        target_encode_loo(df, "id", "nope", "y")
    with pytest.raises(ValueError):
        target_encode_loo(df, "id", "cat", "y", smoothing=-1)
