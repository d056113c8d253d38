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


def test_robust_scale_matches_numpy_quantiles(spark):
    import numpy as np
    import pandas as pd
    import pytest

    from time_sift_spark.operators.encode import robust_scale

    rng = np.random.default_rng(17)
    vals = np.round(rng.normal(50, 10, 101), 6)
    pdf = pd.DataFrame(
        {"id": range(101), "g": "a", "v": vals}
    )
    # constant group -> NULL robust_z
    pdf2 = pd.DataFrame({"id": range(1000, 1005), "g": "c", "v": 7.0})
    df = spark.createDataFrame(pd.concat([pdf, pdf2], ignore_index=True))
    out = robust_scale(df, "v", "g", "id").toPandas()
    a = out[out.g == "a"].sort_values("id").reset_index(drop=True)
    med = np.quantile(vals, 0.5, method="linear")
    q1 = np.quantile(vals, 0.25, method="linear")
    q3 = np.quantile(vals, 0.75, method="linear")
    assert a.group_median[0] == pytest.approx(med, abs=1e-6)
    assert a.group_iqr[0] == pytest.approx(q3 - q1, abs=1e-6)
    assert a.robust_z[5] == pytest.approx((vals[5] - med) / (q3 - q1), abs=1e-5)
    c = out[out.g == "c"]
    assert len(c) == 5 and c.robust_z.isna().all()
    assert (c.group_iqr == 0.0).all()


def test_frequency_encode_rare_collapse(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.encode import frequency_encode

    # "big": 6 rows, "mid": 5, "r1": 2, "r2": 1 -> rare bucket = 3 rows
    cats = ["big"] * 6 + ["mid"] * 5 + ["r1"] * 2 + ["r2"]
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(cats)), "c": cats})
    )
    out = frequency_encode(df, "id", "c", min_count=5).toPandas()
    assert len(out) == 14  # one row per input row
    by_cat = out.groupby("c").first()
    assert by_cat.loc["big", "cat_enc"] == "big"
    assert by_cat.loc["mid", "cat_enc"] == "mid"
    assert by_cat.loc["r1", "cat_enc"] == "__rare__"
    assert by_cat.loc["r2", "cat_enc"] == "__rare__"
    # post-collapse semantics: the rare bucket counts ALL its members
    assert by_cat.loc["r1", "n_bucket"] == 3
    assert by_cat.loc["r1", "freq_enc"] == pytest.approx(3 / 14, abs=1e-6)
    assert by_cat.loc["big", "freq_enc"] == pytest.approx(6 / 14, abs=1e-6)
