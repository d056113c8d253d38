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


def test_frequency_encode_null_category(spark):
    """NULL categories keep the one-row-per-input contract (ADVICE r9:
    the NULL-unsafe join-back dropped them while n_total still counted
    them) — grouped by _fec, collapsed into __rare__ below min_count,
    and joined back NULL-safely on BOTH engines."""
    import duckdb
    import pandas as pd
    import pytest

    from time_sift_spark.functions.text_fns import DUCK, SPARK
    from time_sift_spark.operators.encode import frequency_encode, frequency_encode_sql

    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "c": ["a", "a", "a", None, None],
    })
    df = spark.createDataFrame(pdf.astype({"c": "object"}))
    out = frequency_encode(df, "id", "c", min_count=3).toPandas()
    assert len(out) == 5  # one row per input row, NULLs included
    nulls = out[out.c.isna()]
    assert len(nulls) == 2
    assert (nulls.cat_enc == "__rare__").all()
    assert (nulls.n_bucket == 2).all()
    assert nulls.freq_enc.iloc[0] == pytest.approx(2 / 5, abs=1e-9)
    assert out[out.c == "a"].freq_enc.iloc[0] == pytest.approx(3 / 5, abs=1e-9)

    # NULL category ABOVE min_count keeps its own (NULL) bucket
    out2 = frequency_encode(df, "id", "c", min_count=2).toPandas()
    n2 = out2[out2.c.isna()]
    assert len(n2) == 2 and n2.cat_enc.isna().all() and (n2.n_bucket == 2).all()

    # cross-engine: the DuckDB rendering keeps the same contract
    con = duckdb.connect()
    con.register("_fe_t", pdf)
    exp = con.execute(
        frequency_encode_sql(DUCK, "_fe_t", "id", "c", min_count=3)
    ).df()
    df.createOrReplaceTempView("_fe_t")
    got = spark.sql(
        frequency_encode_sql(SPARK, "_fe_t", "id", "c", min_count=3)
    ).toPandas()
    assert len(exp) == 5 and len(got) == 5
    key = ["id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_robust_scale_sketch_bounded_plan_and_accuracy(spark):
    """The sketch form must (a) contain NO per-group sorted array in its
    plan — the r9 VERDICT scale cliff — and (b) land within one bin
    width of the exact quantiles."""
    import numpy as np
    import pandas as pd
    import pytest

    from time_sift_spark.operators.encode import robust_scale, robust_scale_sketch

    rng = np.random.default_rng(23)
    vals = np.round(rng.normal(100, 20, 2000), 6)
    pdf = pd.DataFrame({"id": range(2000), "g": "a", "v": vals})
    df = spark.createDataFrame(pdf)
    sk = robust_scale_sketch(df, "v", "g", "id", bins=4096)
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan and "sort_array" not in plan
    out = sk.toPandas()
    assert len(out) == 2000
    exact = robust_scale(df, "v", "g", "id").toPandas()
    bin_w = (vals.max() - vals.min()) / 4096
    assert abs(out.group_median[0] - exact.group_median[0]) <= bin_w + 1e-9
    assert abs(out.group_iqr[0] - exact.group_iqr[0]) <= 2 * bin_w + 1e-9

    # cross-engine: DuckDB rendering bit-equal to the Spark rendering
    import duckdb

    from time_sift_spark.functions.text_fns import DUCK
    from time_sift_spark.operators.encode import robust_scale_sketch_sql

    con = duckdb.connect()
    con.register("_rsk_t", pdf)
    exp = con.execute(
        robust_scale_sketch_sql(DUCK, "_rsk_t", "v", "g", "id", bins=4096)
    ).df()
    got = out.sort_values("id").reset_index(drop=True)
    exp = exp.sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_robust_scale_auto_routes_by_group_size(spark):
    """The picker: under the bound → the exact sorted-array plan; a
    group past the bound → the sketch plan (no collect_list), on the
    WHOLE frame."""
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.encode import robust_scale, robust_scale_auto

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "id": range(300),
        "g": ["big"] * 250 + ["small"] * 50,
        "v": np.round(rng.normal(0, 1, 300), 6),
    })
    df = spark.createDataFrame(pdf)

    exact = robust_scale_auto(df, "v", "g", "id", exact_max_group_rows=1000)
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan or "sort_array" in plan
    import pandas.testing as pt

    pt.assert_frame_equal(
        exact.toPandas().sort_values("id").reset_index(drop=True),
        robust_scale(df, "v", "g", "id").toPandas().sort_values("id").reset_index(drop=True),
    )

    sk = robust_scale_auto(df, "v", "g", "id", exact_max_group_rows=100)
    plan_sk = sk._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan_sk and "sort_array" not in plan_sk
    assert sk.count() == 300
