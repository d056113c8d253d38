"""The distributed lag plan against the reference goldens + the numpy model.

F1/F2 fixtures from FIXTURES.md; golden values from
/root/reference/src/lib.rs:806-1076 re-expressed relationally.
"""

import numpy as np
import pandas as pd
import pytest

from time_sift_spark.interop import lag_matrix_np, lag_matrix_pd
from time_sift_spark.operators.lag import lag_features, lag_shape, lead_features
from time_sift_spark.plans.lag_plan import lag_column_names

INF = float("inf")


@pytest.fixture(scope="module")
def f1(spark):
    # F1 series_1d: t dense 0-based, v = 42,40,38,36
    return spark.createDataFrame(
        pd.DataFrame({"t": [0, 1, 2, 3], "v": [42.0, 40.0, 38.0, 36.0]})
    )


@pytest.fixture(scope="module")
def f2(spark):
    # F2 series_multi long format: series 0 = 1..4, series 1 = -1..-4
    rows = [(s, t, float(v)) for s, vals in enumerate([[1, 2, 3, 4], [-1, -2, -3, -4]]) for t, v in enumerate(vals)]
    return spark.createDataFrame(rows, "series_id int, t long, v double")


def test_wide_full_lag_set(f1):
    out = lag_features(f1, "v", "t", [0, 1, 2, 3], fill=INF).orderBy("t").toPandas()
    mat = out[lag_column_names(["v"], [0, 1, 2, 3])].to_numpy().T
    np.testing.assert_array_equal(mat, lag_matrix_np([42.0, 40.0, 38.0, 36.0], [0, 1, 2, 3], INF))


def test_wide_unordered_subset(f1):
    # src/lib.rs:840-865 — lag set [1,3,2], order preserved in output cols
    out = lag_features(f1, "v", "t", [1, 3, 2], fill=INF).orderBy("t").toPandas()
    names = lag_column_names(["v"], [1, 3, 2])
    assert names == ["v_lag1", "v_lag3", "v_lag2"]
    mat = out[names].to_numpy().T
    np.testing.assert_array_equal(mat, lag_matrix_np([42.0, 40.0, 38.0, 36.0], [1, 3, 2], INF))


def test_wide_duplicate_lags(f1):
    out = lag_features(f1, "v", "t", [1, 1], fill=INF).orderBy("t").toPandas()
    names = lag_column_names(["v"], [1, 1])
    assert names == ["v_lag1", "v_lag1_p1"]
    np.testing.assert_array_equal(out["v_lag1"].to_numpy(), out["v_lag1_p1"].to_numpy())


def test_null_fill_mode(f1):
    out = lag_features(f1, "v", "t", [2]).orderBy("t").toPandas()
    assert out["v_lag2"].isna().tolist() == [True, True, False, False]


def test_lag_zero_identity(f1):
    out = lag_features(f1, "v", "t", [0]).orderBy("t").toPandas()
    np.testing.assert_array_equal(out["v_lag0"].to_numpy(), [42.0, 40.0, 38.0, 36.0])


def test_multiseries_wide(f2):
    # ColumnMajor analogue (src/lib.rs:999-1039): per-series lag columns.
    out = (
        lag_features(f2, "v", "t", [0, 1, 2, 3], partition_by="series_id", fill=INF)
        .orderBy("series_id", "t")
        .toPandas()
    )
    s0 = out[out.series_id == 0]
    s1 = out[out.series_id == 1]
    np.testing.assert_array_equal(
        s0[["v_lag0", "v_lag1", "v_lag2", "v_lag3"]].to_numpy().T,
        lag_matrix_np([1.0, 2.0, 3.0, 4.0], [0, 1, 2, 3], INF),
    )
    np.testing.assert_array_equal(
        s1[["v_lag0", "v_lag1", "v_lag2", "v_lag3"]].to_numpy().T,
        lag_matrix_np([-1.0, -2.0, -3.0, -4.0], [0, 1, 2, 3], INF),
    )


def test_long_layout_ordering(f2):
    # RowMajor analogue: lag_pos preserves arbitrary lag-set order
    # (lag-major then series row grouping, src/lib.rs:699-704, test :986-996).
    out = (
        lag_features(f2, "v", "t", [1, 3, 2], partition_by="series_id", fill=INF, layout="long")
        .orderBy("lag_pos", "series_id", "t")
        .toPandas()
    )
    assert list(out.columns) == ["series_id", "t", "lag_pos", "lag", "v_lagged"]
    assert out.lag.tolist()[:8] == [1] * 8  # lag_pos 0 → lag 1, both series
    # reconstruct the reference RowMajor matrix: row (pos*S + s) over t
    mat = out.v_lagged.to_numpy().reshape(3 * 2, 4)
    expected = np.array(
        [
            [INF, 1.0, 2.0, 3.0],
            [INF, -1.0, -2.0, -3.0],
            [INF, INF, INF, 1.0],
            [INF, INF, INF, -1.0],
            [INF, INF, 1.0, 2.0],
            [INF, INF, -1.0, -2.0],
        ]
    )
    np.testing.assert_array_equal(mat, expected)


def test_long_wide_duality(f2):
    # wide↔long round-trip: same values, different shape
    wide = lag_features(f2, "v", "t", [1, 2], partition_by="series_id").orderBy("series_id", "t").toPandas()
    long = (
        lag_features(f2, "v", "t", [1, 2], partition_by="series_id", layout="long")
        .orderBy("lag_pos", "series_id", "t")
        .toPandas()
    )
    np.testing.assert_array_equal(
        long[long.lag == 1].v_lagged.to_numpy(),
        wide.v_lag1.to_numpy(),
    )
    np.testing.assert_array_equal(
        long[long.lag == 2].v_lagged.to_numpy(),
        wide.v_lag2.to_numpy(),
    )


def test_multi_value_cols(f2):
    df = f2.withColumn("v2", f2.v * 10)
    out = (
        lag_features(df, ["v", "v2"], "t", [1], partition_by="series_id")
        .orderBy("series_id", "t")
        .toPandas()
    )
    np.testing.assert_array_equal(out.v2_lag1.fillna(0).to_numpy(), out.v_lag1.fillna(0).to_numpy() * 10)


def test_lead_features(f1):
    out = lead_features(f1, "v", "t", [1], fill=INF).orderBy("t").toPandas()
    np.testing.assert_array_equal(out.v_lead1.to_numpy(), [40.0, 38.0, 36.0, INF])


def test_lag_shape(f1):
    df = lag_features(f1, "v", "t", [1, 2])
    shape = lag_shape(df)
    assert shape["lag_columns"] == ["v_lag1", "v_lag2"]
    assert shape["lags_present"] == [1, 2]
    assert not shape["is_long"]


def test_lag_matrix_pd_matches_numpy(spark):
    data = [42.0, 40.0, 38.0, 36.0]
    via_spark = lag_matrix_pd(spark, data, [1, 3, 2], INF, stride=5)
    via_np = lag_matrix_np(data, [1, 3, 2], INF, stride=5)
    np.testing.assert_array_equal(via_spark, via_np)


def test_single_window_spec_one_exchange(f2):
    # All L lag expressions must share ONE window spec → exactly one
    # Exchange in the physical plan (SURVEY §4: "emit all lags over ONE
    # window spec so Catalyst plans one shuffle").
    df = lag_features(f2, "v", "t", [1, 2, 3, 4, 5], partition_by="series_id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan


def test_lag_matrix_2d_pd_matches_numpy(spark):
    from time_sift_spark.interop import lag_matrix_2d_np, lag_matrix_2d_pd

    rows = np.array([[1.0, 2.0, 3.0, 4.0], [-1.0, -2.0, -3.0, -4.0]])
    cases = [
        ("row", rows, [0, 1, 2, 3], 5),  # golden src/lib.rs:925-961
        ("row", rows, [1, 3, 2], 0),
        ("col", rows.T, [0, 1, 2, 3], 9),  # golden src/lib.rs:999-1039
        ("col", rows.T, [1, 3, 2], 7),  # golden src/lib.rs:1041-1075
    ]
    for layout, data, lags, stride in cases:
        via_spark = lag_matrix_2d_pd(spark, data, layout, lags, INF, stride)
        via_np = lag_matrix_2d_np(data, layout, lags, INF, stride)
        np.testing.assert_array_equal(via_spark, via_np)
    # non-square (quirk Q3 guard) through the Spark path too
    ns = np.array([[10.0, 20.0, 30.0, 40.0, 50.0]])
    np.testing.assert_array_equal(
        lag_matrix_2d_pd(spark, ns, "row", [0, 2], INF),
        lag_matrix_2d_np(ns, "row", [0, 2], INF),
    )


def test_type_polymorphism(spark):
    # Reference is generic over T: Copy (src/lib.rs:415-419); our plan is
    # type-polymorphic through Spark's lag: int/long/float/decimal/string
    # all lag with their type preserved.
    df = spark.createDataFrame(
        [(0, 1, 1.5, "a"), (1, 2, 2.5, "b"), (2, 3, 3.5, "c")],
        "t long, vi int, vf double, vs string",
    ).selectExpr("t", "vi", "vf", "vs", "CAST(vi AS DECIMAL(10,2)) AS vd")
    out = lag_features(df, ["vi", "vf", "vs", "vd"], "t", [1])
    types = dict(out.dtypes)
    assert types["vi_lag1"] == "int"
    assert types["vf_lag1"] == "double"
    assert types["vs_lag1"] == "string"
    assert types["vd_lag1"] == "decimal(10,2)"
    row = out.orderBy("t").collect()[1]
    assert row.vi_lag1 == 1 and row.vs_lag1 == "a" and float(row.vd_lag1) == 1.0


def test_timestamp_time_column(spark):
    import datetime as dt

    rows = [(dt.datetime(2024, 1, 1, h), float(h)) for h in range(4)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = lag_features(df, "v", "ts", [1]).orderBy("ts").toPandas()
    assert out.v_lag1.fillna(-1).tolist() == [-1.0, 0.0, 1.0, 2.0]


def test_null_aware_values(spark):
    # The reference has no nulls (fill-value model); our engine is
    # null-aware: a NULL data value lags through as NULL and — unlike the
    # fill — is NOT replaced by coalesce parity mode only when it came
    # from the shift. Document the chosen semantics: fill mode replaces
    # ALL nulls in the lagged column (shift-created or data), which is
    # exactly COALESCE(LAG(v), fill).
    df = spark.createDataFrame(
        [(0, 1.0), (1, None), (2, 3.0), (3, 4.0)], "t long, v double"
    )
    plain = lag_features(df, "v", "t", [1]).orderBy("t").toPandas()
    assert plain.v_lag1.isna().tolist() == [True, False, True, False]
    filled = lag_features(df, "v", "t", [1], fill=-1.0).orderBy("t").toPandas()
    assert filled.v_lag1.tolist() == [-1.0, 1.0, -1.0, 3.0]
