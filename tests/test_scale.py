"""Halo-bucketed global lag ≡ naive global window, and plan-quality
assertions (the 100 TB design checks: pushdown, pruning, shuffle count)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from time_sift_spark.operators.lag import lag_features
from time_sift_spark.operators.scale import lag_features_global


def _compare_global(spark, values, lags, num_buckets):
    n = len(values)
    pdf = pd.DataFrame({"t": np.arange(n, dtype="int64"), "v": np.asarray(values, dtype="float64")})
    df = spark.createDataFrame(pdf)
    naive = lag_features(df, "v", "t", lags).orderBy("t").toPandas()
    halo = (
        lag_features_global(df, "v", "t", lags, num_buckets=num_buckets)
        .orderBy("t")
        .toPandas()[naive.columns]
    )
    pd.testing.assert_frame_equal(halo, naive)


def test_global_lag_basic(spark):
    _compare_global(spark, list(np.arange(500.0)), [1, 7, 30], 8)


def test_global_lag_more_buckets_than_rows(spark):
    _compare_global(spark, [1.0, 2.0, 3.0], [1], 32)


def test_global_lag_heavy_duplicates(spark):
    # constant + repeated timestamps stress boundary assignment
    rng = np.random.RandomState(0)
    vals = rng.choice([1.0, 2.0, 3.0], size=300)
    _compare_global(spark, list(vals), [1, 5], 8)


_spark_ref = [None]


def _session():
    if _spark_ref[0] is None:
        from time_sift_spark.session import get_spark

        _spark_ref[0] = get_spark("time_sift_spark_tests", master="local[4]", shuffle_partitions=4)
    return _spark_ref[0]


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.floats(allow_nan=False, allow_infinity=False, width=32), min_size=2, max_size=200),
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=2, max_value=16),
)
def test_global_lag_property(values, max_lag, buckets):
    _compare_global(_session(), values, list(range(1, max_lag + 1)), buckets)


# ---------------------------------------------------------------------------
# plan quality
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_column_pruning_reaches_scan(spark):
    from time_sift_spark.sources.catalog import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    df = lag_features(
        li, "l_extendedprice", "l_shipdate", [1], partition_by="l_partkey"
    )
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    # only the 3 needed columns are read from parquet, not all 11
    assert "l_extendedprice" in read_schema and "l_partkey" in read_schema
    assert "l_quantity" not in read_schema and "l_returnflag" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    from time_sift_spark.sources.catalog import load_table

    li = load_table(spark, "lineitem", "/root/testdata/sf0.001").where("l_partkey = 7")
    plan = _plan(lag_features(li, "l_quantity", "l_shipdate", [1], partition_by="l_partkey"))
    assert "PushedFilters: [" in plan and "EqualTo(l_partkey,7" in plan


def test_knn_broadcasts_small_side(spark):
    from time_sift_spark.queries import REGISTRY

    plan = _plan(REGISTRY["knn_cosine_topk"].spark_fn(spark, "/root/testdata/sf0.001"))
    assert "Broadcast" in plan  # 8-row query side must broadcast, not shuffle


def test_global_lag_no_single_partition_window(spark):
    # the halo plan must contain NO un-partitioned window (SinglePartition
    # exchange feeding a Window) — that's exactly the cliff it removes
    df = spark.range(0, 10000).selectExpr("id AS t", "CAST(id AS DOUBLE) AS v")
    plan = _plan(lag_features_global(df, "v", "t", [3], num_buckets=8))
    windows = [seg for seg in plan.split("\n") if "Window" in seg and "windowspec" not in seg]
    assert "SinglePartition" not in plan, plan
    assert windows, "expected Window nodes in plan"
