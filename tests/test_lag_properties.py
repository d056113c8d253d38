"""Property tests: the distributed plan ≡ the local semantic model.

The numpy model (interop.lag_matrix_np) was itself validated against every
reference golden (test_golden_numpy.py), so Spark ≡ numpy ⇒ Spark ≡
reference semantics on arbitrary inputs, not just the goldens.
"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from time_sift_spark.interop import lag_matrix_np
from time_sift_spark.operators.lag import lag_features
from time_sift_spark.plans.lag_plan import lag_column_names

FINITE = st.floats(allow_nan=False, allow_infinity=False, width=32)


@st.composite
def series_and_lags(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    values = draw(st.lists(FINITE, min_size=n, max_size=n))
    lags = draw(st.lists(st.integers(min_value=0, max_value=n - 1), min_size=1, max_size=6))
    return values, lags


_spark = None


def _get_session():
    # hypothesis can't take a pytest fixture inside @given; reuse the
    # session-scoped JVM via the conftest-configured builder.
    global _spark
    if _spark is None:
        from time_sift_spark.session import get_spark

        _spark = get_spark("time_sift_spark_tests", master="local[4]", shuffle_partitions=4)
    return _spark


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_and_lags())
def test_spark_matches_numpy_model(case):
    values, lags = case
    spark = _get_session()
    n = len(values)
    sdf = spark.createDataFrame(pd.DataFrame({"t": np.arange(n, dtype=np.int64), "v": np.asarray(values, dtype=np.float64)}))
    out = lag_features(sdf, "v", "t", lags, fill=float("inf")).orderBy("t").toPandas()
    got = out[lag_column_names(["v"], lags)].to_numpy(dtype=np.float64).T
    expected = lag_matrix_np(values, lags, np.inf)
    np.testing.assert_array_equal(got, expected)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_and_lags(), st.integers(min_value=2, max_value=4))
def test_multiseries_partition_isolation(case, num_series):
    # Lagging never leaks across series boundaries: each partition behaves
    # exactly like an independent 1-D call.
    values, lags = case
    spark = _get_session()
    n = len(values)
    frames = []
    per_series = []
    for s in range(num_series):
        shifted = [v + s * 1000.0 for v in values]
        per_series.append(shifted)
        frames.append(pd.DataFrame({"sid": s, "t": np.arange(n, dtype=np.int64), "v": shifted}))
    sdf = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    out = (
        lag_features(sdf, "v", "t", lags, partition_by="sid", fill=float("inf"))
        .orderBy("sid", "t")
        .toPandas()
    )
    names = lag_column_names(["v"], lags)
    for s in range(num_series):
        got = out[out.sid == s][names].to_numpy(dtype=np.float64).T
        np.testing.assert_array_equal(got, lag_matrix_np(per_series[s], lags, np.inf))


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(series_and_lags())
def test_lead_is_reversed_lag(case):
    # lead(k) on a series ≡ reverse(lag(k) on reversed series) — pins the
    # lead path against the already-validated lag model.
    values, lags = case
    spark = _get_session()
    n = len(values)
    sdf = spark.createDataFrame(
        pd.DataFrame({"t": np.arange(n, dtype=np.int64), "v": np.asarray(values, dtype=np.float64)})
    )
    from time_sift_spark.operators.lag import lead_features

    out = lead_features(sdf, "v", "t", lags, fill=float("inf")).orderBy("t").toPandas()
    reversed_model = lag_matrix_np(list(reversed(values)), lags, np.inf)
    for pos, k in enumerate(lags):
        name = f"v_lead{k}" if (("v", k) not in [("v", kk) for kk in lags[:pos]]) else f"v_lead{k}_p{pos}"
        got = out[name].to_numpy(dtype=np.float64)
        expected = reversed_model[pos][::-1]
        np.testing.assert_array_equal(got, expected)
