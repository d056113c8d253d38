"""Series↔array layout conversion tests."""

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.arrays import arrays_to_series, series_to_arrays


def test_series_to_arrays_ordering_and_padding(spark):
    pdf = pd.DataFrame({"k": [1, 1, 1, 2], "t": [2, 0, 1, 5], "v": [30.0, 10.0, 20.0, 7.0]})
    out = (
        series_to_arrays(spark.createDataFrame(pdf), "v", "t", partition_by="k", pad_to=5, fill=float("inf"))
        .orderBy("k")
        .toPandas()
    )
    assert out.n_points.tolist() == [3, 1]
    assert list(out["values"][0]) == [10.0, 20.0, 30.0, float("inf"), float("inf")]  # time-ordered + stride padding
    assert list(out["values"][1][:1]) == [7.0] and len(out["values"][1]) == 5


def test_round_trip(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2], "t": [1, 0, 0], "v": [2.0, 1.0, 9.0]})
    arr = series_to_arrays(spark.createDataFrame(pdf), "v", "t", partition_by="k")
    back = arrays_to_series(arr.select("k", "values"), "values", partition_by="k").orderBy("k", "t").toPandas()
    assert back.v.tolist() == [1.0, 2.0, 9.0]
    assert back.t.tolist() == [0, 1, 0]  # position-as-time, 0-based


def test_pad_requires_fill(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [0], "v": [1.0]}))
    with pytest.raises(ValueError):
        series_to_arrays(df, "v", "t", partition_by="k", pad_to=4)
    with pytest.raises(ColumnNotFoundError):
        series_to_arrays(df, "nope", "t", partition_by="k")
