"""Gap-fill operator semantics on a hand-checked fixture."""

import datetime as dt

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.gapfill import fill_gaps


def d(day):
    return dt.datetime(2024, 1, day)


def test_fill_gaps_ffill(spark):
    # key A observed on days 1,2,5 (hole at 3,4); key B on day 2 only
    pdf = pd.DataFrame(
        {
            "k": ["A", "A", "A", "B"],
            "bucket": [d(1), d(2), d(5), d(2)],
            "v": [10.0, 20.0, 50.0, 7.0],
        }
    )
    out = (
        fill_gaps(spark.createDataFrame(pdf), "bucket", "day", ["v"], partition_by="k")
        .orderBy("k", "bucket")
        .toPandas()
    )
    a = out[out.k == "A"]
    assert a.bucket.tolist() == [d(1), d(2), d(3), d(4), d(5)]
    assert a.v_filled.tolist() == [10.0, 20.0, 20.0, 20.0, 50.0]
    assert a.is_gap.tolist() == [False, False, True, True, False]
    b = out[out.k == "B"]
    assert len(b) == 1 and not b.is_gap.iloc[0]


def test_fill_gaps_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": ["A"], "bucket": [d(1)], "v": [1.0]}))
    with pytest.raises(ValueError):
        fill_gaps(df, "bucket", "fortnight", ["v"], partition_by="k")
    with pytest.raises(ColumnNotFoundError):
        fill_gaps(df, "bucket", "day", ["nope"], partition_by="k")
    with pytest.raises(ValueError):
        fill_gaps(df, "bucket", "day", ["v"], partition_by="k", strategy="bfill")


# --------------------------------------------------------------------------
# LOCF imputation
# --------------------------------------------------------------------------


def test_locf_carries_last_non_null(spark):
    from time_sift_spark.operators.gapfill import locf

    df = spark.createDataFrame(
        [("u", 1, 10.0), ("u", 2, None), ("u", 3, None), ("u", 4, 40.0), ("u", 5, None)],
        "k string, t long, v double",
    )
    out = {r.t: r.v_filled for r in locf(df, "v", "t", partition_by="k").collect()}
    assert out == {1: 10.0, 2: 10.0, 3: 10.0, 4: 40.0, 5: 40.0}


def test_locf_leading_nulls_stay_null_and_keys_isolated(spark):
    from time_sift_spark.operators.gapfill import locf

    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 2.0), ("b", 1, 9.0), ("b", 2, None)],
        "k string, t long, v double",
    )
    out = {(r.k, r.t): r.v_filled for r in locf(df, "v", "t", partition_by="k").collect()}
    assert out[("a", 1)] is None
    assert out[("a", 2)] == 2.0
    assert out[("b", 2)] == 9.0  # b's null filled from b, not from a


def test_locf_validation(spark):
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.gapfill import locf

    df = spark.createDataFrame([("a", 1, 1.0)], "k string, t long, v double")
    with pytest.raises(ColumnNotFoundError):
        locf(df, "nope", "t", partition_by="k")


# --------------------------------------------------------------------------
# M4 downsampling
# --------------------------------------------------------------------------


def test_m4_keeps_extremes_and_endpoints(spark):
    import pandas as pd

    from time_sift_spark.operators.resample import m4_downsample

    base = pd.Timestamp("2024-01-01")
    # one bucket's worth of points: extremes at ids 2 (max) and 4 (min)
    pdf = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(minutes=m) for m in range(6)],
            "v": [5.0, 7.0, 100.0, 6.0, -50.0, 5.5],
            "id": list(range(6)),
        }
    )
    out = (
        m4_downsample(spark.createDataFrame(pdf), "ts", "v", "id", num_buckets=1)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert set(out.index) == {0, 2, 4, 5}  # first, vmax, vmin, last
    assert bool(out.loc[0, "is_tmin"]) and bool(out.loc[5, "is_tmax"])
    assert bool(out.loc[2, "is_vmax"]) and bool(out.loc[4, "is_vmin"])
    # per-bucket bound: ≤ 4 rows whatever the input size
    many = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=s) for s in range(500)],
            "v": [float((s * 37) % 101) for s in range(500)],
            "id": list(range(500)),
        }
    )
    out2 = m4_downsample(
        spark.createDataFrame(many), "ts", "v", "id", num_buckets=10
    ).toPandas()
    assert out2.groupby("bucket").size().max() <= 4
    assert out2.bucket.nunique() == 10
    # the true global extremes always survive downsampling
    assert many.loc[many.v.idxmax(), "id"] in set(out2.id)
    assert many.loc[many.v.idxmin(), "id"] in set(out2.id)


def test_m4_validation(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.resample import m4_downsample

    df = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2024-01-01")], "v": [1.0], "id": [1]})
    )
    with pytest.raises(ColumnNotFoundError):
        m4_downsample(df, "nope", "v", "id")
    with pytest.raises(ValueError):
        m4_downsample(df, "ts", "v", "id", num_buckets=0)
    num = spark.createDataFrame(pd.DataFrame({"t": [5], "v": [1.0], "id": [1]}))
    with pytest.raises(TypeError):
        m4_downsample(num, "t", "v", "id")
