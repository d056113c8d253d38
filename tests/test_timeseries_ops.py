"""Unit tests for the time-series extension operators (rolling,
sessionize, as-of join, resample) on tiny hand-checked fixtures."""

import datetime as dt

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError, InvalidLagsError
from time_sift_spark.operators.asof import asof_join
from time_sift_spark.operators.resample import resample
from time_sift_spark.operators.rolling import rolling_features
from time_sift_spark.operators.sessionize import sessionize


def ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_rolling_basic(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"sid": [0] * 4, "t": [0, 1, 2, 3], "v": [1.0, 2.0, 3.0, 4.0]})
    )
    out = (
        rolling_features(df, "v", "t", [2], stats=("sum", "count"), partition_by="sid")
        .orderBy("t")
        .toPandas()
    )
    assert out.v_r2_sum.tolist() == [1.0, 3.0, 5.0, 7.0]
    assert out.v_r2_count.tolist() == [1, 2, 2, 2]


def test_rolling_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": [0], "v": [1.0]}))
    with pytest.raises(InvalidLagsError):
        rolling_features(df, "v", "t", [])
    with pytest.raises(InvalidLagsError):
        rolling_features(df, "v", "t", [0])
    with pytest.raises(InvalidLagsError):
        rolling_features(df, "v", "t", [2], stats=("median",))
    with pytest.raises(ColumnNotFoundError):
        rolling_features(df, "x", "t", [2])


def test_sessionize(spark):
    # user 7: events at 00:00, 00:10, 02:00, 02:30 with 1h gap →
    # sessions {0: [00:00, 00:10], 1: [02:00, 02:30]}
    pdf = pd.DataFrame(
        {
            "user_id": [7, 7, 7, 7, 8],
            "ts": [ts(0), ts(0, 10), ts(2), ts(2, 30), ts(5)],
            "event_id": [1, 2, 3, 4, 5],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        sessionize(df, "ts", 3600, partition_by="user_id", order_extra="event_id")
        .orderBy("user_id", "ts")
        .toPandas()
    )
    assert out[out.user_id == 7].session_seq.tolist() == [0, 0, 1, 1]
    assert out[out.user_id == 7].is_session_start.tolist() == [1, 0, 1, 0]
    assert out[out.user_id == 8].session_seq.tolist() == [0]


def test_sessionize_gap_boundary(spark):
    # gap exactly == threshold does NOT start a new session (strict >)
    pdf = pd.DataFrame({"user_id": [1, 1], "ts": [ts(0), ts(1)], "event_id": [1, 2]})
    out = sessionize(spark.createDataFrame(pdf), "ts", 3600, partition_by="user_id").orderBy("ts").toPandas()
    assert out.session_seq.tolist() == [0, 0]


def test_asof_join(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "t": [ts(1), ts(3), ts(5), ts(1)], "lid": [10, 11, 12, 13]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [ts(2), ts(4), ts(9)], "price": [100.0, 200.0, 300.0]})
    )
    out = (
        asof_join(left, right, on="k", left_time="t", right_time="t", right_cols=["price"])
        .orderBy("k", "t")
        .toPandas()
    )
    # k=1: t1 → no match; t3 → 100 (t2); t5 → 200 (t4). k=2: t1 → none.
    assert out.price_asof.isna().tolist() == [True, False, False, True]
    assert out.price_asof.dropna().tolist() == [100.0, 200.0]


def test_asof_join_inclusive_tie(spark):
    # right row at exactly the left time IS matched (backward inclusive)
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(2)], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(2)], "price": [42.0]}))
    out = asof_join(left, right, on="k", left_time="t", right_time="t", right_cols=["price"]).toPandas()
    assert out.price_asof.tolist() == [42.0]


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1, 2], "t": [ts(1), ts(3), ts(5), ts(1)], "lid": [10, 11, 12, 13]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [ts(2), ts(4), ts(9)], "price": [100.0, 200.0, 300.0]})
    )
    out = (
        asof_join(left, right, on="k", left_time="t", right_time="t",
                  right_cols=["price"], direction="forward")
        .orderBy("k", "t")
        .toPandas()
    )
    # k=1: t1 → 100 (next at t2); t3 → 200 (t4); t5 → none. k=2: t1 → 300 (t9).
    assert out.price_asof.isna().tolist() == [False, False, True, False]
    assert out.price_asof.dropna().tolist() == [100.0, 200.0, 300.0]


def test_asof_join_forward_inclusive_tie(spark):
    # right row at exactly the left time IS matched (forward inclusive)
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(2)], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(2)], "price": [42.0]}))
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["price"], direction="forward").toPandas()
    assert out.price_asof.tolist() == [42.0]


def test_asof_forward_matches_pandas_merge_asof(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    lp = pd.DataFrame({
        "k": rng.randint(0, 4, 60), "t": [ts(int(x) // 60, int(x) % 60) for x in rng.choice(500, 60, replace=False)],
    }).sort_values("t")
    rp = pd.DataFrame({
        "k": rng.randint(0, 4, 40), "t": [ts(int(x) // 60, int(x) % 60) for x in rng.choice(500, 40, replace=False)],
        "price": rng.rand(40).round(3) * 100,
    }).sort_values("t")
    out = (
        asof_join(spark.createDataFrame(lp), spark.createDataFrame(rp),
                  on="k", left_time="t", right_time="t",
                  right_cols=["price"], direction="forward")
        .orderBy("k", "t").toPandas()
    )
    expect = pd.merge_asof(lp, rp, on="t", by="k", direction="forward").sort_values(["k", "t"]).reset_index(drop=True)
    assert out.price_asof.round(6).where(out.price_asof.notna(), -1).tolist() == \
        expect.price.round(6).where(expect.price.notna(), -1).tolist()


def test_resample(spark):
    pdf = pd.DataFrame(
        {
            "ts": [ts(0, 5), ts(0, 30), ts(1, 10)],
            "v": [1.0, 2.0, 4.0],
            "u": [1, 2, 1],
        }
    )
    out = (
        resample(
            spark.createDataFrame(pdf),
            "ts",
            "hour",
            {"n": ("count", "v"), "sv": ("sum", "v"), "nu": ("count_distinct", "u")},
        )
        .orderBy("bucket")
        .toPandas()
    )
    assert out.n.tolist() == [2, 1]
    assert out.sv.tolist() == [3.0, 4.0]
    assert out.nu.tolist() == [2, 1]
    assert out.bucket.tolist() == [ts(0), ts(1)]


def test_range_rolling(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "k": [1] * 4,
            "ts": [ts(0), ts(0, 30), ts(1, 15), ts(3)],
            "v": [1.0, 2.0, 4.0, 8.0],
        }
    )
    from time_sift_spark.operators.rolling import range_rolling_features

    out = (
        range_rolling_features(
            spark.createDataFrame(pdf), "v", "ts", [3600], stats=("sum", "count"), partition_by="k"
        )
        .orderBy("ts")
        .toPandas()
    )
    # 1h trailing (exclusive of exactly -1h): 00:00→1; 00:30→1+2; 01:15→2+4
    # (00:00 is 75min back, out); 03:00→8
    assert out.v_t3600s_sum.tolist() == [1.0, 3.0, 6.0, 8.0]
    assert out.v_t3600s_count.tolist() == [1, 2, 2, 1]


def test_range_rolling_boundary_exclusive(spark):
    import pandas as pd

    from time_sift_spark.operators.rolling import range_rolling_features

    pdf = pd.DataFrame({"k": [1, 1], "ts": [ts(0), ts(1)], "v": [5.0, 1.0]})
    out = (
        range_rolling_features(
            spark.createDataFrame(pdf), "v", "ts", [3600], stats=("sum",), partition_by="k"
        )
        .orderBy("ts")
        .toPandas()
    )
    # an event exactly 1h earlier is OUTSIDE the (t-1h, t] frame
    assert out.v_t3600s_sum.tolist() == [5.0, 1.0]


def test_asof_lookup_equals_window_form(spark):
    # both physical strategies must agree on random data
    import numpy as np

    from time_sift_spark.operators.asof import asof_join, asof_join_lookup

    rng = np.random.RandomState(11)
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": rng.randint(0, 5, 200),
                "t": rng.randint(0, 10_000, 200).astype("int64"),
                "lid": np.arange(200),
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": rng.randint(0, 5, 60),
                "t": rng.randint(0, 10_000, 60).astype("int64"),
                "price": rng.randn(60).round(3),
            }
        )
    )
    a = (
        asof_join(left, right, on="k", left_time="t", right_time="t", right_cols=["price"])
        .orderBy("lid")
        .toPandas()
    )
    b = (
        asof_join_lookup(left, right, on="k", left_time="t", right_time="t", right_cols=["price"])
        .orderBy("lid")
        .toPandas()[a.columns.tolist()]
    )
    pd.testing.assert_frame_equal(a, b)


def test_asof_lookup_broadcast_no_left_shuffle(spark):
    from time_sift_spark.operators.asof import asof_join_lookup

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [5], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [3], "price": [1.0]}))
    df = asof_join_lookup(left, right, on="k", left_time="t", right_time="t", right_cols=["price"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan


def test_asof_property_vs_merge_asof(spark):
    # both as-of strategies vs pandas merge_asof on random data
    import numpy as np

    from time_sift_spark.operators.asof import asof_join, asof_join_lookup

    rng = np.random.RandomState(23)
    for trial in range(3):
        nl, nr = 120, 40
        lp = pd.DataFrame(
            {
                "k": rng.randint(0, 4, nl),
                "t": np.sort(rng.choice(100_000, nl, replace=False)).astype("int64"),
                "lid": np.arange(nl),
            }
        )
        rp = pd.DataFrame(
            {
                "k": rng.randint(0, 4, nr),
                "t": np.sort(rng.choice(100_000, nr, replace=False)).astype("int64"),
                "price": rng.randn(nr).round(3),
            }
        )
        expected = pd.merge_asof(
            lp.sort_values("t"), rp.sort_values("t"), on="t", by="k", direction="backward"
        ).sort_values("lid")
        for fn in (asof_join, asof_join_lookup):
            got = (
                fn(
                    spark.createDataFrame(lp),
                    spark.createDataFrame(rp),
                    on="k",
                    left_time="t",
                    right_time="t",
                    right_cols=["price"],
                )
                .orderBy("lid")
                .toPandas()
            )
            np.testing.assert_allclose(
                got.price_asof.to_numpy(dtype=float),
                expected.price.to_numpy(dtype=float),
                equal_nan=True,
                err_msg=f"{fn.__name__} trial {trial}",
            )


def test_time_weighted_avg_hand_checked(spark):
    from time_sift_spark.operators.rolling import time_weighted_avg

    # key 1: value 10 held 2s, value 20 held 6s, last row no interval
    #        twa = (10*2 + 20*6) / 8 = 17.5
    # key 2: single row -> no interval -> key absent from output
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "t": pd.to_datetime([0, 2_000_000, 8_000_000, 0], unit="us", utc=True),
            "v": [10.0, 20.0, 99.0, 7.0],
        }
    )
    out = (
        time_weighted_avg(spark.createDataFrame(pdf), "v", "t", partition_by="k")
        .orderBy("k")
        .toPandas()
    )
    assert out.k.tolist() == [1]
    assert out.time_weighted_avg.tolist() == [17.5]
    assert out.n_intervals.tolist() == [2]


def test_time_weighted_avg_validation(spark):
    from time_sift_spark.operators.rolling import time_weighted_avg

    pdf = pd.DataFrame({"k": [1], "t": pd.to_datetime([0], unit="us", utc=True), "v": [1.0]})
    with pytest.raises(ColumnNotFoundError):
        time_weighted_avg(spark.createDataFrame(pdf), "nope", "t", partition_by="k")


def test_time_weighted_avg_all_ties_key_absent(spark):
    # A key whose rows all share one timestamp has only zero-length
    # intervals: sum(dt)=0 would be DIVIDE_BY_ZERO under ANSI — the
    # operator must drop the key entirely, not crash (code-review r2).
    from time_sift_spark.operators.rolling import time_weighted_avg

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2],
            "t": pd.to_datetime([5, 5, 0, 3_000_000], unit="us", utc=True),
            "v": [1.0, 2.0, 4.0, 9.0],
        }
    )
    out = (
        time_weighted_avg(spark.createDataFrame(pdf), "v", "t", partition_by="k")
        .orderBy("k")
        .toPandas()
    )
    assert out.k.tolist() == [2]
    assert out.time_weighted_avg.tolist() == [4.0]


def test_ts_us_operators_reject_numeric_time(spark):
    """Epoch-numeric time columns must raise at plan-build time (ADVICE
    r5: CAST silently reads a long as epoch SECONDS — off by 1e6)."""
    import pandas as pd
    import pytest

    from time_sift_spark.operators.rangejoin import interval_join, interval_join_lookup
    from time_sift_spark.operators.rolling import range_rolling_features, time_weighted_avg
    from time_sift_spark.operators.sessionize import sessionize

    num = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [1_000_000, 2_000_000], "v": [1.0, 2.0]})
    )
    with pytest.raises(TypeError, match="epoch"):
        sessionize(num, "t", 60, partition_by="k").collect()
    with pytest.raises(TypeError, match="epoch"):
        range_rolling_features(num, "v", "t", range_seconds=[60], partition_by="k").collect()
    with pytest.raises(TypeError, match="epoch"):
        time_weighted_avg(num, "v", "t", partition_by="k").collect()
    with pytest.raises(TypeError, match="epoch"):
        interval_join(
            num, num, on="k", left_time="t", right_time="t",
            tolerance_seconds=1, left_cols=["v"], right_cols=["v"],
        ).collect()
    with pytest.raises(TypeError, match="epoch"):
        interval_join_lookup(
            num, num, on="k", left_time="t", right_time="t",
            tolerance_seconds=1, left_cols=["v"], right_cols=["v"],
        ).collect()


def test_asof_lookup_guardrail_falls_back(spark):
    """asof_join_lookup over max_broadcast_rows degrades to the
    union+window plan: identical columns and values, plus a warning."""
    import warnings

    import pandas as pd

    from time_sift_spark.operators.asof import asof_join, asof_join_lookup

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-02"]), "x": [1, 2, 3]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-05"]), "p": [10.0, 20.0, 30.0]})
    )
    kw = dict(on="k", left_time="t", right_time="t", right_cols=["p"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = asof_join_lookup(left, right, max_broadcast_rows=1, **kw)
        rows = sorted(map(tuple, out.select("k", "t", "x", "p_asof").collect()))
    assert any("falling back" in str(w.message) for w in caught)
    expect = sorted(map(tuple,
        asof_join(left, right, **kw).select("k", "t", "x", "p_asof").collect()))
    assert rows == expect
    assert len(rows) == 3


def test_asof_tolerance_matches_merge_asof(spark):
    """tolerance_us reproduces pandas merge_asof(tolerance=...) exactly."""
    import numpy as np

    rng = np.random.default_rng(17)
    n = 400
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        }
    ).sort_values("t").reset_index(drop=True)
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, n),
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "v": rng.normal(size=n).round(3),
        }
    ).sort_values("t").reset_index(drop=True)
    tol_s = 3600
    expect = pd.merge_asof(
        left, right, on="t", by="k", tolerance=pd.Timedelta(seconds=tol_s)
    )
    from time_sift_spark.operators.asof import asof_join

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            left_time="t",
            right_time="t",
            right_cols=["v"],
            tolerance_us=tol_s * 10**6,
        )
        .orderBy("t", "k")
        .toPandas()
        .reset_index(drop=True)
    )
    expect_sorted = expect.sort_values(["t", "k"]).reset_index(drop=True)
    assert got.v_asof.fillna(-999).tolist() == expect_sorted.v.fillna(-999).tolist()
    # and tolerance genuinely fired somewhere (some match dropped)
    no_tol = pd.merge_asof(left, right, on="t", by="k")
    assert no_tol.v.notna().sum() > expect.v.notna().sum()


def test_asof_tolerance_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1.0], "v": [1.0]}))
    from time_sift_spark.operators.asof import asof_join

    with pytest.raises(ValueError):
        asof_join(df, df, on="k", left_time="t", right_time="t", right_cols=["v"], tolerance_us=-1)
    with pytest.raises(TypeError):
        # numeric time column + tolerance must fail loudly, not misread
        asof_join(df, df, on="k", left_time="t", right_time="t", right_cols=["v"], tolerance_us=10)


def test_hopping_window_agg_overlap(spark):
    """Every event appears in window/hop slots; hand-checked alignment."""
    from time_sift_spark.operators.resample import hopping_window_agg

    pdf = pd.DataFrame(
        {
            "ts": [dt.datetime(2024, 1, 1, 0, 20), dt.datetime(2024, 1, 1, 0, 50)],
            "v": [1.0, 10.0],
        }
    )
    out = (
        hopping_window_agg(
            spark.createDataFrame(pdf), "ts", "1 hour", "15 minutes",
            {"n": ("count", "v"), "s": ("sum", "v")},
        )
        .orderBy("window_start")
        .toPandas()
    )
    # event at 00:20 -> windows starting 23:30..00:15; at 00:50 -> 00:00..00:45
    assert out.n.sum() == 8  # 2 events x 4 slots each
    both = out[(out.n == 2)]
    # overlap: windows starting 00:00 and 00:15 contain both events
    assert both.window_start.tolist() == [
        dt.datetime(2024, 1, 1, 0, 0),
        dt.datetime(2024, 1, 1, 0, 15),
    ]
    assert (both.s == 11.0).all()
    assert (
        (out.window_end - out.window_start) == pd.Timedelta(hours=1)
    ).all()


def test_hopping_window_validation(spark):
    from time_sift_spark.operators.resample import hopping_window_agg

    df = spark.createDataFrame(pd.DataFrame({"t": [1.0], "v": [1.0]}))
    with pytest.raises(TypeError):
        hopping_window_agg(df, "t", "1 hour", "15 minutes", {"n": ("count", "v")})
    with pytest.raises(ValueError):
        hopping_window_agg(
            spark.createDataFrame(pd.DataFrame({"ts": [dt.datetime(2024, 1, 1)], "v": [1.0]})),
            "ts", "1 hour", "15 minutes", {"n": ("median", "v")},
        )


# --------------------------------------------------------------------------
# Nearest-direction as-of join
# --------------------------------------------------------------------------


def _nearest_fixture(spark):
    import pandas as pd

    from time_sift_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a", "b"],
                "lt": pd.to_datetime(
                    ["2024-01-01 00:10", "2024-01-01 01:00", "2024-01-01 03:59", "2024-01-01 02:00"]
                ),
                "lid": [1, 2, 3, 4],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "b"],
                "rt": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 02:00", "2024-01-01 05:00"]),
                "v": [10.0, 20.0, 30.0],
            }
        )
    )
    return asof_join(
        left, right, on="k", left_time="lt", right_time="rt", right_cols=["v"],
        direction="nearest",
    ), left, right


def test_asof_nearest_picks_closer_side(spark):
    out, _, _ = _nearest_fixture(spark)
    got = {r.lid: r.v_asof for r in out.collect()}
    # lid=1: 00:10 — backward 00:00 (10m) vs forward 02:00 (110m) -> 10.0
    # lid=2: 01:00 — equidistant (60m both) -> tie goes backward -> 10.0
    # lid=3: 03:59 — backward 02:00 (119m), no forward -> 20.0
    # lid=4: only forward exists (05:00) -> 30.0
    assert got == {1: 10.0, 2: 10.0, 3: 20.0, 4: 30.0}


def test_asof_nearest_tolerance_discards_far_matches(spark):
    import pandas as pd

    from time_sift_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"], "lt": pd.to_datetime(["2024-01-01 01:00"]), "lid": [1]}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a"], "rt": pd.to_datetime(["2024-01-01 00:00"]), "v": [1.0]}
        )
    )
    out = asof_join(
        left, right, on="k", left_time="lt", right_time="rt", right_cols=["v"],
        direction="nearest", tolerance_us=30 * 60 * 1_000_000,
    ).collect()[0]
    assert out.v_asof is None  # 60m away > 30m tolerance


def test_asof_nearest_single_exchange(spark):
    out, _, _ = _nearest_fixture(spark)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_asof_nearest_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.asof import asof_join

    rng = np.random.RandomState(11)
    lpd = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 60),
            "lt": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10_000, 60), "s"),
        }
    ).sort_values("lt").reset_index(drop=True)
    lpd["lid"] = range(60)
    rpd = pd.DataFrame(
        {
            "k": rng.choice(["a", "b"], 25),
            "rt": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.randint(0, 10_000, 25), "s"),
            "v": rng.randn(25).round(3),
        }
    ).sort_values("rt").reset_index(drop=True)
    got = (
        asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on="k", left_time="lt", right_time="rt", right_cols=["v"],
            direction="nearest",
        )
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    want = pd.merge_asof(
        lpd, rpd, left_on="lt", right_on="rt", by="k", direction="nearest"
    ).sort_values("lid").reset_index(drop=True)
    lhs = got.v_asof.fillna(np.inf)
    rhs = want.v.fillna(np.inf)
    assert (lhs == rhs).all(), pd.concat([got, want.v], axis=1)


# --------------------------------------------------------------------------
# Linear interpolation join
# --------------------------------------------------------------------------


def test_asof_interpolate_brackets_and_edges(spark):
    import pandas as pd

    from time_sift_spark.operators.asof import asof_interpolate

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a"] * 5,
                "lt": pd.to_datetime(
                    ["2024-01-01 00:30", "2024-01-01 01:00", "2024-01-01 01:45",
                     "2024-01-01 02:00", "2024-01-01 03:30"]
                ),
                "lid": [1, 2, 3, 4, 5],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a"],
                "rt": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 02:00", "2024-01-01 03:00"]),
                "v": [10.0, 30.0, 40.0],
            }
        )
    )
    out = asof_interpolate(
        left, right, on="k", left_time="lt", right_time="rt", value_col="v"
    )
    got = {r.lid: r.v_interp for r in out.collect()}
    assert got[1] == 10.0      # before first obs: flat-extends forward value
    assert got[2] == 10.0      # exactly on an observation
    assert got[3] == 25.0      # 45/60 of the way from 10 -> 30
    assert got[4] == 30.0      # exactly on an observation
    assert got[5] == 40.0      # after last obs: flat-extends backward value


def test_asof_interpolate_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.asof import asof_interpolate

    rng = np.random.RandomState(5)
    lt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        sorted(rng.choice(10_000, 50, replace=False)), "s"
    )
    rt = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        sorted(rng.choice(10_000, 20, replace=False)), "s"
    )
    lpd = pd.DataFrame({"k": ["a"] * 50, "lt": lt, "lid": range(50)})
    rpd = pd.DataFrame({"k": ["a"] * 20, "rt": rt, "v": rng.randn(20).round(3)})
    got = (
        asof_interpolate(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on="k", left_time="lt", right_time="rt", value_col="v", round_to=6,
        )
        .toPandas().sort_values("lid").reset_index(drop=True)
    )
    # pandas reference: set v on the union timeline, time-interpolate, sample
    ser = pd.Series(rpd.v.values, index=pd.DatetimeIndex(rpd.rt))
    union = ser.reindex(
        ser.index.union(pd.DatetimeIndex(lpd["lt"]))
    ).interpolate(method="time")
    # flat extension at edges (pandas interpolate leaves leading NaN -> bfill)
    union = union.bfill().ffill()
    want = union.loc[pd.DatetimeIndex(lpd["lt"])].values
    assert np.allclose(got.v_interp.values, want, atol=1e-4)


def test_asof_interpolate_validation(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.asof import asof_interpolate

    left = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "lt": pd.to_datetime(["2024-01-01"]), "lid": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": ["a"], "rt": pd.to_datetime(["2024-01-01"]), "v": [1.0]})
    )
    with pytest.raises(ColumnNotFoundError):
        asof_interpolate(left, right, on="k", left_time="lt", right_time="rt", value_col="nope")
    num = spark.createDataFrame(pd.DataFrame({"k": ["a"], "lt": [5], "lid": [1]}))
    with pytest.raises(TypeError):
        asof_interpolate(num, right, on="k", left_time="lt", right_time="rt", value_col="v")


def test_asof_null_payload_comes_from_matched_row(spark):
    """A NULL-valued right row is still THE match (pandas merge_asof
    matches the most recent right ROW, nulls included) — the carry must
    not substitute an older non-NULL value under the newer row's match.
    Regression for the per-column last(ignorenulls) row-mixing defect."""
    import numpy as np

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [ts(3), ts(5)], "lid": [0, 1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [ts(1), ts(4)], "price": [100.0, np.nan]})
    )
    # backward: t3 matches t1 (100.0); t5 matches t4 whose price is NULL
    out = (
        asof_join(left, right, on="k", left_time="t", right_time="t", right_cols=["price"])
        .orderBy("t")
        .toPandas()
    )
    assert out.price_asof.tolist()[0] == 100.0
    assert pd.isna(out.price_asof.tolist()[1])
    # forward from t3 matches t4 → NULL, not a farther non-NULL row
    fwd = (
        asof_join(left, right, on="k", left_time="t", right_time="t",
                  right_cols=["price"], direction="forward")
        .orderBy("t")
        .toPandas()
    )
    assert pd.isna(fwd.price_asof.tolist()[0])


def test_asof_nearest_null_payload_same_row_as_gap(spark):
    """nearest: the direction is chosen by the matched row's gap and the
    value returned is that SAME row's (possibly NULL) value."""
    import numpy as np

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(5)], "lid": [0]}))
    # backward candidate t4 (gap 1h, price NULL); forward candidate t8 (gap 3h, 7.0)
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [ts(4), ts(8)], "price": [np.nan, 7.0]})
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["price"], direction="nearest",
    ).toPandas()
    # the closer row (t4) wins even though its payload is NULL
    assert pd.isna(out.price_asof.tolist()[0])


def test_asof_interpolate_skips_null_observations(spark):
    """interpolate: a NULL observation is no observation — the bracketing
    rows are the nearest NON-NULL observations, and weights/values always
    come from the same rows."""
    import numpy as np

    from time_sift_spark.operators.asof import asof_interpolate

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [ts(4)], "lid": [0]}))
    # observations at t2=10, t3=NULL, t6=30 → bracket is (t2,10)..(t6,30),
    # weight (4-2)/(6-2)=0.5 → 20.0 (NOT weights from t3's time)
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "rt": [ts(2), ts(3), ts(6)], "v": [10.0, np.nan, 30.0]})
    )
    out = asof_interpolate(
        left, right, on="k", left_time="t", right_time="rt", value_col="v"
    ).toPandas()
    assert out.v_interp.tolist() == [20.0]


def test_asof_join_auto_picks_strategy_by_size(spark):
    """The auto entry point routes a proven-small right side to the
    broadcast-lookup plan (BroadcastHashJoin, no WindowExec on the fact
    path) and a right side past the threshold to the one-Exchange
    union+window plan — same rows either way."""
    from time_sift_spark.operators.asof import asof_join_auto

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [ts(3), ts(5), ts(4)], "lid": [0, 1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "t": [ts(1), ts(4), ts(2)], "price": [10.0, 20.0, 30.0]})
    )
    kw = dict(on="k", left_time="t", right_time="t", right_cols=["price"])

    small = asof_join_auto(left, right, **kw)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small
    assert "Window" not in plan_small

    big = asof_join_auto(left, right, broadcast_threshold_rows=1, **kw)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan_big

    a = small.orderBy("lid").toPandas()
    b = big.orderBy("lid").toPandas()
    pd.testing.assert_frame_equal(a, b[a.columns])

    # non-lookup semantics always take the union+window arm, even small
    fwd = asof_join_auto(left, right, direction="forward", **kw)
    assert "Window" in fwd._jdf.queryExecution().executedPlan().toString()


def test_interval_join_auto_picks_strategy_by_size(spark):
    from time_sift_spark.operators.rangejoin import interval_join_auto

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [ts(3), ts(9)], "lv": [1, 2]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [ts(4), ts(20)], "rv": [7, 8]})
    )
    kw = dict(
        on="k", left_time="t", right_time="rt", tolerance_seconds=7200,
        left_cols=["lv"], right_cols=["rv"],
    )
    small = interval_join_auto(left, right, **kw)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    # the lookup arm is identified by its per-key struct-array collapse
    assert "collect_list" in plan_small and "BroadcastHashJoin" in plan_small
    big = interval_join_auto(left, right, broadcast_threshold_rows=1, **kw)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan_big  # bucket-blocked arm, no broadcast array
    a = small.orderBy("l_lv", "delta_us").toPandas()
    b = big.orderBy("l_lv", "delta_us").toPandas()
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_theil_sen_recovers_planted_slope(spark):
    """Clean linear series: slope recovered exactly (all pairwise
    slopes identical -> their median is the slope)."""
    import pandas as pd

    from time_sift_spark.operators.trend import theil_sen

    ts = pd.date_range("2024-01-01", periods=20, freq="D")
    pdf = pd.DataFrame({
        "k": ["a"] * 20,
        "ts": ts,
        "v": [100.0 + 2.5 * i for i in range(20)],
    })
    out = theil_sen(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    assert out.n_points[0] == 20 and out.n_pairs[0] == 190
    assert abs(out.slope_per_day[0] - 2.5) < 1e-9


def test_theil_sen_robust_to_outlier_where_ols_is_not(spark):
    """One corrupted day: OLS slope moves by >3x, Theil-Sen stays
    within 10% of truth — the breakdown-point claim, measured."""
    import pandas as pd

    from time_sift_spark.operators.trend import linear_trend, theil_sen

    ts = pd.date_range("2024-01-01", periods=21, freq="D")
    v = [10.0 + 1.0 * i for i in range(21)]
    v[20] = 10000.0  # corrupted bucket (at the end, where OLS leverage is max)
    pdf = pd.DataFrame({"k": ["a"] * 21, "ts": ts, "v": v})
    df = spark.createDataFrame(pdf)
    robust = theil_sen(df, "v", "ts", "k").toPandas().slope_per_day[0]
    ols = linear_trend(df, "v", "ts", group_by="k").toPandas().slope_per_day[0]
    assert abs(robust - 1.0) < 0.1
    assert abs(ols - 1.0) > 3.0


def test_theil_sen_single_bucket_series_drops(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.trend import theil_sen

    ts = pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02"])
    pdf = pd.DataFrame({"k": ["solo", "solo", "ok"], "ts": ts,
                        "v": [1.0, 2.0, 3.0]})
    # 'solo' has one bucket (two rows, same day) -> no pairs; 'ok' has
    # one bucket -> also drops; frame with a two-bucket key survives
    out = theil_sen(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    assert len(out) == 0
    with pytest.raises(ColumnNotFoundError):
        theil_sen(spark.createDataFrame(pdf), "nope", "ts", "k")


def test_mase_backtest_perfect_weekly_season(spark):
    import pandas as pd

    from time_sift_spark.operators.backtest import mase_backtest

    # 28 days of an exact period-7 pattern: seasonal-naive is PERFECT
    # (mae_seasonal = 0, mase = 0), naive errs by the day-to-day step.
    pattern = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    rows = [
        ("a", pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), pattern[i % 7])
        for i in range(28)
    ]
    # constant series: mae_naive = 0 -> MASE is NULL, not an error
    rows += [
        ("b", pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), 5.0)
        for i in range(28)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = {r["k"]: r for r in mase_backtest(df, "v", "ts", "k").collect()}
    a = out["a"]
    assert a["n_eval"] == 21  # rows 8..28 have both forecasts
    assert a["mae_seasonal"] == 0.0
    assert a["mase"] == 0.0
    assert a["mae_naive"] > 0.0
    b = out["b"]
    assert b["mae_naive"] == 0.0 and b["mase"] is None

    # series shorter than season+1 buckets drop out
    short = spark.createDataFrame(
        pd.DataFrame(
            [("c", pd.Timestamp("2024-01-01") + pd.Timedelta(days=i), 1.0 * i)
             for i in range(5)],
            columns=["k", "ts", "v"],
        )
    )
    assert mase_backtest(short, "v", "ts", "k").count() == 0


def test_conformal_interval_rank_and_coverage(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.backtest import conformal_backtest

    # exact period-7 series plus spikes on three known odd days: the
    # seasonal-naive scores are 0 except at the spikes, so q_hat = 0 and
    # coverage = 1 - spikes/n_eval exactly.
    pattern = [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0]
    rows = []
    for i in range(35):
        v = pattern[i % 7]
        day = pd.Timestamp("2024-01-01") + pd.Timedelta(days=i)
        x = (day - pd.Timestamp("1970-01-01")).days
        if i in (9, 15, 23) and x % 2 == 1:
            v += 100.0
        rows.append(("a", day, v))
    # count planted spikes that actually landed on odd (eval) days
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = conformal_backtest(df, "v", "ts", "k", alpha=0.2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_cal"] + r["n_eval"] == 28  # 35 days - 7 burn-in
    # calibration scores: mostly zero (spikes sit on eval days or echo
    # into the next week) -> q_alpha is a small nonneg decimal
    assert r["q_alpha"] is not None and r["q_alpha"] >= 0.0
    assert r["coverage"] is not None and 0.0 < r["coverage"] <= 1.0

    # too few calibration points for alpha=0.01 -> NULL, not a clamp
    out2 = conformal_backtest(df, "v", "ts", "k", alpha=0.01).collect()[0]
    assert out2["q_alpha"] is None and out2["coverage"] is None


def test_conformal_series_without_eval_half_surfaces(spark):
    """ADVICE r9: a series whose scored rows are ALL calibration (data
    only on even epoch-days) must still surface with its q_hat and NULL
    n_eval/coverage — the eval arm LEFT JOINs on, never an inner-join
    drop-out."""
    import duckdb
    import pandas as pd

    from time_sift_spark.functions.text_fns import DUCK, SPARK
    from time_sift_spark.operators.backtest import conformal_backtest, conformal_backtest_sql

    # even epoch-days only: every scored row lands in the calibration half
    day0 = pd.Timestamp("2024-01-02")  # epoch day 19724 (even)
    assert (day0 - pd.Timestamp("1970-01-01")).days % 2 == 0
    rows = [
        ("solo", day0 + pd.Timedelta(days=2 * i), float(10 + (i % 3)))
        for i in range(20)
    ]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    df = spark.createDataFrame(pdf)
    out = conformal_backtest(df, "v", "ts", "k", alpha=0.2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_cal"] == 13  # 20 points - 7 burn-in, all even days
    assert r["q_alpha"] is not None
    assert r["n_eval"] is None and r["coverage"] is None

    # cross-engine: DuckDB rendering keeps the series too
    con = duckdb.connect()
    con.register("_conf_t", pdf)
    exp = con.execute(
        conformal_backtest_sql(DUCK, "_conf_t", "v", "ts", "k", alpha=0.2)
    ).df()
    assert len(exp) == 1
    assert pd.isna(exp["coverage"].iloc[0]) and pd.isna(exp["n_eval"].iloc[0])
    assert exp["q_alpha"].iloc[0] == r["q_alpha"]


def test_rolling_quantile_hand_case_and_validation(spark):
    """Type-7 on a hand window: values 10,20,30,40 in time order,
    window 4, p=0.9 → at the 4th row h=0.9*3=2.7, q = a[3] + 0.7*(a[4]
    − a[3]) = 30 + 7 = 37; p=0.5 equals the rolling median; p out of
    range and bad columns raise."""
    import pandas as pd
    import pytest as _pt

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.rolling import rolling_median, rolling_quantile

    pdf = pd.DataFrame({
        "k": ["a"] * 4, "t": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0],
    })
    df = spark.createDataFrame(pdf)
    out = (
        rolling_quantile(df, "v", "t", 4, 0.9, partition_by="k")
        .toPandas().sort_values("t").reset_index(drop=True)
    )
    assert out.loc[3, "v_r4_p9"] == 37.0
    assert out.loc[0, "v_r4_p9"] == 10.0   # 1-row prefix: its real window
    med = rolling_median(df, "v", "t", 4, partition_by="k").toPandas().sort_values("t")
    p5 = rolling_quantile(df, "v", "t", 4, 0.5, partition_by="k").toPandas().sort_values("t")
    assert list(p5.v_r4_p5) == list(med.v_r4_median)
    with _pt.raises(ValueError):
        rolling_quantile(df, "v", "t", 4, 1.5, partition_by="k")
    with _pt.raises(ColumnNotFoundError):
        rolling_quantile(df, "nope", "t", 4, 0.9, partition_by="k")
