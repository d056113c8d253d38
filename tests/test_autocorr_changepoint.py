"""Unit tests for ACF / CCF / CUSUM (serial-dependence analytics)."""

import numpy as np
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.autocorr import acf, ccf_global
from time_sift_spark.operators.changepoint import cusum


def _series(seed, n, sid):
    rng = np.random.default_rng(seed)
    # AR(1): x_t = 0.6 x_{t-1} + e  -> known positive acf ~0.6, ~0.36, ...
    e = rng.normal(size=n)
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = 0.6 * x[i - 1] + e[i]
    return pd.DataFrame({"sid": sid, "t": np.arange(n), "v": x})


def test_acf_matches_pandas(spark):
    pdf = pd.concat([_series(1, 400, 0), _series(2, 400, 1)], ignore_index=True)
    out = (
        acf(spark.createDataFrame(pdf), "v", "t", [1, 2], partition_by="sid")
        .orderBy("sid")
        .toPandas()
    )
    for sid in (0, 1):
        s = pdf[pdf.sid == sid].sort_values("t").v.reset_index(drop=True)
        for k in (1, 2):
            # pairwise corr of (x_t, x_{t-k}) — pandas equivalent
            expect = s.iloc[k:].reset_index(drop=True).corr(
                s.iloc[:-k].reset_index(drop=True)
            )
            got = out[out.sid == sid][f"acf_{k}"].iloc[0]
            assert got == pytest.approx(expect, abs=1e-4)
    assert out.n_obs.tolist() == [400, 400]


def test_acf_ar1_is_positive_and_decaying(spark):
    pdf = _series(3, 1000, 0)
    out = acf(spark.createDataFrame(pdf), "v", "t", [1, 2, 3], partition_by="sid").toPandas()
    r = out.iloc[0]
    assert r.acf_1 > r.acf_2 > r.acf_3 > 0


def test_acf_requires_partition(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": [0], "v": [1.0]}))
    with pytest.raises(ColumnNotFoundError):
        acf(df, "v", "t", [1], partition_by=None)


def test_ccf_detects_known_lead(spark):
    rng = np.random.default_rng(7)
    n = 600
    y = rng.normal(size=n)
    x = np.roll(y, 2) + 0.01 * rng.normal(size=n)  # x_t ~ y_{t-2}
    pdf = pd.DataFrame({"t": np.arange(n), "x": x, "y": y}).iloc[5:]
    out = ccf_global(
        spark.createDataFrame(pdf), "x", "y", "t", [0, 1, 2, 3], num_buckets=4
    ).toPandas()
    r = out.iloc[0]
    assert r.ccf_2 > 0.99
    assert abs(r.ccf_0) < 0.2 and abs(r.ccf_1) < 0.2 and abs(r.ccf_3) < 0.2


def test_cusum_flags_level_shift(spark):
    rng = np.random.default_rng(11)
    n = 400
    v = rng.normal(size=n) * 0.2
    v[n // 2 :] += 3.0  # hard level shift at the midpoint
    pdf = pd.DataFrame({"sid": 0, "t": np.arange(n), "v": v})
    out = (
        cusum(spark.createDataFrame(pdf), "v", "t", partition_by="sid", threshold=3.0)
        .orderBy("t")
        .toPandas()
    )
    assert out.is_shift.any()
    # peak |cusum| lands at the shift point (within a few steps)
    peak_t = out.loc[out.cusum.abs().idxmax(), "t"]
    assert abs(peak_t - n // 2) <= 5


def test_cusum_stable_series_unflagged(spark):
    rng = np.random.default_rng(13)
    pdf = pd.DataFrame({"sid": 0, "t": np.arange(300), "v": rng.normal(size=300)})
    out = cusum(spark.createDataFrame(pdf), "v", "t", partition_by="sid").toPandas()
    assert not out.is_shift.any()


def test_cusum_constant_series_null_not_error(spark):
    pdf = pd.DataFrame({"sid": 0, "t": [0, 1, 2], "v": [5.0, 5.0, 5.0]})
    out = cusum(spark.createDataFrame(pdf), "v", "t", partition_by="sid").toPandas()
    assert out.cusum.isna().all()


def test_acf_single_exchange_plan(spark):
    """groupBy key == window partition key -> Catalyst reuses the hash
    partitioning; exactly one Exchange in the whole ACF plan."""
    pdf = _series(5, 100, 0)
    plan = acf(
        spark.createDataFrame(pdf), "v", "t", [1, 2], partition_by="sid"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_linear_trend_matches_numpy_polyfit(spark):
    import datetime as dt

    from time_sift_spark.operators.trend import linear_trend

    rng = np.random.default_rng(23)
    rows = []
    base = dt.datetime(2024, 1, 1)
    for sid, slope_per_day in ((0, 2.0), (1, -0.5)):
        for i in range(300):
            t_days = i / 10  # every 2.4h over 30 days
            v = 5.0 + slope_per_day * t_days + rng.normal() * 0.01
            rows.append((sid, base + dt.timedelta(days=t_days), v))
    pdf = pd.DataFrame(rows, columns=["sid", "ts", "v"])
    out = (
        linear_trend(spark.createDataFrame(pdf), "v", "ts", group_by="sid")
        .orderBy("sid")
        .toPandas()
    )
    for sid, want in ((0, 2.0), (1, -0.5)):
        r = out[out.sid == sid].iloc[0]
        x = pdf[pdf.sid == sid].ts.astype("int64").to_numpy() / 86_400e9  # days
        y = pdf[pdf.sid == sid].v.to_numpy()
        slope_np = np.polyfit(x, y, 1)[0]
        assert r.slope_per_day == pytest.approx(slope_np, rel=1e-3)
        assert r.slope_per_day == pytest.approx(want, abs=0.01)
        assert r.r2 > 0.999
        assert r.n_obs == 300


def test_linear_trend_constant_series(spark):
    import datetime as dt

    from time_sift_spark.operators.trend import linear_trend

    pdf = pd.DataFrame(
        {
            "sid": [0, 0, 0],
            "ts": [dt.datetime(2024, 1, 1, h) for h in range(3)],
            "v": [7.0, 7.0, 7.0],
        }
    )
    out = linear_trend(spark.createDataFrame(pdf), "v", "ts", group_by="sid").toPandas()
    r = out.iloc[0]
    assert r.slope_per_day == 0.0
    assert r.intercept == 7.0
    # zero y-variance: R² is undefined -> NULL (same convention as corr)
    assert pd.isna(r.r2)


def test_changepoint_locator_finds_planted_shift(spark):
    from time_sift_spark.operators.changepoint import changepoint_locate

    # 30 daily buckets per key; key "a" jumps from ~1.0 to ~5.0 after day 14,
    # key "b" is stable. Noise is small vs the 4.0 shift.
    rng = np.random.default_rng(7)
    rows = []
    for day in range(30):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        base_a = 1.0 if day < 15 else 5.0
        for _ in range(3):
            rows.append(("a", ts, base_a + rng.normal(scale=0.05)))
            rows.append(("b", ts, 2.0 + rng.normal(scale=0.05)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    out = {
        r["k"]: r
        for r in changepoint_locate(
            spark.createDataFrame(pdf), "v", "ts", "k"
        ).collect()
    }
    a = out["a"]
    assert a["n_buckets"] == 30
    assert a["cp_index"] == 15  # last bucket of the low regime
    assert a["cp_last_day_before"] == pd.Timestamp("2024-01-15")
    # daily buckets SUM 3 draws -> means ~3.0 and ~15.0
    assert a["mean_before"] == pytest.approx(3.0, abs=0.5)
    assert a["mean_after"] == pytest.approx(15.0, abs=0.5)
    # the stable key's best split has near-zero gain vs the shifted key's
    assert out["b"]["gain"] < a["gain"] / 100.0

    # single-bucket series drop out (no candidate split)
    one = pd.DataFrame({"k": ["c"], "ts": [pd.Timestamp("2024-01-01")], "v": [1.0]})
    assert changepoint_locate(spark.createDataFrame(one), "v", "ts", "k").count() == 0


def test_corr_matrix_planted_correlations(spark):
    import pandas as pd

    from time_sift_spark.operators.autocorr import corr_matrix

    rng = np.random.default_rng(23)
    rows = []
    base = rng.normal(10, 2, 30)
    for day in range(30):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        rows.append(("a", ts, base[day]))
        rows.append(("b", ts, 3.0 * base[day] + 1.0))   # corr(a,b) = +1
        rows.append(("c", ts, -2.0 * base[day]))        # corr(a,c) = -1
        rows.append(("d", ts, rng.normal(5, 1)))        # independent
    # series sharing only 2 days with the rest -> pair dropped
    rows += [("e", pd.Timestamp("2024-01-01"), 1.0),
             ("e", pd.Timestamp("2024-01-02"), 2.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = {(r["type_a"], r["type_b"]): r for r in corr_matrix(df, "v", "ts", "k").collect()}
    # upper triangle only, e-pairs dropped by the >=3 shared-days rule
    assert all(a < b for a, b in out)
    assert not any("e" in p for p in out)
    assert out[("a", "b")]["corr"] == pytest.approx(1.0, abs=1e-3)
    assert out[("a", "c")]["corr"] == pytest.approx(-1.0, abs=1e-3)
    assert abs(out[("a", "d")]["corr"]) < 0.5
    assert out[("a", "b")]["n_days"] == 30
    assert len(out) == 6  # C(4,2) pairs among a,b,c,d


def test_spearman_monotone_is_one_pearson_is_not(spark):
    """An exponential-ish monotone pair: Spearman must be exactly 1.0
    while Pearson is dragged below it by the spike day; tie handling
    is the average-rank convention via the exact 2r+c-1 surrogate."""
    import datetime

    import pandas as pd

    from time_sift_spark.operators.autocorr import corr_matrix, spearman_matrix

    rows = []
    ys = {"a": [1.0, 2.0, 3.0, 4.0, 1000.0], "b": [1.0, 4.0, 9.0, 16.0, 25.0]}
    for k, vals in ys.items():
        for i, v in enumerate(vals):
            rows.append((k, datetime.datetime(2024, 1, 1 + i, 12), v))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    sp = spearman_matrix(df, "v", "ts", "k").toPandas()
    pe = corr_matrix(df, "v", "ts", "k").toPandas()
    assert len(sp) == 1 and sp.loc[0, "spearman"] == 1.0
    assert pe.loc[0, "corr"] < 0.9


def test_spearman_tie_average_ranks(spark):
    """Ties on one side: series a = (1,2,2,3) vs strictly increasing b.
    Average ranks for a are (1, 2.5, 2.5, 4) → Spearman = Pearson of
    (1,2.5,2.5,4) vs (1,2,3,4) = 0.9487 (scipy.stats.spearmanr value,
    rounded to the engine's 4 decimals)."""
    import datetime

    import pandas as pd

    from time_sift_spark.operators.autocorr import spearman_matrix

    rows = []
    for k, vals in {"a": [1.0, 2.0, 2.0, 3.0], "b": [1.0, 2.0, 3.0, 4.0]}.items():
        for i, v in enumerate(vals):
            rows.append((k, datetime.datetime(2024, 1, 1 + i, 12), v))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    sp = spearman_matrix(df, "v", "ts", "k").toPandas()
    assert sp.loc[0, "spearman"] == 0.9487
