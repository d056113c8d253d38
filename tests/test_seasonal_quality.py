"""Unit tests for seasonal adjustment and the named quality-rule filter."""

import datetime as dt

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.seasonal import deseasonalize
from time_sift_spark.operators.text import quality_filter


def test_deseasonalize_removes_hourly_profile(spark):
    # user 1: hour 0 always 10, hour 1 always 20 (+ row-specific noise 0/2)
    rows = []
    for day in range(1, 6):
        rows.append((1, dt.datetime(2024, 1, day, 0), 10.0 + (day % 2) * 2))
        rows.append((1, dt.datetime(2024, 1, day, 1), 20.0))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
    out = deseasonalize(df, "value", "ts", partition_by="user_id", season="hour").toPandas()
    h0 = out[out.season_slot == 0]
    h1 = out[out.season_slot == 1]
    # hour-1 values are constant -> fully explained by the profile
    assert (h1.value_deseason == 0.0).all()
    assert (h1.seasonal_mean == 20.0).all()
    # hour-0 mean is 11.2 (three of five days +2); residuals vs that mean
    assert h0.seasonal_mean.iloc[0] == pytest.approx(11.2)
    assert sorted(h0.value_deseason.round(4).unique().tolist()) == [-1.2, 0.8]


def test_deseasonalize_validation(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [dt.datetime(2024, 1, 1)], "value": [1.0]})
    )
    with pytest.raises(ValueError):
        deseasonalize(df, "value", "ts", partition_by="user_id", season="dayofweek")
    with pytest.raises(ColumnNotFoundError):
        deseasonalize(df, "nope", "ts", partition_by="user_id")


def test_quality_filter_rules_fire_individually(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    # passes everything: 30+ words with stopwords
                    "the quick brown fox jumps over the lazy dog and then it runs "
                    "far away to the green hills where the sun is warm and the wind "
                    "is soft for a long quiet afternoon in the valley",
                    "too short for the filter",  # fails word count
                    # enough words but zero english stopwords
                    "uno dos tres cuatro cinco seis siete ocho nueve diez once doce "
                    "trece catorce quince dieciseis diecisiete dieciocho diecinueve "
                    "veinte veintiuno veintidos veintitres veinticuatro veinticinco "
                    "veintiseis veintisiete veintiocho veintinueve treinta",
                    # symbol storm: punct ratio >= 0.1
                    "the and is of to in a that it for !!! ??? $$$ %%% ### @@@ &&& "
                    "*** ((( ))) the and is of to in a that it for the and is of to "
                    "in a that it for more words to cross the thirty word floor",
                ],
            }
        )
    )
    out = quality_filter(df, "text", keep_cols=("doc_id",)).orderBy("doc_id").toPandas()
    assert out.keep.tolist() == [True, False, False, False]
    assert not out.r_word_count.iloc[1]
    assert not out.r_stopwords.iloc[2]
    assert out.r_word_count.iloc[2]  # 30 words — only the stopword rule fails
    assert not out.r_symbol_ratio.iloc[3]


def test_mad_outliers_flags_spike_not_inflated_by_it(spark):
    import numpy as np

    from time_sift_spark.operators.rolling import mad_outliers

    rng = np.random.default_rng(31)
    v = rng.normal(10, 0.5, 200)
    v[7] = 50.0  # one gross spike
    pdf = pd.DataFrame({"sid": 0, "i": range(200), "v": v})
    out = mad_outliers(
        spark.createDataFrame(pdf), "v", partition_by="sid"
    ).toPandas()
    flagged = out[out.is_outlier.fillna(False)]
    assert len(flagged) >= 1
    assert 50.0 in flagged.v.values
    # robust center is near 10, not dragged by the spike
    assert abs(out.v_median.iloc[0] - 10) < 0.5


def test_mad_constant_group_null_flag(spark):
    from time_sift_spark.operators.rolling import mad_outliers

    pdf = pd.DataFrame({"sid": 0, "v": [5.0, 5.0, 5.0]})
    out = mad_outliers(spark.createDataFrame(pdf), "v", partition_by="sid").toPandas()
    assert out.is_outlier.isna().all()
    assert (out.v_mad == 0.0).all()


# --------------------------------------------------------------------------
# Double-seasonal Holt-Winters (r12)
# --------------------------------------------------------------------------


def _hw2_frame(n_hours=720, series=("a", "b")):
    """Dense hourly frame with GENUINE double seasonality: daily
    triangle (period 24) + irregular weekly profile (period 168)."""
    rows = []
    for k in series:
        amp = 3 + len(k)  # deterministic per-series amplitude
        for h in range(n_hours):
            d7 = (h // 24) % 7
            y = 300.0 + amp * (12 - abs((h % 24) - 12)) + 5 * ((d7 * (d7 + 2)) % 11)
            rows.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=h), y))
    return pd.DataFrame(rows, columns=["k", "ts", "v"])


def test_hw_two_season_cross_engine_and_short_series_drop(spark):
    import duckdb

    from time_sift_spark.functions.text_fns import DUCK
    from time_sift_spark.operators.seasonal import (
        holt_winters_two_season,
        holt_winters_two_season_sql,
    )

    pdf = _hw2_frame(n_hours=40, series=("a", "b"))
    # tiny periods so the fold is short: m1=4, m2=8 (needs >= 16 buckets)
    got = (
        holt_winters_two_season(
            spark.createDataFrame(pdf), "v", "ts", "k", m1=4, m2=8
        )
        .toPandas().sort_values(["k", "hour_x"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("_t_hw2", pdf)
    exp = (
        con.execute(
            holt_winters_two_season_sql(DUCK, "_t_hw2", "v", "ts", "k", m1=4, m2=8)
        )
        .df().sort_values(["k", "hour_x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert len(got) == 2 * (40 - 8)
    # a series shorter than 2*m2 drops out loudly (the HAVING contract)
    short = pdf[(pdf.k == "a") | (pdf.ts < pd.Timestamp("2024-01-01 15:00:00"))]
    out2 = holt_winters_two_season(
        spark.createDataFrame(short), "v", "ts", "k", m1=4, m2=8
    ).toPandas()
    assert set(out2.k) == {"a"}


def test_hw_two_season_captures_week_where_single_period_cannot(spark):
    """The NON-VACUOUS double-seasonality check: on a series carrying
    both a daily and a weekly cycle, the full (24, 168) model fits the
    converged tail essentially exactly, while a model whose long queue
    is too short to hold the week (m2=48) leaves structural error of
    the weekly component's magnitude."""
    from time_sift_spark.operators.seasonal import holt_winters_two_season

    pdf = _hw2_frame(n_hours=720, series=("a",))
    sdf = spark.createDataFrame(pdf)
    full = holt_winters_two_season(sdf, "v", "ts", "k", m1=24, m2=168).toPandas()
    crippled = holt_winters_two_season(sdf, "v", "ts", "k", m1=24, m2=48).toPandas()
    tail_mse = lambda df: (df.sort_values("hour_x").tail(336).hw2_err ** 2).mean()  # noqa: E731
    full_mse, crippled_mse = tail_mse(full), tail_mse(crippled)
    # the planted series is noise-free and 168-periodic: the full model's
    # init is exactly consistent -> zero error; the short-queue model
    # cannot represent the week at all
    assert full_mse < 1e-12
    assert crippled_mse > 25.0  # weekly profile spans 0..50
