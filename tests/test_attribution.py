"""Attribution tests: handcrafted timelines with known credit, the
lookback tolerance, equal-timestamp convention, and cross-engine parity.
"""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators.attribution import attribution, attribution_sql


def _timeline():
    # user 1: click c=5 @t0, click c=9 @t1, purchase 100 @t2
    #   → last-touch 9, first-touch 5
    # user 2: click c=7 @t0, purchase 50 @t0 (same instant)
    #   → equal-ts click credits (touches order first)
    # user 3: click c=3 @day0, purchase 10 @day10 (outside 3d lookback)
    #   → last-touch NULL, first-touch 3
    # user 4: purchase 70 with no click ever → both NULL
    base = pd.Timestamp("2024-03-01 12:00:00")
    day = pd.Timedelta(days=1)
    rows = [
        (1, base, 10, "click", 0.0, '{"k": 5}'),
        (1, base + day, 11, "click", 0.0, '{"k": 9}'),
        (1, base + 2 * day, 12, "purchase", 100.0, "{}"),
        (2, base, 20, "click", 0.0, '{"k": 7}'),
        (2, base, 21, "purchase", 50.0, "{}"),
        (3, base, 30, "click", 0.0, '{"k": 3}'),
        (3, base + 10 * day, 31, "purchase", 10.0, "{}"),
        (4, base, 40, "purchase", 70.0, "{}"),
    ]
    return pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type", "value", "props"]
    )


_KW = dict(
    key_col="user_id", time_col="ts", order_col="event_id",
    type_col="event_type", touch_type="click", convert_type="purchase",
    value_col="value", campaign_json_col="props", tolerance_days=3,
)


def test_attribution_known_credit(spark):
    out = attribution(spark.createDataFrame(_timeline()), **_KW).toPandas()
    last = {
        (None if pd.isna(r.campaign) else int(r.campaign)): r.revenue
        for r in out[out.model == "last"].itertuples()
    }
    first = {
        (None if pd.isna(r.campaign) else int(r.campaign)): r.revenue
        for r in out[out.model == "first"].itertuples()
    }
    assert last == {9: 100.0, 7: 50.0, None: 80.0}  # u3 out of lookback + u4
    assert first == {5: 100.0, 7: 50.0, 3: 10.0, None: 70.0}


def test_attribution_cross_engine(spark):
    pdf = _timeline()
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_attr_t")
    got = spark.sql(attribution_sql(SPARK, "_attr_t", **_KW)).toPandas()
    con = duckdb.connect()
    con.register("_attr_t", pdf)
    exp = con.execute(attribution_sql(DUCK, "_attr_t", **_KW)).df()
    key = ["model", "campaign"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_attribution_bad_column(spark):
    sdf = spark.createDataFrame(_timeline())
    with pytest.raises(ColumnNotFoundError):
        attribution(sdf, **{**_KW, "value_col": "nope"})


def test_attribution_campaign_fold_is_sign_safe(spark):
    """ADVICE r9: negative / >=128 campaign ids must fold via the
    double-mod idiom — a negative remainder would corrupt the MAX/MIN
    encode-compare tiebreak, and the over-range fold is a documented
    collision, not corruption.  -5 → 123, 133 → 5; a non-numeric
    campaign touch is unattributable (documented skip)."""
    base = pd.Timestamp("2024-03-01 12:00:00")
    day = pd.Timedelta(days=1)
    rows = [
        (1, base, 10, "click", 0.0, '{"k": -5}'),
        (1, base + day, 11, "purchase", 40.0, "{}"),
        (2, base, 20, "click", 0.0, '{"k": 133}'),
        (2, base + day, 21, "purchase", 60.0, "{}"),
        (3, base, 30, "click", 0.0, '{"k": "oops"}'),
        (3, base + day, 31, "purchase", 25.0, "{}"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["user_id", "ts", "event_id", "event_type", "value", "props"]
    )
    out = attribution(spark.createDataFrame(pdf), **_KW).toPandas()
    last = {
        (None if pd.isna(r.campaign) else int(r.campaign)): r.revenue
        for r in out[out.model == "last"].itertuples()
    }
    assert last == {123: 40.0, 5: 60.0, None: 25.0}

    # cross-engine parity on the folded domain
    import duckdb

    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_attr_fold_t")
    got = spark.sql(attribution_sql(SPARK, "_attr_fold_t", **_KW)).toPandas()
    con = duckdb.connect()
    con.register("_attr_fold_t", pdf)
    exp = con.execute(attribution_sql(DUCK, "_attr_fold_t", **_KW)).df()
    key = ["model", "campaign"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
