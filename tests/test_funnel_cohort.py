"""Unit tests for funnel analysis (hand-checked ordering semantics)."""

import datetime as dt

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.funnel import funnel

STEPS = [
    ("a", "et = 'a'"),
    ("b", "et = 'b'"),
    ("c", "et = 'c'"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            [(u, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), et) for u, h, et in rows],
            columns=["user_id", "ts", "et"],
        )
    )


def test_funnel_full_conversion(spark):
    df = _df(spark, [(1, 0, "a"), (1, 1, "b"), (1, 2, "c")])
    out = funnel(df, "ts", "user_id", STEPS).toPandas()
    assert out.funnel_stage.iloc[0] == 3


def test_funnel_order_matters(spark):
    # c happens BEFORE b: stage 2 only (a then b; no c after b)
    df = _df(spark, [(1, 0, "a"), (1, 1, "c"), (1, 2, "b")])
    out = funnel(df, "ts", "user_id", STEPS).toPandas()
    r = out.iloc[0]
    assert r.funnel_stage == 2
    assert pd.isna(r.t_c)


def test_funnel_strict_progression(spark):
    # b at the SAME instant as a does not count (strictly after)
    df = _df(spark, [(1, 0, "a"), (1, 0, "b")])
    out = funnel(df, "ts", "user_id", STEPS).toPandas()
    assert out.funnel_stage.iloc[0] == 1


def test_funnel_takes_earliest_qualifying(spark):
    # two b's after a -> t_b is the EARLIER one; c must follow that one
    df = _df(spark, [(1, 0, "a"), (1, 5, "b"), (1, 2, "b"), (1, 3, "c")])
    out = funnel(df, "ts", "user_id", STEPS).toPandas()
    r = out.iloc[0]
    assert r.t_b == dt.datetime(2024, 1, 1, 2)
    assert r.funnel_stage == 3  # c at h=3 follows b at h=2


def test_funnel_multiple_users_and_nonstarter(spark):
    df = _df(spark, [(1, 0, "a"), (2, 0, "b"), (2, 1, "c")])
    out = funnel(df, "ts", "user_id", STEPS).orderBy("user_id").toPandas()
    assert out.funnel_stage.tolist() == [1, 0]  # user 2 never did step a


def test_funnel_single_exchange_plan(spark):
    df = _df(spark, [(1, 0, "a"), (1, 1, "b")])
    plan = (
        funnel(df, "ts", "user_id", STEPS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_funnel_validation(spark):
    df = _df(spark, [(1, 0, "a")])
    with pytest.raises(ValueError):
        funnel(df, "ts", "user_id", [])
    with pytest.raises(ColumnNotFoundError):
        funnel(df, "nope", "user_id", STEPS)
