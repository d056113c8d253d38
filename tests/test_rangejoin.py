"""Interval-join semantics: bucket blocking must be invisible (exact)."""

import datetime as dt

import pandas as pd
import pytest

from time_sift_spark.operators.rangejoin import interval_join


def t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


def test_interval_join_exact(spark):
    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "ts": [t(10), t(30), t(10)], "lid": [1, 2, 3]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 1, 1, 2], "ts": [t(8), t(14, 59), t(15, 1), t(50)], "rid": [10, 11, 12, 13]}
        )
    )
    out = (
        interval_join(
            left, right, on="k", left_time="ts", right_time="ts",
            tolerance_seconds=300, left_cols=("lid",), right_cols=("rid",),
        )
        .orderBy("l_lid", "r_rid")
        .toPandas()
    )
    # lid=1 @10:00 ±5min: rid 10 (@08:00, -120s) and 11 (@14:59, +299s);
    # rid 12 (@15:01, +301s) is OUT; k=2 pair is 40min apart → OUT
    assert list(map(tuple, out[["l_lid", "r_rid"]].to_numpy())) == [(1, 10), (1, 11)]
    assert out.delta_us.tolist() == [-120_000_000, 299_000_000]


def test_interval_join_boundary_inclusive(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [t(10)], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [t(15)], "rid": [2]}))
    out = interval_join(
        left, right, on="k", left_time="ts", right_time="ts",
        tolerance_seconds=300, left_cols=("lid",), right_cols=("rid",),
    ).toPandas()
    assert len(out) == 1 and out.delta_us[0] == 300_000_000  # exactly ±tol is IN


def test_interval_join_no_duplicates(spark):
    # right row in the same bucket as left must appear exactly once even
    # though the left exploded into 3 buckets
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [t(10)], "lid": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [t(10, 30)], "rid": [2]}))
    out = interval_join(
        left, right, on="k", left_time="ts", right_time="ts",
        tolerance_seconds=300, left_cols=("lid",), right_cols=("rid",),
    ).toPandas()
    assert len(out) == 1


def test_interval_lookup_equals_blocked_form(spark):
    """Broadcast-lookup interval join must produce exactly the blocked
    form's rows on a randomized input (different physical plan, same
    semantics)."""
    import numpy as np

    from time_sift_spark.operators.rangejoin import interval_join_lookup

    rng = np.random.RandomState(3)
    lp = pd.DataFrame({
        "k": rng.randint(0, 5, 80),
        "ts": [t(int(x) // 60, int(x) % 60) for x in rng.randint(0, 24 * 60, 80)],
        "lid": np.arange(80),
    })
    rp = pd.DataFrame({
        "k": rng.randint(0, 5, 60),
        "ts": [t(int(x) // 60, int(x) % 60) for x in rng.randint(0, 24 * 60, 60)],
        "rid": np.arange(60),
    })
    kw = dict(on="k", left_time="ts", right_time="ts",
              tolerance_seconds=900, left_cols=("lid",), right_cols=("rid",))
    a = interval_join(spark.createDataFrame(lp), spark.createDataFrame(rp), **kw) \
        .orderBy("l_lid", "r_rid").toPandas()
    b = interval_join_lookup(spark.createDataFrame(lp), spark.createDataFrame(rp), **kw) \
        .orderBy("l_lid", "r_rid").toPandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b[a.columns].reset_index(drop=True))


def test_interval_lookup_guardrail_falls_back(spark):
    """An over-threshold right side must degrade to the bucket-blocked
    plan (same rows) with a warning — never an oversized broadcast."""
    import warnings

    import pandas as pd

    from time_sift_spark.operators.rangejoin import interval_join, interval_join_lookup

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:01:40"]), "a": [10, 20]})
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 1], "t": pd.to_datetime(["2024-01-01 00:00:07", "2024-01-01 00:00:30", "2024-01-01 00:01:41"]), "b": [7, 8, 9]})
    )
    kw = dict(on="k", left_time="t", right_time="t", tolerance_seconds=10,
              left_cols=["a"], right_cols=["b"])
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = interval_join_lookup(left, right, max_broadcast_rows=1, **kw)
        rows = sorted(map(tuple, out.collect()))
    assert any("falling back" in str(w.message) for w in caught)
    expect = sorted(map(tuple, interval_join(left, right, **kw).collect()))
    assert rows == expect and len(rows) == 2
    # under the threshold: no warning, same rows
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rows2 = sorted(map(tuple, interval_join_lookup(left, right, max_broadcast_rows=100, **kw).collect()))
    assert not any("falling back" in str(w.message) for w in caught)
    assert rows2 == expect


def test_interval_overlap_join_semantics(spark):
    """Overlap join: nested, partial, touching (overlap 0), and
    disjoint pairs; a long interval spanning many buckets pairs exactly
    once."""
    import pandas as pd
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.rangejoin import interval_overlap_join

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    left = pd.DataFrame([
        ("u", 1, t0, t0 + 10 * h),          # long: covers many buckets
        ("u", 2, t0 + 20 * h, t0 + 21 * h), # disjoint from rights
    ], columns=["k", "lid", "s", "e"])
    right = pd.DataFrame([
        ("u", 101, t0 + 2 * h, t0 + 3 * h),    # nested in lid 1
        ("u", 102, t0 + 9 * h, t0 + 12 * h),   # partial overlap with lid 1
        ("u", 103, t0 + 10 * h, t0 + 11 * h),  # touches lid 1's end exactly
        ("u", 104, t0 + 15 * h, t0 + 16 * h),  # disjoint
    ], columns=["k", "rid", "s", "e"])
    out = interval_overlap_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_start="s", left_end="e", right_start="s", right_end="e",
        left_cols=["lid"], right_cols=["rid"], bucket_seconds=3600,
    ).toPandas().sort_values(["l_lid", "r_rid"]).reset_index(drop=True)
    pairs = set(zip(out.l_lid, out.r_rid))
    assert pairs == {(1, 101), (1, 102), (1, 103)}
    by = out.set_index(["l_lid", "r_rid"]).overlap_us
    assert by[(1, 101)] == 3600_000_000        # fully nested hour
    assert by[(1, 102)] == 3600_000_000        # 9h-10h overlap
    assert by[(1, 103)] == 0                   # instant touch
    # k-bucket dedup: each pair appears exactly once
    assert len(out) == 3

    with pytest.raises(ValueError):
        interval_overlap_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="k", left_start="s", left_end="e", right_start="s", right_end="e",
            left_cols=[], right_cols=["rid"],
        )
    with pytest.raises(ColumnNotFoundError):
        interval_overlap_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="k", left_start="nope", left_end="e", right_start="s", right_end="e",
            left_cols=["lid"], right_cols=["rid"],
        )
