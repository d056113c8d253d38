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


def test_sequence_ngrams_handcrafted(spark):
    """Known streams: u1,u2 share A→B→C (support 2); u3's lone D→E→F
    stays below min_keys; an in-stream repeat raises n_occurrences but
    not n_keys."""
    import pandas as pd

    from time_sift_spark.operators.funnel import sequence_ngrams

    rows = []
    for uid, stream in [
        (1, ["A", "B", "C", "A", "B", "C"]),  # A,B,C twice within one user
        (2, ["A", "B", "C"]),
        (3, ["D", "E", "F"]),
    ]:
        for i, ev in enumerate(stream):
            rows.append((uid, ev, i, uid * 100 + i))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "t", "event_id"])
    out = sequence_ngrams(
        spark.createDataFrame(pdf), "user_id", "event_type", "t", "event_id",
        n=3, min_keys=2,
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.g1, row.g2, row.g3) == ("A", "B", "C")
    assert row.n_occurrences == 3  # 2 from u1 (incl. the wrap A,B,C? no: contiguous) + 1 from u2
    assert row.n_keys == 2


def test_sequence_ngrams_cross_engine(spark):
    import duckdb
    import pandas as pd

    from time_sift_spark.operators.funnel import sequence_ngrams_sql

    rng = [(u, f"e{(u * 7 + i * 3) % 4}", i, u * 1000 + i) for u in range(8) for i in range(10)]
    pdf = pd.DataFrame(rng, columns=["user_id", "event_type", "t", "event_id"])
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_seq_t")
    q = sequence_ngrams_sql("_seq_t", "user_id", "event_type", "t", "event_id", n=2, min_keys=2)
    got = spark.sql(q).toPandas()
    con = duckdb.connect()
    con.register("_seq_t", pdf)
    exp = con.execute(q).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_transition_matrix_probabilities(spark):
    """Known tiny stream: counts exact, rows-per-src probs sum to 1."""
    import pandas as pd

    from time_sift_spark.operators.funnel import transition_matrix

    pdf = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 2, 2],
            "t": [1, 2, 3, 4, 1, 2, 3],
            "i": [0, 0, 0, 0, 0, 0, 0],
            "e": ["a", "b", "a", "c", "a", "b", "b"],
        }
    )
    out = (
        transition_matrix(spark.createDataFrame(pdf), "k", "e", "t", "i")
        .toPandas()
        .set_index(["src_type", "dst_type"])
    )
    # streams: a->b->a->c and a->b->b
    assert out.loc[("a", "b")].transitions == 2
    assert out.loc[("b", "a")].transitions == 1
    assert out.loc[("b", "b")].transitions == 1
    assert out.loc[("a", "c")].transitions == 1
    sums = out.reset_index().groupby("src_type")["prob"].sum()
    assert all(abs(s - 1.0) < 1e-12 for s in sums)


def test_transition_matrix_min_transitions_renormalizes(spark):
    import pandas as pd

    from time_sift_spark.operators.funnel import transition_matrix

    pdf = pd.DataFrame(
        {
            "k": [1] * 5,
            "t": list(range(5)),
            "i": [0] * 5,
            "e": ["a", "b", "a", "b", "c"],
        }
    )
    out = transition_matrix(
        spark.createDataFrame(pdf), "k", "e", "t", "i", min_transitions=2
    ).toPandas()
    # only a->b (2x) survives; prob renormalizes over the kept matrix
    assert len(out) == 1
    assert out.iloc[0].src_type == "a" and out.iloc[0].dst_type == "b"
    assert out.iloc[0].prob == 1.0


def test_basket_pairs_counts_and_lift(spark):
    """Hand-checked baskets: pair counts, lift, and the mega-basket drop."""
    import pandas as pd

    from time_sift_spark.operators.basket import basket_pairs

    rows = []
    # baskets 1..3 contain {x,y}; basket 4 = {x,z}; basket 5 oversized
    for b in (1, 2, 3):
        rows += [(b, "x"), (b, "y")]
    rows += [(4, "x"), (4, "z"), (4, "x")]  # dup item collapses
    rows += [(5, it) for it in "abcdefghij"]  # 10 items > cap 5 -> dropped
    pdf = pd.DataFrame(rows, columns=["bk", "it"])
    out = basket_pairs(
        spark.createDataFrame(pdf), "bk", "it",
        min_pairs=1, max_basket=5, topk=None,
    ).toPandas()
    got = {(r.item_a, r.item_b): (r.n_pairs, r.lift) for r in out.itertuples()}
    assert set(got) == {("x", "y"), ("x", "z")}
    # 4 surviving baskets; x in 4, y in 3, z in 1
    n, lift = got[("x", "y")]
    assert n == 3 and abs(lift - (3 * 4) / (4 * 3)) < 1e-15
    n, lift = got[("x", "z")]
    assert n == 1 and abs(lift - (1 * 4) / (4 * 1)) < 1e-15


def test_km_survival_textbook_curve(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.survival import km_survival

    T = pd.Timestamp
    rows = [
        # (user, ts, type) — all signups in the Jan-1 ISO week
        ("A", T("2024-01-01"), "signup"), ("A", T("2024-01-02"), "purchase"),
        ("B", T("2024-01-04"), "signup"),  # censored at horizon -> dur 2
        ("B", T("2024-01-09"), "purchase"),  # AFTER horizon: must not count
        ("C", T("2024-01-01"), "signup"), ("C", T("2024-01-04"), "purchase"),
        ("D", T("2024-01-01"), "signup"), ("D", T("2024-01-05"), "purchase"),
        ("E", T("2024-01-01"), "signup"),  # censored -> dur 5
        ("F", T("2024-01-02"), "purchase"),  # no signup: not a subject
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["u", "ts", "et"]))
    out = {
        r["duration_days"]: r
        for r in km_survival(
            df, "u", "ts", "et", "signup", "purchase", "2024-01-06"
        ).collect()
    }
    # classic 5-subject curve: events at 1,3,4; censorings at 2,5
    assert out[1]["n_at_risk"] == 5 and out[1]["d_events"] == 1
    assert out[1]["survival"] == pytest.approx(0.8)
    assert out[2]["c_censored"] == 1 and out[2]["survival"] == pytest.approx(0.8)
    assert out[3]["survival"] == pytest.approx(0.533333, abs=1e-6)
    assert out[4]["survival"] == pytest.approx(0.266667, abs=1e-6)
    assert out[5]["survival"] == pytest.approx(0.266667, abs=1e-6)
    assert len(out) == 5
    # one cohort: all subjects signed up in the same ISO week
    assert out[1]["cohort"] == T("2024-01-01")


def test_nelson_aalen_hand_check(spark):
    """Tiny cohort: 3 subjects sign up the same week; events at day 1
    (one) and day 2 (one); one censored at the horizon.  Hazard
    increments are 1/3 then 1/2; KM and NA relate as expected."""
    import pandas as pd
    import pytest

    from time_sift_spark.operators.survival import km_survival, nelson_aalen

    rows = []
    base = pd.Timestamp("2024-01-01 10:00:00")  # Monday
    for uid, ev_day in ((1, 1), (2, 2), (3, None)):
        rows.append((uid, base, "signup"))
        if ev_day is not None:
            rows.append((uid, base + pd.Timedelta(days=ev_day), "purchase"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    )
    na = nelson_aalen(
        df, "user_id", "ts", "event_type", "signup", "purchase", "2024-01-10"
    ).toPandas().set_index("duration_days").sort_index()
    assert na.loc[1, "n_at_risk"] == 3 and na.loc[1, "d_events"] == 1
    assert na.loc[1, "cum_hazard"] == pytest.approx(1 / 3)
    assert na.loc[2, "n_at_risk"] == 2 and na.loc[2, "d_events"] == 1
    assert na.loc[2, "cum_hazard"] == pytest.approx(1 / 3 + 1 / 2)
    # censored subject surfaces at the horizon duration with hazard flat
    assert na.loc[9, "d_events"] == 0 and na.loc[9, "c_censored"] == 1
    assert na.loc[9, "cum_hazard"] == pytest.approx(1 / 3 + 1 / 2)
    km = km_survival(
        df, "user_id", "ts", "event_type", "signup", "purchase", "2024-01-10"
    ).toPandas().set_index("duration_days").sort_index()
    # same skeleton: identical at-risk/event columns
    assert (km.n_at_risk == na.n_at_risk).all()
    assert (km.d_events == na.d_events).all()


def test_top_paths_order_truncation_and_ties(spark):
    """Paths respect time order (not insertion order), truncate at
    max_steps, and the (count DESC, path) tie-break is deterministic."""
    import datetime

    import pandas as pd

    from time_sift_spark.operators.funnel import top_paths

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # users 1,2: A>B>C; user 3: B>A (inserted out of time order);
    # user 4: 5 events but max_steps=3 keeps A>A>B
    for u, seq in ((1, "ABC"), (2, "ABC")):
        for i, e in enumerate(seq):
            rows.append((u, e, t0 + datetime.timedelta(minutes=i), i))
    rows.append((3, "A", t0 + datetime.timedelta(minutes=5), 1))
    rows.append((3, "B", t0, 0))
    for i, e in enumerate("AABZZ"):
        rows.append((4, e, t0 + datetime.timedelta(minutes=i), i))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts", "event_id"])
    )
    out = top_paths(df, "user_id", "event_type", "ts", "event_id",
                    max_steps=3, top_k=10).toPandas()
    got = dict(zip(out.path, out.n_keys))
    assert got == {"A>B>C": 2, "B>A": 1, "A>A>B": 1}
    assert list(out.path) == ["A>B>C", "A>A>B", "B>A"]  # count desc, then path
