"""Round-12 operator tests: Croston intermittent demand, Mann-Kendall
trend test, two-sample log-rank, and the AMS F₂ sketch.  Value-level
cross-engine parity for the registered queries is covered by
tests/test_oracle_parity.py; these pin the closed-form hand cases, the
dropout gates, and (for log-rank / AMS) a pure-Python differential
reference over the same md5 arms/signs."""

import hashlib
import math

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError


def _md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- Croston

def test_croston_hand_case(spark):
    """Demands 10/20/30 on days 0/2/5, α=0.5: z₀=10, p₀=2;
    step@2: z=15, p=2, rate 7.5; step@5: z=22.5, p=2.5, rate 9.0;
    SBA multiplies by 0.75."""
    from time_sift_spark.operators.seasonal import croston

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base, base + pd.Timedelta(days=2), base + pd.Timedelta(days=5)],
        "k": ["a"] * 3,
        "v": [10.0, 20.0, 30.0],
    })
    out = (
        croston(spark.createDataFrame(pdf), "v", "ts", "k", alpha=0.5)
        .toPandas().sort_values("day_x").reset_index(drop=True)
    )
    assert list(out.gap_days) == [2, 3]
    assert list(out.y_val) == [20.0, 30.0]
    assert list(out.croston_rate) == [7.5, 9.0]
    assert list(out.sba_rate) == [7.5 * 0.75, 9.0 * 0.75]


def test_croston_zero_days_excluded_and_short_series_drop(spark):
    """Zero/negative-demand days are not demand events (they set the
    gaps, not the recurrence); a series with one nonzero bucket has no
    interval estimate and drops out loudly."""
    from time_sift_spark.operators.seasonal import croston

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(days=i) for i in range(4)] + [base],
        "k": ["a"] * 4 + ["single"],
        "v": [5.0, 0.0, 0.0, 7.0, 3.0],
    })
    out = (
        croston(spark.createDataFrame(pdf), "v", "ts", "k", alpha=0.5)
        .toPandas()
    )
    assert set(out.k) == {"a"}
    # nonzero buckets are days 0 and 3 → one step with gap 3
    assert list(out.gap_days) == [3]
    # z = .5*7+.5*5 = 6, p = .5*3+.5*3 = 3 → rate 2.0
    assert list(out.croston_rate) == [2.0]

    with pytest.raises(ColumnNotFoundError):
        croston(spark.createDataFrame(pdf), "nope", "ts", "k")


# ---------------------------------------------------------------- Mann-Kendall

def test_mann_kendall_monotone_and_flat(spark):
    """Strictly increasing 5-day series: S=10, Var=50/9·3=16.67,
    Z=(10−1)/√Var≈2.2045, significant.  A flat series: S=0, tie term
    cancels the variance entirely → Z=0, not significant."""
    from time_sift_spark.operators.trend import mann_kendall

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(5):
        rows.append((base + pd.Timedelta(days=i), "up", float(i + 1)))
        rows.append((base + pd.Timedelta(days=i), "flat", 4.0))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        mann_kendall(spark.createDataFrame(pdf), "v", "ts", "k")
        .toPandas().set_index("k")
    )
    up = out.loc["up"]
    assert up.n_days == 5 and up.n_pairs == 10 and up.s_stat == 10
    var = 5 * 4 * 15 / 18
    assert up.var_s == var
    assert up.z_stat == 9 / math.sqrt(var)
    assert bool(up.significant)
    flat = out.loc["flat"]
    assert flat.s_stat == 0 and flat.var_s == 0.0 and flat.z_stat == 0.0
    assert not bool(flat.significant)


def test_mann_kendall_tie_correction(spark):
    """Series 1,2,2,3: S = 5 (one tied pair contributes 0); tie group
    of size 2 subtracts 2·1·9=18 from 4·3·13=156 → Var=138/18."""
    from time_sift_spark.operators.trend import mann_kendall

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(days=i) for i in range(4)],
        "k": ["a"] * 4,
        "v": [1.0, 2.0, 2.0, 3.0],
    })
    out = mann_kendall(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    assert out.loc[0, "s_stat"] == 5
    assert out.loc[0, "var_s"] == (4 * 3 * 13 - 2 * 1 * 9) / 18


# ---------------------------------------------------------------- log-rank

def _py_logrank(subjects):
    """Pure-Python reference: subjects = [(arm, dur, ev)]; returns
    (oe_sum, v_sum, chisq) WITHOUT the decimal quantization (the test
    compares to 1e-6, inside the quantization grid)."""
    times = sorted({d for _, d, e in subjects if e})
    oe = v = 0.0
    for t in times:
        n1 = sum(1 for a, d, _ in subjects if a == 1 and d >= t)
        n0 = sum(1 for a, d, _ in subjects if a == 0 and d >= t)
        n = n1 + n0
        d1 = sum(1 for a, d, e in subjects if a == 1 and d == t and e)
        dt = sum(1 for a, d, e in subjects if d == t and e)
        oe += d1 - dt * n1 / n
        if n > 1:
            v += dt * (n - dt) * n1 * n0 / (n * n * (n - 1))
    chisq = (oe * oe / v) if v > 0 else None
    return oe, v, chisq


def test_logrank_differential_vs_python(spark):
    """Drive the operator on a constructed single-cohort population and
    compare O−E / V / χ² against an independent pure-Python evaluation
    using the same md5-parity arms."""
    from time_sift_spark.operators.survival import logrank

    base = pd.Timestamp("2024-01-01")  # a Monday → one signup-week cohort
    rows = []
    subjects = []
    horizon = 20
    for uid in range(40):
        arm = _md5_60bit(str(uid)) % 2
        # deterministic duration spread; ~half convert inside the horizon
        dur = (uid * 7) % 25
        ev = 1 if dur <= horizon - 3 - (arm * 2) else 0
        rows.append((uid, "signup", base))
        if ev:
            rows.append((uid, "purchase", base + pd.Timedelta(days=dur)))
        subjects.append((arm, dur if ev else horizon, ev))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    out = logrank(
        spark.createDataFrame(pdf), "user_id", "ts", "event_type",
        "signup", "purchase", str((base + pd.Timedelta(days=horizon)).date()),
    ).toPandas()
    assert len(out) == 1
    oe, v, chisq = _py_logrank(subjects)
    assert abs(out.loc[0, "oe_sum"] - oe) < 1e-5
    assert abs(out.loc[0, "v_sum"] - v) < 1e-5
    assert abs(out.loc[0, "chisq"] - chisq) < 1e-3
    assert out.loc[0, "o1_events"] == sum(
        e for a, _, e in subjects if a == 1
    )


def test_logrank_identical_arms_no_signal(spark):
    """Mirror-image arms (every duration present once per arm, all
    events): O−E = 0 exactly, χ² = 0."""
    from time_sift_spark.operators.survival import logrank

    base = pd.Timestamp("2024-01-01")
    # pick uids whose md5 parity gives arm 0 and arm 1 deterministically
    arm0 = [u for u in range(200) if _md5_60bit(str(u)) % 2 == 0][:10]
    arm1 = [u for u in range(200) if _md5_60bit(str(u)) % 2 == 1][:10]
    rows = []
    for i, (u0, u1) in enumerate(zip(arm0, arm1)):
        dur = i + 1
        for u in (u0, u1):
            rows.append((u, "signup", base))
            rows.append((u, "purchase", base + pd.Timedelta(days=dur)))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    out = logrank(
        spark.createDataFrame(pdf), "user_id", "ts", "event_type",
        "signup", "purchase", "2024-02-01",
    ).toPandas()
    assert len(out) == 1
    assert out.loc[0, "oe_sum"] == 0.0
    assert out.loc[0, "chisq"] == 0.0


# ---------------------------------------------------------------- AMS F2

def test_ams_f2_exact_and_estimator_differential(spark):
    """Exact F₂ = Σf² is exact; the estimator median equals a
    pure-Python replay of the same md5 signs."""
    from time_sift_spark.operators.sketch import ams_f2

    rows = []
    freqs = {"u%d" % i: i + 1 for i in range(8)}  # f = 1..8
    for v, f in freqs.items():
        rows += [("g", v)] * f
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    d_est = 15
    out = ams_f2(
        spark.createDataFrame(pdf), "v", "k", d_est=d_est
    ).toPandas()
    f2 = sum(f * f for f in freqs.values())
    assert out.loc[0, "n_keys"] == 8
    assert out.loc[0, "f2_exact"] == float(f2)

    ests = []
    for i in range(d_est):
        sx = sum(
            (1 - 2 * (_md5_60bit(f"{v}|{i}") % 2)) * f
            for v, f in freqs.items()
        )
        ests.append(float(sx * sx))
    med = sorted(ests)[(d_est + 1) // 2 - 1]
    assert out.loc[0, "f2_est"] == round(med, 2)
    assert abs(
        out.loc[0, "rel_err"] - round(abs(med - f2) / f2, 6)
    ) < 1e-9


def test_ams_f2_uniform_vs_skewed_separation(spark):
    """The sketch must SEPARATE a uniform key (F₂ = n) from a skewed
    one (F₂ ≈ n²) — the join-size question it exists to answer."""
    from time_sift_spark.operators.sketch import ams_f2

    rows = [("uniform", f"u{i}") for i in range(64)]
    rows += [("skewed", "hot")] * 56 + [("skewed", f"s{i}") for i in range(8)]
    pdf = pd.DataFrame(rows, columns=["k", "v"])
    out = ams_f2(spark.createDataFrame(pdf), "v", "k").toPandas().set_index("k")
    assert out.loc["uniform", "f2_exact"] == 64.0
    assert out.loc["skewed", "f2_exact"] == 56.0 ** 2 + 8
    # estimates land on the right side of the order-of-magnitude gap
    assert out.loc["skewed", "f2_est"] > 4 * out.loc["uniform", "f2_est"]


# ---------------------------------------------------------------- KS test

def test_ks_two_sample_hand_case(spark):
    """ref {1,2,3,4} vs cur {3,4,5,6}: D = 0.5 (the ECDF gap at v∈[2,4]);
    identical samples give D = 0."""
    from time_sift_spark.operators.quality import ks_test

    split = pd.Timestamp("2024-01-16")
    rows = []
    for v in (1.0, 2.0, 3.0, 4.0):
        rows.append((split - pd.Timedelta(days=1), "shift", v))
        rows.append((split - pd.Timedelta(days=1), "same", v))
        rows.append((split + pd.Timedelta(days=1), "same", v))
    for v in (3.0, 4.0, 5.0, 6.0):
        rows.append((split + pd.Timedelta(days=1), "shift", v))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        ks_test(spark.createDataFrame(pdf), "v", "ts", "k", "2024-01-16")
        .toPandas().set_index("k")
    )
    assert out.loc["shift", "n_ref"] == 4 and out.loc["shift", "n_cur"] == 4
    assert out.loc["shift", "d_stat"] == 0.5
    assert not bool(out.loc["shift", "drifted"])  # crit ≈ 0.96 at n=4+4
    assert out.loc["same", "d_stat"] == 0.0


def test_ks_detects_planted_shift(spark):
    """A two-unit location shift over 200+200 samples (D = 0.2 vs the
    ~0.136 critical value) crosses the 5% line; the unshifted twin does
    not."""
    from time_sift_spark.operators.quality import ks_test

    split = pd.Timestamp("2024-01-16")
    rows = []
    for i in range(200):
        v = (i % 40) / 4.0
        rows.append((split - pd.Timedelta(days=1), "shift", v))
        rows.append((split + pd.Timedelta(days=1), "shift", v + 2.0))
        rows.append((split - pd.Timedelta(days=1), "same", v))
        rows.append((split + pd.Timedelta(days=1), "same", v))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        ks_test(spark.createDataFrame(pdf), "v", "ts", "k", "2024-01-16")
        .toPandas().set_index("k")
    )
    assert bool(out.loc["shift", "drifted"])
    assert not bool(out.loc["same", "drifted"])


# ---------------------------------------------------------------- Hampel

def test_hampel_repairs_spike_in_trend(spark):
    """10,11,12,100,13,14,15: the spike's full window has med 13,
    MAD 2 → 87 > 3·1.4826·2 flags and repairs to 13; the edge point's
    truncated window does not flag it."""
    from time_sift_spark.operators.rolling import hampel_filter

    base = pd.Timestamp("2024-01-01")
    vals = [10.0, 11.0, 12.0, 100.0, 13.0, 14.0, 15.0]
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=i) for i in range(7)],
        "k": ["a"] * 7,
        "eid": list(range(7)),
        "v": vals,
    })
    out = (
        hampel_filter(
            spark.createDataFrame(pdf), "v", "ts",
            partition_by="k", order_extra="eid", half_width=3,
        )
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert out.loc[3, "v_med"] == 13.0 and out.loc[3, "v_mad"] == 2.0
    assert bool(out.loc[3, "is_spike"])
    assert out.loc[3, "v_repaired"] == 13.0
    # edge row 0: window [10,11,12,100], med 11.5, MAD (0.5+1.5)/2 = 1.0
    assert out.loc[0, "v_med"] == 11.5 and out.loc[0, "v_mad"] == 1.0
    assert not bool(out.loc[0, "is_spike"])
    assert out.loc[0, "v_repaired"] == 10.0
    # non-spike rows keep their values
    assert list(out.v_repaired) == [10.0, 11.0, 12.0, 13.0, 13.0, 14.0, 15.0]


def test_hampel_mad_zero_keeps_value(spark):
    """A constant window has MAD 0 → NULL flag, value kept (the
    mad_outliers convention)."""
    from time_sift_spark.operators.rolling import hampel_filter

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(minutes=i) for i in range(5)],
        "k": ["a"] * 5,
        "eid": list(range(5)),
        "v": [7.0] * 5,
    })
    out = hampel_filter(
        spark.createDataFrame(pdf), "v", "ts",
        partition_by="k", order_extra="eid", half_width=2,
    ).toPandas()
    assert out.is_spike.isna().all()
    assert (out.v_repaired == 7.0).all()


# ---------------------------------------------------------------- Theta

def test_theta_forecast_python_differential(spark):
    """Replicate the exact recurrence (OLS over centered days, theta
    line, SES with the shared literal complements) in Python floats and
    compare to 1e-9 after the same 6-decimal rounding."""
    from time_sift_spark.operators.seasonal import theta_forecast

    base = pd.Timestamp("2024-01-01")
    vals = [4.0, 7.0, 5.0, 9.0, 8.0, 12.0]
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(days=i) for i in range(6)],
        "k": ["a"] * 6,
        "v": vals,
    })
    out = (
        theta_forecast(spark.createDataFrame(pdf), "v", "ts", "k", alpha=0.3)
        .toPandas().sort_values("day_x").reset_index(drop=True)
    )
    n = 6
    xs = list(range(n))
    sx, sy = float(sum(xs)), float(sum(vals))
    sxx = float(sum(x * x for x in xs))
    sxy = float(sum(x * y for x, y in zip(xs, vals)))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    alpha, ca = 0.3, 0.7
    z = (2.0 * vals[0]) - (a + (b * 0.0))
    fits = []
    for i in range(1, n):
        line = a + (b * float(xs[i]))
        fits.append(0.5 * (z + line))
        zt = (2.0 * vals[i]) - line
        z = (alpha * zt) + (ca * z)
    assert len(out) == n - 1
    for i, f in enumerate(fits):
        assert abs(out.loc[i, "theta_fit"] - f) < 1e-6
        assert abs(out.loc[i, "theta_err"] - (vals[i + 1] - f)) < 1e-6


def test_theta_short_or_degenerate_series_drop(spark):
    """One bucket (no OLS) and a single-day series (zero x-variance)
    drop out loudly."""
    from time_sift_spark.operators.seasonal import theta_forecast

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base, base, base + pd.Timedelta(days=1)],
        "k": ["single", "two", "two"],
        "v": [5.0, 1.0, 2.0],
    })
    out = theta_forecast(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    assert set(out.k) == {"two"}


# ---------------------------------------------------------------- Pettitt

def test_pettitt_level_shift_and_flat(spark):
    """A clean level shift (10×0 then 10×5) maximizes |U| at the last
    pre-shift day with K = 100 (every cross pair signs −1), k_norm =
    6·100²/(20²·21) ≈ 7.14 > 3.6889 → significant; a flat series has
    K = 0 and no signal."""
    from time_sift_spark.operators.trend import pettitt

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(20):
        rows.append((base + pd.Timedelta(days=i), "shift",
                     0.0 if i < 10 else 5.0))
        rows.append((base + pd.Timedelta(days=i), "flat", 3.0))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        pettitt(spark.createDataFrame(pdf), "v", "ts", "k")
        .toPandas().set_index("k")
    )
    sh = out.loc["shift"]
    assert sh.n_days == 20 and sh.k_stat == 100
    assert abs(sh.k_norm - 6.0 * 100 * 100 / (20.0 * 20.0 * 21.0)) < 1e-12
    assert bool(sh.significant)
    day0 = (base - pd.Timestamp("1970-01-01")).days
    assert sh.changepoint_day == day0 + 9  # last pre-shift day
    fl = out.loc["flat"]
    assert fl.k_stat == 0 and not bool(fl.significant)


def test_pettitt_python_differential(spark):
    """Replicate U_t = Σ_{i≤t,j>t} sgn(x_i − x_j) brute-force in Python
    on an arbitrary series and compare K and the location."""
    from time_sift_spark.operators.trend import pettitt

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0]
    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(days=i) for i in range(len(vals))],
        "k": ["a"] * len(vals),
        "v": vals,
    })
    n = len(vals)
    sgn = lambda d: (d > 0) - (d < 0)  # noqa: E731
    us = []
    for t in range(n - 1):  # t indexes the last element of the left part
        us.append(sum(sgn(vals[i] - vals[j])
                      for i in range(t + 1) for j in range(t + 1, n)))
    k_ref = max(abs(u) for u in us)
    loc_ref = min(i for i, u in enumerate(us) if abs(u) == k_ref)
    out = pettitt(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    day0 = (base - pd.Timestamp("1970-01-01")).days
    assert out.loc[0, "k_stat"] == k_ref
    assert out.loc[0, "changepoint_day"] == day0 + loc_ref


# ---------------------------------------------------------------- phrase

def test_phrase_search_consecutive_only(spark):
    """'new york' matches only consecutive occurrences; reversed or
    gapped tokens do not match; double counting is per occurrence."""
    from time_sift_spark.operators.search import phrase_search

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "i love new york in new york",   # 2 matches
            "york new",                       # reversed — no match
            "new big york",                   # gapped — no match
            "brand new york style",           # 1 match
        ],
    })
    out = (
        phrase_search(spark.createDataFrame(pdf), "text", "doc_id",
                      ["new", "york"])
        .toPandas().set_index("doc_id")
    )
    assert out.loc[1, "n_matches"] == 2
    assert out.loc[4, "n_matches"] == 1
    assert 2 not in out.index and 3 not in out.index


def test_phrase_search_duplicate_token_phrase(spark):
    """A phrase with a REPEATED token ('buffalo buffalo buffalo') only
    matches a genuine triple — the offset-join must not let one
    posting satisfy two offsets at the same anchor."""
    from time_sift_spark.operators.search import phrase_search

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            "buffalo buffalo buffalo ok",   # one triple (positions 0-2)...
            "buffalo ok buffalo",           # no triple
        ],
    })
    out = (
        phrase_search(spark.createDataFrame(pdf), "text", "doc_id",
                      ["buffalo", "buffalo", "buffalo"])
        .toPandas().set_index("doc_id")
    )
    assert out.loc[1, "n_matches"] == 1
    assert 2 not in out.index


# ---------------------------------------------------------------- streaming croston

def test_streaming_croston_state_across_batches(spark, tmp_path):
    """Chunked replay (one file per micro-batch) equals the single-pass
    recurrence: the state machine's init buffer and (z, p, px) carry
    across batch boundaries."""
    from time_sift_spark.streaming.lag_stream import (
        run_stream_to_df,
        streaming_croston,
    )

    # buckets: days 0,2,5,9 with demands 10,20,30,40 (micros), α=0.5
    buckets = [(0, 10_000_000), (2, 20_000_000), (5, 30_000_000),
               (9, 40_000_000)]
    src = tmp_path / "croston_chunks"
    src.mkdir()
    for i, (x, ym) in enumerate(buckets):
        pd.DataFrame({"k": ["a"], "x": [x], "y_micros": [ym]}).to_parquet(
            src / f"chunk-{i:02d}.parquet"
        )
    stream = (
        spark.readStream.schema("k string, x long, y_micros long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = (
        run_stream_to_df(
            streaming_croston(stream, key_col="k", alpha=0.5),
            "t_croston_stream",
        )
        .toPandas().sort_values("day_x").reset_index(drop=True)
    )
    # replicate: z0=10, p0=2; @2: z=15,p=2,rate 7.5; @5: q=3,z=22.5,p=2.5,
    # rate 9.0; @9: q=4, z=.5*40+.5*22.5=31.25, p=.5*4+.5*2.5=3.25,
    # rate 9.615384...
    assert list(out.day_x) == [2, 5, 9]
    assert list(out.gap_days) == [2, 3, 4]
    assert list(out.croston_rate)[:2] == [7.5, 9.0]
    assert abs(out.loc[2, "croston_rate"] - 31.25 / 3.25) < 1e-6


# ---------------------------------------------------------------- prop z-test

def test_prop_ztest_hand_case_and_degenerate(spark):
    """Controlled arms via md5-parity-selected uids: arm1 converts 8/10,
    arm0 converts 2/10 → z computed from the pooled form; an all-convert
    population yields NULL z (zero pooled variance)."""
    from time_sift_spark.operators.experiment import prop_ztest

    arm0 = [u for u in range(200) if _md5_60bit(str(u)) % 2 == 0][:10]
    arm1 = [u for u in range(200) if _md5_60bit(str(u)) % 2 == 1][:10]
    rows = []
    for i, u in enumerate(arm0):
        rows.append((u, "signup"))
        if i < 2:
            rows.append((u, "purchase"))
    for i, u in enumerate(arm1):
        rows.append((u, "signup"))
        if i < 8:
            rows.append((u, "purchase"))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_type"])
    out = prop_ztest(
        spark.createDataFrame(pdf), "user_id", "event_type", "purchase"
    ).toPandas()
    r = out.loc[0]
    assert (r.n0, r.n1, r.x0, r.x1) == (10, 10, 2, 8)
    assert r.p0 == 0.2 and r.p1 == 0.8 and r.p_diff == 0.6
    pool = 0.5
    se = math.sqrt(pool * 0.5 * (0.1 + 0.1))
    assert abs(r.z_stat - 0.6 / se) < 1e-6
    assert bool(r.significant)
    req = math.ceil((1.96 + 0.8416) ** 2 * (0.2 * 0.8 + 0.8 * 0.2) / 0.36)
    assert r.required_n_per_arm == req

    # degenerate: everyone converts → NULL z / significance
    rows2 = [(u, "purchase") for u in range(20)]
    out2 = prop_ztest(
        spark.createDataFrame(pd.DataFrame(rows2, columns=["user_id", "event_type"])),
        "user_id", "event_type", "purchase",
    ).toPandas()
    assert pd.isna(out2.loc[0, "z_stat"])
    assert pd.isna(out2.loc[0, "significant"])


# ---------------------------------------------------------------- regression report

def test_regression_report_hand_pairs(spark):
    """Direct pairs through the SQL: yhat=[3,5], y=[4,4] → bias 0,
    MAE 1, RMSE 1, R² NULL-guard when actuals are constant (SST=0),
    MAPE 0.25; a perfect predictor scores 0/0/0 with R²=1."""
    from time_sift_spark.functions.text_fns import SPARK as _S
    from time_sift_spark.operators.backtest import regression_report_sql

    pdf = pd.DataFrame({
        "g": ["const", "const", "perf", "perf", "perf"],
        "yhat": [3.0, 5.0, 1.0, 2.0, 3.0],
        "y": [4.0, 4.0, 1.0, 2.0, 3.0],
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("_t_regr")
    out = spark.sql(regression_report_sql(
        _S, "SELECT g, yhat, y FROM _t_regr", "g"
    )).toPandas().set_index("g")
    c = out.loc["const"]
    assert c.n == 2 and c.bias == 0.0 and c.mae == 1.0 and c.rmse == 1.0
    assert pd.isna(c.r2)  # constant actuals: SST = 0
    assert c.mape == 0.25
    p = out.loc["perf"]
    assert p.mae == 0.0 and p.rmse == 0.0 and p.r2 == 1.0 and p.mape == 0.0


# ---------------------------------------------------------------- season detect

def test_season_detect_planted_period(spark):
    """A clean period-3 series (1,5,9 repeating) detects period 3 with
    ACF 1.0; a 21-day monotone ramp is maximally autocorrelated at the
    SHORTEST lag (ACF falls with lag on a finite trend), so the argmax
    period is min_lag — the documented trend caveat."""
    from time_sift_spark.operators.autocorr import season_detect

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(21):
        rows.append((base + pd.Timedelta(days=i), "p3", float([1, 5, 9][i % 3])))
        rows.append((base + pd.Timedelta(days=i), "trend", float(i)))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        season_detect(spark.createDataFrame(pdf), "v", "ts", "k")
        .toPandas().set_index("k")
    )
    assert out.loc["p3", "period"] == 3
    assert out.loc["p3", "period_acf"] == 1.0
    assert out.loc["p3", "acf_6"] == 1.0  # harmonics also perfect; 3 wins ties
    assert out.loc["trend", "period"] == 2


def test_season_detect_short_series_null(spark):
    """A 3-bucket series has no computable candidate ACF → NULL period."""
    from time_sift_spark.operators.autocorr import season_detect

    base = pd.Timestamp("2024-01-01")
    pdf = pd.DataFrame({
        "ts": [base + pd.Timedelta(days=i) for i in range(3)],
        "k": ["a"] * 3,
        "v": [1.0, 2.0, 3.0],
    })
    out = season_detect(spark.createDataFrame(pdf), "v", "ts", "k").toPandas()
    assert pd.isna(out.loc[0, "period"])
    assert pd.isna(out.loc[0, "period_acf"])


# ---------------------------------------------------------------- HW forecast

def test_hw_forecast_python_differential(spark):
    """Replicate the fold (init + steps, the _hw_scalar_exprs order) and
    the extrapolation tree in Python floats for a 15-bucket period-3
    series; constant series forecast exactly the constant."""
    from time_sift_spark.operators.seasonal import holt_winters_forecast

    base = pd.Timestamp("2024-01-01")
    m, h_max = 3, 5
    vals = [4.0, 7.0, 5.0, 6.0, 9.0, 7.0, 8.0, 11.0, 9.0, 10.0, 13.0,
            11.0, 12.0, 15.0, 13.0]
    rows = [(base + pd.Timedelta(days=i), "a", v) for i, v in enumerate(vals)]
    rows += [(base + pd.Timedelta(days=i), "const", 5.0) for i in range(15)]
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    out = (
        holt_winters_forecast(
            spark.createDataFrame(pdf), "v", "ts", "k",
            period=m, horizon=h_max,
        )
        .toPandas()
    )
    const = out[out.k == "const"].sort_values("h_step")
    assert list(const.hw_forecast) == [5.0] * h_max

    a, b_, g = 0.3, 0.1, 0.2
    ca, cb, cg = 1.0 - a, 1.0 - b_, 1.0 - g
    t1 = sum(vals[:m]) / float(m)
    t2 = sum(vals[m:2 * m]) / float(m)
    l, b = t1, (t2 - t1) / float(m)
    seas = [vals[i] - l for i in range(m)]
    for y in vals[m:]:
        s1 = seas[0]
        lnew = (a * (y - s1)) + (ca * (l + b))
        bnew = (b_ * (lnew - l)) + (cb * b)
        snew = (g * (y - lnew)) + (cg * s1)
        l, b, seas = lnew, bnew, seas[1:] + [snew]
    got = out[out.k == "a"].sort_values("h_step").reset_index(drop=True)
    day0 = (base - pd.Timestamp("1970-01-01")).days
    for h in range(1, h_max + 1):
        fc = (l + h * b) + seas[(h - 1) % m]
        assert abs(got.loc[h - 1, "hw_forecast"] - fc) < 1e-6
        assert got.loc[h - 1, "day_x"] == day0 + 14 + h


def test_hw_forecast_damped_mul_python_differential(spark):
    """The combined ETS(A,Ad,M) extrapolation: replicate init (s0 =
    y/l0), damped-mul steps, and the Φ_h = Σφ^i ladder in Python
    floats on a positive period-3 series."""
    from time_sift_spark.operators.seasonal import holt_winters_forecast

    base = pd.Timestamp("2024-01-01")
    m, h_max, phi = 3, 5, 0.9
    vals = [4.0, 7.0, 5.0, 6.0, 9.0, 7.0, 8.0, 11.0, 9.0, 10.0, 13.0,
            11.0, 12.0, 15.0, 13.0]
    pdf = pd.DataFrame(
        [(base + pd.Timedelta(days=i), "a", v) for i, v in enumerate(vals)],
        columns=["ts", "k", "v"],
    )
    out = (
        holt_winters_forecast(
            spark.createDataFrame(pdf), "v", "ts", "k",
            period=m, horizon=h_max, seasonal="mul", damping=phi,
        )
        .toPandas().sort_values("h_step").reset_index(drop=True)
    )
    a, b_, g = 0.3, 0.1, 0.2
    ca, cb, cg = 1.0 - a, 1.0 - b_, 1.0 - g
    t1 = sum(vals[:m]) / float(m)
    t2 = sum(vals[m:2 * m]) / float(m)
    l, b = t1, (t2 - t1) / float(m)
    seas = [vals[i] / l for i in range(m)]
    for y in vals[m:]:
        s1 = seas[0]
        bt = phi * b
        lnew = (a * (y / s1)) + (ca * (l + bt))
        bnew = (b_ * (lnew - l)) + (cb * bt)
        snew = (g * (y / lnew)) + (cg * s1)
        l, b, seas = lnew, bnew, seas[1:] + [snew]
    ps, pw = 0.0, 1.0
    for h in range(1, h_max + 1):
        pw *= phi
        ps += pw
        fc = (l + ps * b) * seas[(h - 1) % m]
        assert abs(out.loc[h - 1, "hw_forecast"] - fc) < 1e-6


def test_phrase_index_persisted_equals_inline(spark, tmp_path):
    """build → serve returns exactly the inline phrase relation, and
    the serve plan contains NO tokenizer subtree (the explode is paid
    at build)."""
    from time_sift_spark.operators.search import (
        build_phrase_index,
        phrase_search,
        query_phrase_index,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["new york new york", "york new", "the new york times"],
    })
    docs = spark.createDataFrame(pdf)
    path = str(tmp_path / "phrase_idx")
    build_phrase_index(docs, "text", "doc_id", path)
    inline = (
        phrase_search(docs, "text", "doc_id", ["new", "york"])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    served = (
        query_phrase_index(spark, path, ["new", "york"])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert inline.equals(served)
    assert list(served.doc_id) == [1, 3]
    assert list(served.n_matches) == [2, 1]

    plan = query_phrase_index(
        spark, path, ["new", "york"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan  # tokenizer absent: paid at build


def test_phrase_index_append_equals_full_build(spark, tmp_path):
    """build(A) + append(B) answers every phrase query exactly like
    build(A ∪ B) — no corpus statistics exist, so the postings append
    is the whole maintenance."""
    from time_sift_spark.operators.search import (
        append_phrase_index,
        build_phrase_index,
        query_phrase_index,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["new york here", "only york", "new york new york", "no match"],
    })
    docs = spark.createDataFrame(pdf)
    p_inc = str(tmp_path / "idx_inc")
    build_phrase_index(docs.where("doc_id <= 2"), "text", "doc_id", p_inc)
    append_phrase_index(docs.where("doc_id > 2"), p_inc)
    p_full = str(tmp_path / "idx_full")
    build_phrase_index(docs, "text", "doc_id", p_full)
    inc = (
        query_phrase_index(spark, p_inc, ["new", "york"])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    full = (
        query_phrase_index(spark, p_full, ["new", "york"])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert inc.equals(full)
    assert list(inc.doc_id) == [1, 3]
    assert list(inc.n_matches) == [1, 2]


def test_streaming_pettitt_equals_batch_at_drain(spark, tmp_path):
    """Drain ≡ batch for the streaming twin: the (group, day) DECIMAL
    bucket sums drained from the stream feed pettitt_sql's
    staged_bucket entry, so the result must equal the batch statement
    on the same data — including the significant level-shift verdict."""
    from time_sift_spark.operators.trend import pettitt, streaming_pettitt

    base = pd.Timestamp("2024-01-01")
    rows = []
    for i in range(20):
        # two events per day so the stream side genuinely aggregates
        for j in (0, 1):
            rows.append((base + pd.Timedelta(days=i, hours=j), "shift",
                         0.25 if i < 10 else 5.5))
            rows.append((base + pd.Timedelta(days=i, hours=j), "flat", 3.0))
    pdf = pd.DataFrame(rows, columns=["ts", "k", "v"])
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(4).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema("ts timestamp, k string, v double").parquet(path)
    got = (
        streaming_pettitt(stream, "v", "ts", "k", query_name="t_pettitt_stream")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        pettitt(static, "v", "ts", "k")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    sh = got.set_index("k").loc["shift"]
    assert bool(sh.significant) and sh.k_stat == 100
