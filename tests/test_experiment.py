"""CUPED experiment analysis vs a numpy reference."""

import numpy as np
import pandas as pd


def _mk_events(n_users=40, seed=3):
    """Per-user pre/post events; Y = 2·X + noise + arm effect."""
    rng = np.random.RandomState(seed)
    rows = []
    import hashlib

    for u in range(n_users):
        arm = (
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
        )
        x = float(np.round(rng.uniform(10, 100), 2))
        y = float(np.round(2.0 * x + rng.normal(0, 1) + 5.0 * arm, 2))
        rows.append((u, pd.Timestamp("2024-01-10"), x))
        rows.append((u, pd.Timestamp("2024-01-20"), y))
    return pd.DataFrame(rows, columns=["user_id", "ts", "value"])


def test_cuped_theta_and_adjustment(spark):
    from time_sift_spark.operators.experiment import cuped

    pdf = _mk_events()
    out = (
        cuped(
            spark.createDataFrame(pdf),
            "user_id",
            "ts",
            "value",
            cutoff="2024-01-15 00:00:00",
        )
        .toPandas()
        .sort_values("arm")
        .reset_index(drop=True)
    )
    assert list(out.arm) == [0, 1]
    # numpy reference
    per = pdf.assign(pre=pdf.ts < pd.Timestamp("2024-01-15"))
    x = per[per.pre].set_index("user_id").value
    y = per[~per.pre].set_index("user_id").value
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(out.theta[0] - theta) < 1e-9 * max(1.0, abs(theta))
    # adjustment removes the X-driven spread: adjusted means are far
    # closer to (intercept + effect) than raw post means are
    import hashlib

    arms = pd.Series(
        {
            u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2
            for u in x.index
        }
    )
    for a in (0, 1):
        mask = arms == a
        adj = y[mask] - theta * (x[mask] - x.mean())
        assert abs(out.mean_adj[a] - adj.mean()) < 1e-9
    raw_gap = abs(out.mean_post[1] - out.mean_post[0])
    adj_gap = abs(out.mean_adj[1] - out.mean_adj[0])
    assert abs(adj_gap - 5.0) < abs(raw_gap - 5.0) + 1e-9


def test_cuped_assignment_is_deterministic(spark):
    from time_sift_spark.operators.experiment import cuped

    pdf = _mk_events(seed=9)
    a = cuped(
        spark.createDataFrame(pdf), "user_id", "ts", "value",
        cutoff="2024-01-15 00:00:00",
    ).toPandas()
    b = cuped(
        spark.createDataFrame(pdf), "user_id", "ts", "value",
        cutoff="2024-01-15 00:00:00",
    ).toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_ranked_auc_tie_aware(spark):
    from time_sift_spark.operators.experiment import ranked_auc

    pdf = pd.DataFrame(
        {"s": [0.1, 0.2, 0.2, 0.3], "y": [0, 0, 1, 1], "p": [False, False, True, True]}
    )
    out = ranked_auc(spark.createDataFrame(pdf), "s", "y", "p").toPandas()
    assert out.n_eval[0] == 4 and out.n_pos[0] == 2 and out.n_neg[0] == 2
    # pairs: (0.2pos vs 0.1neg)=1, (0.2pos vs 0.2neg)=0.5, (0.3pos vs both)=2
    assert abs(out.auc[0] - 3.5 / 4) < 1e-15
    assert out.accuracy[0] == 1.0


def test_ranked_auc_perfect_and_inverted(spark):
    from time_sift_spark.operators.experiment import ranked_auc

    n = 50
    pdf = pd.DataFrame(
        {"s": np.arange(n, dtype="float64"), "y": (np.arange(n) >= n // 2).astype(int)}
    )
    perfect = ranked_auc(spark.createDataFrame(pdf), "s", "y").toPandas()
    assert perfect.auc[0] == 1.0
    pdf["s"] = -pdf["s"]
    inverted = ranked_auc(spark.createDataFrame(pdf), "s", "y").toPandas()
    assert inverted.auc[0] == 0.0


def test_calibration_bins_perfectly_calibrated(spark):
    """Score == within-bin positive rate by construction -> gap 0."""
    from time_sift_spark.functions.text_fns import SPARK as D
    from time_sift_spark.operators.experiment import calibration_bins_sql

    rows = []
    for b in range(10):
        p = b / 10 + 0.05
        for i in range(100):
            rows.append((p, 1 if i < round(p * 100) else 0))
    pdf = pd.DataFrame(rows, columns=["s", "y"])
    spark.createDataFrame(pdf).createOrReplaceTempView("_cal_t")
    out = (
        spark.sql(calibration_bins_sql(D, "_cal_t", "s", "y"))
        .toPandas().sort_values("bin").reset_index(drop=True)
    )
    assert len(out) == 10
    assert (out.n_bin == 100).all()
    assert out.gap.abs().max() <= 0.001 + 1e-12


def test_brier_decomposition_identity(spark):
    """Murphy identity: brier == reliability - resolution + uncertainty
    when scores are constant within bins (planted that way)."""
    from time_sift_spark.functions.text_fns import SPARK as D
    from time_sift_spark.operators.experiment import brier_decomposition_sql

    rng = np.random.RandomState(7)
    rows = []
    for b in range(10):
        p = b / 10 + 0.05
        frac = min(1.0, max(0.0, p + (0.1 if b % 2 else -0.1)))
        for i in range(200):
            rows.append((p, 1 if i < round(frac * 200) else 0))
    pdf = pd.DataFrame(rows, columns=["s", "y"])
    spark.createDataFrame(pdf).createOrReplaceTempView("_br_t")
    out = spark.sql(brier_decomposition_sql(D, "_br_t", "s", "y")).toPandas()
    r = out.iloc[0]
    assert r.n_eval == 2000
    assert abs(r.brier - (r.reliability - r.resolution + r.uncertainty)) < 1e-4
    # reliability reflects the planted +-0.1 miscalibration: ~0.01
    assert 0.005 < r.reliability < 0.02


def test_classification_report_hand_matrix(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.experiment import classification_report

    # pred/actual pairs: a: tp=2, fp=1 (b->a), fn=1 (a->b); c never
    # predicted (recall 0, precision 0 by the zero-division convention)
    pairs = [("a", "a"), ("a", "a"), ("b", "a"), ("a", "b"), ("b", "b"), ("b", "c")]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["p", "y"]))
    out = {r["class"]: r for r in classification_report(df, "p", "y").collect()}
    a = out["a"]
    assert (a["tp"], a["fp"], a["fn"], a["support"]) == (2, 1, 1, 3)
    assert a["precision_score"] == pytest.approx(2 / 3)
    assert a["recall_score"] == pytest.approx(2 / 3)
    assert a["f1"] == pytest.approx(2 / 3)
    b = out["b"]
    assert (b["tp"], b["fp"], b["fn"]) == (1, 2, 1)
    assert b["precision_score"] == pytest.approx(1 / 3)
    assert b["recall_score"] == pytest.approx(0.5)
    assert b["f1"] == pytest.approx(0.4)  # 2tp/(2tp+fp+fn) = 2/5
    c = out["c"]
    assert (c["tp"], c["fp"], c["fn"]) == (0, 0, 1)
    assert c["precision_score"] == 0.0 and c["recall_score"] == 0.0 and c["f1"] == 0.0
    assert set(out) == {"a", "b", "c"}


def test_welch_ttest_matches_scipy_free_formula(spark):
    import numpy as np
    import pandas as pd
    import pytest

    from time_sift_spark.operators.experiment import welch_ttest
    from time_sift_spark.functions.text_fns import SPARK as _S

    # per-user single rows; planted effect on arm 1
    rng = np.random.default_rng(13)
    users = [f"u{i}" for i in range(400)]
    pdf = pd.DataFrame({"u": users, "v": rng.normal(10.0, 2.0, 400)})
    # compute each user's md5-parity arm the same way the operator does
    arms = (
        spark.createDataFrame(pdf)
        .selectExpr("u", f"{_S.md5_long('CAST(u AS STRING)')} % 2 AS arm")
        .toPandas()
    )
    pdf = pdf.merge(arms, on="u")
    pdf.loc[pdf.arm == 1, "v"] += 1.5
    out = welch_ttest(spark.createDataFrame(pdf[["u", "v"]]), "u", "v").collect()[0]

    # reference Welch computation on decimal-quantized values (the
    # operator's scan cast), pure numpy
    q = pdf.assign(vq=pdf.v.round(6))
    g0, g1 = q[q.arm == 0].vq.to_numpy(), q[q.arm == 1].vq.to_numpy()
    m0, m1 = g0.mean(), g1.mean()
    v0, v1 = g0.var(ddof=1), g1.var(ddof=1)
    se2 = v0 / len(g0) + v1 / len(g1)
    t_ref = (m1 - m0) / np.sqrt(se2)
    df_ref = se2**2 / (
        (v0 / len(g0)) ** 2 / (len(g0) - 1) + (v1 / len(g1)) ** 2 / (len(g1) - 1)
    )
    assert out["n0"] + out["n1"] == 400
    assert out["mean_0"] == pytest.approx(m0, abs=1e-4)
    assert out["t_stat"] == pytest.approx(t_ref, rel=1e-4)
    assert out["df_welch"] == pytest.approx(df_ref, rel=1e-3)
    assert out["significant"] is True and abs(out["t_stat"]) > 5
