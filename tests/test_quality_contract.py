"""Data-quality expectation checks (operators/quality.py)."""

import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.quality import (
    accepted_values,
    between,
    check_expectations,
    foreign_key_orphans,
    freshness,
    not_null,
    row_count_min,
    unique,
)


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2, 2, 4],  # duplicate key
                "status": ["ok", "ok", "bad-status", "ok"],
                "score": [0.5, 1.5, 0.2, None],  # 1.5 out of range, one NULL
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-10"]
                ),
            }
        )
    )


def test_expectations_report_metrics_and_flags(dirty):
    out = (
        check_expectations(
            dirty,
            [
                not_null("score"),
                not_null("score", max_null_frac=0.5, name="not_null_score_lenient"),
                unique("id"),
                accepted_values("status", ["ok", "pending"]),
                between("score", 0.0, 1.0),
                row_count_min(3),
                freshness("ts", ref_time="TIMESTAMP '2024-01-12 00:00:00'",
                          max_age_seconds=86400 * 3),
            ],
        )
        .toPandas()
        .set_index("expectation")
    )
    assert out.loc["not_null_score", "metric"] == 0.25  # 1 of 4 NULL
    # same metric, two thresholds: strict fails, lenient passes
    assert not bool(out.loc["not_null_score", "passed"])
    assert bool(out.loc["not_null_score_lenient", "passed"])
    assert not bool(out.loc["unique_id", "passed"])
    assert out.loc["unique_id", "metric"] == 0.25  # one duplicate row of 4
    assert not bool(out.loc["accepted_values_status", "passed"])
    assert not bool(out.loc["between_score", "passed"])  # NULL does not count, 1.5 does
    assert out.loc["between_score", "metric"] == 0.25
    assert bool(out.loc["row_count_min", "passed"])
    assert bool(out.loc["freshness_ts", "passed"])  # newest row 2 days old
    tight = check_expectations(
        dirty,
        [freshness("ts", ref_time="TIMESTAMP '2024-01-12 00:00:00'",
                   max_age_seconds=3600)],
    ).collect()[0]
    assert not tight.passed and tight.metric == 2 * 86400.0


def test_expectations_single_scan(dirty):
    """The batched-metric claim is structural: one aggregate over the
    source regardless of expectation count."""
    df = check_expectations(dirty, [not_null("score"), unique("id"), row_count_min(1)])
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1  # one agg over one source
    assert plan.count("LocalRelation") == 1


def test_expectations_validation(dirty):
    with pytest.raises(ColumnNotFoundError):
        check_expectations(dirty, [not_null("nope")])
    with pytest.raises(ValueError):
        check_expectations(dirty, [])
    with pytest.raises(ValueError, match="duplicate expectation names"):
        check_expectations(dirty, [not_null("score"), not_null("score", max_null_frac=0.1)])


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame(
        pd.DataFrame({"fk": [1, 1, 2, 9, None]})
    )
    parent = spark.createDataFrame(pd.DataFrame({"pk": [1, 2, 3]}))
    row = foreign_key_orphans(child, parent, child_col="fk", parent_col="pk").collect()[0]
    # the NULL fk and the 9 are orphans (NULL never matches an equi-join)
    assert row.orphan_count == 2 and row.child_count == 5
    assert row.orphan_frac == 0.4


def test_streaming_contract_equals_batch_at_drain(spark, tmp_path):
    import pandas as pd

    from time_sift_spark.operators.quality import (
        between as dq_between,
        check_expectations,
        not_null as dq_not_null,
        row_count_min as dq_rows,
        streaming_contract,
        unique as dq_unique,
    )

    pdf = pd.DataFrame({"k": [1, 2, None, 4], "v": [0.1, 5.0, 0.3, 0.2]})
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(2).write.parquet(path)
    exps = [dq_not_null("k", max_null_frac=0.3), dq_between("v", 0.0, 1.0), dq_rows(2)]
    stream = spark.readStream.schema("k double, v double").parquet(path)
    got = (
        streaming_contract(stream, exps, query_name="t_dq_stream")
        .toPandas().sort_values("expectation").reset_index(drop=True)
    )
    want = (
        check_expectations(spark.read.parquet(path), exps)
        .toPandas().sort_values("expectation").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # unstreamable expectations refuse loudly
    import pytest

    with pytest.raises(ValueError, match="not streamable"):
        streaming_contract(stream, [dq_unique("k")], query_name="t_dq_stream2")


def test_distribution_drift_detects_shift_and_handles_edges(spark):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.quality import distribution_drift

    rng = np.random.default_rng(11)
    rows = []
    for day in range(20):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        for _ in range(50):
            # "shifted": mean jumps 0 -> 5 in the current window
            v = rng.normal(0.0 if day < 10 else 5.0, 1.0)
            rows.append(("shifted", ts, v))
            # "stable": same distribution throughout
            rows.append(("stable", ts, rng.normal(0.0, 1.0)))
    # reference-only group: no current rows -> NULL drift
    rows += [("refonly", pd.Timestamp("2024-01-02"), 1.0 * i) for i in range(20)]
    # current-only group: no reference envelope -> drops out
    rows += [("curonly", pd.Timestamp("2024-01-15"), 1.0 * i) for i in range(20)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = {
        r["k"]: r
        for r in distribution_drift(df, "v", "ts", "k", "2024-01-11").collect()
    }
    assert "curonly" not in out
    assert out["refonly"]["tv_distance"] is None
    assert out["refonly"]["chisq_drift"] is None
    # a 5-sigma mean shift clamps most current mass into the top edge bin
    assert out["shifted"]["tv_distance"] > 0.8
    assert out["stable"]["tv_distance"] < 0.15
    assert out["shifted"]["chisq_drift"] > out["stable"]["chisq_drift"] * 10
    assert out["shifted"]["n_ref"] == 500 and out["shifted"]["n_cur"] == 500


def test_streaming_drift_equals_batch_at_drain(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.quality import (
        distribution_drift,
        streaming_distribution_drift,
    )

    rng = np.random.default_rng(3)
    rows = []
    for day in range(20):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        for _ in range(25):
            rows.append(("a", ts, rng.normal(0.0 if day < 10 else 3.0, 1.0)))
            rows.append(("b", ts, rng.normal(1.0, 0.5)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(4).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(path)
    got = (
        streaming_distribution_drift(
            stream, static, "v", "ts", "k", "2024-01-11",
            query_name="t_drift_stream",
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        distribution_drift(static, "v", "ts", "k", "2024-01-11")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.loc[got.k == "a", "tv_distance"].iloc[0] > got.loc[
        got.k == "b", "tv_distance"
    ].iloc[0]


def test_streaming_quantile_drift_equals_batch_at_drain(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.quality import (
        quantile_drift,
        streaming_quantile_drift,
    )

    rng = np.random.default_rng(7)
    rows = []
    for day in range(20):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        for _ in range(25):
            # 'a' median shifts +200 after the split; 'b' is stable
            rows.append(("a", ts, rng.uniform(100, 300) + (200 if day >= 10 else 0)))
            rows.append(("b", ts, rng.uniform(400, 600)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(4).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(path)
    got = (
        streaming_quantile_drift(
            stream, static, "v", "ts", "k", "2024-01-11",
            query_name="t_qq_stream",
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        quantile_drift(static, "v", "ts", "k", "2024-01-11")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    a, b = got.set_index("k").loc["a"], got.set_index("k").loc["b"]
    assert bool(a.flagged) and not bool(b.flagged)
    assert a["shift_p5"] > 150  # p=0.5 renders as _p5 (the batch naming)


def test_snapshot_diff_verdicts_and_null_safety(spark):
    import pandas as pd

    from time_sift_spark.operators.reconcile import snapshot_diff

    old = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2, 3, 4, 5],
                "a": ["x", "y", None, "w", "v"],
                "b": [1.0, 2.0, 3.0, None, 5.0],
            }
        )
    )
    new = spark.createDataFrame(
        pd.DataFrame(
            {
                # 2 removed, 6 added, 3: NULL->filled (changed in a),
                # 4: both cols changed, 5: identical incl. NULL equality
                "k": [1, 3, 4, 5, 6],
                "a": ["x", "z", "W", "v", "new"],
                "b": [1.0, 3.0, 4.0, 5.0, 6.0],
            }
        )
    )
    out = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    assert out[2]["verdict"] == "removed"
    assert out[6]["verdict"] == "added"
    assert out[3]["verdict"] == "changed" and out[3]["changed_cols"] == "a"
    assert out[4]["verdict"] == "changed" and out[4]["changed_cols"] == "a,b"
    assert out[4]["n_cols_changed"] == 2
    assert 1 not in out and 5 not in out  # unchanged rows never emitted


def test_merge_upsert_iud_semantics(spark):
    """CDC MERGE: I inserts, U updates, D deletes; last-writer-wins per
    key by seq; untouched keys pass through; I-on-existing and
    U-on-absent both resolve to the upsert (tolerant MERGE)."""
    import pandas as pd

    from time_sift_spark.operators.reconcile import merge_upsert

    snap = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2, 3, 4],
        "v": ["a", "b", "c", "d"],
    }))
    chg = spark.createDataFrame(pd.DataFrame({
        "k":   [2,    3,   5,   6,   2],
        "v":   ["b2", None, "e", "f", "b1"],
        "op":  ["U",  "D", "I", "U", "U"],
        "seq": [20,   30,  50,  60,  10],  # k=2: seq 20 wins over 10
    }))
    out = (
        merge_upsert(snap, chg, ["k"], ["v"])
        .toPandas().set_index("k").sort_index()
    )
    assert out.loc[1, "v"] == "a"      # untouched
    assert out.loc[2, "v"] == "b2"     # last-writer (seq 20)
    assert 3 not in out.index          # deleted
    assert out.loc[4, "v"] == "d"      # untouched
    assert out.loc[5, "v"] == "e"      # inserted
    assert out.loc[6, "v"] == "f"      # U on absent key upserts
    assert len(out) == 5

    # idempotent re-apply: merging the same batch into the result is a no-op
    out2 = merge_upsert(
        merge_upsert(snap, chg, ["k"], ["v"]), chg, ["k"], ["v"]
    ).toPandas().set_index("k").sort_index()
    pd.testing.assert_frame_equal(out, out2)


def test_merge_upsert_null_key_contract(spark):
    """Non-NULL-key CDC contract (r10 ADVICE): a NULL-keyed change row
    can never address a snapshot key (equi-join never matches NULL), so
    it is filtered out of the batch rather than emitted as an all-NULL
    garbage row."""
    import pandas as pd

    from time_sift_spark.operators.reconcile import merge_upsert

    snap = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}))
    chg = spark.createDataFrame(
        pd.DataFrame({
            "k": pd.array([None, 2], dtype="Int64"),
            "v": ["ghost", "b2"],
            "op": ["I", "U"],
            "seq": [1, 2],
        })
    )
    out = merge_upsert(snap, chg, ["k"], ["v"]).toPandas()
    assert out.k.notna().all(), "no NULL-keyed output rows"
    assert len(out) == 2
    got = out.set_index("k").v
    assert got.loc[1] == "a" and got.loc[2] == "b2"


def test_streaming_burst_detect_equals_batch_at_drain(spark, tmp_path):
    import pandas as pd

    from time_sift_spark.operators.rolling import burst_detect, streaming_burst_detect

    rows = []
    for day in range(15):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        n = 100 if (day == 10) else 10      # a 10x burst on day 10 for 'a'
        for i in range(n):
            rows.append(("a", ts))
        for i in range(12):
            rows.append(("b", ts))
    pdf = pd.DataFrame(rows, columns=["k", "ts"])
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(4).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema("k string, ts timestamp").parquet(path)
    got = (
        streaming_burst_detect(stream, "ts", "k", query_name="t_burst_stream")
        .toPandas().sort_values(["k", "day_x"]).reset_index(drop=True)
    )
    want = (
        burst_detect(static, "ts", "k")
        .toPandas().sort_values(["k", "day_x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    a = got[got.k == "a"]
    assert bool(a.flagged.any()) and not bool(got[got.k == "b"].flagged.any())


def test_streaming_ks_drift_equals_batch_at_drain(spark, tmp_path):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.quality import ks_test_binned, streaming_ks_test

    rng = np.random.default_rng(11)
    rows = []
    for day in range(20):
        ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=day)
        for _ in range(25):
            # 'a' shifts +300 after the split (crosses many 2-unit bins);
            # 'b' is stable
            rows.append(("a", ts, rng.uniform(100, 300) + (300 if day >= 10 else 0)))
            rows.append(("b", ts, rng.uniform(400, 600)))
    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"])
    path = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(4).write.parquet(path)
    static = spark.read.parquet(path)
    stream = spark.readStream.schema("k string, ts timestamp, v double").parquet(path)
    got = (
        streaming_ks_test(
            stream, static, "v", "ts", "k", "2024-01-11",
            query_name="t_ks_stream",
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        ks_test_binned(static, "v", "ts", "k", "2024-01-11")
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    a, b = got.set_index("k").loc["a"], got.set_index("k").loc["b"]
    assert bool(a.drifted) and not bool(b.drifted)


def test_ks_binned_lower_bounds_exact_and_bin_granularity(spark):
    import pandas as pd

    from time_sift_spark.operators.quality import ks_test, ks_test_binned

    # drift strictly INSIDE one bin: [0,1000)/500 → bin width 2; ref
    # values 100.2, cur values 100.8 — same bin 50, exact D = 1.0
    t_ref = pd.Timestamp("2024-01-05")
    t_cur = pd.Timestamp("2024-01-20")
    rows = [("g", t_ref, 100.2)] * 30 + [("g", t_cur, 100.8)] * 30
    # a second group drifting ACROSS bins: 100 → 500
    rows += [("h", t_ref, 100.0)] * 30 + [("h", t_cur, 500.0)] * 30
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    exact = (
        ks_test(df, "v", "ts", "k", "2024-01-11")
        .toPandas().set_index("k")
    )
    binned = (
        ks_test_binned(df, "v", "ts", "k", "2024-01-11")
        .toPandas().set_index("k")
    )
    # lower-bound contract: D̂ ≤ D for every group
    assert (binned.d_stat <= exact.d_stat + 1e-12).all()
    # sub-bin shift is invisible to the quantized form, total to exact
    assert exact.loc["g"].d_stat == 1.0 and binned.loc["g"].d_stat == 0.0
    assert not bool(binned.loc["g"].drifted)
    # cross-bin shift: both see it fully
    assert binned.loc["h"].d_stat == 1.0 and bool(binned.loc["h"].drifted)
