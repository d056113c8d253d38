"""TIMESTAMP_NTZ tolerance — the round-4 driver failure class.

The driver's testdata switched from TIMESTAMP(NANOS) to
TIMESTAMP(MICROS) parquet between rounds, which a Spark-4 session reads
as TIMESTAMP_NTZ by default; ``unix_micros`` and numeric casts reject
NTZ, so five operator families failed at the driver while every
in-process test stayed green (the suite's session read the old encoding).
These tests feed NTZ input to the operators DIRECTLY, so the tolerance
is covered no matter what the testdata encoding of the round is.
"""

import json

import pandas as pd
import pytest

import bench
from time_sift_spark.operators.rangejoin import interval_join
from time_sift_spark.operators.rolling import range_rolling_features, time_weighted_avg
from time_sift_spark.operators.scale import lag_features_global
from time_sift_spark.operators.sessionize import sessionize


def _ntz_events(spark, n=40):
    """A small events frame whose ts column is TIMESTAMP_NTZ."""
    pdf = pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 4 for i in range(n)],
            "ts": pd.date_range("2024-01-01", periods=n, freq="7min"),
            "value": [float(i) for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf)
    df = df.withColumn("ts", df.ts.cast("timestamp_ntz"))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    return df


def test_sessionize_accepts_ntz(spark):
    out = sessionize(_ntz_events(spark), "ts", gap_seconds=600, partition_by="user_id")
    assert out.count() == 40
    assert "session_seq" in out.columns


def test_rolling_time_range_accepts_ntz(spark):
    out = range_rolling_features(
        _ntz_events(spark), "value", "ts", [3600], stats=("count", "sum"),
        partition_by="user_id",
    )
    assert out.count() == 40


def test_time_weighted_avg_accepts_ntz(spark):
    out = time_weighted_avg(_ntz_events(spark), "value", "ts", partition_by="user_id")
    assert out.count() == 4


def test_interval_join_accepts_ntz(spark):
    df = _ntz_events(spark)
    out = interval_join(
        df.selectExpr("user_id", "event_id AS l_id", "ts"),
        df.selectExpr("user_id", "event_id AS r_id", "ts AS rts"),
        on=["user_id"], left_time="ts", right_time="rts",
        tolerance_seconds=300, left_cols=("l_id",), right_cols=("r_id",),
    )
    # every row matches at least itself (|Δt| = 0 ≤ tol)
    assert out.count() >= 40


def test_lag_global_accepts_ntz(spark):
    df = _ntz_events(spark)
    out = lag_features_global(df, "value", "ts", [1, 2], order_extra="event_id", num_buckets=4)
    assert out.count() == 40
    assert "value_lag2" in out.columns


def test_ntz_matches_timestamp_result(spark):
    """The NTZ path must produce the SAME rows as the TIMESTAMP path
    (UTC session pin makes the cast a re-tag, not a shift)."""
    ntz = _ntz_events(spark)
    tz = ntz.withColumn("ts", ntz.ts.cast("timestamp"))
    a = sessionize(ntz, "ts", gap_seconds=600, partition_by="user_id")
    b = sessionize(tz, "ts", gap_seconds=600, partition_by="user_id")
    rows_a = sorted((r.event_id, r.session_seq) for r in a.select("event_id", "session_seq").collect())
    rows_b = sorted((r.event_id, r.session_seq) for r in b.select("event_id", "session_seq").collect())
    assert rows_a == rows_b


def test_read_events_stream_normalizes_ts(spark, sf_dir):
    from time_sift_spark.sources.catalog import read_events_stream

    s1 = read_events_stream(spark, sf_dir)
    assert dict(s1.dtypes)["ts"] == "timestamp"
    s2 = read_events_stream(spark, sf_dir, ts_type="us_long")
    assert dict(s2.dtypes)["ts"] == "bigint"


def test_late_chunker_is_deterministic_and_ordered(sf_dir):
    import os

    from time_sift_spark.queries import _late_chunked_events

    out = _late_chunked_events(sf_dir)
    names = sorted(n for n in os.listdir(out) if n.endswith(".parquet"))
    assert names[-1] == "chunk-99-late.parquet"
    mtimes = [os.path.getmtime(os.path.join(out, n)) for n in names]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    # idempotent: second call reuses the marker, rewrites nothing
    assert _late_chunked_events(sf_dir) == out
    assert [os.path.getmtime(os.path.join(out, n)) for n in names] == mtimes


@pytest.mark.parametrize("n_queries", [5, 71, 200, 500])
def test_bench_line_always_fits_capture_window(n_queries):
    timings = {f"some_quite_long_query_name_{i:03d}": i * 0.0137 for i in range(n_queries)}
    line = bench.compact_result_line(timings, 99.9, 0.1, 0)
    assert len(line) <= bench.MAX_LINE
    parsed = json.loads(line)
    assert parsed["metric"] == "sum_query_seconds"
    assert parsed["value"] == 99.9
    # whatever was dropped is accounted for
    assert len(parsed["queries"]) + parsed.get("queries_omitted", 0) == n_queries
