"""Bare-session robustness: the exact round-1 failure mode.

The external harness builds its OWN SparkSession (no engine confs —
notably no ``spark.sql.legacy.parquet.nanosAsLong``, no UTC timezone).
Round 1 lost 18/50 correctness rows because ``load_table`` silently
assumed the engine's session confs. This test runs representative
registry queries in a SUBPROCESS with a bare
``SparkSession.builder.master('local[2]').getOrCreate()`` — in-process
testing can't catch it because getOrCreate would reuse the suite's
already-configured session.
"""

import json
import subprocess
import sys
import textwrap

# One query per session-sensitive surface: nanos-timestamp batch read
# (lag/rolling/asof), streaming read, documents-table read, and the
# halo-bucket scale path (driver-side collect of bucket bounds).
PROBE_QUERIES = [
    "lag_events_wide",
    "rolling_events",
    "asof_join_purchases",
    "streaming_lag_events",
    "text_stats_docs",
    "lag_global_hourly",
    # round-2 surfaces: streaming state-store dedup, tempdir write→read,
    # local-interop round trip (createDataFrame on a bare session), and
    # the TWA window+agg path
    "streaming_dedup_events",
    "csv_roundtrip_orders",
    "interop_roundtrip_events",
    "time_weighted_avg_events",
    # round-5 surfaces: the TIMESTAMP(MICROS)→NTZ testdata switch broke
    # exactly these classes on the driver's bare session — epoch-µs
    # window math, the rangejoin SQL-expr bucketing, the scale path's
    # numeric time cast, and the footer-sniffed streaming schema
    "sessionize_events",
    "interval_join_error_click",
    "lag_hotkey_events",
    "streaming_session_windows",
]

_SCRIPT = textwrap.dedent(
    """
    import json, sys
    from pyspark.sql import SparkSession

    # Bare session: mirrors the external harness — NO engine confs.
    spark = (
        SparkSession.builder.master("local[2]")
        .appName("bare_driver_session_probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sys.path.insert(0, "/root/repo")
    from time_sift_spark.queries import queries

    qs = queries()
    out = {}
    for name in json.loads(sys.argv[1]):
        try:
            out[name] = qs[name](spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            out[name] = f"ERROR: {type(e).__name__}: {e}"
    print("RESULT_JSON:" + json.dumps(out))
    """
)


def test_registry_queries_on_bare_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, json.dumps(PROBE_QUERIES)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    marker = [l for l in proc.stdout.splitlines() if l.startswith("RESULT_JSON:")]
    assert marker, f"probe subprocess died:\nstdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-4000:]}"
    results = json.loads(marker[0][len("RESULT_JSON:"):])
    errors = {k: v for k, v in results.items() if isinstance(v, str)}
    assert not errors, f"queries failed on a bare session: {errors}"
    for name, n in results.items():
        assert n > 0, f"{name} returned 0 rows on bare session"
