#!/usr/bin/env python
"""Benchmark harness — times every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is forced with a noop datasource write (full plan runs, nothing
collected to the driver). Per query: one warm-up, then best-of-2 timed runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

from time_sift_spark.queries import REGISTRY
from time_sift_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


# The driver captures only the LAST 2000 chars of stdout and parses that
# (BENCH_r{1..4}.json all recorded "parsed": null from an over-long line
# truncated mid-JSON). MAX_LINE leaves headroom for a trailing newline
# and any stray shutdown output.
MAX_LINE = 1950


def compact_result_line(timings: dict, total: float, sf_val) -> str:
    """ONE parseable JSON line within the driver's capture window:
    degrade per-query precision first, then (last resort) drop the
    cheapest SUCCESSFUL queries, reporting how many were omitted.
    Failed queries (sentinel -1.0) are never trimmed away — the compact
    line must surface failures even when space runs out (full data only
    goes to stderr, which the driver does not capture)."""

    failed = {k: v for k, v in timings.items() if v < 0}

    def line_for(qdict: dict, extra: dict) -> str:
        if failed:
            extra = {"n_failed": len(failed), **extra}
        return json.dumps(
            {
                "metric": "sum_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": qdict,
                **extra,
                "sf": sf_val,
            },
            separators=(",", ":"),
        )

    for dp in (2, 1):
        out = line_for({k: round(v, dp) for k, v in timings.items()}, {})
        if len(out) <= MAX_LINE:
            return out
    ok = {k: v for k, v in timings.items() if v >= 0}
    ranked = sorted(ok, key=lambda k: -ok[k])
    for n_keep in range(len(ranked) - 1, -1, -1):
        trimmed = {k: round(timings[k], 1) for k in [*failed, *ranked[:n_keep]]}
        out = line_for(trimmed, {"queries_omitted": len(ok) - n_keep})
        if len(out) <= MAX_LINE:
            return out
    return line_for(dict(failed), {"queries_omitted": len(ok)})


def _time_query(spark, qd, sf_dir: str) -> float:
    force(qd.spark_fn(spark, sf_dir))  # warm-up (JIT, file listing)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(qd.spark_fn(spark, sf_dir))
        runs.append(time.perf_counter() - t0)
    return round(min(runs), 4)


def _is_streaming(name: str) -> bool:
    return name.startswith(("streaming_", "stream_"))


def _run_isolated(name: str, sf_dir: str) -> float:
    """Time one query in its OWN subprocess/JVM.  Stateful streaming
    queries run multi-batch drains whose timings in a 130-query aged
    session absorb 2-3x old-gen GC draws, slowly inflating the
    element-wise-max baseline the 2x regression gate compares against
    (VERDICT r6 #6); a fresh JVM per streaming query removes that noise
    source.  JVM startup is NOT in the measured window — the subprocess
    itself warms up then times, exactly like the in-process path."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=name)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        sys.stderr.write(proc.stderr)
        line = proc.stdout.strip().splitlines()[-1]
        return float(json.loads(line)["sec"])
    except Exception as exc:
        print(f"[bench] {name} FAILED (isolated): {exc}", file=sys.stderr)
        return -1.0


def main() -> None:
    # many queries x 3 executions in one JVM: give the driver headroom so
    # late-run queries measure work, not old-gen GC (overridable via env)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        # child mode: time exactly one query in this fresh JVM
        spark = get_spark("time_sift_spark_bench_1q")
        try:
            sec = _time_query(spark, REGISTRY[only], sf_dir)
        except Exception as exc:
            print(f"[bench] {only} FAILED: {exc}", file=sys.stderr)
            sec = -1.0
        print(json.dumps({"query": only, "sec": sec}))
        return

    spark = get_spark("time_sift_spark_bench")

    timings: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        if _is_streaming(name):
            timings[name] = _run_isolated(name, sf_dir)
            continue
        try:
            timings[name] = _time_query(spark, qd, sf_dir)
        except Exception as exc:  # keep benching remaining queries
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Full precision for humans / the repo record.
    print(json.dumps({"queries_full": timings, "sf": sf_val}), file=sys.stderr)
    print(compact_result_line(timings, total, sf_val))


if __name__ == "__main__":
    main()
