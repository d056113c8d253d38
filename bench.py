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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("time_sift_spark_bench")

    timings: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        try:
            force(qd.spark_fn(spark, sf_dir))  # warm-up (JIT, file listing)
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                force(qd.spark_fn(spark, sf_dir))
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
        except Exception as exc:  # keep benching remaining queries
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    # Full precision for humans / the repo record.
    print(json.dumps({"queries_full": timings, "sf": sf_val}), file=sys.stderr)

    # The driver captures only the LAST 2000 chars of stdout and parses
    # that (BENCH_r{1..4}.json all show "parsed": null from an
    # over-long line truncated mid-JSON). Emit ONE compact line and
    # degrade per-query precision before ever exceeding the window.
    def line_for(dp: int) -> str:
        return json.dumps(
            {
                "metric": "sum_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, dp) for k, v in timings.items()},
                "sf": sf_val,
            },
            separators=(",", ":"),
        )

    out = next(
        (s for dp in (2, 1) if len(s := line_for(dp)) <= 1950), None
    )
    if out is None:
        # last resort: keep the slowest queries, drop the cheap tail
        ranked = sorted(timings, key=lambda k: -timings[k])
        kept = dict.fromkeys(ranked, None)
        while kept:
            kept.popitem()
            trimmed = {k: round(timings[k], 1) for k in kept}
            out = json.dumps(
                {
                    "metric": "sum_query_seconds",
                    "value": total,
                    "unit": "sec",
                    "queries": trimmed,
                    "queries_omitted": len(timings) - len(trimmed),
                    "sf": sf_val,
                },
                separators=(",", ":"),
            )
            if len(out) <= 1950:
                break
    print(out)


if __name__ == "__main__":
    main()
