#!/usr/bin/env python
"""Run the headline queries against the sf1 scale-probe dataset
(tools/gen_scale_probe.py output) and report per-query seconds next to
the sf0.1 records — the measured 10x data point behind SCALE.md's
100 TB arguments.

Each query runs in its OWN subprocess/JVM (bench.py's
SPARK_GRAFT_BENCH_ONLY mode: warm-up + best-of-2, JVM startup outside
the window) so an aged-session GC draw can't smear the comparison.
Run on a QUIET box.  Output: one JSON line per query on stdout and a
summary JSON file SCALE_PROBE_sf1.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "scale_probe", "sf1")
BENCH = os.path.join(REPO, "bench.py")

# the headline set: flagship lag, global-series halo, rolling/session/
# asof/window/agg staples, the dedup tier, the ANN tier, the graph
# stress, the excision pair, the crawl head, one streaming drain
QUERIES = [
    "lag_events_wide",
    "lag_global_hourly",
    "rolling_events",
    "sessionize_events",
    "asof_join_purchases",
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "topk_orders_per_customer",
    "ewma_events",
    "dedup_exact_docs",
    "minhash_lsh_pairs_docs",
    "lsh_verified_neardup_docs",
    "ngram_jaccard_docs",
    "simhash_neardup_docs",
    "exact_substring_pairs_docs",
    "substring_remove_docs",
    "knn_cosine_topk",
    "ann_lsh_multiprobe_topk",
    "ann_ivf_topk",
    "graph_components_event_chains",
    "html_extract_docs",
    # streaming tier (r12 VERDICT item 7): one drain per streaming
    # class — stateful lag, fuzzy-dedup store, Holt-Winters state
    # queue, bounded-bin KS — measuring state-store scaling at 10x keys
    "streaming_lag_events",
    "streaming_dedup_fuzzy_docs",
    "streaming_holt_winters_events",
    "streaming_ks_drift_events",
]


def main() -> None:
    if not os.path.isdir(SF1):
        sys.exit(f"{SF1} missing — run tools/gen_scale_probe.py first")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # SPARK_GRAFT_PROBE_ONLY=a,b,c re-probes a subset and MERGES into
    # the existing SCALE_PROBE_sf1.json (full re-probes are ~1h; a
    # plan fix or dataset regeneration usually touches a few queries)
    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY")
    names = [q.strip() for q in only.split(",") if q.strip()] if only else QUERIES
    results: dict[str, float] = {}
    out_path = os.path.join(REPO, "SCALE_PROBE_sf1.json")
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            results.update(json.load(f).get("queries", {}))
    t0 = time.time()
    for name in names:
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=name,
                   SPARK_GRAFT_SF_DIR=SF1, SPARK_GRAFT_CPUS=cpus)
        try:
            proc = subprocess.run(
                [sys.executable, BENCH], env=env,
                capture_output=True, text=True, timeout=1200,
            )
            line = proc.stdout.strip().splitlines()[-1]
            sec = float(json.loads(line)["sec"])
        except Exception as exc:  # timeout, parse failure, crash
            sys.stderr.write(f"[scale-probe] {name} FAILED: {exc}\n")
            sec = -1.0
        results[name] = sec
        print(json.dumps({"query": name, "sf1_sec": sec}), flush=True)
    out = {
        "sf": 1.0,
        "cpus": int(cpus),
        "copies": 10,
        "wall_s": round(time.time() - t0, 1),
        "queries": results,
    }
    if only:
        out["partial_reprobe"] = names
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"metric": "scale_probe_sum_seconds",
                      "value": round(sum(v for v in results.values() if v > 0), 2),
                      "n_failed": sum(1 for v in results.values() if v < 0)}))


if __name__ == "__main__":
    main()
