"""Local driver-sim: run named registered queries vs their DuckDB oracles.

Usage: python tools/check_queries.py [name ...]   (no names = all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

from pyspark.sql import SparkSession

from oracle_harness import check_query
from time_sift_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    names = sys.argv[1:] or list(REGISTRY)
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("check-queries")
        .getOrCreate()
    )
    spark.sparkSession = spark
    from time_sift_spark.sources.catalog import ensure_session_confs

    ensure_session_confs(spark)
    bad = 0
    for n in names:
        if n not in REGISTRY:
            print(f"{n}: NOT REGISTERED")
            bad += 1
            continue
        t0 = time.time()
        try:
            problems = check_query(spark, n, SF_DIR)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        dt = time.time() - t0
        if problems:
            bad += 1
            print(f"{n}: FAIL ({dt:.1f}s)")
            for p in problems[:3]:
                print(f"    {p}")
        else:
            print(f"{n}: ok ({dt:.1f}s)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
