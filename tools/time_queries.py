"""Time named registered queries with the bench methodology (noop force,
warm-up + best-of-2). Usage: python tools/time_queries.py name [name ...]"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from time_sift_spark.queries import REGISTRY  # noqa: E402
from time_sift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("time_queries",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        qd = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"time:{name}")
        force(qd.spark_fn(spark, SF_DIR))
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(qd.spark_fn(spark, SF_DIR))
            runs.append(time.perf_counter() - t0)
        print(f"{name}: {min(runs):.2f}s (runs {[round(r, 2) for r in runs]})",
              flush=True)


if __name__ == "__main__":
    main()
