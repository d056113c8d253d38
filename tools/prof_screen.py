"""Split plan-vs-execute cost of the LSH screen (guide §1/§7.3).

Times: sql() construction, analysis+optimization (explain), first
execution, second execution, at several shuffle-partition settings.
Usage: python tools/prof_screen.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from time_sift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("prof_screen",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from time_sift_spark.operators.similarity import (
        build_lsh_index,
        screen_new_vectors_lsh,
    )
    from time_sift_spark.queries import _roundtrip_dir, load_table

    emb = load_table(spark, "embeddings", SF_DIR)
    base = _roundtrip_dir("ts_scr_prof_") + "/s1"
    store = f"{base}/index"
    build_lsh_index(
        emb.where("vec_id < 400").select("vec_id", "embedding"),
        "vec_id", "embedding", store,
        num_planes=4, num_tables=8, dim=64,
    )
    new_df = emb.where("vec_id >= 400").select("vec_id", "embedding")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for parts in (32, 8, 4):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        for rep in range(2):
            t0 = time.perf_counter()
            out = screen_new_vectors_lsh(spark, store, new_df, threshold=0.9)
            t_sql = time.perf_counter() - t0
            t0 = time.perf_counter()
            out._jdf.queryExecution().executedPlan()
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            force(out)
            t_x1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            force(out)
            t_x2 = time.perf_counter() - t0
            print(
                f"parts={parts} rep={rep}: sql={t_sql:.2f} plan={t_plan:.2f} "
                f"exec1={t_x1:.2f} exec2={t_x2:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
