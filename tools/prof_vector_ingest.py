"""Profile streaming_vector_ingest component-by-component (guide §1):
build_lsh_index, the 2-epoch foreachBatch drain (screen / verdict write /
append split out), and the final recursive read. Same dirs/logic as the
registered query, timers added. Usage: python tools/prof_vector_ingest.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from time_sift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("prof_vingest",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    from time_sift_spark.operators.similarity import (
        append_lsh_index,
        build_lsh_index,
        screen_new_vectors_lsh,
    )
    from time_sift_spark.queries import (
        _roundtrip_dir,
        _vector_chunked_embeddings,
        load_table,
    )
    from time_sift_spark.streaming.lag_stream import _next_stream_name

    for rep in range(3):
        t_all = time.perf_counter()
        emb = load_table(spark, "embeddings", SF_DIR)
        base = _roundtrip_dir("ts_svi_prof_") + "/" + _next_stream_name("v")
        store = f"{base}/index"
        results = f"{base}/results"
        t0 = time.perf_counter()
        build_lsh_index(
            emb.where("vec_id < 400").select("vec_id", "embedding"),
            "vec_id", "embedding", store,
            num_planes=4, num_tables=8, dim=64,
        )
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        chunk_dir = _vector_chunked_embeddings(SF_DIR)
        t_chunks = time.perf_counter() - t0

        timings = {"screen": 0.0, "vwrite": 0.0, "vread": 0.0,
                   "append": 0.0, "marker": 0.0}

        def _sink(bdf, epoch_id):
            bsp = bdf.sparkSession
            marker = f"{base}/applied-epoch-{epoch_id}"
            if os.path.exists(marker):
                return
            edir = f"{results}/epoch-{epoch_id}"
            if not os.path.exists(f"{edir}/_SUCCESS"):
                s = time.perf_counter()
                out = screen_new_vectors_lsh(bsp, store, bdf, threshold=0.9)
                timings["screen"] += time.perf_counter() - s
                s = time.perf_counter()
                out.write.mode("overwrite").parquet(edir)
                timings["vwrite"] += time.perf_counter() - s
            s = time.perf_counter()
            verdicts = bsp.read.parquet(edir)
            accepted = bdf.join(
                verdicts.where("accepted").select("vec_id"), "vec_id", "left_semi"
            )
            timings["vread"] += time.perf_counter() - s
            s = time.perf_counter()
            append_lsh_index(bsp, store, accepted)
            timings["append"] += time.perf_counter() - s
            os.makedirs(marker)

        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(chunk_dir)
        )
        t0 = time.perf_counter()
        q = (
            stream.writeStream.foreachBatch(_sink)
            .queryName(_next_stream_name("ts_prof_vingest"))
            .option("checkpointLocation", f"{base}/_checkpoint")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        t_drain = time.perf_counter() - t0
        t0 = time.perf_counter()
        final = spark.read.option("recursiveFileLookup", "true").parquet(results)
        final.write.format("noop").mode("overwrite").save()
        t_read = time.perf_counter() - t0
        total = time.perf_counter() - t_all
        print(
            f"rep{rep}: total={total:.2f} build={t_build:.2f} "
            f"chunks={t_chunks:.2f} drain={t_drain:.2f} "
            f"(screen={timings['screen']:.2f} vwrite={timings['vwrite']:.2f} "
            f"vread={timings['vread']:.2f} append={timings['append']:.2f}) "
            f"final_read={t_read:.2f}",
            flush=True,
        )
        # bucket-file fan-out after build+2 appends
        nb = len([f for f in os.listdir(f"{store}/buckets") if f.endswith(".parquet")])
        nv = len([f for f in os.listdir(f"{store}/vectors") if f.endswith(".parquet")])
        print(f"rep{rep}: bucket files={nb} vector files={nv}", flush=True)


if __name__ == "__main__":
    main()
