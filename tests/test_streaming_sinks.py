"""foreachBatch parquet sink: per-epoch dirs, checkpointed, complete."""

import numpy as np
import pandas as pd

from time_sift_spark.streaming.lag_stream import streaming_lag_features
from time_sift_spark.streaming.sinks import run_stream_to_parquet


def test_foreach_batch_parquet_sink(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "t": np.arange(100, dtype="int64"),
            "k": (np.arange(100) % 3).astype("int64"),
            "v": np.arange(100, dtype="float64"),
        }
    )
    src = str(tmp_path / "src")
    for i in range(2):
        spark.createDataFrame(pdf.iloc[i * 50 : (i + 1) * 50]).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")

    stream = (
        spark.readStream.schema("t long, k long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    out = streaming_lag_features(stream, "v", "t", [1], partition_by="k")
    sink = str(tmp_path / "sink")
    run_stream_to_parquet(out, sink, "t_sink_test")

    import glob

    epochs = sorted(glob.glob(f"{sink}/epoch=*"))
    assert len(epochs) == 2  # one dir per micro-batch
    back = spark.read.parquet(f"{sink}/epoch=*").orderBy("k", "t").toPandas()
    assert len(back) == 100
    # lag carried across the epoch boundary: t=51 (k=0) sees t=48's value
    row = back[(back.k == 0) & (back.t == 51)]
    assert row.v_lag1.iloc[0] == 48.0


def test_rocksdb_state_store_parity(spark, tmp_path):
    """state_store="rocksdb" must produce the same drained result as the
    default (HDFS-backed) provider — the provider changes WHERE keyed
    state lives (heap vs local SSD), never the values."""
    import numpy as np
    import pandas as pd

    from time_sift_spark.streaming.lag_stream import (
        run_stream_to_df,
        streaming_lag_features,
    )

    pdf = pd.DataFrame(
        {
            "t": np.arange(120, dtype="int64"),
            "k": (np.arange(120) % 4).astype("int64"),
            "v": np.arange(120, dtype="float64") * 1.5,
        }
    )
    src = str(tmp_path / "rocks_src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(src)

    def drain(name, provider):
        stream = spark.readStream.schema("t long, k long, v double").parquet(src)
        out = streaming_lag_features(stream, "v", "t", [1, 3], partition_by="k")
        return (
            run_stream_to_df(out, name, state_store=provider)
            .orderBy("k", "t")
            .toPandas()
        )

    default = drain("t_rocks_default", None)
    rocks = drain("t_rocks_rocksdb", "rocksdb")
    pd.testing.assert_frame_equal(default, rocks)
    # provider conf restored after the drain
    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
        != "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )


def test_default_stream_partitions_by_state_class(spark, tmp_path, monkeypatch):
    """The adaptive drain default: Python-state plans
    (applyInPandasWithState) get cores/8 (floored 2) — after the r15
    vectorized key-bucketing the Python side is thin and store overhead
    dominates; JVM-stateful plans get the minimum robust count (2)
    because the per-partition state-store cost dominates at ANY local
    core count (r15 cold-JVM sweep); the env knob overrides both (the
    production sizing lever)."""
    import pyspark.sql.functions as F

    from time_sift_spark.streaming.lag_stream import (
        default_stream_partitions,
        streaming_lag_features,
    )

    pdf = pd.DataFrame({"t": [1, 2], "k": [0, 1], "v": [1.0, 2.0]})
    src = str(tmp_path / "parts_src")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("t long, k long, v double").parquet(src)

    cores = spark.sparkContext.defaultParallelism
    py_state = streaming_lag_features(stream, "v", "t", [1], partition_by="k")
    jvm_state = stream.groupBy("k").agg(F.sum("v").alias("s"))

    monkeypatch.delenv("SPARK_GRAFT_STREAM_PARTS", raising=False)
    assert default_stream_partitions(py_state) == max(2, cores // 8)
    assert default_stream_partitions(jvm_state) == 2

    monkeypatch.setenv("SPARK_GRAFT_STREAM_PARTS", "7")
    assert default_stream_partitions(py_state) == 7
    assert default_stream_partitions(jvm_state) == 7


# --------------------------------------------------------------------------
# Incremental upsert snapshot sink
# --------------------------------------------------------------------------


def test_upsert_sink_merges_and_late_rows_never_displace(spark, tmp_path):
    from time_sift_spark.streaming.sinks import read_latest_snapshot, upsert_latest_sink

    base = str(tmp_path / "snap")
    import os

    os.makedirs(base, exist_ok=True)
    sink = upsert_latest_sink(base, "k", ("v_ts", "rid"))
    b1 = spark.createDataFrame([("a", 1, 10, 100.0), ("b", 1, 11, 200.0)], "k string, v_ts long, rid long, val double")
    b2 = spark.createDataFrame([("a", 5, 12, 111.0)], "k string, v_ts long, rid long, val double")
    late = spark.createDataFrame([("a", 2, 13, 999.0), ("c", 1, 14, 300.0)], "k string, v_ts long, rid long, val double")
    sink(b1, 0)
    sink(b2, 1)
    sink(late, 2)  # a@2 is OLDER than snapshot's a@5 -> must not displace
    snap = {r.k: (r.v_ts, r.val) for r in read_latest_snapshot(spark, base).collect()}
    assert snap == {"a": (5, 111.0), "b": (1, 200.0), "c": (1, 300.0)}


def test_upsert_sink_epoch_redelivery_idempotent(spark, tmp_path):
    from time_sift_spark.streaming.sinks import read_latest_snapshot, upsert_latest_sink

    base = str(tmp_path / "snap2")
    import os

    os.makedirs(base, exist_ok=True)
    sink = upsert_latest_sink(base, "k", ("v_ts",))
    b = spark.createDataFrame([("a", 3, 1.0)], "k string, v_ts long, val double")
    sink(b, 0)
    once = sorted(map(tuple, read_latest_snapshot(spark, base).collect()))
    sink(b, 0)  # redelivery of the same epoch
    twice = sorted(map(tuple, read_latest_snapshot(spark, base).collect()))
    assert once == twice


def test_streaming_fuzzy_dedup_cross_batch_state(spark):
    """The novel property of streaming fuzzy ingestion: a batch-2
    re-crawl of a BATCH-1 page (never in the built corpus) is rejected
    purely through the state the sink appended after batch 1, and the
    drained verdicts equal the chained two-round inline screen."""
    from time_sift_spark.queries import REGISTRY

    out = (
        REGISTRY["streaming_dedup_fuzzy_docs"]
        .spark_fn(spark, "/root/testdata/sf0.001")
        .toPandas()
        .set_index("doc_id")
    )
    b2_recrawls = out.loc[[i for i in out.index if i >= 20000]]
    assert len(b2_recrawls) == 10
    assert (~b2_recrawls.accepted).all()  # rejected via cross-batch state only
    assert (b2_recrawls.max_jaccard >= 0.5).all()
    b1_recrawls = out.loc[[i for i in out.index if 10000 <= i < 20000]]
    assert (~b1_recrawls.accepted).all()  # corpus re-crawls rejected in epoch 1


def test_bucketed_drains_state_isolated_within_one_bucket(
    spark, tmp_path, monkeypatch
):
    """r15: the pandas-state drains group KEYS into hash buckets and run
    the per-key recurrences vectorized inside each bucket call.  Force
    EVERY key into ONE bucket and drive 3 micro-batches: per-key state
    must stay isolated (carried buffers/last values never bleed across
    the bucket's keys) and equal the single-key per-batch reference the
    r14 form computed.  Keys are chosen so arrival interleaves them in
    every batch."""
    import numpy as np
    import pyspark.sql.functions as F

    from time_sift_spark.streaming.lag_stream import (
        run_stream_to_df,
        streaming_ewma,
        streaming_lag_features,
    )

    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    monkeypatch.setenv("SPARK_GRAFT_STREAM_KEY_BUCKETS", "1")
    rng = np.random.default_rng(3)
    n, keys = 90, 5
    pdf = pd.DataFrame({
        "t": np.arange(n, dtype=np.int64),
        "k": np.arange(n, dtype=np.int64) % keys,
        "v": rng.standard_normal(n),
    })
    src = str(tmp_path / "bk_src")
    os.makedirs(src, exist_ok=True)
    step = n // 3
    for s in range(3):
        f = f"{src}/chunk-{s:02d}.parquet"
        pq.write_table(
            pa.Table.from_pandas(
                pdf.iloc[s * step:(s + 1) * step], preserve_index=False
            ),
            f,
        )
        os.utime(f, (1_700_000_000 + s, 1_700_000_000 + s))

    def stream():
        return (
            spark.readStream.schema("t long, k long, v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    # reference: per-key pandas, whole series at once (the batch truth —
    # ordered arrival makes the 3-batch drain equal it exactly)
    ref = pdf.sort_values(["k", "t"]).reset_index(drop=True)
    ref["v_lag2"] = ref.groupby("k")["v"].shift(2)
    ref["v_ewma"] = (
        ref.groupby("k")["v"].apply(
            lambda s: s.ewm(alpha=0.4, adjust=False).mean()
        ).reset_index(level=0, drop=True)
    )

    lag = run_stream_to_df(
        streaming_lag_features(stream(), "v", "t", [2], partition_by="k"),
        "bk_lag",
    ).orderBy("k", "t").toPandas()
    pd.testing.assert_frame_equal(
        lag[["k", "t", "v", "v_lag2"]].reset_index(drop=True),
        ref[["k", "t", "v", "v_lag2"]].reset_index(drop=True),
        check_dtype=False,
    )

    ew = run_stream_to_df(
        streaming_ewma(stream(), "v", "t", 0.4, partition_by="k"),
        "bk_ewma",
    ).orderBy("k", "t").toPandas()
    pd.testing.assert_frame_equal(
        ew[["k", "t", "v", "v_ewma"]].reset_index(drop=True),
        ref[["k", "t", "v", "v_ewma"]].reset_index(drop=True),
        check_dtype=False,
    )
