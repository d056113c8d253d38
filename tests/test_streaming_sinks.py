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
