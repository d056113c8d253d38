"""Experiment (r15, VERDICT item 3): transformWithStateInPandas as a
drop-in for the applyInPandasWithState EWMA drain — measure the two
forms on the SAME chunked input and collect-compare results.

transformWithState is the Spark 4.x Arrow-native state API; it requires
the RocksDB state store provider.  The question is whether its per-batch
machinery beats the GroupState ring-buffer path at this state size.

    python tools/exp_tws_ewma.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402
from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: E402
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

from time_sift_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ALPHA = 0.3


class EwmaProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("last_ewma", "v double")

    def handleInputRows(self, key, rows, timerValues):
        batch = pd.concat(list(rows), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="mergesort"
        )
        vals = batch["value"].astype("float64").reset_index(drop=True)
        prev = self._state.get()
        if prev is not None:
            seeded = pd.concat(
                [pd.Series([prev[0]], dtype="float64"), vals], ignore_index=True
            )
            y = seeded.ewm(alpha=ALPHA, adjust=False).mean().iloc[1:].reset_index(drop=True)
        else:
            y = vals.ewm(alpha=ALPHA, adjust=False).mean()
        out = batch[["ts", "event_id", "value"]].reset_index(drop=True)
        out["value_ewma"] = y
        out.insert(0, "user_id", key[0])
        self._state.update((float(y.iloc[-1]),))
        yield out

    def close(self) -> None:
        pass


def main() -> None:
    spark = get_spark("exp_tws",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    import pyspark.sql.functions as F

    from time_sift_spark.queries import REGISTRY, _late_chunked_events
    from time_sift_spark.sources.catalog import ensure_session_confs
    from time_sift_spark.streaming import lag_stream as ls

    ensure_session_confs(spark)
    chunk_dir = _late_chunked_events(SF_DIR)
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")

    def tws_run(name):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(chunk_dir)
            .where("value IS NOT NULL")
            .withColumn("ts", F.unix_micros("ts"))
            .select("user_id", "ts", "event_id", "value")
        )
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=EwmaProcessor(),
            outputStructType=(
                "user_id long, ts long, event_id long, value double, "
                "value_ewma double"
            ),
            outputMode="Append",
            timeMode="None",
        )
        return ls.run_stream_to_df(out, name, state_store="rocksdb")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # baseline: the registered applyInPandasWithState query
    qd = REGISTRY["streaming_ewma_events"]
    force(qd.spark_fn(spark, SF_DIR))
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(qd.spark_fn(spark, SF_DIR))
        runs.append(time.perf_counter() - t0)
    print(f"applyInPandasWithState: {min(runs):.2f}s {[round(r,2) for r in runs]}",
          flush=True)

    # candidate: transformWithStateInPandas
    seq = [0]

    def next_name():
        seq[0] += 1
        return f"tws_ewma_{seq[0]}"

    force(tws_run(next_name()))
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        force(tws_run(next_name()))
        runs.append(time.perf_counter() - t0)
    print(f"transformWithStateInPandas: {min(runs):.2f}s {[round(r,2) for r in runs]}",
          flush=True)

    # value identity
    a = qd.spark_fn(spark, SF_DIR).orderBy("user_id", "ts", "event_id").collect()
    b = tws_run(next_name()).orderBy("user_id", "ts", "event_id").collect()
    same = [tuple(r) for r in a] == [tuple(r) for r in b]
    print(f"identical: {same} ({len(a)} vs {len(b)} rows)")


if __name__ == "__main__":
    main()
