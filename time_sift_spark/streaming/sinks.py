"""Streaming sinks beyond the memory sink.

``foreachBatch`` is the general-purpose exactly-once-ish sink: each
micro-batch arrives as a BATCH DataFrame with its epoch id, so any batch
writer (parquet, JDBC, MERGE-style upserts) can be reused; idempotence
comes from writing per-epoch paths or using the epoch id as a
transactional key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def parquet_epoch_sink(base_path: str):
    """foreachBatch writer: each epoch lands in ``{base}/epoch={id}/``.

    Re-delivered epochs overwrite their own directory (idempotent), never
    other epochs' data — the standard exactly-once-per-epoch recipe for
    file sinks without a transactional table format.
    """

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(base_path, f"epoch={epoch_id}"))

    return _write


def run_stream_to_parquet(stream_out: DataFrame, base_path: str, query_name: str):
    """Drive a streaming DataFrame to a per-epoch parquet sink until all
    available data is processed; returns the StreamingQuery (stopped)."""
    q = (
        stream_out.writeStream.foreachBatch(parquet_epoch_sink(base_path))
        .queryName(query_name)
        .option("checkpointLocation", os.path.join(base_path, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
