"""SparkSession factory tuned for this engine.

Defaults follow the public Spark tuning guidance: AQE on, Arrow on,
shuffle partitions sized to cores (not the 200 default), UTC session
timezone so results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "time_sift_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # testdata events.parquet stores TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long ns and convert in sources.catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # TIMESTAMP(MICROS) testdata must read as TIMESTAMP, not NTZ
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        # long benching sessions (100+ queries x 3 executions) bloat the
        # driver heap with retained SQL-listener plan snapshots; keep few
        .config("spark.sql.ui.retainedExecutions", "25")
        # Aged-session hygiene (guide §1/§5): hundreds of queries in one
        # JVM accumulate (a) ContextCleaner-tracked localCheckpoint RDD
        # blocks + broadcasts that are only freed after a JVM GC notices
        # their Python references died (default periodic GC is 30min —
        # longer than a whole bench run; r13 measured 2-7x inflation on
        # late-run small queries), and (b) thousands of generated
        # wholestage-codegen classes that crowd the JIT code cache
        # (default 240 MB reserve; measured 68% full 75 queries into a
        # 325-query run — flushing churn degrades hot loops). Reclaim
        # sooner and reserve headroom; both are no-ops for short sessions.
        .config("spark.cleaner.periodicGC.interval", "10min")
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=512m -XX:+ExplicitGCInvokesConcurrent",
            ),
        )
        # saveAsTable (bucketed tables) must not drop a spark-warehouse/
        # dir into the repo cwd; static conf, so set at build time
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "ts_spark_warehouse"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
