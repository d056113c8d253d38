"""Source/sink round-trips for every supported format."""

import pandas as pd
import pytest

from time_sift_spark.sources import catalog


@pytest.fixture(scope="module")
def sample(spark):
    return spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "name": ["a", "b", None], "x": [1.5, 2.5, 3.5]})
    )


SCHEMA = "id long, name string, x double"


def _assert_round_trip(df, back):
    left = df.orderBy("id").toPandas()
    right = back.orderBy("id").toPandas()[left.columns.tolist()]
    pd.testing.assert_frame_equal(left, right)


def test_parquet_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "t.parquet")
    catalog.write_parquet(sample, p)
    _assert_round_trip(sample, spark.read.parquet(p))


def test_csv_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "t.csv")
    catalog.write_csv(sample, p)
    _assert_round_trip(sample, catalog.read_csv(spark, p, SCHEMA))


def test_json_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "t.json")
    catalog.write_json(sample, p)
    _assert_round_trip(sample, catalog.read_json(spark, p, SCHEMA))


def test_orc_round_trip(spark, sample, tmp_path):
    p = str(tmp_path / "t.orc")
    catalog.write_orc(sample, p)
    _assert_round_trip(sample, catalog.read_orc(spark, p))


def test_partitioned_parquet_write(spark, sample, tmp_path):
    p = str(tmp_path / "part.parquet")
    catalog.write_parquet(sample.withColumn("part", sample.id % 2), p, partition_by="part")
    back = spark.read.parquet(p)
    assert back.count() == 3
    # partition pruning: filter on the partition column prunes files
    plan = back.where("part = 0")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "part" in plan.split("PartitionFilters:")[1][:80]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on their join keys must merge-join with NO
    Exchange on either input — the write-time shuffle replaces the
    query-time one."""
    import pandas as pd

    from time_sift_spark.sources.catalog import ensure_bucketed_table

    a = spark.createDataFrame(pd.DataFrame({"k": range(100), "x": range(100)}))
    b = spark.createDataFrame(pd.DataFrame({"k": range(0, 100, 2), "y": range(50)}))
    ta = ensure_bucketed_table(spark, "tb_a", a, "k", num_buckets=4, cache_key=str(tmp_path))
    tb = ensure_bucketed_table(spark, "tb_b", b, "k", num_buckets=4, cache_key=str(tmp_path))
    j = spark.table(ta).hint("merge").join(spark.table(tb), "k")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: no shuffle anywhere in the join
    assert j.count() == 50


def test_lakehouse_negotiation_falls_back_and_roundtrips(spark, tmp_path):
    """write/read_lakehouse_table agree on the negotiated format: without
    a Delta-enabled session the pair degrades to parquet (tag visible),
    with identical rows either way. The delta branch itself runs
    wherever delta-spark + the session extension exist."""
    import pandas as pd

    from time_sift_spark.sources.catalog import (
        delta_usable,
        read_lakehouse_table,
        write_lakehouse_table,
    )

    df = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]}))
    path = str(tmp_path / "lake_tbl")
    fmt = write_lakehouse_table(df, path)
    expected_fmt = "delta" if delta_usable(spark) else "parquet"
    assert fmt == expected_fmt
    back = read_lakehouse_table(spark, path)
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b"), (3, "c")]


def test_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    """A filter on the hive partition column becomes PartitionFilters on
    the scan (pruned at the FileIndex, before any file is opened) and
    never appears as a post-scan data filter on partition values."""
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "d": [f"2024-01-{day:02d}" for day in range(1, 11) for _ in range(5)],
            "v": range(50),
        }
    )
    path = str(tmp_path / "part_tbl")
    df = spark.createDataFrame(pdf).withColumn("d", F.col("d").cast("date"))
    df.write.partitionBy("d").parquet(path)
    filtered = spark.read.parquet(path).where(F.col("d") == "2024-01-03")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "d#" in plan
    # run THIS plan and read the scan's own metrics: exactly 1 of the 10
    # partition dirs survives the FileIndex (inputFiles() is pre-pruning
    # and would list all 10)
    assert len(filtered.collect()) == 5
    scan = filtered._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    assert scan.metrics().apply("numPartitions").value() == 1
