"""EWMA operator vs pandas reference."""

import numpy as np
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.ewma import ewma


def test_ewma_matches_pandas(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame(
        {
            "k": np.repeat([1, 2], 50),
            "t": np.tile(np.arange(50, dtype="int64"), 2),
            "v": rng.randn(100),
        }
    )
    out = ewma(spark.createDataFrame(pdf), "v", "t", 0.3, partition_by="k").orderBy("k", "t").toPandas()
    for k in (1, 2):
        expected = pdf[pdf.k == k].sort_values("t").v.ewm(alpha=0.3, adjust=False).mean()
        np.testing.assert_allclose(out[out.k == k].v_ewma.to_numpy(), expected.to_numpy(), rtol=1e-12)


def test_ewma_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [0], "v": [1.0]}))
    with pytest.raises(ValueError):
        ewma(df, "v", "t", 0.0, partition_by="k")
    with pytest.raises(ColumnNotFoundError):
        ewma(df, "nope", "t", 0.5, partition_by="k")


def test_ewma_scan_equals_groupwise(spark):
    """The partition-scan strategy (mapInPandas + cross-batch carry) must
    be bit-identical to per-key applyInPandas, including when a tiny
    Arrow batch size forces keys to split across batches (the carry
    path)."""
    from time_sift_spark.operators.ewma import ewma_scan

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "k": np.repeat(np.arange(20), 30),
            "t": np.tile(np.arange(30), 20),
            "v": rng.randn(600),
        }
    )
    df = spark.createDataFrame(pdf)
    a = (
        ewma(df, "v", "t", 0.3, partition_by="k")
        .orderBy("k", "t")
        .toPandas()
        .reset_index(drop=True)
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")  # force splits
    try:
        b = (
            ewma_scan(df, "v", "t", 0.3, partition_by="k")
            .orderBy("k", "t")
            .toPandas()
            .reset_index(drop=True)
        )
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    pd.testing.assert_frame_equal(a, b)
