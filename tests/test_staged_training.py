"""The r14 per-iteration staged trainers must be BIT-IDENTICAL to the
one-statement unrolled chains (which remain the oracle text): the two
render the same step CTEs (_lloyd_iter_ctes / _pq_iter_ctes), so any
drift here means the shared-rendering contract broke."""

import numpy as np
import pandas as pd
import pytest

from time_sift_spark.operators import pq as P
from time_sift_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(240, dtype=np.int64),
            "embedding": [
                rng.standard_normal(64).astype("float64").tolist()
                for _ in range(240)
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    df.createOrReplaceTempView("_tst_staged_emb")
    return df


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("k,iters", [(16, 3), (8, 1)])
def test_stage_lloyd_bit_identical_to_unrolled_chain(spark, emb, k, iters):
    inline = spark.sql(
        S.lloyd_train_sql(
            S._VSPARK, "_tst_staged_emb", "vec_id", "embedding",
            num_centroids=k, iters=iters,
        )
    )
    sview = S._stage_lloyd(
        emb, "_tst_staged_emb", "vec_id", "embedding",
        num_centroids=k, iters=iters,
    )
    staged = spark.sql(f"SELECT cid, cent, nc FROM {sview}")
    assert _rows(staged) == _rows(inline)


def test_stage_pq_bit_identical_to_unrolled_chain(spark, emb):
    inline = spark.sql(
        P.pq_train_sql(
            P._VSPARK, "_tst_staged_emb", "vec_id", "embedding",
            m=16, sub_dim=4, k_codes=8, lloyd_iters=2,
        )
    )
    pview = P._stage_pq(
        emb, "_tst_staged_emb", "vec_id", "embedding",
        m=16, sub_dim=4, k_codes=8, lloyd_iters=2,
    )
    staged = spark.sql(f"SELECT s, cid, cent FROM {pview}")
    assert _rows(staged) == _rows(inline)
