"""Unit tests for the distributed prefix sum and the linear-counting sketch."""

import numpy as np
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.operators.prefix import prefix_sum_global
from time_sift_spark.operators.sketch import linear_count_distinct


def test_prefix_sum_matches_cumsum(spark):
    rng = np.random.default_rng(3)
    n = 5000
    pdf = pd.DataFrame({"t": rng.permutation(n), "v": rng.normal(size=n).round(3)})
    out = (
        prefix_sum_global(spark.createDataFrame(pdf), "v", "t", num_buckets=16)
        .orderBy("t")
        .toPandas()
    )
    expect = pdf.sort_values("t").v.cumsum().to_numpy()
    assert np.allclose(out.running_sum.to_numpy(), expect, atol=1e-9)


def test_prefix_sum_no_single_partition_exchange(spark):
    rng = np.random.default_rng(4)
    pdf = pd.DataFrame({"t": np.arange(2000), "v": rng.normal(size=2000)})
    plan = (
        prefix_sum_global(spark.createDataFrame(pdf), "v", "t", num_buckets=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_prefix_sum_ties_and_extras(spark):
    # equal t values ordered by the extra column — exact deterministic order
    pdf = pd.DataFrame({"t": [1, 1, 1, 2, 2], "k": [3, 1, 2, 2, 1], "v": [1.0] * 5})
    out = (
        prefix_sum_global(spark.createDataFrame(pdf), "v", "t", order_extra="k", num_buckets=4)
        .orderBy("t", "k")
        .toPandas()
    )
    assert out.running_sum.tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_prefix_sum_tiny_series_fallback(spark):
    pdf = pd.DataFrame({"t": [5, 5, 5], "v": [1.0, 2.0, 3.0]})
    out = prefix_sum_global(spark.createDataFrame(pdf), "v", "t", order_extra="v").toPandas()
    assert sorted(out.running_sum.tolist()) == [1.0, 3.0, 6.0]
    with pytest.raises(ColumnNotFoundError):
        prefix_sum_global(spark.createDataFrame(pdf), "x", "t")


def test_sketch_estimate_within_error(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"g": rng.integers(0, 3, 6000), "x": rng.integers(0, 800, 6000)})
    out = linear_count_distinct(
        spark.createDataFrame(pdf), "x", group_by=("g",), k=4096
    ).toPandas()
    for _, r in out.iterrows():
        assert abs(r.n_estimate - r.n_exact) / r.n_exact < 0.1
        assert r.used_registers <= r.n_exact


def test_sketch_register_state_is_mergeable(spark):
    """Union of two halves occupies exactly the union of their register
    sets — the property that makes the sketch re-aggregatable (what a
    rollup would store at 100 TB)."""
    import pyspark.sql.functions as F

    from time_sift_spark.functions.text_fns import SPARK as D

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"x": rng.integers(0, 500, 4000), "half": rng.integers(0, 2, 4000)})
    df = spark.createDataFrame(pdf)
    k = 1024
    reg = f"((({D.md5_long('CAST(x AS STRING)')}) % {k}) + {k}) % {k}"
    whole = {r[0] for r in df.select(F.expr(reg)).distinct().collect()}
    h0 = {r[0] for r in df.where("half = 0").select(F.expr(reg)).distinct().collect()}
    h1 = {r[0] for r in df.where("half = 1").select(F.expr(reg)).distinct().collect()}
    assert h0 | h1 == whole


def test_sketch_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError):
        linear_count_distinct(df, "x", k=4)
    with pytest.raises(ColumnNotFoundError):
        linear_count_distinct(df, "y")


def test_count_min_one_sided_and_tight_for_heavy_hitters(spark):
    import pandas as pd

    from time_sift_spark.operators.sketch import count_min_token_freq

    # zipf-ish corpus: token "t0" dominates
    docs = pd.DataFrame(
        {"text": [" ".join(f"t{j % (i + 1)}" for j in range(40)) for i in range(200)]}
    )
    out = count_min_token_freq(
        spark.createDataFrame(docs), "text", width=512, depth=3, top_n=10
    ).toPandas()
    assert len(out) == 10
    assert (out.n_cm >= out.n_exact).all()  # one-sided error, always
    top = out.sort_values("n_exact", ascending=False).iloc[0]
    assert top.n_cm <= top.n_exact * 1.05  # heavy hitter estimated tightly


# --------------------------------------------------------------------------
# Global shuffle rank
# --------------------------------------------------------------------------


def test_shuffle_rank_matches_naive_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from time_sift_spark.operators.prefix import shuffle_rank_global

    df = spark.range(1, 501).withColumnRenamed("id", "doc_id").repartition(7)
    got = shuffle_rank_global(df, "doc_id", num_buckets=16).toPandas()
    naive = (
        df.withColumn(
            "shuffle_rank",
            F.row_number().over(
                Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
            ),
        ).toPandas()
    )
    merged = got.merge(naive, on="doc_id", suffixes=("", "_naive"))
    assert (merged.shuffle_rank == merged.shuffle_rank_naive).all()


def test_shuffle_rank_is_permutation_and_partition_invariant(spark):
    from time_sift_spark.operators.prefix import shuffle_rank_global

    df1 = spark.range(1, 301).withColumnRenamed("id", "doc_id").repartition(3)
    df2 = spark.range(1, 301).withColumnRenamed("id", "doc_id").repartition(11)
    r1 = shuffle_rank_global(df1, "doc_id").toPandas().sort_values("doc_id")
    r2 = shuffle_rank_global(df2, "doc_id").toPandas().sort_values("doc_id")
    assert sorted(r1.shuffle_rank) == list(range(1, 301))  # bijection onto 1..n
    assert (r1.shuffle_rank.values == r2.shuffle_rank.values).all()


def test_shuffle_rank_validation(spark):
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.prefix import shuffle_rank_global

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ColumnNotFoundError):
        shuffle_rank_global(df, "nope")
    with pytest.raises(ValueError):
        shuffle_rank_global(df, "doc_id", num_buckets=37)


def test_shuffle_rank_no_single_partition_exchange(spark):
    from time_sift_spark.operators.prefix import shuffle_rank_global

    df = spark.range(1, 101).withColumnRenamed("id", "doc_id").repartition(4)
    plan = (
        shuffle_rank_global(df, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange SinglePartition" not in plan, plan


def test_sketch_rollup_equals_direct_weekly_sketch(spark):
    import pandas as pd

    from time_sift_spark.operators.sketch import (
        linear_count_distinct,
        linear_count_rollup,
    )

    # two ISO weeks of per-day user activity, users recur across days
    rows = []
    for day in range(1, 13):
        for u in range(day * 7 % 40, 40 + (day % 3) * 20):
            rows.append((f"2024-01-{day:02d} 10:00:00", u))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["ts", "user_id"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    rolled = linear_count_rollup(df, "user_id", "ts", k=256).toPandas()
    # direct weekly sketch over raw values
    direct = linear_count_distinct(
        df.selectExpr("date_trunc('week', ts) AS week", "user_id"),
        "user_id",
        group_by=("week",),
        k=256,
        with_exact=False,
    ).toPandas()
    m = rolled.merge(direct, on="week", suffixes=("_rolled", "_direct"))
    assert len(m) >= 2
    assert (m.used_registers_rolled == m.used_registers_direct).all()
    assert (m.n_estimate_rolled == m.n_estimate_direct).all()


def test_histogram_quantiles_within_bin_width_of_exact(spark):
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.sketch import histogram_quantiles

    rng = np.random.RandomState(3)
    vals = np.concatenate([rng.exponential(50, 4000), rng.uniform(0, 400, 2000)])
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = histogram_quantiles(df, "v", lo=0.0, hi=1000.0, bins=500).collect()[0]
    width = 2.0
    for p, name in [(0.5, "est_p5"), (0.95, "est_p95"), (0.99, "est_p99")]:
        exact = float(np.quantile(vals, p))
        assert abs(getattr(out, name) - exact) <= 2 * width, (p, getattr(out, name), exact)
    assert out.n == len(vals)


def test_histogram_quantiles_merge_property(spark):
    """Sketch built on the union == union of per-half sketches: since the
    state is per-bin counts, verify the ESTIMATE from the full data equals
    the estimate from summing the halves' histograms (here: run on a
    repartitioned frame — partial aggregation IS the merge)."""
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.sketch import histogram_quantiles

    rng = np.random.RandomState(9)
    pdf = pd.DataFrame({"v": rng.uniform(0, 900, 5000)})
    one = histogram_quantiles(
        spark.createDataFrame(pdf).coalesce(1), "v", lo=0.0, hi=1000.0, bins=500
    ).collect()[0]
    many = histogram_quantiles(
        spark.createDataFrame(pdf).repartition(16), "v", lo=0.0, hi=1000.0, bins=500
    ).collect()[0]
    assert (one.est_p5, one.est_p95, one.est_p99) == (many.est_p5, many.est_p95, many.est_p99)


def test_histogram_quantiles_clamps_and_validates(spark):
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.sketch import histogram_quantiles

    df = spark.createDataFrame([(-5.0,), (1e9,), (10.0,)], "v double")
    out = histogram_quantiles(df, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert out.n == 3  # out-of-range values clamp into edge bins, not dropped
    with pytest.raises(ValueError):
        histogram_quantiles(df, "v", lo=5.0, hi=5.0)
    with pytest.raises(ColumnNotFoundError):
        histogram_quantiles(df, "nope", lo=0.0, hi=1.0)


def test_histogram_quantiles_auto_matches_fixed_at_true_bounds(spark):
    """Adaptive bounds == fixed bounds when the caller happens to pass
    the data's exact [min, max + width) — the auto form discovers what
    the informed caller would have declared, then runs the SAME sketch.
    Checked by accuracy instead of equality (bin widths differ slightly
    because auto's hi is the max, not a rounded-up bound): both must be
    within 2 bin widths of numpy's exact quantile."""
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.sketch import histogram_quantiles_auto

    rng = np.random.RandomState(5)
    vals = rng.uniform(10.0, 750.0, 6000)
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    out = histogram_quantiles_auto(df, "v", bins=500).collect()[0]
    assert out.lo == vals.min() and out.hi == vals.max()
    width = (out.hi - out.lo) / 500
    for p, name in [(0.5, "est_p5"), (0.95, "est_p95"), (0.99, "est_p99")]:
        exact = float(np.quantile(vals, p))
        assert abs(getattr(out, name) - exact) <= 2 * width, (p, name)
    assert out.n == len(vals)


def test_histogram_quantiles_auto_merge_property(spark):
    """The merge property survives adaptive bounds BECAUSE they are
    global: the bounds pass sees all partitions, so every partition's
    histogram uses identical bin edges and partial aggregation is still
    the merge."""
    import numpy as np
    import pandas as pd

    from time_sift_spark.operators.sketch import histogram_quantiles_auto

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({"v": rng.exponential(100.0, 5000)})
    one = histogram_quantiles_auto(
        spark.createDataFrame(pdf).coalesce(1), "v", bins=500
    ).collect()[0]
    many = histogram_quantiles_auto(
        spark.createDataFrame(pdf).repartition(16), "v", bins=500
    ).collect()[0]
    assert (one.lo, one.hi) == (many.lo, many.hi)
    assert (one.est_p5, one.est_p95, one.est_p99) == (many.est_p5, many.est_p95, many.est_p99)


def test_histogram_quantiles_auto_degenerate_and_validation(spark):
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.sketch import histogram_quantiles_auto

    # all-equal input: width 0, everything in bin 0, estimates == the value
    df = spark.createDataFrame([(42.0,), (42.0,), (42.0,)], "v double")
    out = histogram_quantiles_auto(df, "v", bins=10).collect()[0]
    assert (out.lo, out.hi) == (42.0, 42.0)
    assert out.est_p5 == 42.0 and out.est_p99 == 42.0
    with pytest.raises(ValueError):
        histogram_quantiles_auto(df, "v", bins=1)
    with pytest.raises(ColumnNotFoundError):
        histogram_quantiles_auto(df, "nope")


def test_bloom_screen_cross_engine_and_truth(spark):
    """Planted exact copies are always possibly_seen (no false
    negatives — a Bloom invariant), novel docs are overwhelmingly
    definitely-new, and the engines agree bit-for-bit including any
    false positives."""
    import duckdb
    import pandas as pd

    from time_sift_spark.functions.text_fns import DUCK, SPARK
    from time_sift_spark.operators.sketch import bloom_screen_sql

    corpus = "(SELECT doc_id, text FROM docs WHERE doc_id < 60)"
    newb = (
        "(SELECT doc_id, text FROM docs WHERE doc_id >= 60"
        " UNION ALL SELECT doc_id + 1000, text FROM docs WHERE doc_id < 10)"
    )
    pdf = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": [f"document body number {i} with unique words w{i}" for i in range(100)],
        }
    )
    pdf.loc[5, "text"] = None  # NULL text: probes nothing, reports false
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("docs")
    got = (
        spark.sql(bloom_screen_sql(SPARK, corpus, newb, "doc_id", "text"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    exp = (
        con.execute(bloom_screen_sql(DUCK, corpus, newb, "doc_id", "text"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    planted = got[got.doc_id >= 1000]
    assert planted[planted.doc_id != 1005].possibly_seen.all()
    assert planted[planted.doc_id != 1005].is_dup.all()
    null_row = got[got.doc_id == 1005].iloc[0]
    assert not null_row.possibly_seen and not null_row.is_dup
    novel = got[(got.doc_id >= 60) & (got.doc_id < 1000)]
    assert not novel.is_dup.any()
    # m=65536, 60 docs: FP probability ~1e-11 — all novel definitely-new
    assert not novel.possibly_seen.any()


def test_bloom_persisted_equals_inline(spark, tmp_path):
    import pandas as pd

    from time_sift_spark.functions.text_fns import SPARK as _S
    from time_sift_spark.operators.sketch import (
        bloom_screen_persisted,
        bloom_screen_sql,
        build_bloom_filter,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(80), "text": [f"text body {i} tok{i % 7}" for i in range(80)]}
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("docs_bp")
    corpus = sdf.where("doc_id < 50")
    newb = sdf.where("doc_id >= 50")
    path = str(tmp_path / "bloom")
    build_bloom_filter(corpus.select("doc_id", "text"), "text", path)
    served = (
        bloom_screen_persisted(spark, path, newb, "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    inline = (
        spark.sql(
            bloom_screen_sql(
                _S,
                "(SELECT doc_id, text FROM docs_bp WHERE doc_id < 50)",
                "(SELECT doc_id, text FROM docs_bp WHERE doc_id >= 50)",
                "doc_id",
                "text",
                with_truth=False,
            )
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(served, inline, check_dtype=False)


def test_hll_accuracy_and_cross_engine_large(spark):
    """50k distinct values: the raw-branch estimate stays within ~3σ of
    the HLL standard error (1.04/√1024 ≈ 3.25%) and both engines emit
    the identical estimate (shared literals, ladder, one IEEE division).
    """
    import duckdb
    import pandas as pd

    from time_sift_spark.functions.text_fns import DUCK, SPARK
    from time_sift_spark.operators.sketch import hll_distinct_sql

    pdf = pd.DataFrame({"v": range(50_000)})
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_hll_big")
    got = spark.sql(
        hll_distinct_sql(SPARK, "_hll_big", "v", with_exact=False)
    ).toPandas()
    con = duckdb.connect()
    con.register("_hll_big", pdf)
    exp = con.execute(
        hll_distinct_sql(DUCK, "_hll_big", "v", with_exact=False)
    ).df()
    assert got.n_estimate[0] == exp.n_estimate[0]
    assert abs(got.n_estimate[0] - 50_000) / 50_000 < 0.10


def test_hll_merge_equals_direct():
    """Weekly estimates from merged daily register states equal a direct
    weekly sketch on the same rows — MAX is associative+idempotent."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.01/events.parquet'"
    )
    from time_sift_spark.functions.text_fns import DUCK
    from time_sift_spark.operators.sketch import hll_distinct_sql, hll_rollup_sql

    rolled = con.execute(hll_rollup_sql(DUCK, "events", "user_id", "ts")).df()
    direct = con.execute(
        "WITH weekly AS (SELECT date_trunc('week', ts) AS week, user_id FROM events) "
        + hll_distinct_sql(
            DUCK, "weekly", "user_id", group_by=("week",), with_exact=False
        ).replace("WITH ", ", ", 1)
    ).df()
    r = rolled.sort_values("week").reset_index(drop=True)
    d = direct.sort_values("week").reset_index(drop=True)
    assert (r.n_estimate.values == d.n_estimate.values).all()
    assert (r.used_registers.values == d.used_registers.values).all()


def test_hll_small_range_uses_linear_counting():
    """Tiny cardinalities hit the linear-counting branch and stay exact
    to within a register collision or two."""
    import duckdb
    import pandas as pd

    from time_sift_spark.functions.text_fns import DUCK
    from time_sift_spark.operators.sketch import hll_distinct_sql

    con = duckdb.connect()
    con.register("_t", pd.DataFrame({"v": list(range(20)) * 3}))
    out = con.execute(hll_distinct_sql(DUCK, "_t", "v")).df()
    assert out.n_exact[0] == 20
    assert abs(out.n_estimate[0] - 20) < 1.5


def test_hll_bad_args(spark):
    import pandas as pd
    import pytest as _pt

    from time_sift_spark.errors import ColumnNotFoundError
    from time_sift_spark.operators.sketch import hll_distinct

    sdf = spark.createDataFrame(pd.DataFrame({"v": [1]}))
    with _pt.raises(ColumnNotFoundError):
        hll_distinct(sdf, "nope")
    with _pt.raises(ValueError):
        hll_distinct(sdf, "v", m=1000)  # not a power of two


def test_bloom_append_idempotent_ingestion(spark, tmp_path):
    """After append_bloom_filter folds an increment in, re-screening the
    same increment reports every appended doc possibly_seen — idempotent
    ingestion; and duplicate appended positions don't change verdicts
    (presence semantics)."""
    import pandas as pd

    from time_sift_spark.operators.sketch import (
        append_bloom_filter,
        bloom_screen_persisted,
        build_bloom_filter,
    )

    pdf = pd.DataFrame(
        {"doc_id": range(40), "text": [f"bloom body {i} q{i % 5}" for i in range(40)]}
    )
    sdf = spark.createDataFrame(pdf)
    path = str(tmp_path / "bloom_app")
    build_bloom_filter(sdf.where("doc_id < 25").select("doc_id", "text"), "text", path)
    newb = sdf.where("doc_id >= 25")
    first = bloom_screen_persisted(spark, path, newb, "doc_id").toPandas()
    assert not first.possibly_seen.any()
    append_bloom_filter(spark, path, newb)
    append_bloom_filter(spark, path, newb)  # double append — still presence
    again = bloom_screen_persisted(spark, path, newb, "doc_id").toPandas()
    assert again.possibly_seen.all()


def test_kmv_merge_identity_and_estimate(spark):
    """k-smallest of the union of two halves' sketches == the whole
    population's sketch (the exact KMV merge identity), and the
    capacity-regime estimate lands within the ~1/sqrt(k) error band."""
    import pandas as pd

    from time_sift_spark.operators.sketch import kmv_distinct

    n = 5000
    pdf = pd.DataFrame({
        "g": ["h1"] * n + ["h2"] * n,
        "v": list(range(n)) + list(range(2500, 7500)),
    })
    df = spark.createDataFrame(pdf)
    k = 128
    # per-half sketches (the stored state): recompute hashes and take
    # k-smallest of the union in pandas, compare against the direct
    # whole-population sketch
    from time_sift_spark.functions.text_fns import SPARK as D

    h = df.selectExpr("g", D.md5_long("CAST(v AS STRING)") + " AS h").toPandas()
    sk1 = sorted(set(h[h.g == "h1"].h))[:k]
    sk2 = sorted(set(h[h.g == "h2"].h))[:k]
    merged = sorted(set(sk1) | set(sk2))[:k]
    whole = sorted(set(h.h))[:k]
    assert merged == whole
    # estimate accuracy on the whole population (7500 distinct)
    one = df.selectExpr("'all' AS g", "v")
    est = kmv_distinct(one, "v", "g", k=k).toPandas()
    assert abs(est.n_estimate[0] - 7500) / 7500 < 3.0 / (k ** 0.5)
    assert est.n_exact[0] == 7500


def test_kmv_overlap_estimates_jaccard(spark):
    """Planted overlap: |A|=4000, |B|=4000, |A∩B|=2000 -> J=1/3; the
    sketch Jaccard and intersection estimates must land within the
    sampling error band, and exact audit columns must be exact."""
    import pandas as pd

    from time_sift_spark.functions.text_fns import SPARK as D
    from time_sift_spark.operators.sketch import kmv_overlap_sql

    pdf = pd.DataFrame({
        "g": ["a"] * 4000 + ["b"] * 4000,
        "v": list(range(4000)) + list(range(2000, 6000)),
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("_kmv_t")
    out = spark.sql(
        kmv_overlap_sql(D, "_kmv_t", "v", "g", "a", "b", k=256)
    ).toPandas()
    r = out.iloc[0]
    assert r.n_exact_a == 4000 and r.n_exact_b == 4000
    assert abs(r.jaccard_exact - 1 / 3) < 1e-3
    assert abs(r.jaccard_kmv - 1 / 3) < 0.1
    assert abs(r.est_intersection - 2000) / 2000 < 0.25
    assert abs(r.est_union - 6000) / 6000 < 0.2


def test_kmv_validation(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.errors import ColumnNotFoundError as CNF
    from time_sift_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame(pd.DataFrame({"x": [1], "g": ["a"]}))
    with pytest.raises(CNF):
        kmv_distinct(df, "nope", "g")
    with pytest.raises(ValueError):
        kmv_distinct(df, "x", "g", k=4)


def test_heavy_hitters_equals_naive_filter(spark):
    """Count-min one-sidedness: the CM-screened + exact-verified output
    must EQUAL the naive GROUP BY/HAVING exactly — even at a tiny width
    where collisions make the candidate set much larger."""
    import pandas as pd

    from time_sift_spark.operators.sketch import heavy_hitters

    texts = (
        ["alpha beta alpha"] * 30          # alpha 60, beta 30
        + ["gamma delta"] * 10             # gamma/delta 10
        + [f"unique{i} filler{i}" for i in range(50)]
    )
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    for width in (8, 1024):  # width 8 forces collisions
        out = (
            heavy_hitters(df, "text", threshold=20, width=width)
            .toPandas().set_index("token").n_exact.sort_index()
        )
        assert out.to_dict() == {"alpha": 60, "beta": 30}

    import pytest

    with pytest.raises(ValueError):
        heavy_hitters(df, "text", threshold=0)
