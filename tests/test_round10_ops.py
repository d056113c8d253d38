"""Round-10 second-wave operator tests: BFS hop distances, Holt-Winters
edge contracts, Gini feature selection on hand-checkable corpora,
lift/gains on a constructed score, and the key-skew bucket identity.
Value-level cross-engine parity for all five registered queries is
covered by tests/test_oracle_parity.py; these pin the semantics the
oracle can't see (error surfaces, dropout gates, closed-form cases)."""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.functions.text_fns import DUCK
from time_sift_spark.operators.graph import bfs_hops, bfs_hops_sql


def _mk(spark, pdf):
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------- BFS

def test_bfs_line_graph_hops(spark):
    # 0→1→2→3→4: hops from seed {0} are the node ids themselves.
    edges = _mk(spark, pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]}))
    seeds = _mk(spark, pd.DataFrame({"n": [0]}))
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, "src", "dst", seeds).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_max_hops_caps_and_multi_source_min(spark):
    # Two seeds; node 3 is 1 hop from seed 2 even though 3 hops from 0;
    # node 5 is beyond max_hops=2 from every seed and must be absent.
    edges = _mk(spark, pd.DataFrame(
        {"src": [0, 1, 2, 3, 4], "dst": [1, 2, 3, 4, 5]}
    ))
    seeds = _mk(spark, pd.DataFrame({"n": [0, 2]}))
    out = {r["node"]: r["hops"]
           for r in bfs_hops(edges, "src", "dst", seeds, max_hops=2).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1, 4: 2}


def test_bfs_directed_and_cycle_terminates(spark):
    # Directed: no backward reach; a cycle must not loop forever.
    edges = _mk(spark, pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]}))
    seeds = _mk(spark, pd.DataFrame({"n": [2]}))
    out = {r["node"]: r["hops"]
           for r in bfs_hops(edges, "src", "dst", seeds, max_hops=10).collect()}
    assert out == {2: 0, 3: 1, 1: 2}


def test_bfs_sql_unrolled_matches_iterative(spark):
    # The oracle form on the same ad-hoc graph (DuckDB) equals the
    # iterative frontier — the kcore/pagerank iterative==unrolled proof
    # on a graph with a reconvergent diamond (two paths to node 3).
    pdf = pd.DataFrame({"src": [0, 0, 1, 2, 3], "dst": [1, 2, 3, 3, 4]})
    con = duckdb.connect()
    con.register("_edges", pdf)
    con.execute("CREATE TABLE nodes AS SELECT UNNEST([0,1,2,3,4]) AS nid")
    sql = bfs_hops_sql(
        DUCK, "e AS (SELECT src, dst FROM _edges)",
        "nodes", "nid", "nid = 0", max_hops=4,
    )
    duck = {int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()}
    edges = _mk(spark, pdf)
    seeds = _mk(spark, pd.DataFrame({"n": [0]}))
    it = {r["node"]: r["hops"] for r in bfs_hops(edges, "src", "dst", seeds).collect()}
    assert duck == it == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_bad_column_raises(spark):
    edges = _mk(spark, pd.DataFrame({"src": [0], "dst": [1]}))
    seeds = _mk(spark, pd.DataFrame({"n": [0]}))
    with pytest.raises(ColumnNotFoundError):
        bfs_hops(edges, "nope", "dst", seeds)


# ------------------------------------------------------- Holt-Winters

def _hw_frame(spark, days, keys=("a",)):
    import datetime
    rows = []
    for k in keys:
        for i in range(days):
            rows.append((k, datetime.datetime(2024, 1, 1 + i % 28, 12)
                         + datetime.timedelta(days=28 * (i // 28)), float(i + 1)))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))


def test_hw_short_series_drops_out(spark):
    # 13 days < 2*period(7): the HAVING gate drops the series (loudly
    # empty, never a half-initialized recurrence).
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 13)
    assert holt_winters(df, "v", "ts", "k", period=7).count() == 0


def test_hw_emits_n_minus_period_rows_and_linear_trend_fits(spark):
    # 21 gap-free days: 21-7=14 fitted rows; on a perfectly linear
    # series the one-step forecast converges toward the truth (errors
    # shrink; the last error is small relative to the first).
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 21)
    out = holt_winters(df, "v", "ts", "k", period=7).orderBy("day_x").collect()
    assert len(out) == 14
    # closed form at t=8: l0=mean(1..7)=4, b0=(mean(8..14)-4)/7=1,
    # s_1=y_1-l0=-3 → fit=(4+1)+(-3)=2, err=8-2=6 (the documented init
    # absorbs the in-season trend into s0; the recurrence then unwinds it)
    assert out[0]["hw_fit"] == pytest.approx(2.0, abs=1e-9)
    assert out[0]["hw_err"] == pytest.approx(6.0, abs=1e-9)
    assert abs(out[-1]["hw_err"]) < abs(out[0]["hw_err"])


def test_hw_rejects_bad_column(spark):
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 21)
    with pytest.raises(ColumnNotFoundError):
        holt_winters(df, "nope", "ts", "k")


def test_hw_mul_closed_form_and_diverges_from_add(spark):
    # Multiplicative first step at t=8 on the linear series: l0=4,
    # b0=1, s_1=y_1/l0=0.25 → fit=(4+1)*0.25=1.25, err=8-1.25=6.75.
    # Also pins that the mode actually switches the recurrence (a mode
    # bug that ignores `seasonal` would reproduce the additive fits).
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 21)
    mul = holt_winters(df, "v", "ts", "k", period=7,
                       seasonal="mul").orderBy("day_x").collect()
    add = holt_winters(df, "v", "ts", "k", period=7).orderBy("day_x").collect()
    assert len(mul) == 14
    assert mul[0]["hw_fit"] == pytest.approx(1.25, abs=1e-9)
    assert mul[0]["hw_err"] == pytest.approx(6.75, abs=1e-9)
    assert any(a["hw_fit"] != m["hw_fit"] for a, m in zip(add, mul))


def test_hw_mul_positivity_guard_drops_nonpositive_series(spark):
    # The zero-value guard the additive form doesn't need: a series
    # with ANY non-positive day bucket is excluded wholesale (division
    # recurrence undefined), while positive series still fit; the
    # additive form keeps both.
    import datetime

    from time_sift_spark.operators.seasonal import holt_winters

    rows = []
    for k, dip in (("pos", False), ("zer", True)):
        for i in range(21):
            v = 0.0 if (dip and i == 10) else float(i + 1)
            rows.append((k, datetime.datetime(2024, 1, 1 + i, 12), v))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    mul = holt_winters(df, "v", "ts", "k", period=7, seasonal="mul").toPandas()
    add = holt_winters(df, "v", "ts", "k", period=7).toPandas()
    assert set(mul.k) == {"pos"}
    assert set(add.k) == {"pos", "zer"}


def test_hw_bad_seasonal_mode_raises(spark):
    from time_sift_spark.operators.seasonal import holt_winters

    with pytest.raises(ValueError):
        holt_winters(_hw_frame(spark, 21), "v", "ts", "k", seasonal="damped")


# ------------------------------------------------------------- Gini

def test_gini_perfect_separator_scores_base_gini(spark):
    # 4 docs, 2 classes; token 'xx' appears exactly in class-a docs →
    # both split arms are pure: gain == base Gini == 1 - 2*(1/2)^2 = 0.5.
    from time_sift_spark.operators.text import gini_feature_select

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["xx yy", "xx yy", "zz yy", "zz yy"],
        "lang": ["a", "a", "b", "b"],
    }))
    out = {r["token"]: r["gini_gain"]
           for r in gini_feature_select(docs, "text", "doc_id", "lang",
                                        min_df=1).collect()}
    assert out["xx"] == pytest.approx(0.5, abs=1e-9)
    assert out["zz"] == pytest.approx(0.5, abs=1e-9)
    # 'yy' is in every doc: the without-arm is empty → gain 0 by the
    # CASE guard (carries no signal, not an error)
    assert out["yy"] == 0.0


def test_gini_multiclass_beats_binary_blind_spot(spark):
    # Token splitting class c from {a,b} has positive gain even though
    # neither arm is pure — the multi-class case chi-square-vs-one-label
    # setups miss.
    from time_sift_spark.operators.text import gini_feature_select

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["mm", "mm", "mm", "mm qq", "qq", "qq"],
        "lang": ["a", "a", "b", "b", "c", "c"],
    }))
    out = {r["token"]: r["gini_gain"]
           for r in gini_feature_select(docs, "text", "doc_id", "lang",
                                        min_df=1).collect()}
    assert out["qq"] > 0.2
    assert out["mm"] > 0.2


# -------------------------------------------------------- Lift/gains

def test_lift_gains_perfect_ranker(spark):
    # 100 rows, 20 positives all with the top scores: deciles 1-2 carry
    # every positive → cum_gain hits 1.0 at tile 2, tile_lift = 5.0 for
    # the pure-positive deciles, and cum_n sums to 100.
    from time_sift_spark.operators.experiment import lift_gains

    pdf = pd.DataFrame({
        "doc_id": range(100),
        "score": [1.0 - i / 100.0 for i in range(100)],
        "y": [1] * 20 + [0] * 80,
    })
    out = lift_gains(_mk(spark, pdf), "score", "y", "doc_id").orderBy("tile").collect()
    assert [r["n"] for r in out] == [10] * 10
    assert out[0]["tile_lift"] == pytest.approx(5.0)
    assert out[1]["cum_gain"] == pytest.approx(1.0)
    assert out[-1]["cum_n"] == 100
    assert out[-1]["cum_lift"] == pytest.approx(1.0)


def test_lift_gains_zero_positives_null_not_crash(spark):
    from time_sift_spark.operators.experiment import lift_gains

    pdf = pd.DataFrame({"doc_id": range(20),
                        "score": [float(i) for i in range(20)],
                        "y": [0] * 20})
    out = lift_gains(_mk(spark, pdf), "score", "y", "doc_id").collect()
    assert all(r["tile_lift"] is None and r["cum_gain"] is None for r in out)


# -------------------------------------------------------- Key skew

def test_key_skew_bucket_identity(spark):
    # Per-key counts 1,2,3,8 → buckets floor(log2) = 0,1,1,3; shares
    # sum to 1 and min/max are exact.
    from time_sift_spark.operators.quality import key_skew_profile

    rows = (["a"] * 1 + ["b"] * 2 + ["c"] * 3 + ["d"] * 8)
    df = _mk(spark, pd.DataFrame({"k": rows}))
    out = {r["bucket"]: r for r in key_skew_profile(df, "k").collect()}
    assert set(out) == {0, 1, 3}
    assert out[0]["n_keys"] == 1 and out[0]["n_rows"] == 1
    assert out[1]["n_keys"] == 2 and out[1]["n_rows"] == 5
    assert out[1]["min_cnt"] == 2 and out[1]["max_cnt"] == 3
    assert out[3]["n_keys"] == 1 and out[3]["n_rows"] == 8
    assert sum(r["rows_share"] for r in out.values()) == pytest.approx(1.0)


# ----------------------------------------------- Prefix Jaccard join

def test_prefix_jaccard_equals_brute_and_threshold_edge(spark):
    # Planted corpus: docs 1/2 share most shingles (J >= 1/2), doc 3 is
    # disjoint; the prefix-filtered Spark form must equal DuckDB brute
    # force exactly, including a pair sitting exactly AT the threshold.
    from time_sift_spark.operators.dedup import (
        prefix_jaccard_join,
        prefix_jaccard_join_sql,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon eta",
            "one two three four five six",
            "alpha beta gamma delta epsilon zeta",  # exact twin of 1
        ],
    })
    out = prefix_jaccard_join(
        _mk(spark, pdf), "doc_id", "text", threshold=(1, 2)
    ).collect()
    got = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"] for r in out}
    con = duckdb.connect()
    con.register("documents", pdf)
    brute = con.execute(prefix_jaccard_join_sql(
        DUCK, "documents", "doc_id", "text", threshold=(1, 2), brute=True,
    )).fetchall()
    assert got == {(a, b): j for a, b, j in brute}
    assert got[(1, 4)] == 1.0  # the exact twin survives at J=1
    assert (1, 2) in got and (2, 4) in got
    assert not any(3 in p for p in got)


def test_prefix_jaccard_bad_column_raises(spark):
    from time_sift_spark.operators.dedup import prefix_jaccard_join

    with pytest.raises(ColumnNotFoundError):
        prefix_jaccard_join(
            _mk(spark, pd.DataFrame({"doc_id": [1], "text": ["x"]})),
            "nope", "text",
        )


# --------------------------------------- Streaming HW numeric replicas

def test_dec6_to_double_matches_sql_dec_to_double():
    # The Python replica must equal the SQL dec_to_double on a
    # DECIMAL(18,6) for positive, negative, and >2^26-integral values.
    from time_sift_spark.operators._num import dec_to_double
    from time_sift_spark.streaming.lag_stream import _dec6_to_double

    con = duckdb.connect()
    # The last four are 18-digit values (legal DECIMAL(18,6) micros)
    # where the pre-r11 float true-division split rounded the quotient
    # across an integer boundary (q one too high, r NEGATIVE — a q/r
    # decomposition the SQL decimal % semantics never produces); the
    # exact-integer floor split matches at ALL BIGINT magnitudes.  The
    # decimal operand is built from the digit string: a DECIMAL/DECIMAL
    # division would itself degrade to double at these widths.
    for micros in [0, 1, -1, 123456789, -987654321, 10**15 + 7,
                   -(10**15 + 7), 999999, -999999, 20152415783501905,
                   559226890874999949, -559226890874999949,
                   209288111064999991, -887603361312999997]:
        s = str(abs(micros)).rjust(7, "0")
        lit = ("-" if micros < 0 else "") + s[:-6] + "." + s[-6:]
        sql = dec_to_double(f"CAST('{lit}' AS DECIMAL(27,6))")
        want = con.execute(f"SELECT {sql}").fetchone()[0]
        assert _dec6_to_double(micros) == want, micros


def test_round_double_py_matches_sql():
    from time_sift_spark.operators._num import round_double
    from time_sift_spark.streaming.lag_stream import _round_double_py

    con = duckdb.connect()
    for v in [0.0, 1.2345675, -1.2345675, 0.0078125, -0.0078125,
              123456.9999995, 2e9, -2e9, 1e-7]:
        want = con.execute(
            f"SELECT {round_double(f'CAST({v!r} AS DOUBLE)', 6)}"
        ).fetchone()[0]
        assert _round_double_py(v) == want, v


# ------------------------------------------- Range partition planner

def test_range_partition_plan_uniform_balances(spark):
    from time_sift_spark.operators.sketch import range_partition_plan

    pdf = pd.DataFrame({"v": [float(i) for i in range(1, 801)]})
    out = range_partition_plan(_mk(spark, pdf), "v", n_buckets=8).collect()
    assert len(out) == 8
    assert sum(r["n_rows"] for r in out) == 800
    # uniform data: every realized share within 2 bin-widths of 1/8
    assert all(abs(r["rows_share"] - 0.125) < 0.02 for r in out)
    # boundaries are monotone and bucket 0 has no lower boundary
    bl = [r["boundary_lo"] for r in sorted(out, key=lambda r: r["bucket"])]
    assert bl[0] is None and all(a < b for a, b in zip(bl[1:], bl[2:]))


def test_range_partition_plan_duplicate_straddle_is_reported(spark):
    # one value carries half the rows: no range plan can split it — the
    # realized share of its bucket must show >= 0.5, not be hidden
    from time_sift_spark.operators.sketch import range_partition_plan

    pdf = pd.DataFrame({"v": [42.0] * 400 + [float(i) for i in range(400)]})
    out = range_partition_plan(_mk(spark, pdf), "v", n_buckets=8).collect()
    assert max(r["rows_share"] for r in out) >= 0.5


# ------------------------------------------------------ Time features

def test_time_features_known_dates(spark):
    import datetime

    from time_sift_spark.operators.seasonal import time_features

    df = spark.createDataFrame(pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [datetime.datetime(2024, 1, 1, 12, 0, 0),   # Monday noon
               datetime.datetime(2024, 1, 6, 0, 0, 0),    # Saturday
               datetime.datetime(1970, 1, 1, 18, 0, 0)],  # Thursday epoch
    }))
    out = {r["event_id"]: r for r in time_features(df, "ts", ("event_id",)).collect()}
    assert out[1]["iso_dow"] == 1 and not out[1]["is_weekend"]
    assert out[1]["day_frac"] == pytest.approx(0.5)
    assert out[2]["iso_dow"] == 6 and out[2]["is_weekend"]
    assert out[3]["iso_dow"] == 4 and out[3]["epoch_day"] == 0
    assert out[3]["day_frac"] == pytest.approx(0.75)
    assert out[1]["week_index"] * 7 <= out[1]["epoch_day"]
    assert out[1]["day_of_year"] == 1 and out[1]["month_of_year"] == 1


# --------------------------------------------------------- Winnowing

def test_winnow_detection_floor_and_df_cap(spark):
    # Docs 1/2 share a 6-token run >= window+k-1 = 6 → MUST pair
    # (the structural guarantee); doc 3 disjoint → never pairs.
    from time_sift_spark.operators.dedup import winnow_pairs

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f g h",
                 "z z a b c d e f q q",
                 "one two three four five six seven"],
    }))
    out = {(r["doc_id_a"], r["doc_id_b"]): r["n_shared"]
           for r in winnow_pairs(docs, "doc_id", "text", shingle_k=3,
                                 window=4, min_shared=1).collect()}
    assert (1, 2) in out and out[(1, 2)] >= 1
    assert not any(3 in p for p in out)


def test_winnow_boilerplate_df_cap_drops_hot_fingerprint(spark):
    # The same text in 5 docs with df_cap=3: every shared fingerprint is
    # over-cap, so NO pairs survive — the documented mega-cluster route.
    from time_sift_spark.operators.dedup import winnow_pairs

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["spam spam common boiler plate text here now"] * 5,
    }))
    out = winnow_pairs(docs, "doc_id", "text", df_cap=3, min_shared=1).collect()
    assert out == []


def test_winnow_spark_equals_duck(spark):
    from time_sift_spark.operators.dedup import winnow_pairs, winnow_pairs_sql

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "quick brown fox jumps over the lazy cat today",
                 "completely different words in this one here",
                 "the quick brown fox jumps over the lazy dog"],
    })
    got = {(r["doc_id_a"], r["doc_id_b"]): r["n_shared"]
           for r in winnow_pairs(_mk(spark, pdf), "doc_id", "text",
                                 min_shared=1).collect()}
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {(a, b): n for a, b, n in con.execute(winnow_pairs_sql(
        DUCK, "documents", "doc_id", "text", min_shared=1)).fetchall()}
    assert got == want and (1, 4) in got


# ---------------------------------------------------- Feature hashing

def test_hash_vectorize_exact_counts_and_sign(spark):
    # Same token twice doubles its weight; disjoint docs with the same
    # token land identical (dim, weight); weights are signed ints.
    from time_sift_spark.operators.text import hash_vectorize

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["aa aa bb", "aa"],
    }))
    out = hash_vectorize(docs, "text", "doc_id", dim=16).collect()
    d1 = {(r["dim_idx"]): r["weight"] for r in out if r["doc_id"] == 1}
    d2 = {(r["dim_idx"]): r["weight"] for r in out if r["doc_id"] == 2}
    (aa_dim, aa_w), = d2.items()
    assert abs(aa_w) == 1
    # doc 1 holds 2*aa at aa's dim, plus bb which either lands elsewhere
    # (exact 2*aa_w) or collides (±1 off) — both are legal hashing-trick
    # outcomes; what matters is the signed-count arithmetic is exact
    assert d1[aa_dim] in (2 * aa_w, 2 * aa_w + 1, 2 * aa_w - 1)
    assert all(isinstance(r["weight"], int) for r in out)


def test_hash_vectorize_inner_product_sanity(spark):
    # Hashed vectors of identical docs are identical; of disjoint docs
    # nearly orthogonal (here: exactly, since no collisions at dim=64
    # with 3 distinct tokens is likely — assert identical case only).
    from time_sift_spark.operators.text import hash_vectorize

    docs = _mk(spark, pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x y z", "x y z"],
    }))
    out = hash_vectorize(docs, "text", "doc_id", dim=64).collect()
    v1 = sorted((r["dim_idx"], r["weight"]) for r in out if r["doc_id"] == 1)
    v2 = sorted((r["dim_idx"], r["weight"]) for r in out if r["doc_id"] == 2)
    assert v1 == v2 and len(v1) >= 1


# ---------------------------------------------------------- SymSpell

def test_symspell_catches_every_single_typo_position(spark):
    # insert, delete, substitute at head/middle/tail — ALL must pair
    # with the original (the deletion-neighborhood guarantee); the
    # distance-2 name must not.
    from time_sift_spark.operators.entity import symspell_match

    df = _mk(spark, pd.DataFrame({
        "cid": [1, 2, 3, 4, 5, 6],
        "name": ["abcdef",   # original
                 "bcdef",    # head deletion
                 "abcxdef",  # middle insertion
                 "abcdeX",   # tail substitution
                 "Xbcdef",   # head substitution
                 "abXXef"],  # distance 2 — must NOT pair with 1
    }))
    out = {(r["id_a"], r["id_b"]) for r in
           symspell_match(df, "cid", "name", max_distance=1).collect()}
    for other in (2, 3, 4, 5):
        assert (1, other) in out, other
    assert (1, 6) not in out


def test_symspell_variant_df_cap(spark):
    # identical names everywhere with cap 2: all variants over-cap, no
    # pairs — the formulaic-name hot-key route.
    from time_sift_spark.operators.entity import symspell_match

    df = _mk(spark, pd.DataFrame({"cid": [1, 2, 3, 4],
                                  "name": ["same"] * 4}))
    assert symspell_match(df, "cid", "name",
                          variant_df_cap=2).collect() == []


# ----------------------------------------------------- Quantile drift

def test_quantile_drift_detects_location_shift(spark):
    import datetime

    from time_sift_spark.operators.quality import quantile_drift

    rows = []
    for i in range(600):
        day = i % 30
        v = float(i % 100) + (300.0 if day >= 15 else 0.0)
        rows.append(("t", datetime.datetime(2024, 1, 1 + day), v))
    df = _mk(spark, pd.DataFrame(rows, columns=["event_type", "ts", "v"]))
    out = quantile_drift(df, "v", "ts", "event_type", "2024-01-16").collect()
    assert len(out) == 1 and out[0]["flagged"]
    assert out[0]["shift_p5"] == pytest.approx(300.0, abs=5.0)


# ------------------------------------------------------------- Burst

def test_burst_detect_flags_spike_not_baseline(spark):
    import datetime

    from time_sift_spark.operators.rolling import burst_detect

    rows = []
    for day in range(10):
        n = 50 if day == 8 else 10
        for i in range(n):
            rows.append(("err", datetime.datetime(2024, 1, 1 + day, 12, 0, i % 60)))
    df = _mk(spark, pd.DataFrame(rows, columns=["event_type", "ts"]))
    out = {r["day_x"]: r for r in
           burst_detect(df, "ts", "event_type").collect()}
    days = sorted(out)
    first, spike, after = out[days[0]], out[days[8]], out[days[9]]
    assert first["burst_ratio"] is None and not first["flagged"]
    assert spike["flagged"] and spike["burst_ratio"] == pytest.approx(5.0)
    # the spiked day inflates later baselines but day 9 itself (10
    # events vs mean ~15) must NOT flag
    assert not after["flagged"]


# ----------------------------------------- Classical decomposition (r11)

def test_classical_decompose_recovers_planted_components(spark):
    # y = 100 + 10*iso_dow: a pure weekly profile over a flat trend.
    # Any full 7-day centered window averages every weekday once, so
    # trend = 100 + 10*mean(1..7) = 140 exactly; seasonal(dow) =
    # 10*dow - 40; resid = 0 on the interior; edges (first/last 3
    # days) are NULL, never shrunken-window estimates.
    import datetime

    from time_sift_spark.operators.seasonal import classical_decompose

    rows = []
    for i in range(28):
        ts = datetime.datetime(2024, 1, 1 + i % 28, 12)
        epoch_day = (ts.date() - datetime.date(1970, 1, 1)).days
        dow = ((epoch_day + 3) % 7) + 1
        rows.append(("a", ts, float(100 + 10 * dow)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts", "v"]))
    out = classical_decompose(df, "v", "ts", "k").toPandas().sort_values("day_x")
    assert len(out) == 28
    assert out.trend.head(3).isna().all() and out.trend.tail(3).isna().all()
    interior = out.iloc[3:-3]
    assert (interior.trend == 140.0).all()
    assert (interior.resid.abs() < 1e-9).all()
    # component identity on the interior
    recon = interior.trend + interior.seasonal + interior.resid
    assert (recon - interior.y_val).abs().max() < 1e-9


def test_classical_decompose_validation(spark):
    import datetime

    from time_sift_spark.operators.seasonal import classical_decompose

    df = spark.createDataFrame(pd.DataFrame(
        {"k": ["a"], "ts": [datetime.datetime(2024, 1, 1)], "v": [1.0]}
    ))
    with pytest.raises(ColumnNotFoundError):
        classical_decompose(df, "nope", "ts", "k")
    with pytest.raises(ValueError):
        classical_decompose(df, "v", "ts", "k", period=1)


def test_hw_damped_flattens_trend_and_validates(spark):
    # On the linear series the damped fit at t=8 uses phi*b0: l0=4,
    # b0=1, phi=0.5 -> fit=(4+0.5)+(-3)=1.5 (vs undamped 2.0); phi
    # outside (0,1] raises.
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 21)
    out = holt_winters(df, "v", "ts", "k", period=7,
                       damping=0.5).orderBy("day_x").collect()
    assert out[0]["hw_fit"] == pytest.approx(1.5, abs=1e-9)
    with pytest.raises(ValueError):
        holt_winters(df, "v", "ts", "k", damping=1.5)


def test_hw_damped_mul_dials_compose(spark):
    # The combined ETS(A,Ad,M) member: fit at t=8 = (l0 + phi*b0) * s_1
    # = (4 + 0.5) * 0.25 = 1.125 — both dials visible in one number.
    from time_sift_spark.operators.seasonal import holt_winters

    df = _hw_frame(spark, 21)
    out = holt_winters(df, "v", "ts", "k", period=7, seasonal="mul",
                       damping=0.5).orderBy("day_x").collect()
    assert out[0]["hw_fit"] == pytest.approx(1.125, abs=1e-9)
