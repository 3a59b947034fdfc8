"""Graph-query operators (operators/graphq.py) vs hand-computed /
NumPy-reference results on crafted graphs."""

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.graphq import (
    degree_histogram,
    degrees,
    k_hop,
    pagerank,
    triangle_counts,
    undirect,
)


def _edges(spark, pairs):
    return spark.createDataFrame([(a, b) for a, b in pairs], "src string, dst string")


def test_degrees(spark):
    # a->b, a->c, b->c, d isolated-as-source-only via d->a
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")])
    got = {r["node"]: (r["out_degree"], r["in_degree"], r["degree"]) for r in degrees(e).collect()}
    assert got == {
        "a": (2, 1, 3),
        "b": (1, 1, 2),
        "c": (0, 2, 2),
        "d": (1, 0, 1),
    }
    hist = {r["degree"]: r["n_nodes"] for r in degree_histogram(e).collect()}
    assert hist == {3: 1, 2: 2, 1: 1}


def test_undirect_dedups_and_symmetrizes(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")])
    got = {(r["src"], r["dst"]) for r in undirect(e).collect()}
    assert got == {("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")}


def test_k_hop_min_hops_and_early_exit(spark):
    # chain a->b->c->d plus shortcut a->c: c is 1 hop (min), d is 2
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["hops"] for r in k_hop(e, seeds, k=10).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # bounded at k=1
    got1 = {r["node"]: r["hops"] for r in k_hop(e, seeds, k=1).collect()}
    assert got1 == {"a": 0, "b": 1, "c": 1}
    # two seeds, min across seeds
    seeds2 = spark.createDataFrame([("a",), ("d",)], "node string")
    got2 = {r["node"]: r["hops"] for r in k_hop(e, seeds2, k=3).collect()}
    assert got2 == {"a": 0, "d": 0, "b": 1, "c": 1}


def test_pagerank_matches_numpy_reference(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("b", "d")]
    e = _edges(spark, pairs)
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=7, damping=0.85).collect()}

    # independent reference: same GraphX recurrence in plain Python
    nodes = sorted({x for p in pairs for x in p})
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    pr = {n: 1.0 for n in nodes}
    for _ in range(7):
        contrib = {n: 0.0 for n in nodes}
        for s, d in pairs:
            contrib[d] += pr[s] / out[s]
        pr = {n: 0.15 + 0.85 * contrib[n] for n in nodes}
    for n in nodes:
        assert got[n] == pytest.approx(pr[n], abs=1e-9)


def test_pagerank_dangling_and_source_nodes(spark):
    # b has no out-edges (dangling), a receives nothing
    e = _edges(spark, [("a", "b")])
    got = {r["node"]: r["pr"] for r in pagerank(e, iters=3, damping=0.85).collect()}
    assert got["a"] == pytest.approx(0.15)
    # pr(b) = 0.15 + 0.85*pr(a); pr(a) settles to 0.15 after iter 1:
    # i1: b = 0.15+0.85*1 = 1.0; i2: b = 0.15+0.85*0.15 = 0.2775; i3: same
    assert got["b"] == pytest.approx(0.15 + 0.85 * 0.15, abs=1e-12)


def test_triangle_counts(spark):
    # K4 on {a,b,c,d}: 4 triangles, each node in 3; plus noise:
    # a self-loop, a parallel edge, a reversed duplicate, and a
    # pendant edge (e) in no triangle
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    noise = [("a", "a"), ("b", "a"), ("a", "b"), ("d", "e")]
    got = {r["node"]: r["triangles"] for r in triangle_counts(_edges(spark, k4 + noise)).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    total = sum(got.values())
    assert total == 3 * 4  # 4 triangles x 3 corners


def test_triangle_free_graph(spark):
    # bipartite graphs are triangle-free
    e = _edges(spark, [("s1", "p1"), ("s1", "p2"), ("s2", "p1"), ("s2", "p2")])
    assert triangle_counts(e).count() == 0


def test_k_hop_undirected_bipartite(spark):
    # undirected closure lets BFS bounce back: s1 -> p1 -> s2
    e = undirect(_edges(spark, [("s1", "p1"), ("s2", "p1")]))
    seeds = spark.createDataFrame([("s1",)], "node string")
    got = {r["node"]: r["hops"] for r in k_hop(e, seeds, k=2).collect()}
    assert got == {"s1": 0, "p1": 1, "s2": 2}


# ---------------------------------------------------------------------------
# weakly-connected components + local clustering coefficient
# ---------------------------------------------------------------------------


def test_weakly_connected_two_components_min_label(spark):
    from docs2kg_spark.operators.graphq import weakly_connected

    edges = spark.createDataFrame(
        # component {a,b,c} (direction ignored) + component {x,y}
        [("b", "a"), ("b", "c"), ("x", "y")],
        "src string, dst string",
    )
    got = {r.node: r.component for r in weakly_connected(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_weakly_connected_driver_vs_distributed_parity(spark):
    from docs2kg_spark.config import PipelineConfig
    from docs2kg_spark.operators.graphq import weakly_connected

    # chain + triangle + isolated pair, shuffled directions
    rows = [("n3", "n1"), ("n1", "n2"), ("n5", "n4"), ("n4", "n6"), ("n6", "n5"),
            ("p1", "p2")]
    edges = spark.createDataFrame(rows, "src string, dst string").repartition(5)
    a = sorted(map(tuple, weakly_connected(edges).collect()))
    b = sorted(
        map(
            tuple,
            weakly_connected(
                edges, cfg=PipelineConfig(cc_driver_max_edges=0)
            ).collect(),
        )
    )
    assert a == b
    assert ("n4", "n4") in a and ("n6", "n4") in a


def test_clustering_coefficient_triangle_plus_pendant(spark):
    from docs2kg_spark.operators.graphq import clustering_coefficient

    edges = spark.createDataFrame(
        # triangle a-b-c plus pendant d hanging off c; parallel edge and
        # self-loop must be ignored
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("b", "a"), ("d", "d")],
        "src string, dst string",
    )
    got = {r.node: (r.degree, r.triangles, r.lcc) for r in
           clustering_coefficient(edges).collect()}
    assert got == {
        "a": (2, 1, 1.0),
        "b": (2, 1, 1.0),
        "c": (3, 1, round(2 * 1 / (3 * 2), 6)),
        "d": (1, 0, 0.0),
    }


def test_assortativity_star_is_minus_one(spark):
    from docs2kg_spark.operators.graphq import degree_assortativity

    edges = spark.createDataFrame(
        [("c", "l1"), ("c", "l2"), ("c", "l3")], "src string, dst string"
    )
    r = degree_assortativity(edges).collect()[0]
    assert (r.m_edges, r.assortativity) == (3, -1.0)


def test_assortativity_hand_computed_mixed_graph(spark):
    from docs2kg_spark.operators.graphq import degree_assortativity

    # triangle a-b-c with pendant d on c: r = -20/28 = -0.714286 (6dp)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src string, dst string",
    )
    r = degree_assortativity(edges).collect()[0]
    assert r.m_edges == 4
    assert r.assortativity == round(-20 / 28, 6)


def test_kcore_clique_survives_chain_peels(spark):
    from docs2kg_spark.operators.graphq import k_core

    # K4 clique + a chain hanging off it
    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    chain = [("d", "x"), ("x", "y"), ("y", "z")]
    edges = spark.createDataFrame(clique + chain, "src string, dst string")
    core3 = {r.node: r.core_degree for r in k_core(edges, k=3).collect()}
    assert core3 == {"a": 3, "b": 3, "c": 3, "d": 3}  # chain fully peeled
    # k=2: the chain still peels (cascade from the degree-1 tail)
    core2 = set(r.node for r in k_core(edges, k=2).collect())
    assert core2 == {"a", "b", "c", "d"}


def test_kcore_cascading_peel_empties_chain(spark):
    from docs2kg_spark.operators.graphq import k_core

    chain = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    edges = spark.createDataFrame(chain, "src string, dst string")
    assert k_core(edges, k=2).count() == 0  # ends peel, cascade consumes all


def test_kcore_cycle_keeps_cycle_drops_pendant(spark):
    from docs2kg_spark.operators.graphq import k_core

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "p")], "src string, dst string"
    )
    got = {r.node: r.core_degree for r in k_core(edges, k=2).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_k_hop_broadcast_and_shuffle_paths_agree(spark):
    """broadcast_below=0 forces the shuffle-join fallback; the default
    broadcasts small frontiers — both must give the identical min-hop
    set (the knob changes the physical plan only)."""
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "e"), ("x", "y")],
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    fast = {(r["node"], r["hops"]) for r in k_hop(e, seeds, k=4).collect()}
    slow = {
        (r["node"], r["hops"])
        for r in k_hop(e, seeds, k=4, broadcast_below=0).collect()
    }
    assert fast == slow
    # a=0, b=1, c=2, e=2 (via b->e), d=3; x/y unreachable
    assert fast == {("a", 0), ("b", 1), ("c", 2), ("e", 2), ("d", 3)}
