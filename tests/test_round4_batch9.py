"""Round-4 batch-9: bounded-hop weighted SSSP, role transitions, Zipf
slope, tokenizer fertility.  Value correctness vs the DuckDB twins is
covered by the gate (tests/test_entry.py); these pin the operator
semantics on crafted/seeded graphs (where the gate's graph is a black
box) plus the plan shapes the docstrings promise."""

import random

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.graphq import sssp_bounded

SF_DIR = "/root/testdata/sf0.001"


def _python_sssp(edges, seeds, max_hops):
    """Reference Bellman-Ford bounded at max_hops edges."""
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        nxt = dict(dist)
        for s, d, w in edges:
            if s in dist and (d not in nxt or dist[s] + w < nxt[d]):
                nxt[d] = min(nxt.get(d, 1 << 60), dist[s] + w)
        dist = nxt
    return dist


def _run(spark, edges, seeds, max_hops, **kw):
    e = spark.createDataFrame(edges, "src string, dst string, w bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    got = {r["node"]: r["dist"] for r in sssp_bounded(e, s, max_hops, **kw).collect()}
    want = _python_sssp(edges, seeds, max_hops)
    assert got == want


def test_sssp_prefers_cheap_long_path(spark):
    """a→b→c (1+1) beats the direct a→c (5); d is reachable only via
    the 3-edge chain."""
    edges = [("a", "b", 1), ("b", "c", 1), ("a", "c", 5), ("c", "d", 1)]
    _run(spark, edges, ["a"], max_hops=4)


def test_sssp_hop_bound_excludes_cheaper_long_path(spark):
    """With max_hops=1 the direct expensive edge wins — the cheap
    2-edge path is out of budget (semantics the twin's recursion bound
    mirrors exactly)."""
    edges = [("a", "b", 1), ("b", "c", 1), ("a", "c", 5)]
    e = {r["node"]: r["dist"] for r in _collect(spark, edges, ["a"], 1)}
    assert e == {"a": 0, "b": 1, "c": 5}


def _collect(spark, edges, seeds, max_hops):
    e = spark.createDataFrame(edges, "src string, dst string, w bigint")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    return sssp_bounded(e, s, max_hops).collect()


def test_sssp_multi_seed_and_unreachable(spark):
    edges = [("a", "b", 2), ("c", "d", 3), ("x", "y", 1)]
    rows = {r["node"]: r["dist"] for r in _collect(spark, edges, ["a", "c"], 3)}
    assert rows == {"a": 0, "b": 2, "c": 0, "d": 3}  # x, y absent


def test_sssp_random_graph_parity_both_join_paths(spark):
    """Seeded random digraph vs the Python Bellman-Ford, on BOTH the
    broadcast-frontier path and the shuffle fallback
    (broadcast_below=0) — the two physical plans must agree."""
    rng = random.Random(42)
    nodes = [f"n{i}" for i in range(30)]
    edges = [
        (rng.choice(nodes), rng.choice(nodes), rng.randint(1, 9))
        for _ in range(120)
    ]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    for kw in ({}, {"broadcast_below": 0}):
        _run(spark, edges, ["n0", "n7"], max_hops=5, **kw)


def test_sssp_improving_revisit(spark):
    """A node settled early must re-relax when a later round improves
    it: a→e direct (10) is found at hop 1, the 4-edge chain costs 4 and
    must overwrite it AND propagate onward to f within the bound."""
    edges = [
        ("a", "e", 10),
        ("a", "b", 1),
        ("b", "c", 1),
        ("c", "d", 1),
        ("d", "e", 1),
        ("e", "f", 1),
    ]
    _run(spark, edges, ["a"], max_hops=6)


def test_role_transitions_matches_construction(spark):
    """The derived transcripts alternate role by +2 mod 4 per turn
    (doc_id strides by 50 ≡ 2 mod 4 within a conversation), so the only
    transitions are system↔assistant and user↔tool."""
    from docs2kg_spark.queries import q_role_transitions

    rows = q_role_transitions(spark, SF_DIR).collect()
    got = {(r["prev_role"], r["role"]) for r in rows}
    assert got == {
        ("system", "assistant"),
        ("assistant", "system"),
        ("user", "tool"),
        ("tool", "user"),
    }
    assert all(r["n_turns"] >= r["n_convs"] >= 1 for r in rows)


def test_zipf_slope_exact_two_point(spark):
    """Two tokens with freqs (4, 2) at ranks (1, 2): slope =
    (ln4−ln2)/(ln1−ln2) = −1 exactly under the integer scaling."""
    df = spark.createDataFrame(
        [(0, "w w w w v v", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.createOrReplaceTempView("_zipf_docs")
    from docs2kg_spark.queries import q_zipf_slope

    import docs2kg_spark.queries as Q

    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "documents" else orig(spark, sf_dir, name)
        row = q_zipf_slope(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert row["n_terms"] == 2
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=1e-6)


def test_tokenizer_fertility_counts(spark):
    """'ab3 x!' → BPE-ish tokens [ab, 3, x, !] = 4; 6 chars."""
    import docs2kg_spark.queries as Q
    from docs2kg_spark.queries import q_tokenizer_fertility

    df = spark.createDataFrame(
        [(0, "ab3 x!", "en", "s", 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "documents" else orig(spark, sf_dir, name)
        row = q_tokenizer_fertility(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert (row["n_chars"], row["n_tokens"]) == (6, 4)
    assert row["chars_per_token"] == pytest.approx(1.5)


def test_sssp_plan_has_no_cartesian_and_broadcasts_frontier(spark):
    """The gate query's relaxation joins must be broadcast-hash (tiny
    entity frontier), never a cartesian/nested-loop product."""
    from docs2kg_spark.queries import q_graph_sssp

    df = q_graph_sssp(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
