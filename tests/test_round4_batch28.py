"""Round-4 batch-28: weighted PageRank, turn-length drift.  Twin
parity is covered by the gate; these pin semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_weighted_pagerank_follows_weight(spark):
    """Hub h points to a (weight 9) and b (weight 1): a must outrank b,
    and the exact share arithmetic is checkable by hand after 1 iter
    of influence."""
    from docs2kg_spark.operators.graphq import pagerank_weighted

    e = spark.createDataFrame(
        [("h", "a", 9), ("h", "b", 1)], "src string, dst string, w long"
    )
    rows = {r["node"]: r["pr"] for r in pagerank_weighted(e, iters=5).collect()}
    assert rows["a"] > rows["b"] > 0
    # h receives nothing: pr(h) = 0.15 at fixpoint of this loop
    assert rows["h"] == pytest.approx(0.15, abs=1e-9)
    # shares: a gets 0.9 of h's rank, b 0.1 — after round 1 both frozen
    # (h's pr stays 0.15 from round 2 on; 5 rounds => final uses 0.15)
    assert rows["a"] == pytest.approx(0.15 + 0.85 * 0.15 * 0.9, abs=1e-9)
    assert rows["b"] == pytest.approx(0.15 + 0.85 * 0.15 * 0.1, abs=1e-9)


def test_weighted_vs_unweighted_rank_difference(spark):
    """On the real entity graph, weighting must produce a valid score
    set (all >= 1-d lower bound logic: every node >= 0.15)."""
    rows = Q.q_graph_pagerank_weighted(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["pr"] >= 0.15 - 1e-6


def test_turn_length_drift_crafted(spark):
    """Rising assistant turns (+5 chars/turn) and flat user turns:
    slope signs and exact medians."""
    rows = []
    for conv in ("c1", "c2"):
        for i in range(4):
            rows.append((conv, 2 * i, "user", "x" * 10, None, None))
            rows.append((conv, 2 * i + 1, "assistant", "y" * (10 + 5 * (2 * i + 1)), None, None))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    orig = Q.derive_transcripts
    try:
        Q.derive_transcripts = lambda s, sf: t
        out = {r["role"]: r for r in Q.q_turn_length_drift(spark, SF_DIR).collect()}
    finally:
        Q.derive_transcripts = orig
    assert out["assistant"]["n_convs"] == 2
    assert out["assistant"]["med_slope"] == pytest.approx(5.0, abs=1e-6)
    assert out["assistant"]["n_rising"] == 2 and out["assistant"]["n_falling"] == 0
    assert out["user"]["med_slope"] == pytest.approx(0.0, abs=1e-6)
    assert out["user"]["n_rising"] == 0 and out["user"]["n_falling"] == 0
