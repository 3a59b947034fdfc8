"""Round-4 batch-26: HITS, session stats.  Twin parity is covered by
the gate; these pin semantics."""

from datetime import datetime

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_hits_star_graph(spark):
    """Directed star u0 -> {v1..v3}: after 2 un-normalized rounds
    h²(u0) = Σ a¹(v) = 3·3 = 9, a²(v) = h²(u0) = 9, and leaves have
    hub 0, root authority 0."""
    t = spark.createDataFrame(
        [("u0", "rel", f"v{i}", "c") for i in (1, 2, 3)],
        "subj string, pred string, obj string, conv_id string",
    )
    orig = Q.q_kg_triples
    try:
        Q.q_kg_triples = lambda s, sf: t
        rows = {r["node"]: r for r in Q.q_graph_hits(spark, SF_DIR).collect()}
    finally:
        Q.q_kg_triples = orig
    assert rows["u0"]["hub_score"] == 9 and rows["u0"]["auth_score"] == 0
    for v in ("v1", "v2", "v3"):
        assert rows[v]["hub_score"] == 0 and rows[v]["auth_score"] == 9


def test_hits_duplicate_triples_collapse(spark):
    """The same (subj, obj) across convs/predicates is ONE edge (the
    eg_e DISTINCT convention every graph read shares)."""
    t = spark.createDataFrame(
        [("a", "rel", "b", "c1"), ("a", "rel2", "b", "c2"), ("a", "rel", "b", "c3")],
        "subj string, pred string, obj string, conv_id string",
    )
    orig = Q.q_kg_triples
    try:
        Q.q_kg_triples = lambda s, sf: t
        rows = {r["node"]: r for r in Q.q_graph_hits(spark, SF_DIR).collect()}
    finally:
        Q.q_kg_triples = orig
    assert rows["a"]["hub_score"] == 1 and rows["b"]["auth_score"] == 1


def test_session_stats_crafted(spark):
    """Two sessions of known durations/events -> exact medians."""
    rows = [
        # user 1, session A: 3 events over 120 s
        (0, datetime(2025, 3, 1, 10, 0, 0), 1, "view", 0.0, "{}"),
        (1, datetime(2025, 3, 1, 10, 1, 0), 1, "view", 0.0, "{}"),
        (2, datetime(2025, 3, 1, 10, 2, 0), 1, "view", 0.0, "{}"),
        # user 1, session B (gap > 60 min): 1 event, 0 s
        (3, datetime(2025, 3, 1, 14, 0, 0), 1, "view", 0.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: e if name == "events" else orig(s, sf, name)
        r = Q.q_session_stats(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_sessions"] == 2
    assert r["med_events"] == pytest.approx(2.0)   # interp of {1, 3}
    assert r["med_dur_s"] == pytest.approx(60.0)   # interp of {0, 120}
