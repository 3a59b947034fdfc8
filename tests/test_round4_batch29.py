"""Round-4 batch-29: first-seen histogram, audience Jaccard, churn.
Twin parity is covered by the gate; these pin semantics."""

from datetime import datetime

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_first_seen_hist_mass(spark):
    """Σ n_entities == |entity timeline| and every first_turn >= 0."""
    hist = Q.q_kg_entity_first_seen_hist(spark, SF_DIR).collect()
    total = sum(r["n_entities"] for r in hist)
    assert total == Q.q_kg_entity_timeline(spark, SF_DIR).count()
    assert all(r["first_turn"] >= 0 for r in hist)


def test_type_user_jaccard_crafted(spark):
    """Types with identical audiences get J=1; disjoint get no row
    (no shared user) — and the identity inter/(a+b-inter) holds."""
    rows = []
    eid = 0
    for uid in (1, 2, 3):
        for t in ("a", "b"):
            rows.append((eid, datetime(2025, 3, 1, 10), uid, t, 0.0, "{}"))
            eid += 1
    rows.append((eid, datetime(2025, 3, 1, 10), 9, "c", 0.0, "{}"))
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: e if name == "events" else orig(s, sf, name)
        out = {(r["type_a"], r["type_b"]): r for r in Q.q_type_user_jaccard(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r["n_inter"], r["n_a"], r["n_b"]) == (3, 3, 3)
    assert r["jacc"] == pytest.approx(1.0)


def test_user_churn_partition(spark):
    """retained + churned + new == users active in any half; midpoint
    split is deterministic."""
    r = Q.q_user_churn(spark, SF_DIR).collect()[0]
    assert r["n_users"] == r["n_retained"] + r["n_churned"] + r["n_new"]
    assert r["n_users"] == (
        Q._t(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
