"""Round-4 batch-22: modularity, dedup cluster sizes, k-per-group
sampling, YoY seasonality.  Twin parity is covered by the gate; these
pin semantics on crafted inputs."""

import hashlib
from datetime import date

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_modularity_bounds_and_identity(spark):
    """Q ∈ [-0.5, 1); and the integer identity holds:
    modularity == q_num / m2²."""
    r = Q.q_graph_modularity(spark, SF_DIR).collect()[0]
    assert -0.5 <= r["modularity"] < 1.0
    assert r["modularity"] == pytest.approx(r["q_num"] / (r["m2"] ** 2), abs=1e-6)
    assert r["n_communities"] >= 1 and r["m2"] % 2 == 0  # und double-counts


def test_modularity_perfect_partition(spark):
    """Two disjoint triangles labeled by LPA → every edge intra:
    Q = Σ(intra2·m2 − d²)/m2² = (6·12−36)·2/144 = 0.5."""
    from docs2kg_spark.operators.graphq import label_propagation
    from pyspark.sql import functions as F

    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    t = spark.createDataFrame(
        [(f"e{a}", "rel", f"e{b}", "c0") for a, b in tri],
        "subj string, pred string, obj string, conv_id string",
    )
    orig_tr, orig_comm = Q.q_kg_triples, Q.q_graph_communities
    try:
        Q.q_kg_triples = lambda spark_, sf_dir: t
        Q.q_graph_communities = lambda spark_, sf_dir: label_propagation(
            t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), iters=4
        )
        r = Q.q_graph_modularity(spark, SF_DIR).collect()[0]
    finally:
        Q.q_kg_triples, Q.q_graph_communities = orig_tr, orig_comm
    assert r["n_communities"] == 2 and r["m2"] == 12
    assert r["modularity"] == pytest.approx(0.5, abs=1e-6)


def test_dedup_cluster_sizes_mass_conservation(spark):
    """Σ size·count == |documents in the map| and singleton clusters
    dominate a mostly-unique corpus."""
    rows = Q.q_dedup_cluster_sizes(spark, SF_DIR).collect()
    total = sum(r["cluster_size"] * r["n_clusters"] for r in rows)
    n_docs = Q._t(spark, SF_DIR, "documents").count()
    assert total == n_docs
    ones = next(r["n_clusters"] for r in rows if r["cluster_size"] == 1)
    assert ones >= total // 2


def test_group_sample_cap_and_hash_order(spark):
    """≤3 per (lang, source); members are exactly the 3 smallest md5
    keys of their cell."""
    d = Q._t(spark, SF_DIR, "documents").select("doc_id", "lang", "source").collect()
    cells = {}
    for r in d:
        key = hashlib.md5(f"{r['doc_id']}|gsample-v1".encode()).hexdigest()
        cells.setdefault((r["lang"], r["source"]), []).append((key, r["doc_id"]))
    want = {}
    for cell, members in cells.items():
        for rank, (_, did) in enumerate(sorted(members)[:3], 1):
            want[(cell[0], cell[1], rank)] = did
    got = {
        (r["lang"], r["source"], r["rank"]): r["doc_id"]
        for r in Q.q_group_sample(spark, SF_DIR).collect()
    }
    assert got == want


def test_monthly_yoy_lag_semantics(spark):
    """Planted 13 months: month 13 sees month 1 as prev year; first 12
    months have NULL yoy."""
    rows = []
    for i in range(13):
        y, m = 2024 + (i // 12), (i % 12) + 1
        rows.append((i, 1, "O", float(100 + i), date(y, m, 15), "P"))
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: o if name == "orders" else orig(s, sf, name)
        out = {r["month"]: r for r in Q.q_monthly_revenue_yoy(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert len(out) == 13
    assert out["2025-01"]["prev_year_cents"] == 10000
    assert out["2025-01"]["yoy_delta"] == out["2025-01"]["cents"] - 10000
    assert all(out[m]["prev_year_cents"] is None for m in out if m.startswith("2024"))
