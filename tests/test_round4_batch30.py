"""Round-4 batch-30: dup language matrix, hub eccentricity.  Twin
parity is covered by the gate; these pin semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_dup_lang_matrix_mass(spark):
    """Σ cell counts == |pair table| and cells are canonically ordered."""
    cells = Q.q_dup_lang_matrix(spark, SF_DIR).collect()
    total = sum(r["n_pairs"] for r in cells)
    assert total == Q._minhash_pairs_memo(spark, SF_DIR).count()
    for r in cells:
        assert r["lang_a"] <= r["lang_b"]
        assert 0 < r["min_sim"] <= r["max_sim"] <= 1.0


def test_ecc_hubs_crafted_path_graph(spark):
    """Path a-b-c-d-e-f: hub by degree ties resolve to the smallest
    ids; eccentricity within 4 hops is exact."""
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    t = spark.createDataFrame(
        [(x, "rel", y, "c") for x, y in edges],
        "subj string, pred string, obj string, conv_id string",
    )
    orig = Q.q_kg_triples
    try:
        Q.q_kg_triples = lambda s, sf: t
        rows = {r["hub"]: r for r in Q.q_graph_ecc_hubs(spark, SF_DIR).collect()}
    finally:
        Q.q_kg_triples = orig
    # degrees: b,c,d,e = 2; a,f = 1 → top-3 by (deg desc, node) = b, c, d
    assert set(rows) == {"b", "c", "d"}
    # from c: reaches all 6 nodes within 3 hops → ecc 3, n_reached 6
    assert rows["c"]["ecc4"] == 3 and rows["c"]["n_reached"] == 6
    # from b: f is 4 away → ecc 4, all reached
    assert rows["b"]["ecc4"] == 4 and rows["b"]["n_reached"] == 6


def test_ecc_hubs_real_graph_bounds(spark):
    rows = Q.q_graph_ecc_hubs(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["ecc4"] <= 4 and r["n_reached"] >= 1
