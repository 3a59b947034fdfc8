"""Round-4 batch-53: entity cluster sizes, edge-weight histogram, turn
position-length curve."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_entity_cluster_sizes_total(spark):
    rows = Q.q_kg_entity_cluster_sizes(spark, SF_DIR).collect()
    cm = Q.q_kg_canonical_map(spark, SF_DIR)
    assert sum(r["cluster_size"] * r["n_entities"] for r in rows) == cm.count()
    # the fixture's alias families guarantee at least one multi-surface
    # cluster
    assert any(r["cluster_size"] >= 2 for r in rows)


def test_edge_weight_hist_bands(spark):
    rows = Q.q_kg_edge_weight_hist(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["min_w"] <= r["max_w"]
        assert 2 ** r["weight_band"] <= r["min_w"]
        assert r["max_w"] < 2 ** (r["weight_band"] + 1)
        assert r["n_edges"] >= 1


def test_turn_position_length_totals(spark):
    rows = Q.q_turn_position_length_curve(spark, SF_DIR).collect()
    t = Q.derive_transcripts(spark, SF_DIR)
    assert sum(r["n_turns"] for r in rows) == t.count()
    for r in rows:
        assert r["mean_chars"] >= 1
        assert r["pos_band"] in ("00-04", "05-14", "15-39", "40+")
