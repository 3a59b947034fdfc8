"""Round-4 batch-14: dedup method agreement, extraction confidence
calibration, KG edge-type mix.  Twin parity is covered by the gate."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_venn_set_relations(spark):
    """Exact-duplicate pairs are Jaccard-1 and hamming-0, so BOTH
    near-dup methods must contain every exact pair: n_common =
    n_exact on the exact rows."""
    from docs2kg_spark.queries import q_dedup_method_venn

    rows = {(r["method_a"], r["method_b"]): r for r in q_dedup_method_venn(spark, SF_DIR).collect()}
    assert set(rows) == {("exact", "minhash"), ("exact", "simhash"), ("minhash", "simhash")}
    em, es, ms = rows[("exact", "minhash")], rows[("exact", "simhash")], rows[("minhash", "simhash")]
    assert em["n_a"] == es["n_a"]  # same exact set measured twice
    assert em["n_common"] == em["n_a"]  # exact ⊆ minhash
    assert es["n_common"] == es["n_a"]  # exact ⊆ simhash
    for r in rows.values():
        assert 0 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        denom = r["n_a"] + r["n_b"] - r["n_common"]
        assert r["set_jaccard"] == pytest.approx(r["n_common"] / denom, abs=1e-6)


def test_mention_confidence_profile_covers_methods(spark):
    from docs2kg_spark.queries import q_kg_mentions, q_mention_confidence_profile

    rows = q_mention_confidence_profile(spark, SF_DIR).collect()
    n_total = q_kg_mentions(spark, SF_DIR).count()
    assert sum(r["n_mentions"] for r in rows) == n_total
    methods = {r["method"] for r in rows}
    assert "gazetteer" in methods
    for r in rows:
        assert 0 < r["mean_conf"] <= 1.0
        assert 1 <= r["n_surfaces"] <= r["n_mentions"]


def test_edge_type_share_sums_to_one(spark):
    from docs2kg_spark.queries import q_kg_edge_type_share, q_kg_edges

    rows = q_kg_edge_type_share(spark, SF_DIR).collect()
    assert sum(r["n_edges"] for r in rows) == q_kg_edges(spark, SF_DIR).count()
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
