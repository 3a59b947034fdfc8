"""Round-4 batch-34: brand return rate, props JSON stats, isolated
entity share.  Twin parity is covered by the gate; these pin
semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_brand_return_rate_bounds(spark):
    rows = Q.q_brand_return_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_returned"] <= r["n_lines"]
        assert 0 <= r["returned_cents"] <= r["total_cents"]
        assert r["return_rate"] == pytest.approx(r["n_returned"] / r["n_lines"], abs=1e-6)


def test_props_value_stats_exact(spark):
    """props is {"k": N} on every row -> n_present equals row count and
    min <= med <= max."""
    rows = Q.q_props_value_stats(spark, SF_DIR).collect()
    total = sum(r["n_present"] for r in rows)
    assert total == Q._t(spark, SF_DIR, "events").count()
    for r in rows:
        assert r["min_k"] <= r["med_k"] <= r["max_k"]


def test_isolated_share_identity(spark):
    """Every conv's isolated count is bounded by its entity count, and
    a conv with triples has at least 2 non-isolated entities."""
    rows = Q.q_kg_isolated_entity_share(spark, SF_DIR).collect()
    assert rows
    convs_with_triples = {
        r["conv_id"]
        for r in Q.q_kg_triples(spark, SF_DIR).select("conv_id").distinct().collect()
    }
    for r in rows:
        assert 0 <= r["n_isolated"] <= r["n_entities"]
        if r["conv_id"] in convs_with_triples:
            assert r["n_entities"] - r["n_isolated"] >= 2
