"""Round-4 batch-64: market-segment rollup and role-balance entropy."""

import math

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_mktsegment_profile(spark):
    rows = Q.q_mktsegment_profile(spark, SF_DIR).collect()
    c = Q._t(spark, SF_DIR, "customer")
    o = Q._t(spark, SF_DIR, "orders")
    assert sum(r["n_customers"] for r in rows) == c.count()
    assert sum(r["n_orders"] for r in rows) == o.count()
    for r in rows:
        assert 0 <= r["n_active"] <= r["n_customers"]
        if r["n_orders"]:
            assert r["aov_cents"] == r["revenue_cents"] // r["n_orders"]


def test_conv_role_balance(spark):
    rows = Q.q_conv_role_balance(spark, SF_DIR).collect()
    assert len(rows) == 50
    t = Q.derive_transcripts(spark, SF_DIR)
    assert sum(r["n_turns"] for r in rows) == t.count()
    ln4 = int(math.log(4) * 1_000_000)
    for r in rows:
        assert 1 <= r["n_roles"] <= 4
        assert r["entropy_micro"] <= ln4 + 8
        assert r["entropy_micro"] >= -8
