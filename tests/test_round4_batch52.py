"""Round-4 batch-52: deterministic walk pairs and the rolling-24h
RANGE window."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_walk_pairs_deterministic_and_valid(spark):
    a = {(r["anchor"], r["context"], r["hop"])
         for r in Q.q_kg_walk_pairs(spark, SF_DIR).collect()}
    b = {(r["anchor"], r["context"], r["hop"])
         for r in Q.q_kg_walk_pairs(spark, SF_DIR).collect()}
    assert a == b and a
    # every hop-1 context is a true neighbor of its anchor
    from docs2kg_spark.operators.graphq import undirect

    t = Q.q_kg_triples(spark, SF_DIR)
    e = {
        (r["src"], r["dst"])
        for r in undirect(
            t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        ).collect()
    }
    for an, cx, hop in a:
        if hop == 1:
            assert (an, cx) in e
        assert an != cx


def test_rolling_24h_crafted(spark):
    rows = [
        (1, "2025-01-01 00:00:00", 7, "t", 1.0, "{}"),
        (2, "2025-01-01 12:00:00", 7, "t", 2.0, "{}"),
        (3, "2025-01-02 00:00:00", 7, "t", 4.0, "{}"),   # 24h after e1: e1 OUT (window is 86399s)
        (4, "2025-01-05 00:00:00", 7, "t", 8.0, "{}"),
        (5, "2025-01-01 00:00:00", 9, "t", 16.0, "{}"),  # other user isolated
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: ev if name == "events" else orig(s, sf, name)
        out = {r["event_id"]: r for r in Q.q_event_rolling_24h(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out[1]["n_24h"] == 1 and out[1]["value_cents_24h"] == 100
    assert out[2]["n_24h"] == 2 and out[2]["value_cents_24h"] == 300
    assert out[3]["n_24h"] == 2 and out[3]["value_cents_24h"] == 600  # e2 + e3
    assert out[4]["n_24h"] == 1 and out[4]["value_cents_24h"] == 800
    assert out[5]["n_24h"] == 1 and out[5]["value_cents_24h"] == 1600
