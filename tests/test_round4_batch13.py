"""Round-4 batch-13: int8 retrieval recall, MinHash similarity bands,
traffic heatmap.  Twin parity is covered by the gate; these pin
exactness properties and composition invariants."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_int8_dot_is_exact_bigint(spark):
    """The quantized dot product must be an exact integer on the Spark
    side — lanes ≤127 in magnitude, so dim·127² stays far under 2⁵³ and
    the DuckDB double-path computes the identical value."""
    from docs2kg_spark.queries import q_ann_int8_recall

    rows = q_ann_int8_recall(spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert r["recall"] == pytest.approx(r["n_hits"] / 5.0, abs=1e-6)
    # absmax int8 keeps ranking mostly intact on smooth synthetic
    # embeddings — average recall should be well above chance
    avg = sum(r["recall"] for r in rows) / len(rows)
    assert avg >= 0.5


def test_minhash_bands_sum_to_pair_count(spark):
    from docs2kg_spark.queries import q_doc_near_dup_minhash, q_minhash_sim_bands

    n_pairs = q_doc_near_dup_minhash(spark, SF_DIR).count()
    rows = q_minhash_sim_bands(spark, SF_DIR).collect()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    # verified-Jaccard pairs pass the 0.45 threshold → bands ≥ 4
    assert all(r["band"] >= 4 for r in rows)


def test_heatmap_dow_anchor_and_mass(spark):
    """0=Monday anchoring: 1970-01-05 was a Monday; total event mass is
    preserved by the (dow, hour) partition."""
    from docs2kg_spark.queries import q_event_hour_heatmap
    import docs2kg_spark.queries as Q

    rows = q_event_hour_heatmap(spark, SF_DIR).collect()
    n_total = Q._t(spark, SF_DIR, "events").count()
    assert sum(r["n_events"] for r in rows) == n_total
    assert all(0 <= r["dow"] <= 6 and 0 <= r["hour"] <= 23 for r in rows)

    df = spark.createDataFrame(
        [(0, "1970-01-05 13:00:00", 1, "a", 2.5, None)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type", "value", "props")
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "events" else orig(spark, sf_dir, name)
        r = q_event_hour_heatmap(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert (r["dow"], r["hour"], r["n_events"]) == (0, 13, 1)
    assert r["mean_value"] == pytest.approx(2.5)
