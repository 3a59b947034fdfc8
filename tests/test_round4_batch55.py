"""Round-4 batch-55: closing tone and embedding distance histogram."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_closing_tone_totals(spark):
    rows = Q.q_conv_closing_tone(spark, SF_DIR).collect()
    assert sum(r["n_convs"] for r in rows) == 50
    assert {r["tone"] for r in rows} <= {"positive", "negative", "neutral"}
    assert all(r["n_convs"] >= 1 for r in rows)


def test_distance_hist_consistency(spark):
    rows = Q.q_embedding_distance_hist(spark, SF_DIR).collect()
    n = Q._t(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_pairs"] for r in rows) == n - 17
    for r in rows:
        assert 0 <= r["min_d2"] <= r["max_d2"]
        assert 2 ** r["dist_band"] <= r["min_d2"] + 1
        assert r["max_d2"] + 1 < 2 ** (r["dist_band"] + 1)
