"""Round-4 batch-54: user dominance histogram, tool bigrams, predicate
confidence profile."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_user_type_dominance_totals(spark):
    rows = Q.q_user_type_dominance(spark, SF_DIR).collect()
    n_users = Q._t(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        # dominance share is in (0, 1]; decile 10 == single-type user
        assert 1 <= r["dominance_decile"] <= 10


def test_tool_bigrams_consistency(spark):
    rows = Q.q_tool_bigrams(spark, SF_DIR).collect()
    assert rows
    t = Q.derive_transcripts(spark, SF_DIR)
    tool_turns = t.filter(F.col("tool").isNotNull())
    n_tools = tool_turns.count()
    n_convs_with_tools = tool_turns.select("conv_id").distinct().count()
    # each conv with k tool turns yields k-1 bigrams
    assert sum(r["n_pairs"] for r in rows) == n_tools - n_convs_with_tools
    for r in rows:
        assert 1 <= r["n_convs"] <= r["n_pairs"]


def test_kg_pred_confidence_values(spark):
    rows = {r["pred"]: r for r in Q.q_kg_pred_confidence(spark, SF_DIR).collect()}
    assert rows
    for r in rows.values():
        # the extractor emits 0.95/0.9 gazetteer and 0.6-ish LLM-standin
        # confidences; triple confidence = min of the pair's
        assert 0 < r["min_conf_milli"] <= r["max_conf_milli"] <= 1000
        assert r["sum_conf_milli"] <= 1000 * r["n_triples"]
