"""Round-4 batch-58: conversation coverage funnel and the parroting
detector."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_conv_coverage_funnel(spark):
    r = Q.q_kg_conv_coverage(spark, SF_DIR).collect()[0]
    assert r["n_convs"] == 50
    # triples require >=2 mentions in one segment -> triple coverage
    # can never exceed mention coverage
    assert r["n_with_triples"] <= r["n_with_mentions"] <= r["n_convs"]
    assert r["mention_coverage_bp"] >= r["triple_coverage_bp"]
    assert r["n_with_mentions"] > 0


def test_tool_parrot_crafted(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "tool", "result alpha beta gamma delta", "srcA", None),
            ("c1", 1, "assistant", "alpha beta gamma delta", None, None),   # 100% parrot
            ("c1", 2, "tool", "output one two three", "srcA", None),
            ("c1", 3, "assistant", "completely novel summary here", None, None),  # 0%
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    orig = Q.derive_transcripts
    try:
        Q.derive_transcripts = lambda s, sf: t
        r = Q.q_tool_parrot_profile(spark, SF_DIR).collect()[0]
    finally:
        Q.derive_transcripts = orig
    assert r["n_pairs"] == 2
    assert r["n_parrot"] == 1
    assert r["sum_containment_bp"] == 10000  # 10000 + 0


def test_tool_parrot_real_bounds(spark):
    rows = Q.q_tool_parrot_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_parrot"] <= r["n_pairs"]
        assert 0 <= r["sum_containment_bp"] <= 10000 * r["n_pairs"]
