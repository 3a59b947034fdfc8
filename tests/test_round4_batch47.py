"""Round-4 batch-47: vocab coverage curve, graph reciprocity, survivor
length bias."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_vocab_coverage_monotone(spark):
    rows = sorted(
        Q.q_vocab_coverage_curve(spark, SF_DIR).collect(), key=lambda r: r["cutoff"]
    )
    assert [r["cutoff"] for r in rows] == [100, 1000, 10000]
    cov = [r["coverage_bp"] for r in rows]
    assert cov == sorted(cov)
    for r in rows:
        assert r["n_types"] <= r["cutoff"]
        assert 0 < r["coverage_bp"] <= 10000
        assert r["n_covered"] <= r["total_tokens"]
    # a Zipfian corpus: the top-100 head already carries a major share
    assert cov[0] > 3000


def test_graph_reciprocity_crafted(spark):
    # craft triples: a->b and b->a reciprocal; a->c one-way
    t = spark.createDataFrame(
        [
            ("c0", "s0", "a", "Person", "RELATES_TO", "b", "Tool", 0.9),
            ("c0", "s1", "b", "Tool", "RELATES_TO", "a", "Person", 0.9),
            ("c0", "s2", "a", "Person", "RELATES_TO", "c", "Tool", 0.9),
        ],
        "conv_id string, seg_id string, subj string, subj_label string, pred string, obj string, obj_label string, confidence double",
    )
    orig = Q.q_kg_triples
    try:
        Q.q_kg_triples = lambda s, sf: t
        r = Q.q_graph_reciprocity(spark, SF_DIR).collect()[0]
    finally:
        Q.q_kg_triples = orig
    assert r["n_edges"] == 3
    assert r["n_reciprocal"] == 2
    assert r["reciprocity_bp"] == 6666


def test_dedup_survivor_bias_bounds(spark):
    r = Q.q_dedup_survivor_bias(spark, SF_DIR).collect()[0]
    assert r["n_clusters"] >= 1
    assert 0 <= r["n_survivor_longest"] <= r["n_clusters"]
    assert r["sum_surv_len"] <= r["sum_max_len"]
    assert 0 <= r["deficit_bp"] <= 10000
