"""Round-4 batch-46: conversation label purity."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_conv_label_purity_invariants(spark):
    rows = Q.q_conv_label_purity(spark, SF_DIR).collect()
    assert rows
    _, m = Q._kg_stack(spark, SF_DIR)
    assert sum(r["n_mentions"] for r in rows) == m.count()
    for r in rows:
        assert 1 <= r["n_labels"]
        # dominant share is at least the uniform share
        assert r["purity_bp"] >= 10000 // r["n_labels"] - 1
        assert r["purity_bp"] <= 10000
        assert r["top_label"]
