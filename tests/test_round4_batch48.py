"""Round-4 batch-48: centrality rank correlation, conversation language
mix, line-profile stats."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_centrality_rank_corr_bounds(spark):
    r = Q.q_centrality_rank_corr(spark, SF_DIR).collect()[0]
    assert r["n"] >= 3
    assert -1.0 <= r["rho"] <= 1.0
    # degree and PageRank on a co-occurrence graph are strongly
    # positively related — a negative rho would mean a bug
    assert r["rho"] > 0.5
    assert r["sum_d2"] >= 0


def test_conv_lang_mix_invariants(spark):
    rows = Q.q_conv_lang_mix(spark, SF_DIR).collect()
    assert len(rows) == 50  # conv-0000..conv-0049
    n_docs = Q._t(spark, SF_DIR, "documents").count()
    assert sum(r["n_turns"] for r in rows) == n_docs
    for r in rows:
        assert 1 <= r["n_langs"] <= 5
        assert r["dominance_bp"] >= 10000 // r["n_langs"] - 1
        assert r["dominance_bp"] <= 10000


def test_doc_line_stats_consistency(spark):
    rows = Q.q_doc_line_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_lines"] >= r["n_docs"]  # every doc has >= 1 line
        assert r["n_blank"] + r["n_short"] <= r["n_lines"]
        assert 0 <= r["blank_bp"] <= 10000
        assert 0 <= r["short_bp"] <= 10000
