"""Round-4 batch-59: scrub savings summary and hour entropy."""

import math

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_scrub_savings_consistency(spark):
    rows = Q.q_doc_scrub_savings(spark, SF_DIR).collect()
    assert rows
    from docs2kg_spark.operators.dedup import exact_substr_scrub

    s = exact_substr_scrub(Q._t(spark, SF_DIR, "documents"))
    agg = s.groupBy().sum("n_toks", "n_removed").collect()[0]
    assert sum(r["n_toks"] for r in rows) == agg[0]
    assert sum(r["n_removed"] for r in rows) == agg[1]
    for r in rows:
        assert 0 <= r["n_docs_touched"] <= r["n_docs"]
        assert 0 <= r["removed_bp"] <= 10000


def test_event_hour_entropy_bounds(spark):
    rows = Q.q_event_hour_entropy(spark, SF_DIR).collect()
    assert rows
    ln24_micro = int(math.log(24) * 1_000_000)
    for r in rows:
        assert 1 <= r["n_hours"] <= 24
        # H <= ln(n_hours) <= ln 24, within micro-rounding slack
        assert r["entropy_micro"] <= ln24_micro + 24
        assert r["entropy_micro"] >= -24
