"""Round-4 batch-63: monthly type-share drift and sentence lengths."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_type_share_by_month(spark):
    rows = Q.q_type_share_by_month(spark, SF_DIR).collect()
    assert sum(r["n"] for r in rows) == Q._t(spark, SF_DIR, "events").count()
    by_month = {}
    for r in rows:
        by_month.setdefault(r["month"], 0)
        by_month[r["month"]] += r["share_bp"]
    for share in by_month.values():
        assert 9990 <= share <= 10000


def test_sentence_len_profile(spark):
    rows = Q.q_sentence_len_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_sentences"] >= 1
        assert r["n_tokens"] >= r["n_sentences"]
        assert r["len_band"] in ("01-05", "06-15", "16-30", "31+")
