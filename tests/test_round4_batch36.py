"""Round-4 batch-36: casing profile, balance-activity matrix, mention
density.  Twin parity is covered by the gate; these pin semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_casing_profile_crafted(spark):
    docs = spark.createDataFrame(
        [(0, "HELLO World this IS Fine", "en", "caps", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        r = Q.q_doc_casing_profile(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    # uppercase letters: HELLO(5) W(1) IS(2) F(1) = 9; letters = 20
    assert (r["n_upper"], r["n_letters"]) == (9, 20)
    assert r["n_allcaps_tokens"] == 2  # HELLO, IS
    assert r["n_title_tokens"] == 2    # World, Fine
    assert r["upper_bp"] == 9 * 10000 // 20


def test_balance_matrix_partition(spark):
    rows = Q.q_balance_activity_matrix(spark, SF_DIR).collect()
    total = sum(r["n_customers"] for r in rows)
    assert total == Q._t(spark, SF_DIR, "customer").count()
    bands = {r["balance_band"] for r in rows}
    assert bands <= {"negative", "low", "high"}


def test_mention_density_consistency(spark):
    rows = Q.q_mention_density_by_label(spark, SF_DIR).collect()
    assert rows
    total_mentions = sum(r["n_mentions"] for r in rows)
    assert total_mentions == Q.q_kg_mentions(spark, SF_DIR).count()
    for r in rows:
        assert r["per_1k_tokens"] == r["n_mentions"] * 1000 // r["n_tokens"]
