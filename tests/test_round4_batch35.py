"""Round-4 batch-35: eta² variance decomposition, CMS merge audit.
Twin parity is covered by the gate; these pin semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_eta2_extremes(spark):
    """Perfectly separated groups -> eta² = 1; identical groups -> 0."""
    sep = spark.createDataFrame(
        [(0, "t", "en", "s", 10), (1, "t", "en", "s", 10),
         (2, "t", "de", "s", 99), (3, "t", "de", "s", 99)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    same = spark.createDataFrame(
        [(0, "t", "en", "s", 10), (1, "t", "en", "s", 20),
         (2, "t", "de", "s", 10), (3, "t", "de", "s", 20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: sep if name == "documents" else orig(s, sf, name)
        r1 = Q.q_length_lang_eta(spark, SF_DIR).collect()[0]
        Q._t = lambda s, sf, name: same if name == "documents" else orig(s, sf, name)
        r2 = Q.q_length_lang_eta(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r1["eta2"] == pytest.approx(1.0, abs=1e-6)
    assert r2["eta2"] == pytest.approx(0.0, abs=1e-6)


def test_eta2_real_range(spark):
    r = Q.q_length_lang_eta(spark, SF_DIR).collect()[0]
    assert r["eta2"] is None or -1e-9 <= r["eta2"] <= 1.0


def test_cms_merge_audit_zero_mismatch(spark):
    r = Q.q_cms_merge_audit(spark, SF_DIR).collect()[0]
    assert r["n_mismatch"] == 0
    assert r["total_mass"] == r["expected_mass"]
    assert r["n_cells"] >= 1
