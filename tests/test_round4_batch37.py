"""Round-4 batch-37: conv graph density, numeric density, contrastive
triplets.  Twin parity is covered by the gate; these pin semantics."""

import hashlib

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_conv_graph_density_bounds(spark):
    rows = Q.q_kg_conv_graph_density(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_entities"] >= 2
        assert r["n_possible"] == r["n_entities"] * (r["n_entities"] - 1) // 2
        assert 0 <= r["n_pairs"] <= r["n_possible"]
        assert 0.0 <= r["density"] <= 1.0


def test_numeric_density_crafted(spark):
    docs = spark.createDataFrame(
        [(0, "pi is 3.14 and e is 2.71", "en", "nums", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        r = Q.q_doc_numeric_density(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_digits"] == 6
    assert r["n_numeric_tokens"] == 2  # 3.14, 2.71
    assert r["digit_bp"] == 6 * 10000 // len("pi is 3.14 and e is 2.71")


def test_contrastive_triplets_invariants(spark):
    """Anchor/positive share a language, negative never does, and the
    positive equals the hash-min non-self doc of the anchor's lang."""
    rows = Q.q_contrastive_triplets(spark, SF_DIR).collect()
    assert rows
    langs = {
        r["doc_id"]: r["lang"]
        for r in Q._t(spark, SF_DIR, "documents").select("doc_id", "lang").collect()
    }
    by_lang = {}
    for did, lang in langs.items():
        k = hashlib.md5(f"ctr-v1|{did}".encode()).hexdigest()
        by_lang.setdefault(lang, []).append((k, did))
    for r in rows:
        assert r["anchor"] % 10 == 0
        assert langs[r["positive"]] == langs[r["anchor"]]
        assert langs[r["negative"]] != langs[r["anchor"]]
        assert r["positive"] != r["anchor"]
        cands = sorted(by_lang[langs[r["anchor"]]])[:2]
        expect = cands[1][1] if cands[0][1] == r["anchor"] else cands[0][1]
        assert r["positive"] == expect
