"""Round-4 batch-49: predicate pattern entropy, dup-span position
profile, encoding-artifact QA."""

import math

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_pred_pattern_entropy_bounds(spark):
    rows = Q.q_kg_pred_pattern_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_patterns"] >= 1
        # single-pattern predicate -> H == 0 exactly
        if r["n_patterns"] == 1:
            assert r["entropy_micro"] == 0
        # H <= ln(n_patterns) within micro-rounding slack
        assert r["entropy_micro"] <= int(
            math.log(r["n_patterns"]) * 1_000_000
        ) + r["n_patterns"]
        assert r["entropy_micro"] >= -r["n_patterns"]  # rounding floor
    # the declared, schema-tight predicates exist alongside RELATES_TO
    preds = {r["pred"] for r in rows}
    assert "RELATES_TO" in preds and len(preds) >= 3


def test_dup_span_position_sums(spark):
    rows = Q.q_dup_span_position_profile(spark, SF_DIR).collect()
    thirds = {r["third"] for r in rows}
    assert thirds <= {"head", "body", "tail"}
    total_bp = sum(r["share_bp"] for r in rows)
    assert 9990 <= total_bp <= 10000
    assert all(r["n_occ"] >= 1 for r in rows)


def test_encoding_artifacts_crafted(spark):
    docs = spark.createDataFrame(
        [
            (0, "clean ascii text", "en", "s", 0),
            (1, "bad � replacement", "en", "s", 0),
            (2, "moji Ã© and ctrl \x07 here", "en", "s", 0),
            (3, "tab\tand\nnewline are fine", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        r = Q.q_doc_encoding_artifacts(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_docs"] == 4
    assert r["n_replacement"] == 1
    assert r["n_control"] == 1  # \x07 only; \t and \n excluded
    assert r["n_mojibake"] == 1
    assert r["n_damaged_docs"] == 2
