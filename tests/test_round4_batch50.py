"""Round-4 batch-50: alias edit profile, markup census, question-turn
share."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_alias_edit_profile(spark):
    rows = Q.q_kg_alias_edit_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_aliases"] >= 1
        assert 1 <= r["min_dist"] <= r["max_dist"]  # alias != canon
        assert r["sum_dist"] >= r["max_dist"]
    # the fixture's 'acme corp'/'acme corporation' family is linked
    assert any("acme" in r["canon_text"] for r in rows)


def test_markup_profile_crafted(spark):
    docs = spark.createDataFrame(
        [
            (0, "# Title\n- item one\n- item two\n```\ncode\n```", "en", "s", 0),
            (1, "plain prose with a [link](http://x) inline", "en", "s", 0),
            (2, "## Sub\nmore\n* star bullet", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        r = Q.q_doc_markup_profile(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_headers"] == 2
    assert r["n_bullets"] == 3
    assert r["n_fence_marks"] == 2
    assert r["n_links"] == 1
    assert r["n_structured_docs"] == 2


def test_question_profile_invariants(spark):
    rows = Q.q_turn_question_profile(spark, SF_DIR).collect()
    assert {r["role"] for r in rows} == {"system", "user", "assistant", "tool"}
    t = Q.derive_transcripts(spark, SF_DIR)
    assert sum(r["n_turns"] for r in rows) == t.count()
    for r in rows:
        assert 0 <= r["question_bp"] <= 10000
