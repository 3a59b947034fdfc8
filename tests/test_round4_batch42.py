"""Round-4 batch-42: mention polarity enrichment, tie-strength profile,
agent-loop detector."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q
from docs2kg_spark.queries import _POLARITY_LEXICON

SF_DIR = "/root/testdata/sf0.001"


def test_polarity_lexicon_is_valid():
    words = [w for w, _ in _POLARITY_LEXICON]
    assert len(words) == len(set(words))
    assert all(w == w.lower() and w.isalnum() for w in words)
    assert any(s > 0 for _, s in _POLARITY_LEXICON)
    assert any(s < 0 for _, s in _POLARITY_LEXICON)


def test_mention_polarity_consistency(spark):
    rows = Q.q_mention_polarity(spark, SF_DIR).collect()
    assert rows
    total = sum(r["n_mentions"] for r in rows)
    _, m = Q._kg_stack(spark, SF_DIR)
    assert total == m.count()
    for r in rows:
        assert 1 <= r["n_segs"] <= r["n_mentions"]
        # integer-milli consistency — Spark DIV and DuckDB // both
        # truncate toward ZERO on BIGINT (verified by the value gate on
        # the negative-sum rows), unlike Python's flooring //
        assert r["pol_milli"] == int(r["pol_sum"] * 1000 / r["n_mentions"])


def test_tie_strength_profile(spark):
    rows = Q.q_graph_tie_strength(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["a"] < r["b"]
        # common neighbors can never exceed min(deg)-? (each common
        # neighbor is a distinct neighbor of both endpoints)
        assert r["common"] <= min(r["deg_a"], r["deg_b"])
        assert r["is_weak"] == (r["common"] <= 1)
    assert any(r["is_weak"] for r in rows)


def test_turn_loop_detector_crafted(spark):
    t = spark.createDataFrame(
        [
            ("c1", 0, "assistant", "let me try that again", None, None),
            ("c1", 1, "assistant", "let me try that again", None, None),
            ("c1", 2, "assistant", "let me try that againX", None, None),
            ("c2", 0, "user", "completely different opening", None, None),
            ("c2", 1, "assistant", "nothing like the previous turn at all", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    orig = Q.derive_transcripts
    try:
        Q.derive_transcripts = lambda s, sf: t
        rows = {r["conv_id"]: r for r in Q.q_turn_loop_detector(spark, SF_DIR).collect()}
    finally:
        Q.derive_transcripts = orig
    assert rows["c1"]["n_pairs"] == 2
    assert rows["c1"]["n_loops"] == 2  # exact repeat + 1-char drift
    assert rows["c1"]["min_dist"] == 0
    assert rows["c2"]["n_loops"] == 0
