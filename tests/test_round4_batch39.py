"""Round-4 batch-39: exact-substring scrub (Lee et al. removal stage)
and the JL projection distortion audit.  Twin parity is covered by the
gate; these pin semantics on crafted corpora."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q
from docs2kg_spark.operators.dedup import exact_substr_scrub

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_scrub_removes_shared_span_exactly(spark):
    shared = "one two three four five six seven eight"  # exactly 8 tokens
    d = _docs(
        spark,
        [
            f"intro {shared} outro",
            f"other prefix {shared}",
            "totally unique text with no duplicated gram here at all",
        ],
    )
    rows = {r["doc_id"]: r for r in exact_substr_scrub(d, n=8, min_df=2).collect()}
    assert rows[0]["scrubbed_text"] == "intro outro"
    assert rows[0]["n_removed"] == 8 and rows[0]["n_toks"] == 10
    assert rows[1]["scrubbed_text"] == "other prefix"
    assert rows[2]["n_removed"] == 0
    assert rows[2]["scrubbed_text"] == rows[2]["scrubbed_text"].lower()


def test_scrub_overlapping_grams_merge_to_one_interval(spark):
    # a 10-token shared run: three overlapping 8-grams cover all 10
    # positions — interval union, not 3×8 double-counting
    run = "a b c d e f g h i j"
    d = _docs(spark, [f"x {run} y", f"z {run}"])
    rows = {r["doc_id"]: r for r in exact_substr_scrub(d, n=8, min_df=2).collect()}
    assert rows[0]["n_removed"] == 10
    assert rows[0]["scrubbed_text"] == "x y"
    assert rows[1]["scrubbed_text"] == "z"


def test_scrub_within_doc_repeat_kept(spark):
    # the 8-gram repeats only WITHIN one doc — min_df counts distinct
    # docs, so nothing is removed (dup_span_profile convention)
    span = "p q r s t u v w"
    d = _docs(spark, [f"{span} mid {span}", "unrelated other words entirely"])
    rows = {r["doc_id"]: r for r in exact_substr_scrub(d, n=8, min_df=2).collect()}
    assert rows[0]["n_removed"] == 0


def test_scrub_fully_duplicated_doc_empties(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs(spark, [t, t])
    for r in exact_substr_scrub(d, n=8, min_df=2).collect():
        assert r["scrubbed_text"] == ""
        assert r["n_removed"] == r["n_toks"] == 8


def test_scrub_short_doc_sub_n_gram(spark):
    # docs shorter than n contribute their single sub-n gram (same
    # convention as dup_span_profile) — two identical short docs scrub
    d = _docs(spark, ["tiny doc", "tiny doc", "different entirely"])
    rows = {r["doc_id"]: r for r in exact_substr_scrub(d, n=8, min_df=2).collect()}
    assert rows[0]["scrubbed_text"] == "" and rows[0]["n_removed"] == 2
    assert rows[2]["n_removed"] == 0


def test_jl_distortion_invariants(spark):
    rows = Q.q_jl_distortion(spark, SF_DIR).collect()
    assert rows
    n_emb = Q._t(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_pairs"] for r in rows) == n_emb - 17
    for r in rows:
        assert 0 <= r["min_bp"] <= r["max_bp"]
        assert r["bucket"] == r["min_bp"] // 500 or r["n_pairs"] > 1
        assert r["min_bp"] // 500 == r["bucket"]
        assert r["max_bp"] // 500 == r["bucket"]
    # the projection must be unbiased enough that the bulk of pairs sit
    # within a factor ~3 of perfect preservation (bp 10000)
    bulk = sum(r["n_pairs"] for r in rows if 3000 <= r["min_bp"] <= 33000)
    assert bulk >= 0.5 * (n_emb - 17)
