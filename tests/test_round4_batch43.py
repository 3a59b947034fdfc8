"""Round-4 batch-43: surface ambiguity census and split stratification
audit."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_mention_ambiguity_finds_mercury(spark):
    rows = {r["text"]: r for r in Q.q_mention_ambiguity(spark, SF_DIR).collect()}
    # the corpus's built-in two-label surface
    assert "mercury" in rows
    m = rows["mercury"]
    assert m["n_labels"] == 2
    assert m["labels"] == "Project Code|Tool"
    assert m["n_mentions"] >= 2
    # every returned surface is genuinely ambiguous
    for r in rows.values():
        assert r["n_labels"] >= 2
        assert len(r["labels"].split("|")) == r["n_labels"]


def test_split_balance_audit_marginals(spark):
    rows = Q.q_split_balance_audit(spark, SF_DIR).collect()
    assert rows
    n_docs = Q._t(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"}
    for r in rows:
        # dev_bp is exact: (n·N − ns·nl)·1e4 ÷ (ns·nl), truncating
        assert isinstance(r["dev_bp"], int)
        # expected_milli reconstructs the cell's independence baseline
        assert r["expected_milli"] >= 0
    # the train split dominates (0.90 weight)
    train = sum(r["n_docs"] for r in rows if r["split"] == "train")
    assert train > 0.8 * n_docs
