"""Round-4 batch-32: status pivot, prefix groups, label co-occurrence.
Twin parity is covered by the gate; these pin semantics."""

from datetime import date

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_status_pivot_adds_up(spark):
    rows = Q.q_status_month_mix(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_orders"] == r["n_open"] + r["n_fulfilled"] + r["n_partial"]


def test_prefix_groups_catch_header_boilerplate(spark):
    """Same 120-char opening, divergent bodies -> one group; distinct
    openings -> none."""
    header = ("confidential notice " * 10).strip()  # > 120 chars
    docs = spark.createDataFrame(
        [
            (0, header + " body one follows here", "en", "s", 0),
            (1, header + " a completely different body", "en", "s", 0),
            (2, "short unique text", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        rows = Q.q_doc_prefix_groups(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 2 and rows[0]["exemplar"] == 0
    assert len(rows[0]["prefix"]) == 120


def test_label_cooc_pairs_are_canonical(spark):
    rows = Q.q_kg_label_cooc(spark, SF_DIR).collect()
    for r in rows:
        assert r["label_a"] < r["label_b"]
        assert r["n_segments"] >= 1
