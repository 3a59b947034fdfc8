"""Round-4 batch-15: MOSS containment, embedding label cohesion.  Twin
parity is covered by the gate; these pin the semantics on crafted
inputs."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_containment_quote_vs_neardup(spark):
    """doc 1 contains doc 0's text verbatim inside a longer document →
    containment(0,1) = 1.0 even though the pair is far from a global
    near-duplicate."""
    from docs2kg_spark.operators.dedup import winnow_containment

    quoted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    padding = " ".join(f"w{i}" for i in range(60))
    df = spark.createDataFrame(
        [
            (0, quoted, "en", "s", len(quoted)),
            (1, padding + " " + quoted + " " + padding, "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = winnow_containment(df, min_shared=1).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (0, 1)
    assert r["n_shared"] == r["n_a"]  # every fp of the quoted doc is shared
    assert r["containment"] == pytest.approx(1.0, abs=1e-6)
    assert r["n_b"] > r["n_a"]  # the containing doc is bigger


def test_containment_bounds_on_corpus(spark):
    from docs2kg_spark.queries import q_doc_winnow_pairs, q_winnow_containment

    rows = q_winnow_containment(spark, SF_DIR).collect()
    assert len(rows) == q_doc_winnow_pairs(spark, SF_DIR).count()
    for r in rows:
        assert 0 < r["containment"] <= 1.0 + 1e-9
        assert r["n_shared"] <= min(r["n_a"], r["n_b"])


def test_label_centroid_cos_bounds_and_identity(spark):
    from docs2kg_spark.queries import q_label_centroid_cos

    rows = q_label_centroid_cos(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["cos_to_global"] <= 1.0 + 1e-9

    # single-label corpus: label centroid IS the global centroid → cos 1
    import docs2kg_spark.queries as Q

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], 7), (1, [2.0, 1.0, 0.0], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "embeddings" else orig(spark, sf_dir, name)
        r = q_label_centroid_cos(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    assert len(r) == 1 and r[0]["n_vecs"] == 2
    assert r[0]["cos_to_global"] == pytest.approx(1.0, abs=1e-6)


def test_empty_input_guards_return_null_not_ansi_error(spark):
    """ANSI mode throws DIVIDE_BY_ZERO where DuckDB yields NULL — the
    empty-input guards must make the ratio columns NULL instead of
    crashing (the event_anomalies ADVICE class, applied to the round-4
    late batches)."""
    import docs2kg_spark.queries as Q

    empty_events = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: (
            empty_events if name == "events" else orig(spark, sf_dir, name)
        )
        rows = Q.q_user_gini(spark, "/root/testdata/sf0.001").collect()
    finally:
        Q._t = orig
    assert len(rows) == 1 and rows[0]["n_users"] == 0 and rows[0]["gini"] is None
