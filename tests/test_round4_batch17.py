"""Round-4 batch-17: RAKE keyword extraction, session basket lift.
Twin parity is covered by the gate; these pin semantics on crafted
inputs."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_rake_scores_multiword_phrase_highest(spark):
    """Classic RAKE property: a multi-word phrase of co-occurring
    content words outranks single frequent words (degree rewards
    phrase length)."""
    import docs2kg_spark.queries as Q

    df = spark.createDataFrame(
        [
            (0, "deep neural networks and deep neural networks of training", "en", "s", 0),
            (1, "training is training", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "documents" else orig(spark, sf_dir, name)
        rows = Q.q_rake_keywords(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    top0 = [r for r in rows if r["doc_id"] == 0 and r["rank"] == 1][0]
    assert top0["phrase"] == "deep neural networks"
    # deg(deep)=deg(neural)=deg(networks)=6 over 2 occurrences → 3.0 each
    assert top0["score"] == pytest.approx(9.0, abs=1e-6)
    top1 = [r for r in rows if r["doc_id"] == 1 and r["rank"] == 1][0]
    assert top1["phrase"] == "training"


def test_rake_rank_bounds(spark):
    from docs2kg_spark.queries import q_rake_keywords

    rows = q_rake_keywords(spark, SF_DIR).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_event_lift_independence_and_bounds(spark):
    """Crafted sessions: types that always co-occur get lift = N/(n·n)
    ·n_ab maximal; disjoint types never appear as a pair."""
    import docs2kg_spark.queries as Q
    import pandas as pd

    rows = []
    eid = 0
    # 4 users → 4 sessions; 'a'+'b' always together; 'c' alone
    for u in range(1, 5):
        base = pd.Timestamp("2025-03-01 10:00:00")
        types = ["a", "b"] if u <= 2 else ["c"]
        for i, t in enumerate(types):
            rows.append((eid, base + pd.Timedelta(seconds=i), u, t, 0.0, None))
            eid += 1
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "events" else orig(spark, sf_dir, name)
        out = Q.q_event_lift(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"], r["n_ab"]) == ("a", "b", 2)
    # N=4 sessions, n_a=n_b=2 → lift = 2*4/(2*2) = 2.0
    assert r["lift"] == pytest.approx(2.0, abs=1e-6)
