"""Round-4 batch-11: perplexity bands, engagement Gini, retrieval leg
agreement.  Twin parity is covered by the gate; these pin the math on
crafted inputs."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _gini_of(spark, counts):
    """Run q_user_gini over a crafted events table with the given
    per-user event counts."""
    import docs2kg_spark.queries as Q

    rows = []
    eid = 0
    for uid, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, uid))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: (
            df if name == "events" else orig(spark, sf_dir, name)
        )
        return Q.q_user_gini(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig


def _gini_ref(counts):
    xs = sorted(counts)
    n, tot = len(xs), sum(xs)
    s = sum((i + 1) * x for i, x in enumerate(xs))
    return 2.0 * s / (n * tot) - (n + 1) / n


def test_gini_uniform_is_zero(spark):
    r = _gini_of(spark, [4, 4, 4, 4, 4])
    assert r["gini"] == pytest.approx(0.0, abs=1e-6)
    assert (r["n_users"], r["total_events"]) == (5, 20)


def test_gini_concentrated_matches_formula(spark):
    counts = [1, 1, 1, 1, 96]
    r = _gini_of(spark, counts)
    assert r["gini"] == pytest.approx(round(_gini_ref(counts), 6), abs=1e-6)
    assert r["gini"] > 0.7


def test_gini_random_matches_formula(spark):
    import random

    rng = random.Random(9)
    counts = [rng.randint(1, 30) for _ in range(40)]
    r = _gini_of(spark, counts)
    assert r["gini"] == pytest.approx(round(_gini_ref(counts), 6), abs=1e-6)


def test_perplexity_bands_partition_the_corpus(spark):
    from docs2kg_spark.queries import q_doc_logprob, q_perplexity_bands

    n_scored = q_doc_logprob(spark, SF_DIR).count()
    rows = q_perplexity_bands(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == n_scored
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    # bands are half-nat floors of a negative mean logprob
    assert all(r["band"] < 0 for r in rows)


def test_retrieval_overlap_bounds(spark):
    from docs2kg_spark.queries import q_retrieval_overlap

    rows = q_retrieval_overlap(spark, SF_DIR).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["n_common"] <= min(r["n_bm25"], r["n_jacc"])
        denom = r["n_bm25"] + r["n_jacc"] - r["n_common"]
        assert r["set_jaccard"] == pytest.approx(r["n_common"] / denom, abs=1e-6)
    # the legs rank differently, so at least one probe should show
    # imperfect agreement (otherwise fusion adds nothing to audit)
    assert any(r["set_jaccard"] < 1.0 for r in rows)
