"""Round-4 batch-38: embedding second-moment pairs, KG metapath census,
tool-usage profile.  Twin parity is covered by the gate; these pin
semantics on crafted inputs."""

import pytest
from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_second_moment_crafted(spark):
    # dim-64 vectors, only dims 0/1 populated and perfectly correlated,
    # dim 2 anti-correlated with them: top pair must be (0,1) positive
    # and (0,2)/(1,2) negative, all integer-exact.
    rows = []
    for k, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        vec = [0.0] * 64
        vec[0] = v * 0.1
        vec[1] = v * 0.2
        vec[2] = -v * 0.1
        rows.append((k, vec, 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: emb if name == "embeddings" else orig(s, sf, name)
        out = Q.q_embedding_second_moment(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    assert out[0]["n_rows"] == 4
    by_pair = {(r["i"], r["j"]): r["cov_scaled"] for r in out}
    # quantized dims: q0 = floor(v*0.1*1e4) = v*1000, q1 = v*2000,
    # q2 = floor(-v*0.1*1e4) = -v*1000 exactly (0.1*k has exact*1e4? use
    # the computed values instead of assuming):
    q0 = [1000, 2000, 3000, 4000]
    q1 = [2000, 4000, 6000, 8000]
    q2 = [-1000, -2000, -3000, -4000]

    def cov(a, b):
        n = 4
        return n * sum(x * y for x, y in zip(a, b)) - sum(a) * sum(b)

    assert by_pair[(0, 1)] == cov(q0, q1)
    assert by_pair[(0, 2)] == cov(q0, q2)
    assert by_pair[(1, 2)] == cov(q1, q2)
    assert by_pair[(0, 2)] < 0 < by_pair[(0, 1)]
    # top-20 ranking: the three populated pairs outrank every zero pair
    top3 = sorted(out, key=lambda r: -abs(r["cov_scaled"]))[:3]
    assert {(r["i"], r["j"]) for r in top3} == {(0, 1), (0, 2), (1, 2)}


def test_second_moment_quantization_floor(spark):
    # floor quantization: 0.00015 -> floor(1.5) = 1, not round-to-2 —
    # pins the cross-engine determinism rule
    vec = [0.0] * 64
    vec[0] = 0.00015
    emb = spark.createDataFrame(
        [(0, vec, 0), (1, vec, 0)], "vec_id long, embedding array<float>, label int"
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: emb if name == "embeddings" else orig(s, sf, name)
        out = Q.q_embedding_second_moment(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    # cov(0, j) for all-zero j is 0; every returned pair must be 0
    assert all(r["cov_scaled"] == 0 for r in out)


def test_metapath_counts_shape(spark):
    rows = Q.q_kg_metapath_counts(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_paths"] >= 1
        assert 1 <= r["n_mids"] <= r["n_paths"]
        # a 2-hop chain shares the mid label by construction
        assert r["mid_label"] is not None


def test_tool_usage_profile_consistency(spark):
    t = Q.derive_transcripts(spark, SF_DIR)
    expected_calls = t.filter(F.col("tool").isNotNull()).count()
    rows = Q.q_tool_usage_profile(spark, SF_DIR).collect()
    assert sum(r["n_calls"] for r in rows) == expected_calls
    for r in rows:
        assert 0 <= r["read_back_bp"] <= 10000
        assert 1 <= r["n_convs"] <= r["n_calls"]
        assert r["tool"] is not None
