"""Round-4 batch-44: kNN label purity and the joint degree
distribution."""

import math

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_knn_purity_crafted_separable(spark):
    # two perfectly separated clusters along different axes: every
    # anchor's neighbors share its label -> purity 10000 bp
    rows = []
    for i in range(20):
        v = [0.0] * 64
        v[0 if i % 2 == 0 else 1] = 1.0 + (i % 5) * 0.01
        rows.append((i, v, i % 2))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: emb if name == "embeddings" else orig(s, sf, name)
        out = {r["label"]: r for r in Q.q_embedding_knn_purity(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    # anchors: vec_id % 10 == 0 -> ids 0 and 10, both label 0
    assert set(out) == {0}
    assert out[0]["n_anchors"] == 2
    assert out[0]["purity_bp"] == 10000


def test_knn_purity_bounds_real(spark):
    rows = Q.q_embedding_knn_purity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_same"] <= 3 * r["n_anchors"]
        assert 0 <= r["purity_bp"] <= 10000


def test_graph_jdd_totals(spark):
    rows = Q.q_graph_jdd(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["band_lo"] <= r["band_hi"]
        assert r["n_edges"] >= 1
    # total JDD mass = number of undirected edges
    from docs2kg_spark.operators.graphq import undirect

    t = Q.q_kg_triples(spark, SF_DIR)
    e = undirect(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    n_edges = e.filter(F.col("src") < F.col("dst")).count()
    assert sum(r["n_edges"] for r in rows) == n_edges
