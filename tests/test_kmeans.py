"""kmeans_refine (operators/similarity.py): Lloyd semantics on a
crafted corpus with known clusters."""

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.similarity import kmeans_refine


def _emb(spark):
    # two tight blobs in 2-d; seeds are the two lowest ids (one per blob)
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.5, -0.5]),
        (3, [-0.5, 0.5]),
        (4, [10.5, 9.5]),
        (5, [9.5, 10.5]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_converges_to_blob_means(spark):
    out = kmeans_refine(_emb(spark), spark, n_centroids=2, iters=3, round_dp=6)
    got = {(r["cid"], r["dim"]): (r["val"], r["n"]) for r in out.collect()}
    # blob A = {0,2,3} mean (0,0); blob B = {1,4,5} mean (10,10)
    assert got[(0, 0)] == (0.0, 3) and got[(0, 1)] == (0.0, 3)
    assert got[(1, 0)] == (10.0, 3) and got[(1, 1)] == (10.0, 3)


def test_sse_non_increasing(spark):
    df = _emb(spark)

    def sse(cents):
        import math

        vecs = {r["vec_id"]: r["embedding"] for r in df.collect()}
        total = 0.0
        for v in vecs.values():
            total += min(sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents.values())
        return total

    def centroids(iters):
        out = kmeans_refine(df, None, n_centroids=2, iters=iters)
        c = {}
        for r in out.collect():
            c.setdefault(r["cid"], [0.0, 0.0])[r["dim"]] = r["val"]
        return c

    assert sse(centroids(2)) <= sse(centroids(1)) + 1e-9


def test_iters_zero_rejected(spark):
    with pytest.raises(ValueError):
        kmeans_refine(_emb(spark), spark, n_centroids=2, iters=0)
