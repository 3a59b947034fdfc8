"""Round-4 batch-41: Adamic–Adar scores, Pareto revenue bands,
embedding norm profile."""

import math

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q
from docs2kg_spark.operators.graphq import adamic_adar

SF_DIR = "/root/testdata/sf0.001"


def test_adamic_adar_crafted(spark):
    # a-w-b and a-v-b: two shared neighbors; deg(w)=2, deg(v)=3 (extra
    # edge v-c).  aa(a,b) = round(1e6/ln2) + round(1e6/ln3)
    edges = spark.createDataFrame(
        [("a", "w"), ("w", "b"), ("a", "v"), ("v", "b"), ("v", "c")],
        "src string, dst string",
    )
    rows = {(r["a"], r["b"]): r for r in adamic_adar(edges, min_common=1).collect()}
    ab = rows[("a", "b")]
    assert ab["common"] == 2
    assert ab["aa_micro"] == round(1e6 / math.log(2)) + round(1e6 / math.log(3))
    # hub down-weighting: (a,b) via deg-2 w scores higher than via deg-3 v
    assert round(1e6 / math.log(2)) > round(1e6 / math.log(3))


def test_adamic_adar_min_common_filters(spark):
    edges = spark.createDataFrame(
        [("a", "w"), ("w", "b")], "src string, dst string"
    )
    assert adamic_adar(edges, min_common=2).count() == 0
    assert adamic_adar(edges, min_common=1).count() == 1


def test_customer_pareto_invariants(spark):
    rows = sorted(
        Q.q_customer_pareto(spark, SF_DIR).collect(), key=lambda r: -r["band"]
    )
    assert rows
    n_cust = Q._t(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    # cumulative share is monotone from the top band down and ends at
    # 10000 bp (integer division of total by itself)
    shares = [r["cum_share_bp"] for r in rows]
    assert shares == sorted(shares)
    assert shares[-1] == 10000
    # concentration: the top band alone holds a strictly positive share
    assert shares[0] > 0


def test_embedding_norm_profile_consistency(spark):
    rows = Q.q_embedding_norm_profile(spark, SF_DIR).collect()
    n = Q._t(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_vecs"] for r in rows) == n
    for r in rows:
        assert 0 <= r["min_norm2"] <= r["max_norm2"]
        if r["n_zero"]:
            assert r["min_norm2"] == 0
        # band consistency: both extremes fall in the band
        assert int(math.floor(math.log2(r["min_norm2"] + 1))) == r["norm_band"]
        assert int(math.floor(math.log2(r["max_norm2"] + 1))) == r["norm_band"]
