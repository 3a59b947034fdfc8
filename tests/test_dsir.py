"""dsir_weights: importance-ratio semantics, degenerate target,
partitioning independence."""

from pyspark.sql import functions as F

from docs2kg_spark.operators.tfidf import dsir_weights


def _docs(spark):
    # target-flavored vocabulary: {wiki, facts}; raw noise: {spam, ads}
    return spark.createDataFrame(
        [
            (1, "wiki facts wiki facts", "tgt"),
            (2, "wiki facts facts wiki", "tgt"),
            (3, "spam ads spam ads", "web"),
            (4, "wiki facts spam ads", "web"),
            (5, "spam spam ads ads", "web"),
        ],
        "doc_id long, text string, src string",
    )


def test_targetlike_docs_score_higher(spark):
    out = {
        r["id"]: r["avg_llr"]
        for r in dsir_weights(_docs(spark), target=F.col("src") == "tgt").collect()
    }
    # doc 4 (half target-vocab) sits strictly between the pure-target
    # doc 2 and the pure-noise doc 3; ordering is the whole point of DSIR
    assert out[2] > out[4] > out[3]
    assert out[1] == out[2]  # same bag of words -> identical weight
    assert out[3] == out[5]


def test_target_everything_is_zero(spark):
    # target == raw -> p_t == p_r for every token -> llr exactly 0
    out = dsir_weights(_docs(spark), target=F.lit(True)).collect()
    assert all(r["avg_llr"] == 0.0 for r in out)


def test_partitioning_independent(spark):
    d = _docs(spark)
    a = sorted(dsir_weights(d, target=F.col("src") == "tgt").collect())
    b = sorted(
        dsir_weights(d.repartition(7, "text"), target=F.col("src") == "tgt").collect()
    )
    assert a == b
