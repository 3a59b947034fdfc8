"""dup_span_profile: hand-computed parity, short/empty-doc conventions,
partitioning independence."""

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.dedup import dup_span_profile


@pytest.fixture(scope="module")
def docs(spark):
    # "a b c d" appears in docs 1 and 2 (shared 2-gram chain),
    # doc 3 is unique, doc 4 is short (<n tokens), doc 5 is whitespace.
    return spark.createDataFrame(
        [
            (1, "a b c d x"),
            (2, "a b c d y"),
            (3, "p q r s t"),
            (4, "a b"),
            (5, "   "),
        ],
        "doc_id long, text string",
    )


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_hand_computed(spark, docs):
    # n=3: doc1 grams = [a b c, b c d, c d x]; doc2 = [a b c, b c d, c d y]
    # shared grams (df>=2): "a b c", "b c d" -> 2 of 3 positions each.
    out = _rows(dup_span_profile(docs, n=3, min_df=2))
    assert out[1] == {"doc_id": 1, "n_grams": 3, "n_dup_grams": 2, "dup_fraction": 0.666667}
    assert out[2]["n_dup_grams"] == 2
    assert out[3] == {"doc_id": 3, "n_grams": 3, "n_dup_grams": 0, "dup_fraction": 0.0}
    # short doc: single sub-n gram "a b", unique -> not dup
    assert out[4] == {"doc_id": 4, "n_grams": 1, "n_dup_grams": 0, "dup_fraction": 0.0}
    # whitespace doc: zero grams, fraction 0.0 (never null)
    assert out[5] == {"doc_id": 5, "n_grams": 0, "n_dup_grams": 0, "dup_fraction": 0.0}


def test_occurrences_counted_but_df_is_distinct_docs(spark):
    # One doc repeating a gram 3x does NOT make it df>=2 on its own,
    # but once another doc shares it, all 3 occurrences count as dup.
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "z z z")],
        "doc_id long, text string",
    )
    solo = _rows(dup_span_profile(docs, n=2, min_df=2))
    assert solo[1]["n_dup_grams"] == 0  # "a b"/"b a" live only in doc 1
    docs2 = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c")],
        "doc_id long, text string",
    )
    shared = _rows(dup_span_profile(docs2, n=2, min_df=2))
    # doc1 grams: [a b, b a, a b, b a, a b] -> "a b" (3 occ) shared with doc2
    assert shared[1]["n_grams"] == 5
    assert shared[1]["n_dup_grams"] == 3


def test_partitioning_independent(spark, docs):
    base = sorted(dup_span_profile(docs, n=3).collect())
    repart = sorted(dup_span_profile(docs.repartition(7, "text"), n=3).collect())
    assert base == repart
