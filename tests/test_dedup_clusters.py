"""doc_dedup_map / doc_dedup_keep: transitive near-dup clustering with
min-id survivor (operators/dedup.py)."""

from pyspark.sql import functions as F

from docs2kg_spark.operators.dedup import doc_dedup_keep, doc_dedup_map

BASE = (
    "the quarterly revenue report shows steady growth across all regions "
    "with particular strength in the northern markets and a slight dip in "
    "the coastal segment during the second fiscal quarter of the year"
)


def _docs(spark):
    rows = [
        # chain: 1 ≈ 2 (tail edit), 2 ≈ 3 (different tail edit) — 1 and 3
        # may or may not pair directly; transitivity must still collapse
        # all three to one survivor
        (1, BASE + " alpha"),
        (2, BASE),
        (3, BASE + " omega"),
        # exact duplicate pair
        (4, "completely different text about kafka pipelines and parquet files"),
        (5, "completely different text about kafka pipelines and parquet files"),
        # singleton
        (6, "unrelated tiny note"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_transitive_cluster_min_survivor(spark):
    cmap = {r["doc_id"]: r["canonical_id"] for r in doc_dedup_map(_docs(spark)).collect()}
    assert cmap["1"] == cmap["2"] == cmap["3"] == "1"
    assert cmap["4"] == cmap["5"] == "4"
    assert cmap["6"] == "6"


def test_keep_returns_survivors_only(spark):
    kept = sorted(r["doc_id"] for r in doc_dedup_keep(_docs(spark)).select("doc_id").collect())
    assert kept == [1, 4, 6]


def test_string_min_semantics_documented(spark):
    # ids compared as strings on both engines: "10" < "9"
    docs = spark.createDataFrame(
        [(9, BASE), (10, BASE)], "doc_id bigint, text string"
    )
    cmap = {r["doc_id"]: r["canonical_id"] for r in doc_dedup_map(docs).collect()}
    assert cmap["9"] == cmap["10"] == "10"
