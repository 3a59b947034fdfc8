"""Round-4 batch-40: ontology coverage audit, script/lang mismatch QA,
near-dup cluster purity.  Twin parity is covered by the gate; these pin
semantics."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q
from docs2kg_spark.config import DEFAULT_ONTOLOGY

SF_DIR = "/root/testdata/sf0.001"


def test_ontology_coverage_statuses(spark):
    rows = Q.q_kg_ontology_coverage(spark, SF_DIR).collect()
    assert rows
    declared = {(s, d) for _, s, d in DEFAULT_ONTOLOGY.connections}
    for r in rows:
        if r["pred"] != "RELATES_TO":
            assert r["status"] == "declared"
            # a non-fallback pred is only emitted for its declared pair
            assert (r["subj_label"], r["obj_label"]) in declared
        elif (r["obj_label"], r["subj_label"]) in declared:
            assert r["status"] == "reverse_declared"
        else:
            assert r["status"] == "fallback"
        assert 1 <= r["n_convs"] <= r["n_triples"]
    # the audit must see every emitted triple exactly once
    total = sum(r["n_triples"] for r in rows)
    assert total == Q.q_kg_triples(spark, SF_DIR).count()


def test_script_mismatch_crafted(spark):
    docs = spark.createDataFrame(
        [
            (0, "hello world", "en", "s", 0),
            (1, "ni hao romanized text", "zh", "s", 0),
            (2, "你好世界", "zh", "s", 0),
            (3, "1234 ...!!!", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: docs if name == "documents" else orig(s, sf, name)
        rows = {(r["lang"], r["dominant_script"]): r
                for r in Q.q_doc_script_mismatch(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert rows[("en", "latin")]["mismatch"] is False
    assert rows[("zh", "latin")]["mismatch"] is True  # romanized zh flagged
    assert rows[("zh", "cjk")]["mismatch"] is False
    assert rows[("zh", "cjk")]["cjk_chars"] == 4
    assert rows[("en", "none")]["mismatch"] is True  # no letters at all


def test_dup_cluster_purity_consistency(spark):
    rows = Q.q_dup_cluster_purity(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_clusters"] >= 1
        assert r["n_docs"] >= 2 * r["n_clusters"]
        assert 0 <= r["n_multi_source"] <= r["n_clusters"]
        assert 0 <= r["n_multi_lang"] <= r["n_clusters"]
    # total clustered docs = map rows in clusters of size >= 2
    cmap = Q._doc_dedup_map_memo(spark, SF_DIR)
    sizes = cmap.groupBy("canonical_id").count().filter(F.col("count") >= 2)
    assert sum(r["n_docs"] for r in rows) == (
        sizes.agg(F.sum("count")).collect()[0][0] or 0
    )
