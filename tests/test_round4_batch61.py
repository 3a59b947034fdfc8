"""Round-4 batch-61: mention span profile and source gram novelty."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_mention_span_profile(spark):
    rows = Q.q_kg_mention_span_profile(spark, SF_DIR).collect()
    _, m = Q._kg_stack(spark, SF_DIR)
    assert sum(r["n_mentions"] for r in rows) == m.count()
    for r in rows:
        assert 1 <= r["min_len"] <= r["max_len"]
        assert r["sum_len"] >= r["n_mentions"] * r["min_len"]
    # gazetteer spans are bounded by the longest surface in the fixture
    gaz_max = max(
        r["max_len"] for r in rows if r["method"] == "gazetteer"
    )
    from docs2kg_spark.config import DEFAULT_GAZETTEER

    assert gaz_max <= max(len(s) for s, _ in DEFAULT_GAZETTEER) + 2


def test_source_gram_novelty(spark):
    rows = sorted(
        Q.q_source_gram_novelty(spark, SF_DIR).collect(), key=lambda r: r["source"]
    )
    assert rows
    # the name-order FIRST source owns every gram it has
    assert rows[0]["n_novel"] == rows[0]["n_grams"]
    assert rows[0]["novelty_bp"] == 10000
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]
    # total novel grams = total distinct grams in the corpus
    total_novel = sum(r["n_novel"] for r in rows)
    import pyspark.sql.functions as F

    d = Q._t(spark, SF_DIR, "documents")
    toks = d.select(F.split(F.lower(F.trim("text")), Q.WS_RE).alias("toks"))
    grams = (
        toks.select(
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - 8, F.lit(0)))
            ).alias("i"),
            "toks",
        )
        .select(F.concat_ws(" ", F.slice("toks", F.col("i") + 1, 8)).alias("g"))
        .filter(F.length("g") > 0)
        .distinct()
        .count()
    )
    assert total_novel == grams
