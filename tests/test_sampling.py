"""Deterministic split / stratified sampling (operators/sampling.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from docs2kg_spark.operators.sampling import hash_split, stratified_sample


def _df(spark, n=2000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _py_bucket(key, salt):
    return hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:4]


def test_split_matches_python_reference_and_weights(spark):
    out = {r["doc_id"]: r["split"] for r in hash_split(_df(spark), "doc_id").collect()}
    counts = {}
    for i in range(2000):
        b = _py_bucket(i, "split-v1")
        expect = "train" if b < format(int(0.90 * 65536), "04x") else (
            "val" if b < format(int(0.95 * 65536), "04x") else "test"
        )
        assert out[i] == expect
        counts[expect] = counts.get(expect, 0) + 1
    # weights hold approximately
    assert counts["train"] == pytest.approx(1800, abs=120)
    assert counts["val"] == pytest.approx(100, abs=60)


def test_split_stable_under_repartition(spark):
    df = _df(spark)
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b


def test_split_salt_changes_assignment(spark):
    df = _df(spark, 500)
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", salt="v2").collect()}
    assert a != b


def test_split_degenerate_single_split(spark):
    rows = hash_split(_df(spark, 100), "doc_id", weights={"all": 1.0}).collect()
    assert {r["split"] for r in rows} == {"all"}


def test_stratified_downsamples_per_label(spark):
    df = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, "en").when(F.col("id") % 4 == 1, "de").otherwise("fr").alias("lang"),
    )
    kept = stratified_sample(df, "lang", {"en": 0.25, "de": 0.5}, default_fraction=1.0, id_col="doc_id")
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 2000  # default 1.0 keeps everything
    assert counts["en"] == pytest.approx(250, abs=60)
    assert counts["de"] == pytest.approx(500, abs=80)
    # determinism: same call → same set
    again = stratified_sample(df, "lang", {"en": 0.25, "de": 0.5}, default_fraction=1.0, id_col="doc_id")
    assert {r["doc_id"] for r in kept.collect()} == {r["doc_id"] for r in again.collect()}


def test_stratified_default_zero_drops_unlisted(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("xx").alias("lang")
    )
    assert stratified_sample(df, "lang", {"en": 1.0}, id_col="doc_id").count() == 0


def test_source_cap_exact_and_stable(spark):
    from docs2kg_spark.operators.sampling import source_cap

    rows = [(i, f"s{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    kept = source_cap(df, "source", "doc_id", cap=7).collect()
    by = {}
    for r in kept:
        by.setdefault(r.source, set()).add(r.doc_id)
    assert {k: len(v) for k, v in by.items()} == {"s0": 7, "s1": 7, "s2": 7}
    # content-keyed rank: identical set under any partitioning
    again = source_cap(df.repartition(11), "source", "doc_id", cap=7).collect()
    by2 = {}
    for r in again:
        by2.setdefault(r.source, set()).add(r.doc_id)
    assert by == by2


def test_source_cap_under_cap_groups_untouched(spark):
    from docs2kg_spark.operators.sampling import source_cap

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               "doc_id int, source string")
    assert source_cap(df, "source", "doc_id", cap=5).count() == 3


def test_leakfree_split_never_straddles_clusters(spark):
    """Split keyed on the dedup-cluster id: every near-dup cluster lands
    wholly in one split; the naive per-doc split demonstrably straddles
    on the same corpus (that's the leakage it exists to prevent)."""
    from docs2kg_spark.operators.dedup import doc_dedup_map
    from docs2kg_spark.operators.sampling import hash_split

    # 30 clusters of 4 identical docs each + unique fillers; each
    # cluster's vocabulary is disjoint (w{c}_{k}) so clusters are NOT
    # near-dups of each other, only within themselves
    rows = []
    for c in range(30):
        text = " ".join(f"w{c}x{k} tail{c}y{k}" for k in range(12))
        for j in range(4):
            rows.append((c * 10 + j, text))
    rows += [
        (9000 + i, " ".join(f"u{i}q{k} filler{i}z{k}" for k in range(12)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cmap = doc_dedup_map(df, spark)
    leakfree = hash_split(cmap, "canonical_id").select("doc_id", "split")
    joined = cmap.join(leakfree, on="doc_id")
    straddling = (
        joined.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert straddling == 0
    # sanity: the clusters really are multi-doc (the test isn't vacuous)
    multi = cmap.groupBy("canonical_id").count().filter(F.col("count") > 1).count()
    assert multi >= 30
    # and the naive per-doc split DOES straddle at least one cluster
    naive = hash_split(df, "doc_id").select("doc_id", "split")
    naive_straddle = (
        cmap.join(naive, on="doc_id")
        .groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert naive_straddle > 0
