"""Deterministic mergeable sketches: count-min frequency and HyperLogLog
cardinality.  Pins the guarantees (CMS: est ≥ true; HLL: bounded
relative error + LinearCounting small-range) and the MERGE laws — the
property that makes a sketch worth having on a fleet."""

from __future__ import annotations

from pyspark.sql import functions as F

from docs2kg_spark.operators.sketches import cms_build, cms_estimate, hll_distinct


def _true_counts(df):
    return {
        r.k: r.c
        for r in df.select(F.col("k").cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
        .collect()
    }


def test_cms_never_underestimates(spark):
    rows = [(i % 97,) for i in range(3000)] + [(1000 + i,) for i in range(200)]
    df = spark.createDataFrame(rows, "k long")
    cms = cms_build(df, "k")
    est = {r.k: r.est for r in cms_estimate(cms, df, "k").collect()}
    true = _true_counts(df)
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # 297 keys into 256 buckets (load > 1): per-seed collisions are
    # certain, but 4 independent seeds make all-4-collide rare — the
    # min over seeds keeps a solid majority exact
    exact = sum(1 for k in true if est[k] == true[k])
    assert exact / len(true) > 0.6


def test_cms_merges_cellwise(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(500)], "k long")
    b = spark.createDataFrame([(i % 11,) for i in range(300)], "k long")
    merged = (
        cms_build(a, "k")
        .unionByName(cms_build(b, "k"))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    direct = cms_build(a.unionByName(b), "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hll_accuracy_and_linear_counting(spark):
    # small set → LinearCounting branch, tight estimate
    small = spark.createDataFrame([(i,) for i in range(20)], "k long")
    r = hll_distinct(small, "k", include_true=True).collect()[0]
    assert r.n_true == 20
    assert abs(r.est - 20) / 20 < 0.35
    # larger set → raw HLL branch; 1/sqrt(64) ≈ 13% expected error
    big = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    r2 = hll_distinct(big, "k", include_true=True).collect()[0]
    assert r2.n_true == 5000
    assert abs(r2.est - 5000) / 5000 < 0.4
    assert r2.est == r2.raw_est  # correction must NOT fire up here


def test_hll_duplicates_do_not_move_the_estimate(spark):
    once = spark.createDataFrame([(i,) for i in range(300)], "k long")
    tenx = spark.createDataFrame([(i % 300,) for i in range(3000)], "k long")
    a = hll_distinct(once, "k").collect()[0]
    b = hll_distinct(tenx, "k").collect()[0]
    assert (a.v_nonempty, a.raw_est, a.est) == (b.v_nonempty, b.raw_est, b.est)
