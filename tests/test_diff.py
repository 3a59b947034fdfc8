"""Snapshot diff: added/removed/changed classification, null-safety,
and the exhaustive unchanged-absence property."""

from __future__ import annotations

from docs2kg_spark.operators.diff import diff_counts, table_diff


def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, v string, w int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10),        # unchanged → absent
         (2, "B", 20),        # changed (v)
         (4, None, 40),       # unchanged with NULL = NULL → absent
         (5, "e", 50)],       # added
        "k int, v string, w int",
    )
    got = {r.k: r.change for r in table_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_table_diff_null_vs_value_is_change(spark):
    old = spark.createDataFrame([(1, None)], "k int, v string")
    new = spark.createDataFrame([(1, "x")], "k int, v string")
    assert [r.change for r in table_diff(old, new, ["k"]).collect()] == ["changed"]


def test_diff_counts_summary(spark):
    old = spark.createDataFrame([(i, i % 3) for i in range(30)], "k int, v int")
    new = spark.createDataFrame(
        [(i, (i % 3) + (1 if i % 5 == 0 else 0)) for i in range(1, 33)],
        "k int, v int",
    )
    got = {r.change: r.n for r in diff_counts(old, new, ["k"]).collect()}
    # removed: k=0; added: 30,31,32 minus... k ranges 1..32 → added {30,31,32}
    assert got["removed"] == 1 and got["added"] == 3
    # changed: k in 1..29 with k%5==0 → {5,10,15,20,25}
    assert got["changed"] == 5


def test_compare_cols_subset(spark):
    old = spark.createDataFrame([(1, "a", "x")], "k int, v string, noise string")
    new = spark.createDataFrame([(1, "a", "y")], "k int, v string, noise string")
    # noise excluded → unchanged
    assert table_diff(old, new, ["k"], compare_cols=["v"]).count() == 0
    # noise included → changed
    assert table_diff(old, new, ["k"]).count() == 1
