"""Snapshot diff — classify rows between two versions of a keyed table
as added / removed / changed.  The change-data-capture derivation every
incremental pipeline needs: the output IS the source relation for a
MERGE/upsert into the next Iceberg/Delta snapshot, and the batch analog
of what streaming/incremental.py's delta appends consume.

Reference provenance: Docs2KG re-runs whole stages and overwrites
(io/sinks.py mirrors its output-dir overwrite semantics,
digitization/base.py); a diff is how a user of the rebuilt engine
upgrades that to incremental maintenance.

Scale shape: ONE full-outer equi-join on the key (the minimum possible
— change detection is by definition a co-grouping of both snapshots),
with change classification as a narrow projection: no second pass, no
row hashing UDF, no collect.  At 100 TB both snapshots bucket-write on
the key (io/bucketing.py) and the join is Exchange-free.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """→ key columns + `change` ∈ {'added', 'removed', 'changed'};
    unchanged rows are absent.  ``compare_cols`` defaults to every
    shared non-key column; comparison is null-safe (NULL = NULL is
    unchanged, NULL vs value is a change)."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in key_cols
        ]
    o = old.select(*key_cols, *compare_cols, F.lit(1).alias("_o"))
    n = new.select(
        *key_cols,
        *[F.col(c).alias("n_" + c) for c in compare_cols],
        F.lit(1).alias("_n"),
    )
    j = o.join(n, on=key_cols, how="full_outer")
    differs = (
        reduce(
            lambda a, b: a | b,
            [~F.col(c).eqNullSafe(F.col("n_" + c)) for c in compare_cols],
        )
        if compare_cols
        else F.lit(False)
    )
    change = (
        F.when(F.col("_o").isNull(), "added")
        .when(F.col("_n").isNull(), "removed")
        .when(differs, "changed")
    )
    return (
        j.select(*key_cols, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def diff_counts(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per change type with its count — the audit summary a
    nightly snapshot job logs before applying the merge."""
    return (
        table_diff(old, new, key_cols, compare_cols)
        .groupBy("change")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
