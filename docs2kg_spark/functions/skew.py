"""Explicit skew handling: key salting for hot-key joins/aggregations
(BASELINE.json::north_rule — "partitioning / shuffle / skew handled
explicitly"; AQE skew-join stays on as the runtime backstop, see
session.py).

Pattern: salt the *build/heavy* side by spreading each hot key over S
buckets; explode the *probe/small* side over all S buckets so every
salted partition finds its match.  Used where a known-hot key (one
entity surface in millions of segments, one very long conversation)
would overwhelm a single reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_heavy_side(df: DataFrame, key: str, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """deterministic per-row salt in [0, n_salts): spreads a hot key's
    rows over n_salts reducers.  Salt derives from a row hash, not
    rand(), so reruns are stable (resume/idempotence)."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast("int")
    )


def explode_probe_side(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """replicate each probe row once per salt bucket."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    heavy: DataFrame, light: DataFrame, on: list[str], n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """equi-join on `on` with the heavy side salted: shuffle key becomes
    (on..., _salt), so one hot key spreads across n_salts reducers."""
    h = salt_heavy_side(heavy, on[0], n_salts)
    l = explode_probe_side(light, n_salts)
    return h.join(l, on=on + ["_salt"], how=how).drop("_salt")


def salted_count(df: DataFrame, key: str, n_salts: int = 8) -> DataFrame:
    """two-phase count for a skewed group-by key: partial count on
    (key, salt), final re-aggregate on key — the manual map-side-combine
    pattern for hot keys."""
    return (
        salt_heavy_side(df, key, n_salts)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("n"))
    )


def ensure_min_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the source partitioning is coarser
    than the cluster's parallelism.

    Compute-heavy (Arrow-UDF) stages must not inherit a tiny partition
    count from a small scan: locally a 5k-row parquet arrives as ONE
    split and serializes the whole stage onto one core (observed: the
    MinHash dedup ran every stage at (0+1)/1 tasks).  At 100 TB the scan
    splits by spark.sql.files.maxPartitionBytes and this is a no-op —
    the guard only widens plans that would otherwise under-use the
    cluster."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rk",
    n_parts: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY …)`` over an UNBOUNDED relation
    without the single-reducer global sort (round-4 verdict perf item
    2) — the general-ordering sibling of
    ``relations.number_by_sorted_rank`` (which needs a lexicographic
    string key; this takes any Column ordering, e.g. count DESC, tok).

    Two-phase: range-repartition on the sort key (partition i holds
    sort-order-contiguous rows, all before partition i+1), rank locally
    within each range partition (window partitioned by
    spark_partition_id — evaluated map-side, before the window's own
    exchange), then add per-partition prefix offsets.  The only
    un-partitioned window runs over the per-partition COUNT aggregate —
    ≤ ``n_parts`` rows, constant-bounded — broadcast back.  Range
    boundaries come from sampling, so partition SIZES vary run-to-run,
    but rank = offset + local rank is exact for any boundary placement;
    with a total-order key the output is deterministic.

    Cost: one range exchange (with its sampling pass) + one pid-keyed
    window exchange, vs the naive plan's everything-to-one-reducer sort
    that stops scaling at the first vocabulary-sized relation.
    """
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from pyspark.sql import Window

    ranged = df.repartitionByRange(n_parts, *order_by).withColumn(
        "_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_lrk", F.row_number().over(Window.partitionBy("_pid").orderBy(*order_by))
    )
    counts = local.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
    )
    return (
        local.join(F.broadcast(offsets.select("_pid", "_off")), on="_pid")
        .withColumn(out_col, (F.col("_off") + F.col("_lrk")).cast("bigint"))
        .drop("_pid", "_lrk", "_off")
    )
