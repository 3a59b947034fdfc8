"""Bucketed (pre-partitioned) tables — co-located joins and aggregates.

At 100 TB the dominant cost of the KG pipeline's repeated equi-joins
(mention → segment, edge-endpoint resolution, near-dup pair joins) is
the shuffle.  Bucketing pays that shuffle ONCE at ingest: a table
written with ``bucketBy(n, key)`` is physically split into n files per
partition by ``hash(key) % n``, and Spark's scan reports the bucket
spec as its output partitioning, so

- a join of two tables bucketed on their join keys with the same bucket
  count needs NO Exchange on either side (SortMergeJoin reads matching
  buckets pairwise), and
- an aggregate keyed on the bucket column needs NO Exchange either.

This is the multi-executor-cluster strategy the single-box bench can't
show as a throughput win (everything is one machine's memory bus) but
CAN show as a plan shape: tests/test_bucketing.py asserts the
Exchange-free plans.

Caveats that matter in production (encoded in the helper):
- both sides must agree on bucket count (or be multiples, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``sortBy`` within buckets lets SortMergeJoin skip its Sort;
- bucketed tables go through the catalog (``saveAsTable``) — a plain
  ``parquet(path)`` write silently drops the bucket spec; this helper
  refuses path-only writes for that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and by default
    bucket-sorted) on ``key`` — the pay-the-shuffle-once ingest step.
    Joins and aggregates keyed on ``key`` against other ``n_buckets``
    tables are then Exchange-free."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode(mode).format("parquet").saveAsTable(table)
