"""Round-4 batch-8 queries (remaining TPC-H shapes + KG profile reads):
plan-shape assertions and engine-parity probes.  Value correctness vs
the DuckDB twins is covered by the gate (tests/test_entry.py); these
pin the physical plans the docstrings promise and the one float-ish
seam (floor(log2) bucketing)."""

import math

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_disjunctive_revenue_broadcasts_prefiltered_part(spark):
    """Q19 shape: the part dimension must ride a BroadcastHashJoin and
    carry the OR-envelope filter BEFORE the join (the build side is
    candidate parts only, not the whole dimension)."""
    from docs2kg_spark.queries import q_disjunctive_revenue

    plan = _plan(q_disjunctive_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the part-side scan is filtered on brand/size, so the pushed-filter
    # list on the part file scan mentions p_size
    assert "p_size" in plan and "p_brand" in plan


def test_blocking_suppliers_no_cartesian_no_subquery_replay(spark):
    """Q21 shape: the double correlation collapses to aggregates — the
    plan must contain no CartesianProduct and scan lineitem exactly
    once (pairs feed both the per-order stats and the guilty side via
    reuse, never a re-read per EXISTS)."""
    from docs2kg_spark.queries import q_blocking_suppliers

    plan = _plan(q_blocking_suppliers(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") <= 2  # pairs subtree reused or rebuilt once


def test_part_value_share_single_fact_scan(spark):
    """Q11 shape: the lazy localCheckpoint means the global-scalar side
    and the filter side consume ONE materialized agg — the executed
    plan of the final query contains no second lineitem scan."""
    from docs2kg_spark.queries import q_part_value_share

    df = q_part_value_share(spark, SF_DIR)
    n = df.count()
    assert n > 0
    assert "lineitem.parquet" not in _plan(df)  # both sides read the checkpoint


def test_excess_shippers_window_not_second_scan(spark):
    """Q20 shape: the per-part total is a Window over the reduced
    (part, supplier) agg — not a second aggregate joined back."""
    from docs2kg_spark.queries import q_excess_shippers

    plan = _plan(q_excess_shippers(spark, SF_DIR))
    assert "Window" in plan
    assert plan.count("lineitem.parquet") == 1


def test_floor_log2_bucket_engine_stable(spark):
    """The degree-histogram bucket floor(log2(n)) must equal Python's
    for every plausible degree, including the exact powers of two where
    a 1-ulp-low log2 would shift the bucket."""
    n = 4100
    df = spark.range(1, n).select(
        F.col("id"), F.floor(F.log2("id")).cast("bigint").alias("b")
    )
    got = {r.id: r.b for r in df.collect()}
    for x in range(1, n):
        assert got[x] == math.floor(math.log2(x)), x


def test_conv_density_zero_mention_convs_survive(spark):
    """Conversations whose kept segments produce no mentions must
    appear with exact-0 counts (left-join semantics), and every conv
    with segments appears exactly once."""
    from docs2kg_spark.queries import q_kg_conv_density, q_kg_segments

    segs_convs = {
        r.conv_id for r in q_kg_segments(spark, SF_DIR).select("conv_id").distinct().collect()
    }
    rows = q_kg_conv_density(spark, SF_DIR).collect()
    assert {r.conv_id for r in rows} == segs_convs
    assert len(rows) == len(segs_convs)
    for r in rows:
        assert r.n_segments >= 1
        assert r.n_mentions >= 0 and r.n_triples >= 0 and r.n_entities >= 0
        assert r.n_entities <= r.n_mentions or r.n_mentions == 0


def test_entity_aliases_fold_detected(spark):
    """The seeded fixture contains at least one entity with two surface
    forms that the LSH linker folds ('acme corp' / 'acme corporation'),
    so the alias profile must show n_surfaces >= 2 somewhere, and every
    row must satisfy n_surfaces <= n_mentions."""
    from docs2kg_spark.queries import q_kg_entity_aliases

    rows = q_kg_entity_aliases(spark, SF_DIR).collect()
    assert rows
    assert any(r.n_surfaces >= 2 for r in rows)
    for r in rows:
        assert 1 <= r.n_surfaces <= r.n_mentions
        assert r.first_alias


def test_forecast_revenue_predicate_reaches_scan(spark):
    """Q6 shape: the entire filter (date band, discount band, quantity
    cap) must appear as PushedFilters on the lineitem parquet scan —
    the query's whole point is that no row survives past the scan
    unnecessarily."""
    from docs2kg_spark.queries import q_forecast_revenue

    plan = _plan(q_forecast_revenue(spark, SF_DIR))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed, plan
    joined = " ".join(pushed)
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in joined, (col, joined)
