"""Round-4 batch-21: purchase attribution, shipping-delay percentiles,
data-quality audit, basket pair mining.  Twin parity is covered by the
gate; these pin semantics on crafted inputs."""

from datetime import datetime

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _patch_events(df):
    orig = Q._t
    Q._t = lambda spark, sf_dir, name: df if name == "events" else orig(spark, sf_dir, name)
    return orig


def test_purchase_attribution_buckets(spark):
    """Crafted stream: purchases at 30s / 2h after a view, one with no
    prior view at all, and a view AFTER a purchase that must not
    attribute backwards."""
    rows = [
        # user 1: view at 10:00:00, purchase 30s later -> lt_1m
        (0, datetime(2025, 3, 1, 10, 0, 0), 1, "view", 1.0, "{}"),
        (1, datetime(2025, 3, 1, 10, 0, 30), 1, "purchase", 1.0, "{}"),
        # user 2: view at 08:00, purchase 2h later -> lt_1d
        (2, datetime(2025, 3, 1, 8, 0, 0), 2, "view", 1.0, "{}"),
        (3, datetime(2025, 3, 1, 10, 0, 0), 2, "purchase", 1.0, "{}"),
        # user 3: purchase first (none), view only afterwards
        (4, datetime(2025, 3, 1, 9, 0, 0), 3, "purchase", 1.0, "{}"),
        (5, datetime(2025, 3, 1, 9, 5, 0), 3, "view", 1.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = _patch_events(e)
    try:
        out = {r["latency_bucket"]: r["n_purchases"]
               for r in Q.q_purchase_attribution(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out == {"lt_1m": 1, "lt_1d": 1, "none": 1}


def test_shipping_delay_percentile_interpolation(spark):
    """percentile() interpolates: delays {0,10} -> p50 = 5.0 exactly."""
    o = spark.createDataFrame(
        [(1, 10, "O", 1.0, datetime(2025, 1, 1).date(), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2025, 1, 1).date()),
            (1, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", datetime(2025, 1, 11).date()),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date",
    )
    orig = Q._t

    def t(spark_, sf_dir, name):
        return {"orders": o, "lineitem": li}.get(name) or orig(spark_, sf_dir, name)

    try:
        Q._t = t
        r = Q.q_shipping_delay_stats(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert (r["min_d"], r["max_d"]) == (0, 10)
    assert r["p50"] == pytest.approx(5.0)
    assert r["p90"] == pytest.approx(9.0)


def test_dq_audit_detects_planted_violations(spark):
    """Planted orphans and out-of-range rows are counted exactly."""
    c = spark.createDataFrame(
        [(10, "c", 1, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    o = spark.createDataFrame(
        [
            (1, 10, "O", 1.0, datetime(2025, 1, 1).date(), "P"),
            (2, 99, "O", 1.0, datetime(2025, 1, 1).date(), "P"),  # orphan custkey
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 60.0, 1.0, 0.0, 0.0, "N", "O", datetime(2025, 1, 2).date()),   # bad qty
            (1, 2, 1, 2, 5.0, 1.0, 0.5, 0.0, "N", "O", datetime(2025, 1, 2).date()),    # bad discount
            (7, 3, 1, 1, 5.0, 1.0, 0.0, 0.0, "N", "O", datetime(2025, 1, 2).date()),    # orphan orderkey
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date",
    )
    orig = Q._t

    def t(spark_, sf_dir, name):
        return {"orders": o, "lineitem": li, "customer": c}.get(name) or orig(spark_, sf_dir, name)

    try:
        Q._t = t
        r = Q.q_dq_audit(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r.asDict() == {
        "n_lineitem": 3, "n_orders": 2, "n_li_orphans": 1, "n_order_orphans": 1,
        "n_null_custkey": 0, "n_bad_qty": 1, "n_bad_discount": 1,
    }


def test_basket_pairs_distinct_parts_per_order(spark):
    """A part appearing on two lines of one order still counts once;
    output rows come ordered by count then keys."""
    rows = Q.q_part_basket_pairs(spark, SF_DIR).collect()
    assert rows and len(rows) <= 20
    keys = [(-r["n_orders"], r["part_a"], r["part_b"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["part_a"] < r["part_b"] and r["n_orders"] >= 1
