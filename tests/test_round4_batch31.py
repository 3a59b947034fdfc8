"""Round-4 batch-31: HHI concentration, weekday profile, label
position.  Twin parity is covered by the gate; these pin semantics."""

from datetime import date

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_hhi_monopoly_and_duopoly(spark):
    """One brand fully owned by one supplier -> HHI = 10000² ;
    a perfect 50/50 duopoly -> 2·5000²."""
    li = spark.createDataFrame(
        [
            (1, 10, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", date(2025, 1, 1)),
            (2, 20, 2, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", date(2025, 1, 1)),
            (3, 20, 3, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", date(2025, 1, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate date",
    )
    p = spark.createDataFrame(
        [(10, "a", "MONO", "t", 1, 1.0), (20, "b", "DUO", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: {"lineitem": li, "part": p}.get(name) or orig(s, sf, name)
        out = {r["p_brand"]: r for r in Q.q_brand_concentration_hhi(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out["MONO"]["hhi_bp2"] == 10000 * 10000 and out["MONO"]["n_suppliers"] == 1
    assert out["DUO"]["hhi_bp2"] == 2 * 5000 * 5000 and out["DUO"]["n_suppliers"] == 2


def test_weekday_profile_dow_alignment(spark):
    """2025-03-02 is a Sunday -> dow 0; 2025-03-05 a Wednesday -> 3."""
    o = spark.createDataFrame(
        [
            (1, 1, "O", 10.0, date(2025, 3, 2), "P"),
            (2, 1, "O", 20.0, date(2025, 3, 5), "P"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: o if name == "orders" else orig(s, sf, name)
        out = {r["dow"]: r for r in Q.q_weekday_order_profile(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert set(out) == {0, 3}
    assert out[0]["total_cents"] == 1000 and out[3]["total_cents"] == 2000


def test_label_position_bounds(spark):
    rows = Q.q_label_position_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_segments"] >= 1
        assert 0 <= r["med_pos"] <= r["p90_pos"]
