"""Round-4 batch-27: dedup funnel, event trigrams, order gaps,
shingle DF profile.  Twin parity is covered by the gate; these pin
semantics."""

from datetime import datetime

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_dedup_funnel_is_monotone(spark):
    rows = {r["stage"]: r["n_docs"] for r in Q.q_dedup_funnel(spark, SF_DIR).collect()}
    assert set(rows) == {"1_raw", "2_exact_dedup", "3_near_dedup", "4_quality_gate"}
    assert rows["1_raw"] >= rows["2_exact_dedup"] >= rows["3_near_dedup"] >= rows["4_quality_gate"]
    assert rows["1_raw"] == Q._t(spark, SF_DIR, "documents").count()


def test_event_trigrams_crafted_path(spark):
    """One user, stream a>b>c>a>b>c: trigrams abc(2), bca(1), cab(1)."""
    seq = ["a", "b", "c", "a", "b", "c"]
    rows = [
        (i, datetime(2025, 3, 1, 10, 0, i), 1, t, 0.0, "{}") for i, t in enumerate(seq)
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: e if name == "events" else orig(s, sf, name)
        got = {(r["t1"], r["t2"], r["t3"]): r["n"] for r in Q.q_event_trigrams(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert got == {("a", "b", "c"): 2, ("b", "c", "a"): 1, ("c", "a", "b"): 1}


def test_order_gap_stats_exact_interpolation(spark):
    """One customer with orders at days 0, 10, 40 -> gaps {10, 30},
    median 20."""
    from datetime import date, timedelta

    base = date(2025, 1, 1)
    o = spark.createDataFrame(
        [
            (k, 1, "O", 1.0, base + timedelta(days=d), "P")
            for k, d in ((1, 0), (2, 10), (3, 40))
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    c = spark.createDataFrame(
        [(1, "c", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: {"orders": o, "customer": c}.get(name) or orig(s, sf, name)
        r = Q.q_order_gap_stats(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    assert r["n_gaps"] == 2
    assert r["med_gap_d"] == pytest.approx(20.0)


def test_shingle_df_profile_mass(spark):
    """Bucket mins/maxes nest correctly and total shingle count equals
    the distinct-shingle universe."""
    rows = Q.q_shingle_df_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 2 ** r["bucket"] <= r["min_df"] <= r["max_df"] < 2 ** (r["bucket"] + 1)
    assert sum(r["n_shingles"] for r in rows) > 0
