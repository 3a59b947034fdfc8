"""Round-4 batch-60: token length distribution and order-volume
autocorrelation."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_token_len_distribution(spark):
    rows = Q.q_token_len_distribution(spark, SF_DIR).collect()
    assert rows
    total_bp = sum(r["share_bp"] for r in rows)
    assert 9990 <= total_bp <= 10000
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]


def test_order_volume_autocorr_crafted(spark):
    # perfect 7-day cycle: counts repeat weekly -> lag-7 r == 1.0
    import datetime

    rows = []
    oid = 0
    base = datetime.date(2024, 1, 1)
    week = [5, 1, 1, 1, 1, 1, 3]
    for d in range(70):
        for _ in range(week[d % 7]):
            rows.append((oid, 0, "O", 1.0, str(base + datetime.timedelta(days=d)), "x"))
            oid += 1
    o = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    orig = Q._t
    try:
        Q._t = lambda s, sf, name: o if name == "orders" else orig(s, sf, name)
        out = {r["lag_days"]: r for r in Q.q_order_volume_autocorr(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out[7]["r"] == 1.0
    assert out[1]["r"] < 0.5  # the cycle is not smooth day-to-day
    assert out[7]["n_pairs"] == 63


def test_order_volume_autocorr_real(spark):
    rows = Q.q_order_volume_autocorr(spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["r"] is None or -1.0 <= r["r"] <= 1.0
        assert r["n_pairs"] >= 1
