"""Round-4 batch-62: rolling 7-day HLL distinct users (windowed sketch
merge with exact truth beside it)."""

from pyspark.sql import functions as F

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_rolling_7d_hll_invariants(spark):
    rows = sorted(
        Q.q_rolling_7d_users_hll(spark, SF_DIR).collect(), key=lambda r: r["day"]
    )
    assert rows
    e = Q._t(spark, SF_DIR, "events")
    n_days = e.select(F.to_date("ts")).distinct().count()
    assert len(rows) == n_days
    for r in rows:
        assert 1 <= r["v_nonempty"] <= 64
        assert r["n_true"] >= 1
        assert r["est"] > 0
        # HLL at m=64 has ~13% relative sd; 40% is a generous sanity
        # ceiling that still catches merge bugs
        assert r["rel_err_bp"] <= 4000


def test_rolling_7d_truth_is_window_superset(spark):
    # trailing-7-day distinct >= single-day distinct for every day
    rows = {r["day"]: r["n_true"] for r in Q.q_rolling_7d_users_hll(spark, SF_DIR).collect()}
    e = Q._t(spark, SF_DIR, "events")
    daily = {
        r["d"]: r["n"]
        for r in e.select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for d, n in daily.items():
        assert rows[d] >= n
