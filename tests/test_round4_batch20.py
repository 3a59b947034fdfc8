"""Round-4 batch-20: Bloom membership sketch, RFM bands, value
histogram, per-customer ranking windows.  Twin parity is covered by
the gate; these pin semantics on crafted inputs."""

import hashlib
from datetime import datetime

import pytest

import docs2kg_spark.queries as Q
from docs2kg_spark.queries import _BLOOM_K, _BLOOM_M

SF_DIR = "/root/testdata/sf0.001"


def _patch_events(df):
    orig = Q._t
    Q._t = lambda spark, sf_dir, name: df if name == "events" else orig(spark, sf_dir, name)
    return orig


def _bloom_bits(uid):
    return {
        int(hashlib.md5(f"bloom-v1|{j}|{uid}".encode()).hexdigest()[:8], 16) % _BLOOM_M
        for j in range(_BLOOM_K)
    }


def test_bloom_no_false_negatives_and_exact_counts(spark):
    """Every member is flagged (Bloom guarantees no false negatives);
    counts recompute exactly from the md5 bit positions in Python."""
    rows = []
    eid = 0
    for uid in range(1, 41):
        t = "purchase" if uid <= 10 else "view"
        rows.append((eid, datetime(2025, 3, 1, 10), uid, t, 1.0, "{}"))
        eid += 1
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = _patch_events(e)
    try:
        r = Q.q_bloom_membership(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    bits = set().union(*(_bloom_bits(u) for u in range(1, 11)))
    flagged = [u for u in range(1, 41) if _bloom_bits(u) <= bits]
    assert r["n_users"] == 40 and r["n_members"] == 10
    assert r["n_bits_set"] == len(bits)
    assert r["n_flagged"] == len(flagged)
    assert r["n_false_pos"] == r["n_flagged"] - r["n_members"]
    assert r["n_flagged"] >= r["n_members"]  # no false negatives


def test_rfm_band_boundaries(spark):
    """Users planted exactly on the band cutoffs land where the
    CASE arms say."""
    rows = []
    eid = 0
    # user 1: last event on the corpus max date (rdays 0 -> hot), 1 event, small
    # user 2: 1 day stale (warm); user 3: 5 days stale (cold)
    for uid, day in ((1, 10), (2, 9), (3, 5)):
        rows.append((eid, datetime(2025, 3, day, 12), uid, "view", 100.0, "{}"))
        eid += 1
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = _patch_events(e)
    try:
        out = Q.q_user_rfm_bands(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    cells = {(r["r_band"], r["f_band"], r["m_band"]): r["n_users"] for r in out}
    assert cells == {
        ("hot", "low", "small"): 1,
        ("warm", "low", "small"): 1,
        ("cold", "low", "small"): 1,
    }
    assert all(r["total_cents"] == 10000 for r in out)


def test_value_histogram_buckets_and_open_top(spark):
    """Boundary values: 49.99 -> bucket 0, 50.0 -> bucket 1,
    777.0 -> clamped to bucket 9; cents sums exact."""
    rows = [
        (0, datetime(2025, 3, 1), 1, "x", 49.99, "{}"),
        (1, datetime(2025, 3, 1), 1, "x", 50.0, "{}"),
        (2, datetime(2025, 3, 1), 1, "x", 777.0, "{}"),
    ]
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig = _patch_events(e)
    try:
        out = {r["bucket"]: r for r in Q.q_event_value_histogram(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert set(out) == {0, 1, 9}
    assert out[0]["total_cents"] == 4999
    assert out[1]["total_cents"] == 5000
    assert out[9]["total_cents"] == 77700


def test_order_windows_internal_consistency(spark):
    """rank/dense_rank/percent_rank/cume_dist/ntile agree with their
    definitions within every customer partition."""
    rows = Q.q_order_value_windows(spark, SF_DIR).collect()
    assert rows
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["o_custkey"], []).append(r)
    for rs in per_cust.values():
        rs.sort(key=lambda r: (-r["o_totalprice"], r["o_orderkey"]))
        n = len(rs)
        for i, r in enumerate(rs):
            assert r["rnk"] == i + 1  # tie-broken order => rank == row position
            assert r["prank"] == pytest.approx(i / (n - 1) if n > 1 else 0.0, abs=1e-6)
            assert r["cdist"] == pytest.approx((i + 1) / n, abs=1e-6)
            assert 1 <= r["quartile"] <= min(4, n)
        assert [r["drnk"] for r in rs] == [r["rnk"] for r in rs]  # distinct keys
