"""Round-4 batch-33: threshold sweep, outlier profile, KG yield
correlation.  Twin parity is covered by the gate; these pin
semantics."""

import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_threshold_sweep_monotone(spark):
    """Raising the cutoff can only shrink both admitted sets."""
    rows = sorted(Q.q_dedup_threshold_sweep(spark, SF_DIR).collect(),
                  key=lambda r: r["t_pct"])
    assert [r["t_pct"] for r in rows] == [30, 40, 50, 60, 70]
    for lo, hi in zip(rows, rows[1:]):
        assert lo["n_true"] >= hi["n_true"]
        assert lo["n_est"] >= hi["n_est"]


def test_outlier_profile_fence(spark):
    rows = Q.q_event_outlier_profile(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["q1"] <= r["q3"]
        assert 0 <= r["n_outliers"] < r["n"]


def test_yield_corr_in_range_and_positive(spark):
    """More segments should mean more triples on the synthetic corpus
    (positive association), and |r| <= 1."""
    r = Q.q_kg_yield_corr(spark, SF_DIR).collect()[0]
    assert r["n"] >= 2
    if r["pearson"] is not None:
        assert -1.0 <= r["pearson"] <= 1.0
        assert r["pearson"] > 0
