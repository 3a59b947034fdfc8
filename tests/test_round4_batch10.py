"""Round-4 batch-10: turn-level corpus dedup, winsorized robust stats,
SimHash threshold observability, packer fragmentation.  Value parity vs
the DuckDB twins is covered by the gate (tests/test_entry.py); these
pin semantics on crafted inputs and the one cross-engine seam
(interpolated percentiles)."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _with_docs(monkey_df, fn, spark):
    import docs2kg_spark.queries as Q

    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: (
            monkey_df if name == "documents" else orig(spark, sf_dir, name)
        )
        return fn(spark, SF_DIR).collect()
    finally:
        Q._t = orig


def test_turn_dedup_first_wins_semantics(spark):
    """Duplicate turn text across conversations: only the earliest
    (conv_id, turn_idx) occurrence survives."""
    import docs2kg_spark.queries as Q

    t = spark.createDataFrame(
        [
            ("conv-0001", 0, "user", "same text", None),
            ("conv-0001", 1, "user", "unique a", None),
            ("conv-0002", 0, "user", "same text", None),
            ("conv-0002", 1, "user", "same text", None),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    orig = Q.derive_transcripts
    try:
        Q.derive_transcripts = lambda spark, sf_dir: t
        rows = {r["conv_id"]: r for r in Q.q_turn_dedup(spark, SF_DIR).collect()}
    finally:
        Q.derive_transcripts = orig
    assert rows["conv-0001"]["n_kept"] == 2  # first 'same text' + 'unique a'
    assert rows["conv-0002"]["n_kept"] == 0
    assert rows["conv-0002"]["n_dropped"] == 2


def test_winsorize_percentile_parity_with_duckdb(spark):
    """The cross-engine seam: Spark's exact `percentile` and DuckDB's
    `quantile_cont` must produce bit-identical interpolated bounds on
    the same values (both use h = (n−1)·p linear interpolation)."""
    import duckdb

    vals = [float(v) for v in [1, 2, 3, 5, 8, 13, 21, 34, 55, 89]]
    s = (
        spark.createDataFrame([(v,) for v in vals], "value double")
        .agg(
            F.percentile("value", 0.01).alias("p01"),
            F.percentile("value", 0.99).alias("p99"),
        )
        .collect()[0]
    )
    d = duckdb.sql(
        "SELECT quantile_cont(v, 0.01) AS p01, quantile_cont(v, 0.99) AS p99 "
        f"FROM (SELECT CAST(unnest({vals}) AS DOUBLE) AS v)"
        # the DOUBLE cast matters: bare float literals parse as DECIMAL
        # in DuckDB and quantile_cont would interpolate at decimal scale
    ).fetchone()
    assert s["p01"] == d[0] and s["p99"] == d[1]


def test_winsorize_clips_tails(spark):
    from docs2kg_spark.queries import q_event_winsorize

    rows = q_event_winsorize(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p01"] <= r["p99"]
        # winsorized mean must land inside the clip bounds
        assert r["p01"] - 1e-6 <= r["mean_winsorized"] <= r["p99"] + 1e-6
        # at most ~1% of mass clipped per side (exact percentile bound)
        assert r["n_clipped_lo"] <= r["n"] * 0.011 + 1
        assert r["n_clipped_hi"] <= r["n"] * 0.011 + 1


def test_simhash_hist_sums_to_pair_count(spark):
    from docs2kg_spark.queries import q_doc_near_dup_simhash, q_simhash_hd_hist

    n_pairs = q_doc_near_dup_simhash(spark, SF_DIR).count()
    hist = q_simhash_hd_hist(spark, SF_DIR).collect()
    assert sum(r["n_pairs"] for r in hist) == n_pairs
    assert all(0 <= r["hamming"] <= 3 for r in hist)


def test_packing_splits_invariants(spark):
    """Per shard: chunk count covers the token mass (n_chunks =
    ceil(tokens/512) when the packer is gapless) and split docs are a
    subset of all docs."""
    from docs2kg_spark.queries import q_packing_splits

    rows = q_packing_splits(spark, SF_DIR).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0 <= r["n_split"] <= r["n_docs"]
        assert r["n_chunks"] == -(-r["n_tokens"] // 512)  # gapless concat
        assert r["split_ratio"] == pytest.approx(r["n_split"] / r["n_docs"], abs=1e-6)
