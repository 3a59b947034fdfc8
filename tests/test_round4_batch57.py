"""Round-4 batch-57: gap survival curve, segment label transitions,
lang-ID margin profile."""

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_gap_survival_monotone(spark):
    rows = {r["threshold"]: r for r in Q.q_event_gap_survival(spark, SF_DIR).collect()}
    assert set(rows) == {"1m", "10m", "1h", "1d"}
    # survival is non-increasing in the threshold
    assert (
        rows["1m"]["n_exceed"]
        >= rows["10m"]["n_exceed"]
        >= rows["1h"]["n_exceed"]
        >= rows["1d"]["n_exceed"]
    )
    n_gaps = rows["1m"]["n_gaps"]
    assert all(r["n_gaps"] == n_gaps for r in rows.values())
    assert all(0 <= r["exceed_bp"] <= 10000 for r in rows.values())


def test_seg_label_transitions(spark):
    rows = Q.q_seg_label_transitions(spark, SF_DIR).collect()
    assert rows
    segs, _ = Q._kg_stack(spark, SF_DIR)
    n_segs = segs.count()
    n_convs = segs.select("conv_id").distinct().count()
    assert sum(r["n_pairs"] for r in rows) == n_segs - n_convs
    labels = {r["label"] for r in rows} | {r["prev_label"] for r in rows}
    assert labels <= {"H1", "P", "CODE"}


def test_lang_margin_profile(spark):
    rows = Q.q_lang_margin_profile(spark, SF_DIR).collect()
    n_docs = Q._t(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["margin_band"] for r in rows} <= {"0", "1-2", "3-5", "6+"}
    # en is the corpus head with strong stopword signal: some en docs
    # must clear the 6+ margin band
    assert any(r["lang"] == "en" and r["margin_band"] == "6+" for r in rows)
