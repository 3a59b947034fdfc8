from docs2kg_spark.operators.mentions import extract_mentions
from docs2kg_spark.operators.segments import segment_transcripts


def _mention_key(r):
    return (r.seg_id, r.start, r.end, r.text, r.label, r.confidence, r.method)


def test_mention_parity_with_oracle(spark, transcripts_df, oracle_result):
    segs = segment_transcripts(transcripts_df)
    got = {_mention_key(r) for r in extract_mentions(segs, spark).collect()}
    want = {
        (m["seg_id"], m["start"], m["end"], m["text"], m["label"], m["confidence"], m["method"])
        for m in oracle_result["mentions"]
    }
    assert got == want


def test_edge_case_texts(spark):
    """Edge cases from FIXTURES.md F1, run through the full Spark path and
    compared to the oracle per text."""
    from docs2kg_spark.oracle.reference import extract_segment_mentions

    texts = [
        "alice: hello",              # entity at 0
        "report to alice",           # entity at end, preceded by alpha → llm only
        "sparkling water!",          # substring trap
        "mercury!",                  # two labels same surface
        "- acme  corp -",            # 0.9 confidence (whitespace)
        "alice.  bob. alice again.", # drift + repeats
        "ALICE, BOB, and others.",   # case mangling + boundary mix
        "acme, inc. filed: QZ-42.",  # comma entity + project code
        "bank of lima: open in lima.",  # 3-token entity overlapping shorter entity
    ]
    rows = [("c", i, "user", t, None) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    segs = segment_transcripts(df)
    seg_rows = {r.seg_id: r.text for r in segs.collect()}
    got = {}
    for r in extract_mentions(segs, spark).collect():
        got.setdefault(r.seg_id, set()).add((r.start, r.end, r.text, r.label, r.confidence, r.method))
    for seg_id, text in seg_rows.items():
        want = {
            (m.start, m.end, m.text, m.label, m.confidence, m.method)
            for m in extract_segment_mentions(text)
        }
        assert got.get(seg_id, set()) == want, f"mismatch for text: {text!r}"
