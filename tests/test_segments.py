from pyspark.sql import functions as F

from docs2kg_spark.fixtures import gen_transcripts
from docs2kg_spark.operators.segments import segment_transcripts, turn_order_invariant


def test_segment_parity_with_oracle(transcripts_df, oracle_result):
    got = {
        (r.conv_id, r.seg_id, r.seg_idx, r.turn_idx, r.label, r.text)
        for r in segment_transcripts(transcripts_df).collect()
    }
    want = {
        (s["conv_id"], s["seg_id"], s["seg_idx"], s["turn_idx"], s["label"], s["text"])
        for s in oracle_result["segments"]
    }
    assert got == want


def test_turn_order_invariant(spark, transcripts_df, fixture_rows):
    """per-turn text equality under stable turn ordering (input_hint)."""
    got = {r.conv_id: r.texts for r in turn_order_invariant(transcripts_df).collect()}
    want = {}
    for row in sorted(fixture_rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        want.setdefault(row["conv_id"], []).append(row["text"])
    assert got == want


def test_seg_idx_contiguous_per_conv(transcripts_df):
    segs = segment_transcripts(transcripts_df)
    bad = (
        segs.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.min("seg_idx").alias("lo"), F.max("seg_idx").alias("hi"))
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1))
        .count()
    )
    assert bad == 0


def test_empty_and_whitespace_turns_skipped(spark):
    rows = [
        ("c1", 0, "user", "hello.", None),
        ("c1", 1, "user", "", None),
        ("c1", 2, "user", " \t\n ", None),
        ("c1", 3, "user", "bye.", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string")
    got = segment_transcripts(df).orderBy("seg_idx").collect()
    assert [(r.seg_idx, r.turn_idx) for r in got] == [(0, 0), (1, 3)]


def test_bucketed_segmentation_identical(spark, transcripts_df):
    """segment_transcripts_bucketed == segment_transcripts exactly, even
    with a tiny bucket that forces multi-bucket conversations (the
    long-conversation skew path of BASELINE.json::north_rule)."""
    from docs2kg_spark.operators.segments import (
        segment_transcripts,
        segment_transcripts_bucketed,
    )

    plain = sorted(map(tuple, segment_transcripts(transcripts_df).collect()))
    for bucket in (7, 100_000):
        bucketed = sorted(
            map(tuple, segment_transcripts_bucketed(transcripts_df, bucket).collect())
        )
        assert bucketed == plain
