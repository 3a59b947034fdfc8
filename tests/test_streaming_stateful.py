"""Stateful structured-streaming operators (§2.9): cross-batch session
state via applyInPandasWithState and watermarked windowed aggregation
with late-data drop — both checked against their batch twins."""

import pandas as pd
import pytest

from docs2kg_spark.streaming.stateful import (
    streaming_sessionize,
    streaming_windowed_rollup,
)

EVENT_SCHEMA = "user_id long, event_id long, ts timestamp"


def _events_pdf():
    """3 users; user 1 has a session spanning the T-split (events at
    09:58 and 10:05, gap 7 min < 60), so cross-batch state is exercised;
    user 2 has a >gap break inside half two."""
    rows = [
        (1, 100, "2025-03-01 09:00:00"),
        (1, 101, "2025-03-01 09:30:00"),
        (1, 102, "2025-03-01 09:58:00"),
        (2, 200, "2025-03-01 09:10:00"),
        (3, 300, "2025-03-01 09:55:00"),
        # ---- second half (ts >= 10:00) ----
        (1, 103, "2025-03-01 10:05:00"),
        (1, 104, "2025-03-01 12:00:00"),
        (2, 201, "2025-03-01 10:20:00"),
        (2, 202, "2025-03-01 13:00:00"),
        (3, 301, "2025-03-01 10:40:00"),
    ]
    return pd.DataFrame(rows, columns=["user_id", "event_id", "ts"]).assign(
        ts=lambda d: pd.to_datetime(d["ts"])
    )


def _batch_sessions(spark, pdf):
    from docs2kg_spark.operators.asof import sessionize

    df = spark.createDataFrame(pdf, EVENT_SCHEMA)
    return {
        (r.user_id, r.event_id, r.session_idx)
        for r in sessionize(df, key="user_id", ts="ts", gap_minutes=60.0).collect()
    }


def _drain_sessionize(spark, in_dir, out_dir, ckpt):
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        streaming_sessionize(stream, gap_minutes=60.0)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_sessionize_matches_batch_single_drain(spark, tmp_path):
    pdf = _events_pdf()
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(pdf, EVENT_SCHEMA).write.parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, ckpt)
    got = {
        (r.user_id, r.event_id, r.session_idx)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == _batch_sessions(spark, pdf)


def test_streaming_sessionize_state_survives_across_batches(spark, tmp_path):
    """Split the stream at 10:00 into two sequential availableNow drains
    sharing one checkpoint: user 1's 09:58 → 10:05 events are 7 minutes
    apart across the split, so they must land in the SAME session —
    provable only if per-key state persisted in the state store."""
    pdf = _events_pdf()
    cut = pd.Timestamp("2025-03-01 10:00:00")
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    spark.createDataFrame(pdf[pdf.ts < cut], EVENT_SCHEMA).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, ckpt)
    spark.createDataFrame(pdf[pdf.ts >= cut], EVENT_SCHEMA).write.mode("append").parquet(in_dir)
    _drain_sessionize(spark, in_dir, out_dir, ckpt)

    got = {
        (r.user_id, r.event_id, r.session_idx)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = _batch_sessions(spark, pdf)
    assert got == want
    # the load-bearing pair: events 102 (batch 1) and 103 (batch 2)
    sess = {e: s for u, e, s in got if u == 1}
    assert sess[102] == sess[103]
    # and user 1's 12:00 event broke into a new session
    assert sess[104] == sess[103] + 1


def test_streaming_windowed_rollup_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = [
        ("login", "2025-03-01 09:05:00"),
        ("login", "2025-03-01 09:45:00"),
        ("purchase", "2025-03-01 09:50:00"),
        ("login", "2025-03-01 10:10:00"),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    in_dir = str(tmp_path / "in")
    df.write.parquet(in_dir)
    stream = spark.readStream.schema("event_type string, ts timestamp").parquet(in_dir)
    q = (
        streaming_windowed_rollup(stream)
        .writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r.window_start), r.event_type, r.n)
        for r in spark.sql("SELECT * FROM rollup_complete").collect()
    }
    want = {
        (str(r.window_start), r.event_type, r.n)
        for r in df.groupBy(
            F.window("ts", "1 hour")["start"].alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want and len(want) == 3


def test_streaming_windowed_rollup_drops_late_rows(spark, tmp_path):
    """Batch 1 advances the watermark to 10:50; batch 2 delivers a 09:00
    straggler (window end 10:00 < watermark → dropped) and a 10:55 row
    (window [10:00,11:00) still open → counted).  Emitted updates from
    batch 2 must contain the open window and not the expired one."""
    from pyspark.sql import functions as F

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out: dict[int, list] = {}

    def run_once(tag_dir):
        stream = spark.readStream.schema("event_type string, ts timestamp").parquet(in_dir)
        rollup = streaming_windowed_rollup(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(tag_dir)

        q = (
            rollup.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def write_rows(rows):
        spark.createDataFrame(rows, "event_type string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).write.mode("append").parquet(in_dir)

    write_rows([("login", "2025-03-01 10:30:00"), ("login", "2025-03-01 11:00:00")])
    out1 = str(tmp_path / "out1")
    run_once(out1)

    write_rows([("login", "2025-03-01 09:00:00"), ("login", "2025-03-01 10:55:00")])
    out2 = str(tmp_path / "out2")
    run_once(out2)

    updates2 = {(str(r.window_start), r.n) for r in spark.read.parquet(out2).collect()}
    # the straggler's 09:00 window never appears; the 10:00 window was
    # re-emitted with the 10:55 row folded in (10:30 + 10:55 → n=2)
    assert not any(w.endswith("09:00:00") for w, _ in updates2)
    assert ("2025-03-01 10:00:00", 2) in updates2


def _drain_dedup(spark, in_dir, out_dir, ckpt):
    from docs2kg_spark.streaming.stateful import streaming_dedup

    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(in_dir)
    q = (
        streaming_dedup(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_redelivery_within_watermark(spark, tmp_path):
    """A re-delivered event (same event_id, a later micro-batch, inside
    the watermark horizon) must be emitted exactly once; genuinely new
    events pass.  Output equals the batch distinct-on-key twin."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    b1 = pd.DataFrame(
        [(1, 100, "2025-03-01 09:00:00"), (2, 200, "2025-03-01 09:01:00")],
        columns=["user_id", "event_id", "ts"],
    ).assign(ts=lambda d: pd.to_datetime(d["ts"]))
    # batch 2 re-delivers event 100 (dup) alongside a new event 300
    b2 = pd.DataFrame(
        [(1, 100, "2025-03-01 09:00:00"), (3, 300, "2025-03-01 09:05:00")],
        columns=["user_id", "event_id", "ts"],
    ).assign(ts=lambda d: pd.to_datetime(d["ts"]))

    spark.createDataFrame(b1, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _drain_dedup(spark, in_dir, out_dir, ckpt)
    spark.createDataFrame(b2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    _drain_dedup(spark, in_dir, out_dir, ckpt)

    got = {(r.user_id, r.event_id) for r in spark.read.parquet(out_dir).collect()}
    assert got == {(1, 100), (2, 200), (3, 300)}
    # exactly-once: no key appears twice
    n = spark.read.parquet(out_dir).count()
    assert n == 3
