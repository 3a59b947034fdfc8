"""Incremental streaming dedup (streaming/dedup.py): cross-batch
first-seen-wins, batch-operator parity, and replay idempotence."""

import os

import pytest

from docs2kg_spark.io.sinks import TableStore
from docs2kg_spark.streaming.dedup import incremental_dedup


def _write_wave(spark, input_dir, rows, name):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("append").parquet(input_dir)


def _drain(spark, input_dir, out_dir, ckpt):
    q = incremental_dedup(spark, input_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)


WAVE1 = [
    (0, "alpha beta gamma", "en", "s", 16),
    (1, "delta epsilon", "en", "s", 13),
    (2, "ALPHA   beta GAMMA", "en", "s", 18),  # in-batch dup of 0 (normalized)
]
WAVE2 = [
    (10, "alpha beta gamma", "en", "s", 16),   # cross-batch dup of 0
    (11, "zeta eta", "en", "s", 8),
]


def test_cross_batch_first_seen_wins(spark, tmp_path):
    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    _write_wave(spark, input_dir, WAVE1, "w1")
    _drain(spark, input_dir, out_dir, ckpt)
    _write_wave(spark, input_dir, WAVE2, "w2")
    _drain(spark, input_dir, out_dir, ckpt)

    store = TableStore(spark, out_dir)
    uniq = {r["doc_id"] for r in store.read("unique_docs").collect()}
    # 2 deduped in-batch against 0; 10 deduped cross-batch against 0
    assert uniq == {0, 1, 11}
    fps = store.read("fingerprints")
    assert fps.count() == fps.select("fp").distinct().count() == 3


def test_parity_with_batch_exact_dedup(spark, tmp_path):
    """Streaming over in-order waves == batch exact_dedup over the
    union (same survivors, same fingerprint set)."""
    from docs2kg_spark.operators.dedup import exact_dedup

    input_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    _write_wave(spark, input_dir, WAVE1, "w1")
    _drain(spark, input_dir, out_dir, ckpt)
    _write_wave(spark, input_dir, WAVE2, "w2")
    _drain(spark, input_dir, out_dir, ckpt)

    both = spark.createDataFrame(
        WAVE1 + WAVE2,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    want = {r["doc_id"] for r in exact_dedup(both).select("doc_id").collect()}
    store = TableStore(spark, out_dir)
    got = {r["doc_id"] for r in store.read("unique_docs").collect()}
    assert got == want


def test_replay_is_idempotent(spark, tmp_path):
    """Re-processing the same input with a FRESH checkpoint (the
    worst-case redelivery: every batch replays) leaves the sinks
    byte-identical — append_batch's per-batch-id deltas overwrite
    rather than duplicate."""
    input_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_wave(spark, input_dir, WAVE1, "w1")
    _drain(spark, input_dir, out_dir, str(tmp_path / "ck1"))
    store = TableStore(spark, out_dir)
    before = sorted(
        (r["doc_id"], r["text"]) for r in store.read("unique_docs").collect()
    )
    _drain(spark, input_dir, out_dir, str(tmp_path / "ck2"))  # full replay
    after = sorted(
        (r["doc_id"], r["text"]) for r in store.read("unique_docs").collect()
    )
    assert after == before
    fps = store.read("fingerprints")
    assert fps.count() == fps.select("fp").distinct().count()
