"""Streaming HLL maintenance (streaming/dedup.py::incremental_hll):
register-exact batch parity across waves and replay idempotence."""

from pyspark.sql import types as T

from docs2kg_spark.io.sinks import TableStore
from docs2kg_spark.operators.sketches import hll_registers
from docs2kg_spark.streaming.dedup import hll_merged, incremental_hll

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _write_wave(spark, input_dir, rows):
    spark.createDataFrame(rows, "event_id long, user_id long").coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)


def _drain(spark, input_dir, out, ckpt):
    q = incremental_hll(spark, input_dir, out, ckpt, schema=EVENT_SCHEMA)
    q.awaitTermination(120)


def test_streaming_hll_equals_batch_registers(spark, tmp_path):
    """Two waves through the stream == one batch hll_registers over the
    union, register for register (max is the merge operator)."""
    input_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    w1 = [(i, i * 3) for i in range(60)]
    w2 = [(100 + i, 1000 + i * 7) for i in range(60)]
    _write_wave(spark, input_dir, w1)
    _drain(spark, input_dir, out, str(tmp_path / "ck"))
    _write_wave(spark, input_dir, w2)
    _drain(spark, input_dir, out, str(tmp_path / "ck"))

    store = TableStore(spark, out)
    got = {(r["bucket"], r["r"]) for r in hll_merged(store).collect()}
    both = spark.createDataFrame(w1 + w2, "event_id long, user_id long")
    want = {(r["bucket"], r["r"]) for r in hll_registers(both, "user_id").collect()}
    assert got == want


def test_streaming_hll_replay_idempotent(spark, tmp_path):
    """Re-processing every file with a fresh checkpoint leaves the
    merged registers unchanged (deltas overwrite; max can't inflate)."""
    input_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_wave(spark, input_dir, [(i, i % 23) for i in range(50)])
    _drain(spark, input_dir, out, str(tmp_path / "ck1"))
    store = TableStore(spark, out)
    before = sorted((r["bucket"], r["r"]) for r in hll_merged(store).collect())
    _drain(spark, input_dir, out, str(tmp_path / "ck2"))
    after = sorted((r["bucket"], r["r"]) for r in hll_merged(store).collect())
    assert after == before
