"""Streaming CMS maintenance (streaming/dedup.py::incremental_cms):
batch parity, merge correctness across waves, replay idempotence."""

from pyspark.sql import types as T

from docs2kg_spark.io.sinks import TableStore
from docs2kg_spark.operators.sketches import cms_build, cms_estimate
from docs2kg_spark.streaming.dedup import cms_merged, incremental_cms

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
    q = incremental_cms(spark, input_dir, out, ckpt, schema=EVENT_SCHEMA)
    q.awaitTermination(120)


def test_streaming_cms_equals_batch_sketch(spark, tmp_path):
    """Two waves through the stream == one batch cms_build over the
    union, cell for cell."""
    input_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    w1 = [(i, i % 7) for i in range(50)]
    w2 = [(100 + i, i % 11) for i in range(50)]
    _write_wave(spark, input_dir, w1)
    _drain(spark, input_dir, out, str(tmp_path / "ck"))
    _write_wave(spark, input_dir, w2)
    _drain(spark, input_dir, out, str(tmp_path / "ck"))

    store = TableStore(spark, out)
    got = {(r["seed"], r["bucket"]): r["cnt"] for r in cms_merged(store).collect()}
    both = spark.createDataFrame(w1 + w2, "event_id long, user_id long")
    want = {(r["seed"], r["bucket"]): r["cnt"] for r in cms_build(both, "user_id").collect()}
    assert got == want
    # and the estimates are usable: every true count <= estimate
    est = {
        r["user_id"]: r["est"]
        for r in cms_estimate(
            cms_merged(store), both.select("user_id").distinct(), "user_id"
        ).collect()
    }
    true = {}
    for _, u in w1 + w2:
        true[str(u)] = true.get(str(u), 0) + 1
    for k, t in true.items():
        assert est[k] >= t


def test_streaming_cms_replay_idempotent(spark, tmp_path):
    """A full re-process with a fresh checkpoint leaves the merged
    sketch unchanged (per-batch deltas overwrite, never double-count)."""
    input_dir, out = str(tmp_path / "in"), str(tmp_path / "out")
    _write_wave(spark, input_dir, [(i, i % 5) for i in range(40)])
    _drain(spark, input_dir, out, str(tmp_path / "ck1"))
    store = TableStore(spark, out)
    before = sorted(
        (r["seed"], r["bucket"], r["cnt"]) for r in cms_merged(store).collect()
    )
    _drain(spark, input_dir, out, str(tmp_path / "ck2"))  # replay everything
    after = sorted(
        (r["seed"], r["bucket"], r["cnt"]) for r in cms_merged(store).collect()
    )
    assert after == before
