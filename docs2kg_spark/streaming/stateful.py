"""Custom stateful streaming operators (§2.9): the
``applyInPandasWithState`` surface the batch pipeline cannot express.

Two operators:

- ``streaming_sessionize`` — gap-based sessionization as a *stateful*
  stream: per-key state carries (last event time, current session
  index) across micro-batches AND across query restarts (state lives in
  the checkpoint's state store), so a session spanning two batches gets
  ONE session id — the thing the per-batch ``foreachBatch`` lift in
  incremental.py structurally cannot do.  Semantics match the batch
  operator (operators/asof.py::sessionize): first session per key is 0,
  a gap > gap_minutes starts a new one (parity-tested).

- ``streaming_windowed_rollup`` — event-time windowed counts with a
  watermark: the late-data story (rows older than watermark are
  dropped, bounded state) for the hourly_rollup aggregate.

Scale notes: state is partitioned by the group key across executors
(the state store shuffles on the groupBy key exactly once); per-key
state here is O(1) (two scalars), so state size is #active keys, not
#events — the watermark/timeout bounds it over time.  Out-of-order
arrival WITHIN a batch is handled (events are sorted per key before
assignment); arrival of an event older than its key's last seen time in
a PREVIOUS batch would mis-assign — pair this operator with a watermark
-bounded source or accept per-batch ordering, the same contract Spark's
built-in session_window has in update mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("session_idx", T.IntegerType()),
    ]
)

# (last event epoch-seconds, current session index)
SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_epoch", T.DoubleType()),
        T.StructField("session_idx", T.IntegerType()),
    ]
)


def _make_sessionize_fn(gap_seconds: float):
    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_epoch, idx = state.get
        else:
            last_epoch, idx = None, -1
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            epochs = pdf["ts"].map(pd.Timestamp.timestamp)
            out_idx = []
            for e in epochs:
                if last_epoch is None or e - last_epoch > gap_seconds:
                    idx += 1
                last_epoch = e
                out_idx.append(idx)
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "event_id": pdf["event_id"],
                    "ts": pdf["ts"],
                    "session_idx": pd.Series(out_idx, index=pdf.index, dtype="int32"),
                }
            )
        state.update((float(last_epoch) if last_epoch is not None else -1.0, int(idx)))

    return assign


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: float = 60.0,
    key: str = "user_id",
) -> DataFrame:
    """streaming events(user_id, event_id, ts) → (user_id, event_id, ts,
    session_idx) with cross-batch session continuity.  Apply to a
    streaming DataFrame; write with append mode."""
    return events.groupBy(key).applyInPandasWithState(
        _make_sessionize_fn(gap_minutes * 60.0),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_windowed_rollup(
    events: DataFrame,
    watermark: str = "10 minutes",
    window_len: str = "1 hour",
    group_col: str = "event_type",
) -> DataFrame:
    """event-time windowed counts with a watermark: the streaming twin of
    the hourly_rollup aggregate.  Rows later than the watermark are
    dropped; state per (window, group) is evicted once the watermark
    passes the window end — bounded state at unbounded input."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), F.col(group_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(group_col),
            F.col("n"),
        )
    )


def streaming_dedup(
    events: DataFrame,
    watermark: str = "10 minutes",
    keys: tuple[str, ...] = ("event_id",),
    ts: str = "ts",
) -> DataFrame:
    """Exactly-once event emission under at-least-once delivery: drop
    rows whose dedup key was already seen, keeping key state only
    within the watermark horizon.

    Why not plain dropDuplicates: on a stream it keeps EVERY key ever
    seen — state grows without bound at 10¹²-turn scale.  Re-delivery
    (the failure mode this guards) is temporally local — a retried
    batch or replayed file lands within minutes — so
    dropDuplicatesWithinWatermark bounds state to the keys inside the
    watermark window and evicts the rest.  The batch twin is a plain
    distinct-on-key (tests assert parity on a re-delivered stream).

    Reference parity: the batch pipeline's idempotence comes from
    content-addressed ids + overwrite markers (io/sinks.py); this is
    the same guarantee for the append-only streaming path.
    """
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
