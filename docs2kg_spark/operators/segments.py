"""Segmentation: transcripts → segments.

The transcript analog of the reference's LayoutKG stage
(kg_construction/layout_kg/layout_kg.py): one turn = one layout element,
stable-ordered within its conversation, empty turns skipped
(layout_kg.py:34-36), sequence numbering (neo4j_loader.py:315-321),
role→label mapping standing in for the HTML tag→label map
(layout_kg.py:42-66): system turns are section headers (H1), user and
assistant turns are paragraphs (P), tool turns are code blocks (CODE).

Scale notes:
- the row_number window shuffles once on conv_id — the same partitioning
  every downstream per-conversation stage reuses;
- everything is JVM-side (when/sha2/trim) → whole-stage codegen, no
  Python;
- seg_id is content-addressed (sha2 of conv_id|turn_idx|text) so reruns
  are idempotent (SURVEY.md §1.4.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import det_id_col

# must stay in lock-step with oracle/reference.py::ROLE_LABEL
ROLE_LABEL_MAP = {"system": "H1", "user": "P", "assistant": "P", "tool": "CODE"}


def label_for_role_col(role_col="role"):
    c = F.col(role_col) if isinstance(role_col, str) else role_col
    expr = F.lit("P")
    for role, label in ROLE_LABEL_MAP.items():
        expr = F.when(c == role, F.lit(label)).otherwise(expr)
    return expr


def segment_transcripts(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → segments.

    Output: conv_id, seg_id, seg_idx, turn_idx, label, role, tool, text.
    seg_idx numbers only the *kept* (non-empty) turns, like the
    enumerate() over parsed elements at neo4j_loader.py:315-321.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        # keep only turns with any non-whitespace char — the Spark
        # equivalent of Python's `text.strip()` truthiness (trim() alone
        # strips spaces but not tabs/newlines)
        transcripts.filter(F.col("text").isNotNull() & F.col("text").rlike(r"\S"))
        .withColumn("seg_idx", (F.row_number().over(w) - F.lit(1)).cast("int"))
        .withColumn("label", label_for_role_col("role"))
        .withColumn("seg_id", det_id_col("conv_id", "turn_idx", "text"))
        .select("conv_id", "seg_id", "seg_idx", "turn_idx", "label", "role", "tool", "text")
    )


def turn_order_invariant(transcripts: DataFrame) -> DataFrame:
    """Per-turn text equality under stable turn ordering
    (BASELINE.json::input_hint invariant): returns one row per conv with
    the ordered text list; callers compare against the generator's
    order.  Uses collect_list over an ordered window with an explicit
    full frame so the result is deterministic."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        transcripts.withColumn("texts", F.collect_list("text").over(w))
        .groupBy("conv_id")
        .agg(F.first("texts").alias("texts"))
    )


def segment_transcripts_bucketed(transcripts: DataFrame, bucket_turns: int = 100_000) -> DataFrame:
    """Long-conversation-safe segmentation — identical output to
    segment_transcripts, different shuffle shape.

    The plain version windows on conv_id, so ONE conversation's turns
    land on ONE reducer; AQE skew-join cannot split a window partition,
    which makes a pathological 10M-turn conversation a straggler at
    10^12-turn scale (the "long conversations" skew named in
    BASELINE.json::north_rule).  Here the ordering key is salted by a
    deterministic turn-range bucket — the big shuffle partitions on
    (conv_id, bucket), spreading a huge conversation over
    ceil(turns/bucket_turns) reducers — and global sequence numbers are
    recovered by adding per-bucket prefix offsets from a tiny
    (conv, bucket)-grain aggregate that rides a broadcast join.

    Two-phase stable numbering:
      1. row_number within (conv_id, bucket) ordered by turn_idx;
      2. offset = total kept rows in all earlier buckets of the conv
         (a running sum over the per-bucket counts — thousands of rows,
         broadcast).
    """
    kept = transcripts.filter(F.col("text").isNotNull() & F.col("text").rlike(r"\S"))
    kept = kept.withColumn("_b", (F.col("turn_idx") / F.lit(bucket_turns)).cast("long"))

    w_local = Window.partitionBy("conv_id", "_b").orderBy("turn_idx")
    local = kept.withColumn("_li", F.row_number().over(w_local))

    counts = local.groupBy("conv_id", "_b").agg(F.count("*").alias("_n"))
    w_off = (
        Window.partitionBy("conv_id").orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)))
    # Only buckets with a non-zero prefix offset need a correction row —
    # for a single-bucket conversation (_b = 0, the overwhelmingly common
    # case) the offset is 0, so the broadcast scales with the number of
    # *extra* buckets of pathological conversations, not with the total
    # conversation count (at 10^9 convs a full offsets broadcast would
    # blow the driver / 8 GB broadcast limit).  Missing rows coalesce to 0.
    nonzero = offsets.filter(F.col("_off") > 0).select("conv_id", "_b", "_off")

    return (
        local.join(F.broadcast(nonzero), on=["conv_id", "_b"], how="left")
        .withColumn("seg_idx", (F.coalesce("_off", F.lit(0)) + F.col("_li") - 1).cast("int"))
        .withColumn("label", label_for_role_col("role"))
        .withColumn("seg_id", det_id_col("conv_id", "turn_idx", "text"))
        .select("conv_id", "seg_id", "seg_idx", "turn_idx", "label", "role", "tool", "text")
    )


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """→ (conv_id, n_turns, n_system, n_user, n_assistant, n_tool,
    n_role_repeats, n_idx_gaps, first_role, last_role): per-conversation
    integrity/shape profile — the data-quality gate a transcript corpus
    passes before training (role-alternation violations, non-dense turn
    indices, role balance).  ``n_role_repeats`` counts adjacent
    same-role turn pairs; ``n_idx_gaps`` counts turns whose turn_idx is
    not exactly predecessor+1 (a dense 0..n-1 conversation has 0).

    Scale shape: ONE shuffle — the lag() window partitions by conv_id
    and the groupBy that follows aggregates on the same key, so the
    exchange is reused (hashpartitioning(conv_id) already satisfies the
    aggregate's distribution); everything else is conditional counting.
    Long conversations stream through the window (no frame).  All
    outputs are integers or min/max strings — engine-exact.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.lag("role").over(w).alias("_prev_role"),
        F.lag("turn_idx").over(w).alias("_prev_idx"),
    )
    cnt_role = lambda r: F.sum(F.when(F.col("role") == r, 1).otherwise(0))
    return lagged.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        cnt_role("system").cast("bigint").alias("n_system"),
        cnt_role("user").cast("bigint").alias("n_user"),
        cnt_role("assistant").cast("bigint").alias("n_assistant"),
        cnt_role("tool").cast("bigint").alias("n_tool"),
        F.sum(F.when(F.col("role") == F.col("_prev_role"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_role_repeats"),
        F.sum(
            F.when(
                F.col("_prev_idx").isNotNull()
                & (F.col("turn_idx") != F.col("_prev_idx") + 1),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_idx_gaps"),
        F.min_by("role", "turn_idx").alias("first_role"),
        F.max_by("role", "turn_idx").alias("last_role"),
    )
