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
