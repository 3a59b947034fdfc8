"""Sequence-transition mining over keyed, ordered event streams.

Agent transcripts and clickstreams are state sequences (tool calls,
event types); the first-order Markov transition table — how often state
A is followed by state B within a key, and the conditional probability
P(B|A) — is the standard profile of them (tool-chain analysis, funnel
drop-off, anomalous-flow detection).  The reference has no sequence
analytics (its per-file loop never orders events); this extends the
training-data surface the brief adds.

Scale shape:
- the successor is a ``lead()`` window PARTITIONED BY the sequence key —
  one shuffle on the key, never a global sort (same shape as
  operators/segments.py's turn numbering, which survives the same skew
  analysis: a hot key means a long sequence, bounded by the longest
  single conversation, and the window is rows-between-free so it
  streams);
- the transition table is |states|² at most — tiny — produced by ONE
  hash aggregate over the lead pairs; the per-source totals it needs
  ride the same grouped relation (a second tiny agg over |states|²
  rows, not a second pass over the data).

Cross-engine exactness: counts are integers; ``prob`` is one
double division rounded to 6dp — deterministic in both engines given
identical integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_counts(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """→ (src, dst, n, prob): first-order transition counts and
    conditional probabilities of ``state_col`` sequences per ``key_col``,
    ordered by ``order_cols`` (pass a unique tiebreaker last — transition
    tables under a non-total order are not well-defined).  Terminal
    states (no successor within the key) are not counted as transitions.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    totals = counts.groupBy("src").agg(F.sum("n").alias("_tot"))
    return (
        counts.join(F.broadcast(totals), on="src")
        .select(
            "src",
            "dst",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("_tot"), 6).alias("prob"),
        )
    )
