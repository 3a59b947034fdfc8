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
    with_prob: bool = True,
) -> DataFrame:
    """→ (src, dst, n, prob): first-order transition counts and
    conditional probabilities of ``state_col`` sequences per ``key_col``,
    ordered by ``order_cols`` (pass a unique tiebreaker last — transition
    tables under a non-total order are not well-defined).  Terminal
    states (no successor within the key) are not counted as transitions.
    ``with_prob=False`` returns (src, dst, n) only and skips the
    marginal join — consumers that re-aggregate (e.g. the entropy
    profile) should not pay it.
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(F.count("*").alias("n"))
    if not with_prob:
        return counts.select("src", "dst", F.col("n").cast("bigint").alias("n"))
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


def funnel_counts(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    steps: list[str],
) -> DataFrame:
    """→ (step, step_name, users): ordered-funnel analysis — for each
    prefix of ``steps``, how many keys (users / conversations) performed
    those states IN ORDER (as a subsequence of their state stream, other
    states freely interleaved).  The classic product-analytics funnel
    and the agent-trace analog (plan → act → observe completion rates).

    Progress is computed by a greedy earliest-match fold, which is the
    optimal subsequence matcher: per key, events are restricted to the
    step states, sorted by ``order_cols`` (pass a unique tiebreaker
    last), mapped to their 1-based step index, and folded with
    ``acc' = acc+1 if x == acc+1 else acc`` — a JVM-side higher-order
    ``aggregate``, no UDF.

    Scale shape: the ONLY shuffle is the per-key groupBy; events that
    are not funnel steps are filtered BEFORE collect_list, so the
    per-key array is bounded by the key's step-event count, not its
    total activity (a hot key with millions of irrelevant events ships
    nothing).  The per-key progress relation then collapses to ONE
    row via a single conditional aggregate; the (step, users) unpivot
    is over that row.  Counts are integers — engine-exact.
    """
    n = len(steps)
    p = F.when(F.col(state_col) == steps[0], 1)
    for i, s in enumerate(steps[1:], start=2):
        p = p.when(F.col(state_col) == s, i)
    p = p.otherwise(0)
    seqs = (
        events.select(
            F.col(key_col).alias("key"),
            *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
            p.alias("p"),
        )
        .filter(F.col("p") > 0)
        .groupBy("key")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        *[F.col(f"_o{i}") for i in range(len(order_cols))], F.col("p")
                    )
                )
            ).alias("seq")
        )
    )
    prog = seqs.select(
        F.aggregate(
            F.transform("seq", lambda s: s["p"]),
            F.lit(0),
            lambda acc, x: F.when(x == acc + 1, acc + 1).otherwise(acc),
        ).alias("progress")
    )
    wide = prog.agg(
        *[
            F.sum(F.when(F.col("progress") >= k, 1).otherwise(0)).alias(f"_s{k}")
            for k in range(1, n + 1)
        ]
    )
    stack = ", ".join(f"{k}, '{steps[k - 1]}', _s{k}" for k in range(1, n + 1))
    return wide.select(
        F.expr(f"stack({n}, {stack}) AS (step, step_name, users)")
    ).select(
        F.col("step").cast("bigint").alias("step"),
        "step_name",
        F.col("users").cast("bigint").alias("users"),
    )


def context_assembly(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    state_col: str,
    k: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Sliding-context construction: for every event, the concatenation
    of the previous ``k`` states within its key →
    input columns + ``ctx`` (empty string at sequence starts).

    This is the SFT-example builder's core move — each turn of a
    transcript becomes a training row carrying its preceding context
    window — expressed as a frame-bounded window so the context never
    leaves the executor:

    - ONE shuffle on the sequence key (same key the ordering window in
      segments.py already uses — co-partitioning is reused when
      composed);
    - the frame is ROWS BETWEEN k PRECEDING AND 1 PRECEDING, so state
      held per partition is O(k), not O(sequence) — a hot key (one very
      long conversation) streams through;
    - collect_list inside an ORDERED frame preserves frame order, so the
      concatenation is deterministic given a total order (pass a unique
      tiebreaker last in ``order_cols``).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-k, -1)
    )
    return events.withColumn(
        "ctx", F.concat_ws(sep, F.collect_list(F.col(state_col)).over(w))
    )
