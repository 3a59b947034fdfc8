"""Deterministic sequence packing for LLM training-data pipelines.

Implements GPT-style *concat-and-chunk* packing: documents are
concatenated in a deterministic order and split into fixed
token-budget training sequences ("packs"); a document crossing a pack
boundary spans consecutive packs.  This is the closed-form packing
(every assignment is pure arithmetic over a running token sum), unlike
greedy bin packing, which is inherently sequential per bin.

Distributed form — shard-local packing:

- documents are assigned to a deterministic shard by a hash of their
  id and ordered within the shard by the same hash (ties broken by
  id), so the layout is a pure function of (ids, token counts, budget,
  n_shards): stable under repartitioning, input order, and resume —
  the same property operators/sampling.py's hash split has, and for
  the same reason (partitioning-dependent layout cannot survive a
  resumable pipeline);
- the only shuffle is the per-shard running-sum window (PARTITION BY
  shard) — never a global ORDER BY window, which would serialize the
  corpus through one reducer (the classic window scale-killer);
- pack ids are globally unique as (shard, local_pack); each shard
  wastes at most one partial tail pack.

Token counts come from any integer column (pair with
operators/text.py::bpe_token_count or whitespace_token_count).  The
whole operator is one window + arithmetic — no UDF, no driver loop —
with an exact DuckDB twin (oracle_sql()['doc_packing']).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pack_hash(id_str: Column) -> Column:
    return F.md5(F.concat(id_str, F.lit("|pack-v1")))


def chunk_examples(
    examples: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, n_tokens, n_windows, win_first, pad_tokens) —
    boundary-respecting chunking: each example (a document, or a whole
    conversation whose turns were already concatenated) is chunked into
    ``ceil(tokens/budget)`` windows of its own; no window ever contains
    two examples.  This is the no-cross-example-attention layout SFT
    pipelines use, the complement of :func:`pack_documents`'s
    concat-and-chunk (which trades isolation for zero padding).

    - every example yields ≥1 window (a zero/short example is one padded
      window); ``pad_tokens`` is the padding wasted in its last window —
      aggregate it for the padding-efficiency corpus stat;
    - window ids are globally unique as (shard, win_first + k): examples
      hash to a deterministic shard and ``win_first`` is the shard-local
      running sum of preceding window counts, so the layout is a pure
      function of (ids, token counts, budget, n_shards) — repartition-
      and resume-stable for the same reason pack_documents is, and the
      only shuffle is the same PARTITION BY shard window (never a global
      ORDER BY).
    """
    id_str = F.col(id_col).cast("string")
    shard = (
        F.conv(F.substring(_pack_hash(id_str), 1, 4), 16, 10).cast("long") % n_shards
    )
    n_windows = F.greatest(
        F.expr(f"(_toks + {budget} - 1) DIV {budget}"), F.lit(1).cast("long")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(_pack_hash(id_str), id_str)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        examples.select(
            F.col(id_col),
            shard.alias("shard"),
            F.col(token_col).cast("long").alias("_toks"),
        )
        .withColumn("_nw", n_windows)
        .withColumn("_cumw", F.sum("_nw").over(w))
        .select(
            id_col,
            "shard",
            F.col("_toks").alias("n_tokens"),
            F.col("_nw").cast("long").alias("n_windows"),
            (F.col("_cumw") - F.col("_nw")).cast("long").alias("win_first"),
            (F.col("_nw") * budget - F.col("_toks")).cast("long").alias("pad_tokens"),
        )
    )


def pack_documents(
    documents: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, shard, pack_first, pack_last, pack_offset, token_count) —
    concat-and-chunk packing within deterministic shards.

    pack_first/pack_last are the shard-local pack indices the document
    spans (equal unless it crosses a boundary; documents longer than
    the budget span multiple packs — they are chunked, not dropped);
    pack_offset is the document's token start position inside
    pack_first.  Zero-token documents sit at a boundary with
    pack_last == pack_first and contribute nothing.
    """
    id_str = F.col(id_col).cast("string")
    shard = (
        F.conv(F.substring(_pack_hash(id_str), 1, 4), 16, 10).cast("long") % n_shards
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(_pack_hash(id_str), id_str)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = documents.select(
        F.col(id_col),
        shard.alias("shard"),
        F.col(token_col).cast("long").alias("_toks"),
    ).withColumn("_cum", F.sum("_toks").over(w))
    prev_end = (F.col("_cum") - F.col("_toks")).alias("_prev")
    out = with_cum.select(id_col, "shard", "_toks", F.col("_cum"), prev_end)
    first = F.expr(f"_prev DIV {budget}")
    last = F.greatest(F.expr(f"(_cum - 1) DIV {budget}"), first)
    return out.select(
        id_col,
        "shard",
        first.cast("long").alias("pack_first"),
        last.cast("long").alias("pack_last"),
        (F.col("_prev") % budget).cast("long").alias("pack_offset"),
        F.col("_toks").alias("token_count"),
    )
