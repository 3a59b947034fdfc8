"""Benchmark-contamination detection for training-data pipelines.

Flags training documents that share word n-grams with a (small)
held-out benchmark/eval set — the standard decontamination step before
pretraining (n-gram overlap, as popularized by public LM training
reports).  Reference parity: the reference has no such stage; this is
part of the training-data surface the brief adds on top of the KG
pipeline.

Scale shape (the part that matters at 100 TB):
- the benchmark side is tiny by construction (an eval set is thousands
  of items, not billions) → its distinct gram table is BROADCAST;
- the document side explodes to distinct (doc, gram) pairs — a narrow
  generate over the pruned (id, text) scan, no shuffle;
- the join is a broadcast hash join on the gram, so no document-side
  shuffle happens until the per-(doc, bench) aggregation, whose input
  is already filtered to matching grams only (a tiny fraction of the
  corpus);
- per-doc gram sets are deduplicated BEFORE the join, so a pathological
  document repeating one benchmark gram a million times contributes one
  row, not a skewed join key.

Tokenization (lower/trim + ``\\s+`` split) and gram construction
(slice + space-join) are byte-identical to operators/dedup.py's n-gram
Jaccard, whose DuckDB twin is value-oracled — the same SQL idioms back
this operator's twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE

from docs2kg_spark.functions.skew import ensure_min_parallelism


def word_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """distinct (id, gram) word n-grams; documents shorter than n tokens
    contribute their single sub-n gram (same convention as
    dedup.ngram_jaccard_pairs and its green SQL twin)."""
    toks = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(F.lower(F.trim(F.col(text_col))), WS_RE).alias("toks"),
    )
    return (
        toks.select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0))),
                    lambda i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") > 0)
        .distinct()
    )


def contamination_scores(
    documents: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, bench_id, shared_grams, contaminated_frac) for every
    document sharing ≥1 word n-gram with a benchmark item;
    contaminated_frac = shared / |benchmark item's gram set| ∈ (0, 1]."""
    doc_grams = word_ngrams(documents, id_col, text_col, n)
    bench_grams = word_ngrams(benchmark, bench_id_col, bench_text_col, n)
    bench_sizes = bench_grams.groupBy(F.col("id").alias("bench_id")).agg(
        F.count("*").alias("n_bench_grams")
    )
    hits = doc_grams.join(
        F.broadcast(
            bench_grams.select(F.col("id").alias("bench_id"), "gram")
        ),
        on="gram",
    )
    shared = hits.groupBy(
        F.col("id").alias(id_col), F.col("bench_id")
    ).agg(F.count("*").alias("shared_grams"))
    return shared.join(F.broadcast(bench_sizes), on="bench_id").select(
        id_col,
        "bench_id",
        "shared_grams",
        (F.col("shared_grams") / F.col("n_bench_grams")).alias("contaminated_frac"),
    )
