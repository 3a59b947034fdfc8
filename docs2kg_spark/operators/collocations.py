"""Bigram collocation mining (pointwise mutual information) — the
corpus-statistics primitive behind multi-word-expression discovery and
tokenizer-merge candidate ranking in a training-data pipeline.

Reference provenance: Docs2KG inspects extracted-entity surface forms as
multi-token phrases (kg_construction/semantic_kg.py builds entities from
multi-word gazetteer surfaces); PMI is the standard public-corpus
statistic (Church & Hanks 1990) for discovering exactly those phrases
from raw text, so it belongs in the engine's term-statistics family next
to TF-IDF (operators/tfidf.py).

Scale shape (the 100 TB plan):
- tokenization is the shared explicit-whitespace split (functions/ids.WS_RE)
  as a narrow array expression — no explode until after the per-document
  array is built, so empty-token filtering happens row-local;
- bigrams are formed INSIDE the row via a `transform(sequence(...))`
  over the filtered token array (adjacency is a per-document property, so
  it never needs a shuffle or a window);
- unigram and bigram counts are each ONE hash aggregate with map-side
  partial aggregation — the classic word-count shape that scales linearly;
- the two corpus totals join in as broadcast single-row relations;
- top-N is orderBy+limit = distributed TakeOrdered: each partition
  contributes its local top-N of the already-vocabulary-sized pair table,
  only N rows reach the driver.

Cross-engine determinism (the kmeans/tfidf playbook): the PMI double is
computed with a structurally identical left-associative expression in
both engines — (CAST(c_xy AS DOUBLE) * n_tok / c_x * n_tok / c_y /
n_big) — rounded to 6dp before ranking, and the (w1, w2) pair string is
the total-order tie-break, so both engines rank the identical list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE


def _token_arrays(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) with the shared whitespace-class tokenizer; empties are
    filtered inside the array so bigram adjacency is over REAL tokens
    (a run of spaces does not break a collocation)."""
    return documents.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), WS_RE), lambda x: x != ""
        ).alias("toks"),
    )


def bigram_pmi(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
    top_n: int = 100,
) -> DataFrame:
    """Top-N adjacent-bigram collocations by PMI →
    (w1, w2, pair_count, pmi).

    PMI = ln( P(w1,w2) / (P(w1)·P(w2)) ) with unigram probabilities over
    the token stream and the joint over the bigram stream; pairs seen
    fewer than `min_count` times are dropped first (rare-pair PMI is
    unstable — the standard Church–Hanks caveat)."""
    arrs = _token_arrays(documents, id_col, text_col)

    # adjacency is row-local: build the (w1, w2) structs inside the array
    # (guarded — sequence(1, 0) would produce a DESCENDING range, not an
    # empty one, so short docs must short-circuit to an empty array)
    pairs_col = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()"))

    bigrams = (
        arrs.select(F.explode(pairs_col).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_count"))
    )
    unigrams = (
        arrs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    n_tok = unigrams.agg(F.sum("c").alias("n_tok"))
    n_big = bigrams.agg(F.sum("pair_count").alias("n_big"))

    u1 = unigrams.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = unigrams.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))

    scored = (
        bigrams.filter(F.col("pair_count") >= min_count)
        .join(u1, on="w1")
        .join(u2, on="w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            F.col("pair_count").cast("bigint").alias("pair_count"),
            # left-associative, structurally identical to the SQL twin
            F.round(
                F.log(
                    F.col("pair_count").cast("double")
                    * F.col("n_tok")
                    / F.col("c1")
                    * F.col("n_tok")
                    / F.col("c2")
                    / F.col("n_big")
                ),
                6,
            ).alias("pmi"),
        )
    )
    # distributed TakeOrdered — only top_n rows reach the driver;
    # (pmi, w1, w2) is a total order because (w1, w2) is unique
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(top_n)
