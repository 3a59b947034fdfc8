"""Byte-pair-encoding merge learning — the tokenizer-training primitive
(Sennrich, Haddow & Birch, ACL'16) a training-data engine sits next to:
the same corpus that gets deduped/filtered/packed here is what the
production BPE/unigram tokenizer is fitted on.

Reference provenance: Docs2KG has no tokenizer training (its NER is
spaCy-tokenizer-driven, kg_construction/ner_spacy_match.py); this is
part of the beyond-the-reference LLM-pipeline family, like TF-IDF and
DSIR (operators/tfidf.py).

Scale shape (the 100 TB plan):
- the corpus is touched ONCE: one word-count hash aggregate reduces it
  to the word VOCABULARY (word, count) — every BPE iteration after that
  operates on the vocabulary relation, never the corpus;
- per merge iteration: adjacent symbol pairs are built INSIDE the row
  (transform over the symbol array — adjacency never shuffles), one
  hash agg scores the pairs, ONE row (the winning pair) reaches the
  driver, and the merge itself is a row-local fold (aggregate) over
  each word's symbol array;
- the winner is picked by (count DESC, pair ASC) — a total order, so
  the merge sequence is deterministic under any partitioning;
- the vocabulary is localCheckpointed per iteration to cut the
  replayed lineage (the kmeans_refine playbook).

Greedy application semantics: the fold scans left→right, so "aaa"
under merge (a,a) becomes [aa, a] — the standard BPE convention; the
plain-Python reference in tests/test_bpe.py pins exactly this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE


def word_vocab(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, count) over the whitespace-tokenized corpus — the single
    corpus-wide pass every BPE iteration reuses."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), WS_RE), lambda x: x != ""
    )
    return (
        documents.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("count"))
    )


def _char_syms(word_col: str = "word") -> F.Column:
    """Split a word into its character symbols, row-local."""
    return F.expr(
        f"transform(sequence(1, length({word_col})), i -> substring({word_col}, i, 1))"
    )


def pair_counts(sym_vocab: DataFrame) -> DataFrame:
    """Adjacent symbol-pair counts over a (syms, count) vocabulary →
    (sym_a, sym_b, pair_count), weighted by word count.  The scoring
    statistic of one BPE iteration; adjacency is built inside the row."""
    pairs = F.when(
        F.size("syms") >= 2,
        F.expr(
            "transform(sequence(1, size(syms) - 1), "
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<struct<a:string,b:string>>)"))
    return (
        sym_vocab.select(F.col("count"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("sym_a"), F.col("p.b").alias("sym_b"))
        .agg(F.sum("count").cast("bigint").alias("pair_count"))
    )


def _apply_merge(syms: F.Column, a: str, b: str) -> F.Column:
    """Row-local greedy left→right merge of adjacent (a, b) → a||b."""
    empty = F.expr("CAST(array() AS array<string>)")
    return F.aggregate(
        syms,
        empty,
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_learn(
    documents: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.  Returns
    (merges, final_vocab) where merges is the ordered list of merged
    (sym_a, sym_b) pairs and final_vocab is (word, count, syms) with
    each word's segmentation under the learned merges.

    Stops early when no adjacent pair is left (fully merged corpus)."""
    vocab = (
        word_vocab(documents, text_col)
        .select("word", "count", _char_syms().alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "sym_a", "sym_b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["sym_a"], top[0]["sym_b"]
        merges.append((a, b))
        vocab = vocab.select(
            "word", "count", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=False)
    return merges, vocab


def bpe_pair_stats(
    documents: DataFrame,
    text_col: str = "text",
    top_n: int = 50,
) -> DataFrame:
    """Top-N adjacent character-pair statistics of the corpus — the
    round-0 BPE scoring table (what the first merge would be chosen
    from), ranked by (pair_count DESC, sym_a, sym_b) total order.
    orderBy+limit = distributed TakeOrdered: each partition ships its
    local top-N of the already-tiny pair relation."""
    vocab = word_vocab(documents, text_col).select(
        "count", _char_syms().alias("syms")
    )
    return (
        pair_counts(vocab)
        .orderBy(F.col("pair_count").desc(), "sym_a", "sym_b")
        .limit(top_n)
    )
