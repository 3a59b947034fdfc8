"""Repetition / structure quality signals for training-data curation
(Gopher-rule family: Rae et al. 2021 §A1.1, C4 heuristics).

Complements operators/text.py (length / punctuation / stopword signals)
with the repetition measures large-scale pipelines filter on:
- top_word_frac     — occurrences of the most frequent word / n_words
- dup_2gram_frac    — 1 − distinct(2-grams)/count(2-grams)
- mean_word_len     — Σ len(word) / n_words
- symbol_word_ratio — '#' and '…' occurrences / n_words
- bullet_line_frac  — fraction of lines starting with a bullet mark

Scale design: every signal is a pure column expression over the row's
own text (split / sort_array / zip_with / aggregate higher-order
functions) — a narrow, whole-stage-codegen'd pass with NO shuffle, no
explode, no UDF.  The most-frequent-word count folds a sorted word
array with `aggregate` (longest equal-run of the sorted array == top
multiplicity), so nothing leaves the row.  The DuckDB twin (queries.py)
recomputes the same signals relationally (unnest + group-by), which is
fine for an oracle but would shuffle |words| rows per document at scale
— the contrast is the point: the narrow form is the 100 TB shape.

All ratios are exact integer quotients cast to double (one IEEE
division — bit-identical across engines), rounded to 6dp for the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(F.trim(text)), WS_RE), lambda w: w != "")


def _top_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a sorted array == the
    maximum multiplicity of any element.  One fold, no explode."""
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc, w):
        run = F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            w.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(sorted_arr, acc0, merge, lambda acc: acc["best"])


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (id_col, n_words, top_word_frac, dup_2gram_frac, mean_word_len,
    symbol_word_ratio, bullet_line_frac); ratio columns are null when
    the document has no words (no divide-by-zero rows)."""
    text = F.col(text_col)
    words = _words(text)
    n = F.size(words)

    top = _top_run(F.sort_array(words))

    # 2-grams in original order: zip words with its shift-by-one; the
    # zip_with null-padding tail gram is dropped by the null concat
    grams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    n_grams = F.size(grams)

    sum_len = F.aggregate(words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
    n_symbols = F.length(text) - F.length(F.regexp_replace(text, "[#…]", ""))

    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    n_bullets = F.size(F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]")))

    nz = n > 0
    return docs.select(
        F.col(id_col),
        n.alias("n_words"),
        F.when(nz, F.round(top.cast("double") / n, 6)).alias("top_word_frac"),
        F.when(
            n_grams > 0,
            F.round(F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n_grams, 6),
        ).alias("dup_2gram_frac"),
        F.when(nz, F.round(sum_len.cast("double") / n, 6)).alias("mean_word_len"),
        F.when(nz, F.round(n_symbols.cast("double") / n, 6)).alias("symbol_word_ratio"),
        F.when(n_lines > 0, F.round(n_bullets.cast("double") / n_lines, 6)).alias(
            "bullet_line_frac"
        ),
    )
