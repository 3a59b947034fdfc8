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


# composite-filter rule bits (Gopher §A.2 / C4-style, integer-exact)
R_SHORT, R_WORDLEN, R_TOPWORD, R_DUPGRAM, R_LOWSTOP = 1, 2, 4, 8, 16

# the 10-word function-word list shared with the lang/quality signals
FILTER_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def gopher_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Composite document-quality filter (the Gopher rules §A.2 /
    C4-style pipeline gate): every rule is evaluated as an EXACT
    integer cross-multiplication — no float ratio ever compares
    against a float threshold, so engines can never disagree at a
    boundary — and failures accumulate into a ``reasons`` bitmap so
    downstream triage can see WHY a document fell out, not just that
    it did.

    Rules (bit set = rule FIRED = reject reason):
      1  R_SHORT    n_words < 20
      2  R_WORDLEN  mean word length outside [3, 12]  (3n > Σlen ∨ Σlen > 12n)
      4  R_TOPWORD  top word multiplicity > 20%       (5·topc > n)
      8  R_DUPGRAM  duplicate-2gram fraction > 15%    (20·(ng−dg) > 3·ng)
      16 R_LOWSTOP  stopword fraction < 2%            (50·nstop < n)

    → (doc_id, n_words, reasons, kept) with kept = 1 iff reasons = 0.

    Scale shape: every signal is a row-local array fold over the
    whitespace words (the repetition_signals machinery — sort + one
    aggregate, no explode), so the filter is a pure projection: zero
    shuffle, pushes through partition pruning, and composes with any
    downstream sampler as a cheap predicate."""
    text = F.col(text_col)
    words = _words(text)
    n = F.size(words)
    topc = _top_run(F.sort_array(words))
    grams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda g: g.isNotNull(),
    )
    ng = F.size(grams)
    dg = F.size(F.array_distinct(grams))
    sum_len = F.aggregate(words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w))
    nstop = F.size(F.filter(words, lambda w: w.isin(*FILTER_STOPWORDS)))

    nl = n.cast("bigint")
    fired = [
        (R_SHORT, n < 20),
        (R_WORDLEN, (n > 0) & ((F.lit(3) * nl > sum_len) | (sum_len > F.lit(12) * nl))),
        (R_TOPWORD, (n > 0) & (topc.cast("bigint") * 5 > nl)),
        (R_DUPGRAM, (ng > 0) & ((ng - dg).cast("bigint") * 20 > ng.cast("bigint") * 3)),
        (R_LOWSTOP, (n > 0) & (nstop.cast("bigint") * 50 < nl)),
    ]
    reasons = None
    for bit, cond in fired:
        term = F.when(cond, F.lit(bit)).otherwise(F.lit(0))
        reasons = term if reasons is None else reasons + term
    return docs.select(
        F.col(id_col),
        nl.alias("n_words"),
        reasons.cast("int").alias("reasons"),
        F.when(reasons == 0, F.lit(1)).otherwise(F.lit(0)).cast("int").alias("kept"),
    )
