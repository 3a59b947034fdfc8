"""Text-analysis operators for large-scale training-data pipelines.

All four operators are pure JVM-side column expressions (whole-stage
codegen, no Python), so they hold up at 100 TB: language-ID (stopword
n-gram heuristic), quality scoring (length/punct/stopword/caps ratios),
token counting (whitespace + BPE-ish regex), and document
fingerprinting (normalized content hash).  Each has an exact ANSI-SQL
twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE

# tiny per-language stopword signals for the heuristic language ID
LANG_SIGNALS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "los", "que", "es", "una"],
}

EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# BPE-ish token regex: words-with-leading-space style pieces — letter
# runs, digit runs, or single non-space symbols (a public-vocabulary
# approximation of byte-pair pre-tokenization)
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, WS_RE)))


def bpe_token_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.coalesce(F.regexp_count(c, F.lit(BPE_TOKEN_RE)), F.lit(0))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """occurrences of each language's stopword set, word-bounded,
    case-insensitive."""
    c = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(c)
    return {
        lang: sum(
            (F.regexp_count(lowered, F.lit(rf"\b{w}\b")) for w in words), F.lit(0)
        )
        for lang, words in LANG_SIGNALS.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax language; ties broken by language code order; 'und' when no
    signal at all.

    Implemented as ONE array_max over (score, -rank) structs: lexical
    struct comparison maximizes score and, on ties, minimizes the rank —
    i.e. the first language in code order wins, exactly the old chained
    `when` semantics.  The chain was an exponentially duplicated
    expression tree (each step embedded the whole prior chain in both
    branches, so every stopword regexp appeared up to 2^|langs| times in
    the generated code); runtime subexpression elimination hid most of
    the eval cost, but the generated function blew past whole-stage
    codegen size limits — this compact form stays inside them and cut
    the balancing query's steady-state sf0.1 run ~2.5× (value-parity
    verified against the old form)."""
    scores = lang_scores(text)
    langs = sorted(scores)
    arr = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(-i).alias("nrank"))
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(arr)
    code = F.element_at(F.array(*[F.lit(lang) for lang in langs]), -best["nrank"] + 1)
    return F.when(best["score"] > 0, code).otherwise(F.lit("und"))


def quality_columns(text: Column | str) -> dict[str, Column]:
    """length, punctuation ratio, stopword ratio, uppercase ratio, and a
    combined [0,1] quality score with fixed public weights."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_upper = F.regexp_count(c, F.lit(r"[A-Z]"))
    n_tokens = whitespace_token_count(c)
    stop_re = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    n_stop = F.regexp_count(F.lower(c), F.lit(stop_re))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    quality = (
        F.lit(0.4) * length_score
        + F.lit(0.3) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0)))
    )
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": punct_ratio.cast("double"),
        "upper_ratio": upper_ratio.cast("double"),
        "stop_ratio": stop_ratio.cast("double"),
        "quality": quality.cast("double"),
    }


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: sha2 over lowercased,
    whitespace-collapsed text — the exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.trim(F.regexp_replace(F.lower(c), WS_RE, " "))
    return F.sha2(normalized, 256)


def analyze(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → per-doc analysis columns (one narrow pass)."""
    q = quality_columns(text_col)
    return documents.select(
        "*",
        lang_id(text_col).alias("pred_lang"),
        fingerprint(text_col).alias("fingerprint"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
        *[col.alias(name) for name, col in q.items() if name != "n_chars"],
    )


def char_entropy(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy — the classic
    gibberish / encoding-noise / low-diversity signal a quality
    pipeline thresholds on (very low ⇒ repeated filler, very high ⇒
    binary junk or base64 blobs).

    Engine parity (the doc_logprob playbook, tfidf.py): each per-char
    log2-probability is rounded to 6dp and scaled to an INTEGER inside
    the UDF (round-half-up, matching DuckDB/Spark ROUND on positives),
    the per-doc sum is an exact BIGINT, and the final 6dp rounding is
    integer micro-unit division ((2s+n) div 2n) JVM-side — so neither
    float accumulation order nor a half-boundary division can diverge.

    100 TB shape: one Arrow pass, ZERO shuffle — the char histogram is
    row-local (a groupBy(doc, char) formulation would shuffle the whole
    corpus byte stream); only (id, 3 ints) leave the UDF.  Empty/null
    texts are excluded (no distribution to measure).
    """
    import math
    from collections import Counter

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def ent(xs: pd.Series) -> pd.Series:
        out = []
        for s in xs:
            s = (s or "").lower()
            n = len(s)
            if n == 0:
                out.append([0, 0, 0])
                continue
            acc = 0
            cnt = Counter(s)
            for nc in cnt.values():
                t = -math.log2(nc / n)  # >= 0
                # 6dp round-half-up, scaled to int — the exact twin of
                # CAST(ROUND(-log2(..) * 1e6) AS BIGINT)
                acc += nc * int(math.floor(t * 1e6 + 0.5))
            out.append([n, len(cnt), acc])
        return pd.Series(out)

    src = documents.filter(F.length(F.coalesce(F.col(text_col), F.lit(""))) >= 1)
    e = src.select(F.col(id_col).alias("doc_id"), ent(F.col(text_col)).alias("_e"))
    # final 6dp rounding done in exact integer micro-units: round-half-up
    # of (sum / n_chars) via (2s + n) div (2n) — no float half-boundary can
    # flip between engines; the one double op left (micro/1e6) is identical
    # IEEE arithmetic on identical integers.
    return e.select(
        "doc_id",
        F.col("_e")[0].cast("bigint").alias("n_chars"),
        F.col("_e")[1].cast("bigint").alias("n_alphabet"),
        (
            F.expr("(2 * _e[2] + _e[0]) div (2 * _e[0])").cast("double") / 1e6
        ).alias("entropy"),
    )
