"""TF-IDF term scoring and corpus vocabulary — the term-statistics
primitives of a training-data pipeline (salient-term extraction for
dataset inspection, vocabulary construction for tokenizer training).

Scale shape (the 100 TB plan, verified with .explain):
- tokenize = split + explode: narrow, whole-stage codegen, no Python;
- tf = one hash aggregate on (doc, token) with map-side partial agg;
- df (document frequency) aggregates the ALREADY-reduced tf table — one
  token-keyed shuffle over the vocabulary, never the token stream;
- the corpus size joins in as a broadcast single-row relation
  (no global window, no collect);
- top-k per doc is a row_number window partitioned by doc (the same
  doc-keyed partitioning tf already has);
- vocabulary top-N is orderBy+limit = distributed TakeOrdered — each
  partition contributes its local top-N, only N rows reach the driver.

Cross-engine determinism (the kmeans_centroids playbook): idf is rounded
to 6dp BEFORE the tf multiply, the score again after, and ranking orders
by the ROUNDED score with the token string as the total-order tie-break,
so both engines rank the identical matrix.

Tokenization is the explicit whitespace class WS_RE shared with the
token-count/packing twins (bare \\s diverges across engines on U+000B).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE


def _tokens(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) pairs: lowercased, explicit-whitespace-split, empties
    dropped (an empty document contributes nothing)."""
    return (
        documents.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )


def doc_tfidf_topk(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document →
    (id, tok, tf, score, rnk), smooth idf = ln((1+N)/(1+df)) + 1
    (the standard add-one-smoothed form, so unseen-corpus edge cases
    never divide by zero)."""
    toks = _tokens(documents, id_col, text_col)
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = documents.select(F.count("*").alias("n_docs"))

    idf6 = F.round(F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df"))) + F.lit(1.0), 6)
    scored = (
        tf.join(df, on="tok")
        .crossJoin(F.broadcast(n))
        .withColumn("score", F.round(F.col("tf") * idf6, 6))
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            "id",
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("score").cast("double").alias("score"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def doc_unigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the KenLM-perplexity-filter stand-in (CCNet/Gopher
    style quality signal: gibberish and boilerplate score far from the
    corpus mode) → (id, n_tokens, avg_logprob).

    Scale shape: token stream reduces to corpus counts in ONE hash agg;
    the per-token logprob table is vocabulary-sized and joins back to the
    (doc, token) tf table token-keyed (AQE broadcasts it when small);
    documents with zero tokens carry no probability mass and are absent.

    Cross-engine exactness: the per-token logprob is rounded to 6dp and
    SCALED TO AN INTEGER (×10^6) before the per-doc sum — integer sums
    are associative, so the result is independent of Spark's partial-agg
    order AND bit-identical to the DuckDB twin, where a double sum over
    an unspecified row order would not be.
    """
    toks = _tokens(documents, id_col, text_col)
    # tf is consumed twice (model fit + per-doc join) and vocab twice
    # (total + logprob table): checkpoint both so the corpus is scanned
    # and token-exploded ONCE — Spark re-executes shared subtrees per
    # consumer otherwise (ReuseExchange does not span AQE subqueries),
    # which at 100 TB means re-reading the corpus per use.  Lazy, so
    # nothing materializes until the first action.
    tf = (
        toks.groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = (
        tf.groupBy("tok").agg(F.sum("tf").alias("n")).localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("n").alias("total"))

    lp6 = F.round(F.log(F.col("n") / F.col("total")), 6)
    lp_scaled = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.round(lp6 * 1_000_000).cast("long").alias("lp_i")
    )
    return (
        tf.join(lp_scaled, on="tok")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_i")).alias("lp_sum"),
        )
        .select(
            "id",
            "n_tokens",
            # exact 6dp: half-away-from-zero on the BIGINT rational
            # lp_sum/n_tokens (ROUND(double) splits on .5 ties between
            # engines — same class as the flesch fix; caught by the
            # extended randomized gate)
            F.expr(
                "CAST(CASE WHEN lp_sum >= 0 THEN (2*lp_sum + n_tokens) DIV (2*n_tokens) "
                "ELSE -((-2*lp_sum + n_tokens) DIV (2*n_tokens)) END AS DOUBLE) / 1000000.0"
            ).alias("avg_logprob"),
        )
    )


def vocabulary_topn(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus-level top-N tokens by total occurrence count → (tok, n);
    ties broken by token string so the cut is a total order.  orderBy +
    limit compiles to TakeOrdered: per-partition local top-N, only N
    rows cross to the driver — no global sort."""
    return (
        _tokens(documents, id_col, text_col)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(top_n)
        .select("tok", F.col("n").cast("bigint").alias("n"))
    )


def hapax_by_lang(
    documents: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-language type/token corpus-health statistics →
    (lang, n_tokens, n_types, n_hapax, hapax_permille_types).

    Hapax legomena (types occurring exactly once in a language's
    corpus) are the classic OCR-garbage / boilerplate-noise signal for
    training-data triage: a healthy natural-language slice sits around
    40-60% hapax share of types (Zipf), while scraped noise pushes it
    toward 1000‰.  The share is reported as an exact integer permille
    (floor division) per the repo's integer-exactness convention.

    Scale shape: two hash aggregates — (lang, tok) with map-side
    combine collapses the exploded token stream to the per-language
    vocabulary, then a |langs|-row rollup.  No window, no join, no
    driver data."""
    counts = (
        documents.select(
            F.col(lang_col).alias("lang"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint").alias("n_hapax"),
        )
        .withColumn(
            "hapax_permille_types",
            F.expr("CAST((1000 * n_hapax) DIV n_types AS BIGINT)"),
        )
    )


def dsir_weights(
    documents: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169) scored with unigram bag-of-words features:
    per-document mean log importance ratio log(p_target/p_raw) under
    Laplace-smoothed unigram models, where the target model is fit on
    the rows matching the ``target`` predicate and the raw model on the
    whole corpus → (id, n_tokens, avg_llr).  Rank by ``avg_llr`` (or
    feed ``exp(avg_llr)`` to ``sampling.weighted_keep``) to select
    corpus data distributed like the target slice.

    Smoothing: add-1 over the RAW vocabulary V (the target slice is a
    subset of the corpus, so its vocabulary is a subset of V and every
    ratio is finite):  p_t = (c_t+1)/(N_t+V),  p_r = (c_r+1)/(N_r+V).

    Scale shape: the token stream collapses to (doc, tok, tf) in one
    hash agg; BOTH models come out of a single vocabulary-sized agg over
    it (sum + filtered sum — the target model is a conditional sum, not
    a second corpus pass); the per-token log-ratio table is
    vocabulary-sized and joins back token-keyed (AQE broadcasts it when
    small).  Zero-token documents carry no mass and are absent, same as
    :func:`doc_unigram_logprob`.

    Cross-engine exactness: same recipe as ``doc_unigram_logprob`` —
    the log argument is one double division of two exactly-representable
    integer products, the log-ratio is rounded to 6dp and integer-scaled
    before the per-doc sum, so the sum is associative and bit-identical
    to the DuckDB twin.
    """
    tagged = documents.select(
        F.col(id_col).alias("id"),
        target.alias("tgt"),
        F.col(text_col).alias("_text"),
    )
    toks = tagged.select(
        "id",
        "tgt",
        F.explode(F.split(F.trim(F.lower(F.col("_text"))), WS_RE)).alias("tok"),
    ).filter(F.col("tok") != "")
    # same exchange-reuse discipline as doc_unigram_logprob: tf and
    # vocab each feed two consumers — checkpoint so the corpus is
    # scanned and exploded once, not three times.
    tf = (
        toks.groupBy("id", "tgt", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = tf.groupBy("tok").agg(
        F.sum("tf").alias("n_r"),
        F.coalesce(F.sum(F.when(F.col("tgt"), F.col("tf"))), F.lit(0)).alias("n_t"),
    ).localCheckpoint(eager=False)
    tot = vocab.agg(
        F.sum("n_r").alias("NR"), F.sum("n_t").alias("NT"), F.count("*").alias("V")
    )
    llr6 = F.round(
        F.log(
            ((F.col("n_t") + 1) * (F.col("NR") + F.col("V")))
            / ((F.col("n_r") + 1) * (F.col("NT") + F.col("V")))
        ),
        6,
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "tok", F.round(llr6 * 1_000_000).cast("long").alias("lp_i")
    )
    return (
        tf.join(lp, on="tok")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_i")).alias("lp_sum"),
        )
        .select(
            "id",
            "n_tokens",
            # exact 6dp (see avg_logprob note): seed-1201 gate catch
            F.expr(
                "CAST(CASE WHEN lp_sum >= 0 THEN (2*lp_sum + n_tokens) DIV (2*n_tokens) "
                "ELSE -((-2*lp_sum + n_tokens) DIV (2*n_tokens)) END AS DOUBLE) / 1000000.0"
            ).alias("avg_llr"),
        )
    )


# interpolation weight for the bigram model; LAM2 is computed ONCE here
# and repr-injected into the SQL twin so both engines use the identical
# IEEE double (1 - 0.7 is NOT 0.3 in binary floating point)
BIGRAM_LAMBDA = 0.7
BIGRAM_LAMBDA2 = 1.0 - BIGRAM_LAMBDA


def doc_bigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean INTERPOLATED-BIGRAM log-probability under the
    corpus's own LM: lp(w1,w2) = ln(λ·P(w2|w1) + (1-λ)·P(w2)) —
    one rung up the n-gram ladder from doc_unigram_logprob and the
    closer stand-in for the KenLM perplexity filter (CCNet): word-salad
    that sails through a unigram model (common words, shuffled order)
    scores far from the corpus mode here.
    → (id, n_bigrams, avg_logprob); docs with <2 tokens are absent.

    Scale shape: the per-doc bigram stream is built INSIDE the row
    (collocations.py's transform — adjacency never shuffles); it reduces
    to per-doc multiplicities in one hash agg, the corpus bigram and
    unigram models are ONE further agg each over the already-reduced
    tables, and both join back by gram key (vocabulary-sized, AQE
    broadcasts when small).  The interpolation backoff means unseen-pair
    smoothing costs nothing: every observed pair has both terms.

    Cross-engine exactness: per-pair logprob rounded to 6dp then
    integer-scaled before the per-doc sum (associative — the
    doc_unigram_logprob playbook); λ and 1-λ reach both engines as
    repr'd doubles."""
    from docs2kg_spark.operators.collocations import _token_arrays

    arrs = _token_arrays(documents, id_col, text_col)
    pairs_col = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1), "
            "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    # per-doc bigram multiplicities; consumed by the corpus model AND the
    # per-doc score join — checkpoint so the explode happens once
    tf_big = (
        arrs.select("id", F.explode(pairs_col).alias("p"))
        .select("id", "p.w1", "p.w2")
        .groupBy("id", "w1", "w2")
        .agg(F.count("*").alias("m"))
        .localCheckpoint(eager=False)
    )
    big = tf_big.groupBy("w1", "w2").agg(F.sum("m").alias("c_xy"))
    uni = (
        arrs.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    n_tok = uni.agg(F.sum("c").alias("n_tok"))

    p_bi = F.col("c_xy").cast("double") / F.col("c_x")
    p_uni = F.col("c_y").cast("double") / F.col("n_tok")
    lp6 = F.round(
        F.log(F.lit(BIGRAM_LAMBDA) * p_bi + F.lit(BIGRAM_LAMBDA2) * p_uni), 6
    )
    lp_scaled = (
        big.join(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_x")), on="w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_y")), on="w2")
        .crossJoin(F.broadcast(n_tok))
        .select("w1", "w2", F.round(lp6 * 1_000_000).cast("long").alias("lp_i"))
    )
    return (
        tf_big.join(lp_scaled, on=["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("m").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("m") * F.col("lp_i")).alias("_lp_sum"),
        )
        .select(
            "id",
            "n_bigrams",
            # exact 6dp (see avg_logprob note)
            F.expr(
                "CAST(CASE WHEN _lp_sum >= 0 THEN (2*_lp_sum + n_bigrams) DIV (2*n_bigrams) "
                "ELSE -((-2*_lp_sum + n_bigrams) DIV (2*n_bigrams)) END AS DOUBLE) / 1000000.0"
            ).alias("avg_logprob"),
        )
    )
