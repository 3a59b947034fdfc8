"""Text-analysis queries: language ID, quality, tokens, vocabulary, LM scoring, collocations, BPE, corpus statistics.

Split from the original queries.py monolith (round-4 verdict item 6);
segment order preserved.  Registry: docs2kg_spark.queries (package
__init__ re-exports every name, driver contract unchanged).
"""
from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from docs2kg_spark.config import DEFAULT_GAZETTEER
from docs2kg_spark.functions.ids import WS_RE
from docs2kg_spark.oracle.sql_twins import (
    kg_canonical_map_sql,
    kg_edges_sql,
    kg_mentions_sql,
    kg_nodes_sql,
    kg_triples_sql,
    minhash_estimator_audit_sql,
    minhash_near_dup_sql,
)

from docs2kg_spark.queries._shared import (
    TRANSCRIPTS_CTE,
    _kg_stack,
    _logprob_memo,
    _t,
    derive_transcripts,
)



def q_token_counts(spark, sf_dir):
    from docs2kg_spark.operators.text import bpe_token_count, whitespace_token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count("text").cast("bigint").alias("ws_tokens"),
        bpe_token_count("text").cast("bigint").alias("bpe_tokens"),
    )


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+')) END AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_tokens
FROM documents
"""


def q_quality(spark, sf_dir):
    from docs2kg_spark.operators.text import quality_columns

    d = _t(spark, sf_dir, "documents")
    q = quality_columns("text")
    return d.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        F.round(q["punct_ratio"], 6).alias("punct_ratio"),
        F.round(q["stop_ratio"], 6).alias("stop_ratio"),
        F.round(q["quality"], 6).alias("quality"),
    )


SQL_QUALITY = r"""
WITH m AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+')) END AS n_tokens,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END, 6) AS punct_ratio,
       ROUND(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END, 6) AS stop_ratio,
       ROUND(0.4 * LEAST(n_chars / 500.0, 1.0)
           + 0.3 * LEAST(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 2, 1.0)
           + 0.3 * (1.0 - LEAST(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)), 6) AS quality
FROM m
"""


def q_lang_id(spark, sf_dir):
    from docs2kg_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_id("text").alias("pred_lang"))


def _sql_lang_score(lang_words):
    return " + ".join(rf"len(regexp_extract_all(lower(text), '\b{w}\b'))" for w in lang_words)


SQL_LANG_ID = rf"""
WITH s AS (
  SELECT doc_id,
         {_sql_lang_score(['the','and','of','to','is'])} AS s_en,
         {_sql_lang_score(['der','die','und','ist','nicht'])} AS s_de,
         {_sql_lang_score(['le','la','et','les','est'])} AS s_fr,
         {_sql_lang_score(['el','los','que','es','una'])} AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
            WHEN s_fr >= GREATEST(s_de, s_en, s_es) AND s_fr > 0 THEN
              CASE WHEN s_fr > GREATEST(s_de, s_en, s_es) THEN 'fr'
                   WHEN s_es = s_fr THEN 'es' WHEN s_en >= s_fr THEN 'en' WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END
            ELSE 'x' END AS pred_lang
FROM s
"""
# NOTE: tie-breaking by language-code order is fiddly in nested CASEs —
# the real oracle below builds it mechanically.


def _sql_lang_id_mechanical():
    """argmax with ties → lexicographically-smallest language code,
    mirroring operators/text.py::lang_id exactly: fold over languages in
    sorted order, replace only on strictly-greater score."""
    langs = {
        "de": ["der", "die", "und", "ist", "nicht"],
        "en": ["the", "and", "of", "to", "is"],
        "es": ["el", "los", "que", "es", "una"],
        "fr": ["le", "la", "et", "les", "est"],
    }
    scores = {lang: _sql_lang_score(ws) for lang, ws in langs.items()}
    ordered = sorted(langs)
    best_score, best_lang = f"s_{ordered[0]}", f"'{ordered[0]}'"
    for lang in ordered[1:]:
        best_lang = f"CASE WHEN s_{lang} > {best_score} THEN '{lang}' ELSE {best_lang} END"
        best_score = f"GREATEST(s_{lang}, {best_score})"
    inner = ", ".join(f"{expr} AS s_{lang}" for lang, expr in scores.items())
    return f"""
WITH s AS (SELECT doc_id, {inner} FROM documents)
SELECT doc_id, CASE WHEN {best_score} > 0 THEN {best_lang} ELSE 'und' END AS pred_lang FROM s
"""


SQL_LANG_ID = _sql_lang_id_mechanical()


def q_intersect_langs(spark, sf_dir):
    """intersect set op (§2.7 'free'): languages present in both halves
    of the corpus."""
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("doc_id") % 2 == 0).select("lang")
    b = d.filter(F.col("doc_id") % 2 == 1).select("lang")
    return a.intersect(b)


SQL_INTERSECT = """
SELECT lang FROM documents WHERE doc_id % 2 = 0
INTERSECT
SELECT lang FROM documents WHERE doc_id % 2 = 1
"""


# ---------------------------------------------------------------------------
# repetition quality signals (operators/quality.py — Gopher-rule family)
# ---------------------------------------------------------------------------


def q_doc_repetition(spark, sf_dir):
    from docs2kg_spark.operators.quality import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"))


# relational recomputation of the narrow array-fold signals: unnest the
# words per doc and aggregate — oracle-grade, not the 100 TB shape (the
# Spark side never leaves the row; see operators/quality.py docstring)
SQL_DOC_REPETITION = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+'), x -> x <> '') AS words
  FROM documents
),
base AS (SELECT doc_id, text, words, len(words) AS n FROM w),
uw AS (SELECT doc_id, unnest(words) AS word FROM base),
topw AS (
  SELECT doc_id, max(c) AS topc, sum(c * length(word)) AS sl
  FROM (SELECT doc_id, word, count(*) AS c FROM uw GROUP BY doc_id, word)
  GROUP BY doc_id
),
iw AS (SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM base),
g AS (SELECT a.doc_id, a.wd || ' ' || b.wd AS gram
      FROM iw a JOIN iw b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
gs AS (SELECT doc_id, count(*) AS ng, count(DISTINCT gram) AS dg FROM g GROUP BY doc_id),
ln AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), l -> trim(l) <> '') AS lines
  FROM base
)
SELECT b.doc_id,
       CAST(b.n AS INT) AS n_words,
       CASE WHEN b.n > 0 THEN ROUND(topw.topc::DOUBLE / b.n, 6) END AS top_word_frac,
       CASE WHEN gs.ng > 0 THEN ROUND(1.0 - gs.dg::DOUBLE / gs.ng, 6) END AS dup_2gram_frac,
       CASE WHEN b.n > 0 THEN ROUND(topw.sl::DOUBLE / b.n, 6) END AS mean_word_len,
       CASE WHEN b.n > 0 THEN
         ROUND((length(b.text) - length(regexp_replace(b.text, '[#…]', '', 'g')))::DOUBLE / b.n, 6)
       END AS symbol_word_ratio,
       CASE WHEN len(ln.lines) > 0 THEN
         ROUND(len(list_filter(ln.lines, l -> regexp_matches(ltrim(l), '^[-*•]')))::DOUBLE / len(ln.lines), 6)
       END AS bullet_line_frac
FROM base b
LEFT JOIN topw ON topw.doc_id = b.doc_id
LEFT JOIN gs ON gs.doc_id = b.doc_id
LEFT JOIN ln ON ln.doc_id = b.doc_id
"""


def q_doc_tfidf(spark, sf_dir):
    from docs2kg_spark.operators.tfidf import doc_tfidf_topk

    d = _t(spark, sf_dir, "documents")
    return doc_tfidf_topk(d, top_k=5).withColumnRenamed("id", "doc_id")


# idf is rounded to 6dp BEFORE the tf multiply and the score again after,
# identically on both sides, so both engines rank the same matrix (the
# kmeans_centroids cross-engine playbook); ties break on the token string
# (binary collation in both engines).
SQL_DOC_TFIDF = r"""
WITH toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
), tf AS (
  SELECT id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.id, tf.tok, tf.tf,
         ROUND(tf.tf * ROUND(ln((1 + n_docs) / CAST(1 + df AS DOUBLE)) + 1.0, 6), 6) AS score
  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
), ranked AS (
  SELECT id AS doc_id, tok, CAST(tf AS BIGINT) AS tf, score,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY score DESC, tok) AS rnk
  FROM scored
)
SELECT doc_id, tok, tf, score, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 5
"""


def q_vocab_topk(spark, sf_dir):
    from docs2kg_spark.operators.tfidf import vocabulary_topn

    return vocabulary_topn(_t(spark, sf_dir, "documents"), top_n=100)


SQL_VOCAB_TOPK = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
)
SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks WHERE tok <> ''
GROUP BY tok ORDER BY n DESC, tok LIMIT 100
"""


def q_doc_logprob(spark, sf_dir):
    return _logprob_memo(spark, sf_dir)


# per-token logprob rounded to 6dp then scaled to an INTEGER before the
# per-doc sum: integer sums are associative, so the value is independent
# of either engine's aggregation order (see operators/tfidf.py)
SQL_DOC_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
), tf AS (
  SELECT id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), vocab AS (
  SELECT tok, SUM(tf) AS n FROM tf GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM vocab),
lp AS (
  SELECT tok, CAST(ROUND(ROUND(ln(n / CAST(total AS DOUBLE)), 6) * 1000000) AS BIGINT) AS lp_i
  FROM vocab CROSS JOIN tot
)
SELECT tf.id AS doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN SUM(tf.tf * lp.lp_i) >= 0 THEN (2*(SUM(tf.tf * lp.lp_i)) + SUM(tf.tf)) // (2*(SUM(tf.tf))) ELSE -((-2*(SUM(tf.tf * lp.lp_i)) + SUM(tf.tf)) // (2*(SUM(tf.tf)))) END AS DOUBLE) / 1000000.0 AS avg_logprob
FROM tf JOIN lp USING (tok)
GROUP BY tf.id
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights with the en-language slice as the target
    distribution — en is the corpus head (218/500 at sf0.01), so both
    models are well-populated and the log-ratios are non-degenerate."""
    from docs2kg_spark.operators.tfidf import dsir_weights

    d = _t(spark, sf_dir, "documents")
    return dsir_weights(d, target=F.col("lang") == "en").select(
        F.col("id").alias("doc_id"), "n_tokens", "avg_llr"
    )


SQL_DSIR_WEIGHTS = r"""
WITH toks AS (
  SELECT doc_id AS id, (lang = 'en') AS tgt,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
), tf AS (
  SELECT id, tgt, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2, 3
), vocab AS (
  SELECT tok, SUM(tf) AS n_r,
         COALESCE(SUM(tf) FILTER (WHERE tgt), 0) AS n_t
  FROM tf GROUP BY 1
), tot AS (SELECT SUM(n_r) AS nr, SUM(n_t) AS nt, COUNT(*) AS v FROM vocab),
lp AS (
  SELECT tok,
         CAST(ROUND(ROUND(ln(((n_t + 1) * (nr + v)) / CAST((n_r + 1) * (nt + v) AS DOUBLE)), 6) * 1000000) AS BIGINT) AS lp_i
  FROM vocab CROSS JOIN tot
)
SELECT tf.id AS doc_id,
       CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN SUM(tf.tf * lp.lp_i) >= 0 THEN (2*(SUM(tf.tf * lp.lp_i)) + SUM(tf.tf)) // (2*(SUM(tf.tf))) ELSE -((-2*(SUM(tf.tf * lp.lp_i)) + SUM(tf.tf)) // (2*(SUM(tf.tf)))) END AS DOUBLE) / 1000000.0 AS avg_llr
FROM tf JOIN lp USING (tok)
GROUP BY tf.id
"""


def q_doc_lang_balance(spark, sf_dir):
    from docs2kg_spark.operators.sampling import balance_by_class
    from docs2kg_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    # thin (id, label) projection checkpointed once: balance_by_class
    # reads its input twice (class counts + the filter pass), and the
    # lang-id expression is the expensive part of this query
    labeled = d.select("doc_id", lang_id("text").alias("pred_lang")).localCheckpoint(
        eager=False
    )
    return balance_by_class(labeled, "pred_lang", "doc_id").select("doc_id", "pred_lang")


def _doc_lang_balance_sql() -> str:
    """Downsample every predicted language to the smallest class's size:
    keep iff bucket * class_n < 65536 * target — pure integer arithmetic,
    composed on the mechanical lang-id twin."""
    return f"""
WITH lang AS ({_sql_lang_id_mechanical()}),
counts AS (SELECT pred_lang, COUNT(*) AS class_n FROM lang GROUP BY 1),
tgt AS (SELECT MIN(class_n) AS target FROM counts)
SELECT l.doc_id, l.pred_lang
FROM lang l JOIN counts c ON l.pred_lang = c.pred_lang CROSS JOIN tgt
WHERE ('0x' || substr(md5(CAST(l.doc_id AS VARCHAR) || '|balance-v1'), 1, 4))::BIGINT * c.class_n
      < CAST(65536 AS BIGINT) * tgt.target
"""


# ---------------------------------------------------------------------------
# bigram PMI collocations (operators/collocations.py)
# ---------------------------------------------------------------------------


def q_collocations(spark, sf_dir):
    """Top-100 adjacent-bigram collocations by PMI over the corpus —
    the multi-word-expression / tokenizer-merge-candidate statistic."""
    from docs2kg_spark.operators.collocations import bigram_pmi

    return bigram_pmi(_t(spark, sf_dir, "documents"), min_count=3, top_n=100)


# the PMI double is the SAME left-associative expression in both engines
# (CAST(pair_count AS DOUBLE) * n_tok / c1 * n_tok / c2 / n_big), rounded
# to 6dp before ranking; (w1, w2) is unique so the order is total
SQL_COLLOCATIONS = r"""
WITH arrs AS (
  SELECT list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+'),
                     x -> x <> '') AS toks
  FROM documents
), pairs AS (
  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
  FROM arrs WHERE len(toks) >= 2
), bigrams AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS pair_count FROM pairs GROUP BY 1, 2
), uc AS (
  SELECT tok, COUNT(*) AS c FROM (SELECT unnest(toks) AS tok FROM arrs) GROUP BY 1
), tot AS (
  SELECT CAST((SELECT SUM(c) FROM uc) AS BIGINT) AS n_tok,
         CAST((SELECT SUM(pair_count) FROM bigrams) AS BIGINT) AS n_big
)
SELECT w1, w2, CAST(pair_count AS BIGINT) AS pair_count,
       ROUND(ln(CAST(pair_count AS DOUBLE) * n_tok / c1.c * n_tok / c2.c / n_big), 6) AS pmi
FROM bigrams JOIN uc c1 ON c1.tok = w1 JOIN uc c2 ON c2.tok = w2 CROSS JOIN tot
WHERE pair_count >= 3
ORDER BY pmi DESC, w1, w2 LIMIT 100
"""


def q_lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix: predicted vs labeled language,
    (true_lang, pred_lang, n) — the eval read for the lang_id filter."""
    from docs2kg_spark.operators.text import lang_id

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.col("lang").alias("true_lang"), lang_id("text").alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def _lang_id_confusion_sql() -> str:
    return f"""
WITH lc_pred AS ({SQL_LANG_ID})
SELECT d.lang AS true_lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n
FROM documents d JOIN lc_pred p USING (doc_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# BPE pair statistics (operators/bpe.py — tokenizer training)
# ---------------------------------------------------------------------------


def q_bpe_pair_stats(spark, sf_dir):
    """Top-50 adjacent character-pair counts over the word vocabulary —
    the round-0 BPE scoring table (what the first merge is chosen from);
    the full merge loop (bpe.py::bpe_learn) is pytest-verified against a
    plain-Python reference."""
    from docs2kg_spark.operators.bpe import bpe_pair_stats

    return bpe_pair_stats(_t(spark, sf_dir, "documents"))


SQL_BPE_PAIR_STATS = r"""
WITH bp_toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+'),
                            x -> x <> '')) AS word
  FROM documents
),
bp_wv AS (SELECT word, count(*) AS c FROM bp_toks GROUP BY 1),
bp_pos AS (
  SELECT word, c, unnest(generate_series(1, length(word) - 1)) AS i
  FROM bp_wv WHERE length(word) >= 2
)
SELECT substr(word, i, 1) AS sym_a, substr(word, i + 1, 1) AS sym_b,
       CAST(sum(c) AS BIGINT) AS pair_count
FROM bp_pos
GROUP BY 1, 2
ORDER BY pair_count DESC, sym_a, sym_b
LIMIT 50
"""


# ---------------------------------------------------------------------------
# interpolated-bigram LM quality scoring (operators/tfidf.py)
# ---------------------------------------------------------------------------


def q_doc_bigram_logprob(spark, sf_dir):
    """Per-doc mean interpolated-bigram log-probability under the
    corpus's own LM — the KenLM-perplexity-filter stand-in, one rung up
    from the unigram model (catches shuffled-word salad)."""
    from docs2kg_spark.operators.tfidf import doc_bigram_logprob

    d = _t(spark, sf_dir, "documents")
    return doc_bigram_logprob(d).withColumnRenamed("id", "doc_id")


def _doc_bigram_logprob_sql() -> str:
    from docs2kg_spark.operators.tfidf import BIGRAM_LAMBDA, BIGRAM_LAMBDA2

    return rf"""
WITH arrs AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+'),
                     x -> x <> '') AS toks
  FROM documents
), pairs AS (
  SELECT id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
  FROM arrs WHERE len(toks) >= 2
), tf_big AS (
  SELECT id, p[1] AS w1, p[2] AS w2, COUNT(*) AS m FROM pairs GROUP BY 1, 2, 3
), big AS (
  SELECT w1, w2, SUM(m) AS c_xy FROM tf_big GROUP BY 1, 2
), uni AS (
  SELECT tok, COUNT(*) AS c FROM (SELECT unnest(toks) AS tok FROM arrs) GROUP BY 1
), tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
lp AS (
  SELECT w1, w2,
         CAST(ROUND(ROUND(ln({BIGRAM_LAMBDA!r} * (CAST(c_xy AS DOUBLE) / c1.c)
                             + {BIGRAM_LAMBDA2!r} * (CAST(c2.c AS DOUBLE) / n_tok)), 6)
              * 1000000) AS BIGINT) AS lp_i
  FROM big JOIN uni c1 ON c1.tok = w1 JOIN uni c2 ON c2.tok = w2 CROSS JOIN tot
)
SELECT t.id AS doc_id,
       CAST(SUM(t.m) AS BIGINT) AS n_bigrams,
       CAST(CASE WHEN SUM(t.m * lp.lp_i) >= 0 THEN (2*(SUM(t.m * lp.lp_i)) + SUM(t.m)) // (2*(SUM(t.m))) ELSE -((-2*(SUM(t.m * lp.lp_i)) + SUM(t.m)) // (2*(SUM(t.m)))) END AS DOUBLE) / 1000000.0 AS avg_logprob
FROM tf_big t JOIN lp USING (w1, w2)
GROUP BY 1
"""


def q_hapax_by_lang(spark, sf_dir):
    """Per-language hapax-legomena corpus-health profile (exact integer
    permille — the OCR-garbage / boilerplate triage signal)."""
    from docs2kg_spark.operators.tfidf import hapax_by_lang

    return hapax_by_lang(_t(spark, sf_dir, "documents"))


SQL_HAPAX_BY_LANG = r"""
WITH toks AS (
  SELECT lang, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
), c AS (
  SELECT lang, tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST((1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS hapax_permille_types
FROM c GROUP BY lang
"""


def q_kwic_contexts(spark, sf_dir):
    """Keyword-in-context concordance for the extracted mentions (the
    annotation-audit read) — operators/profiling.py::kwic_contexts
    composed on the memoized segments+mentions chain."""
    from docs2kg_spark.operators.profiling import kwic_contexts

    segs, m = _kg_stack(spark, sf_dir)
    return kwic_contexts(m, segs, window=24)


def _kwic_contexts_sql(window: int = 24) -> str:
    from docs2kg_spark.oracle.sql_twins import _kg_prefix

    w = int(window)
    return f"""
{_kg_prefix(TRANSCRIPTS_CTE)}
SELECT m.conv_id, m.seg_id, m.start, m.text AS surface, m.label,
       substr(s.lt, greatest(1, m.start - {w - 1}), least(m.start, {w})) AS left_ctx,
       substr(s.lt, m."end" + 1, {w}) AS right_ctx
FROM mentions m JOIN segs s ON s.seg_id = m.seg_id
"""


def q_corpus_filter(spark, sf_dir):
    """Composite Gopher/C4-style quality gate with a per-document
    reject-reason bitmap — operators/quality.py::gopher_filter (every
    rule an exact integer cross-multiplication)."""
    from docs2kg_spark.operators.quality import gopher_filter

    return gopher_filter(_t(spark, sf_dir, "documents"))


SQL_CORPUS_FILTER = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+'), x -> x <> '') AS words
  FROM documents
),
base AS (SELECT doc_id, words, len(words) AS n FROM w),
uw AS (SELECT doc_id, unnest(words) AS word FROM base),
wc AS (SELECT doc_id, word, count(*) AS c FROM uw GROUP BY doc_id, word),
topw AS (
  SELECT doc_id, max(c) AS topc, sum(c * length(word)) AS sl,
         sum(CASE WHEN word IN ('the','a','an','and','or','of','to','in','is','it')
                  THEN c ELSE 0 END) AS nstop
  FROM wc GROUP BY doc_id
),
iw AS (SELECT doc_id, generate_subscripts(words, 1) AS i, unnest(words) AS wd FROM base),
g AS (SELECT a.doc_id, a.wd || ' ' || b.wd AS gram
      FROM iw a JOIN iw b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
gs AS (SELECT doc_id, count(*) AS ng, count(DISTINCT gram) AS dg FROM g GROUP BY doc_id),
f AS (
  SELECT b.doc_id, b.n,
         CASE WHEN b.n < 20 THEN 1 ELSE 0 END
       + CASE WHEN b.n > 0 AND (3 * b.n > t.sl OR t.sl > 12 * b.n) THEN 2 ELSE 0 END
       + CASE WHEN b.n > 0 AND 5 * t.topc > b.n THEN 4 ELSE 0 END
       + CASE WHEN coalesce(gs.ng, 0) > 0 AND 20 * (gs.ng - gs.dg) > 3 * gs.ng THEN 8 ELSE 0 END
       + CASE WHEN b.n > 0 AND 50 * coalesce(t.nstop, 0) < b.n THEN 16 ELSE 0 END AS reasons
  FROM base b LEFT JOIN topw t ON t.doc_id = b.doc_id LEFT JOIN gs ON gs.doc_id = b.doc_id
)
SELECT doc_id, CAST(n AS BIGINT) AS n_words, CAST(reasons AS INT) AS reasons,
       CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS INT) AS kept
FROM f
"""


def q_char_entropy(spark, sf_dir):
    """Per-doc character-level Shannon entropy (+ alphabet size) — the
    gibberish/encoding-noise quality signal.  One Arrow pass, zero
    shuffle; per-term 6dp-rounded integer scaling keeps both engines'
    sums bit-identical (operators/text.py::char_entropy)."""
    from docs2kg_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


SQL_CHAR_ENTROPY = r"""
WITH ed AS (
  SELECT doc_id, lower(text) AS lt FROM documents
  WHERE length(coalesce(text, '')) >= 1
),
ech AS (
  SELECT doc_id, substr(lt, i, 1) AS c, length(lt) AS n
  FROM (SELECT doc_id, lt, unnest(generate_series(1, length(lt))) AS i FROM ed)
),
ecnt AS (SELECT doc_id, c, n, COUNT(*) AS nc FROM ech GROUP BY 1, 2, 3),
eterm AS (
  SELECT doc_id, n,
         nc * CAST(ROUND(-log2(nc / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS s_i
  FROM ecnt
)
SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_alphabet,
       CAST((2 * SUM(s_i) + MAX(n)) // (2 * MAX(n)) AS DOUBLE) / 1000000.0 AS entropy
FROM eterm GROUP BY doc_id
"""


def q_ttr_by_source(spark, sf_dir):
    """Per-source type-token ratio (lexical diversity) — the corpus
    health read that flags template-stamped or boilerplate-heavy
    sources (low TTR) before they dilute a training mix.

    Scale shape: the token stream reduces to (source, tok) counts with
    map-side combine BEFORE the |sources|-row rollup (never a
    countDistinct over raw tokens); doc counts ride a separate thin
    agg on the already-narrow documents scan; ONE rounded division."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.lower("text"), WS_RE)).alias("tok")
    ).filter(F.col("tok") != "")
    per_source = (
        toks.groupBy("source", "tok")
        .agg(F.count("*").alias("tf"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum("tf").cast("bigint").alias("n_tokens"),
        )
    )
    nd = (
        d.filter(F.col("text").rlike(r"[^ \t\n\r\f\x0B]"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    return nd.join(per_source, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 6).alias("ttr"),
    )


SQL_TTR_BY_SOURCE = r"""
WITH ttoks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
),
ttf AS (SELECT source, tok, COUNT(*) AS tf FROM ttoks WHERE tok <> '' GROUP BY 1, 2),
tps AS (SELECT source, COUNT(*) AS n_types, SUM(tf) AS n_tokens FROM ttf GROUP BY 1),
tnd AS (
  SELECT source, COUNT(*) AS n_docs FROM documents
  WHERE regexp_matches(text, '[^ \t\n\r\f\x0B]') GROUP BY 1
)
SELECT t.source, CAST(n.n_docs AS BIGINT) AS n_docs,
       CAST(t.n_tokens AS BIGINT) AS n_tokens,
       CAST(t.n_types AS BIGINT) AS n_types,
       ROUND(CAST(t.n_types AS DOUBLE) / t.n_tokens, 6) AS ttr
FROM tps t JOIN tnd n USING (source)
"""


def q_turn_novelty(spark, sf_dir):
    """Per-turn lexical novelty over the derived transcripts: for each
    (conv, turn), how many of its distinct tokens appear for the FIRST
    time in the conversation at that turn — the discourse-progression
    signal (a flat-zero tail ⇒ the conversation is circling; SFT
    curation drops such spans).

    Scale shape: distinct (conv, turn, tok) → (conv, tok) first-turn
    agg → join back: both the agg and the join key on (conv, tok), so
    the second Exchange is ENSURE_REQUIREMENTS-eliminated; the final
    (conv, turn) rollup is turn-bounded.  Exact integers + one rounded
    division."""
    t = derive_transcripts(spark, sf_dir)
    toks = (
        t.select(
            "conv_id",
            "turn_idx",
            F.explode(F.split(F.lower("text"), WS_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    ).localCheckpoint(eager=False)  # first-turn agg + join read ONE pass
    firsts = toks.groupBy("conv_id", "tok").agg(F.min("turn_idx").alias("ft"))
    return (
        toks.join(firsts, ["conv_id", "tok"])
        .groupBy("conv_id", "turn_idx")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum((F.col("ft") == F.col("turn_idx")).cast("int"))
            .cast("bigint")
            .alias("n_new"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "n_types",
            "n_new",
            F.round(F.col("n_new").cast("double") / F.col("n_types"), 6).alias(
                "novelty"
            ),
        )
    )


def _turn_novelty_sql() -> str:
    return rf"""
WITH {TRANSCRIPTS_CTE.strip().rstrip()},
nvt AS (
  SELECT DISTINCT conv_id, turn_idx, tok FROM (
    SELECT conv_id, turn_idx,
           unnest(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+')) AS tok
    FROM transcripts
  ) WHERE tok <> ''
),
nvf AS (SELECT conv_id, tok, MIN(turn_idx) AS ft FROM nvt GROUP BY 1, 2)
SELECT t.conv_id, t.turn_idx, CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CASE WHEN f.ft = t.turn_idx THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       ROUND(CAST(SUM(CASE WHEN f.ft = t.turn_idx THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM nvt t JOIN nvf f ON f.conv_id = t.conv_id AND f.tok = t.tok
GROUP BY t.conv_id, t.turn_idx
"""


def q_zipf_slope(spark, sf_dir):
    """Per-source Zipf fit: OLS slope of ln(freq) on ln(rank) over the
    top-100 vocabulary — the corpus-health scalar (natural text ≈ −1;
    template-stamped or synthetic sources drift toward 0) Gopher-style
    curation tracks per domain.

    Scale shape: the token stream reduces to (source, tok, tf) with
    map-side combine; the rank window runs over the REDUCED relation
    and keeps 100 rows per source; the OLS moments are integer-scaled
    BIGINTs (ln·1e6 — exact, associative, order-independent sums; the
    slope is scale-invariant so the 1e6 cancels), one guarded division
    at the end."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split(F.lower("text"), WS_RE)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("source").orderBy(F.col("tf").desc(), F.col("tok"))
    top = tf.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 100)
    lr = F.round(F.log(F.col("rank").cast("double")) * 1e6).cast("bigint")
    lf = F.round(F.log(F.col("tf").cast("double")) * 1e6).cast("bigint")
    m = (
        top.select("source", lr.alias("lr"), lf.alias("lf"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("lr").alias("sx"),
            F.sum("lf").alias("sy"),
            F.sum(F.col("lr") * F.col("lr")).alias("sxx"),
            F.sum(F.col("lr") * F.col("lf")).alias("sxy"),
        )
    )
    num = (F.col("n_terms") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n_terms") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "source",
        "n_terms",
        F.round(F.when(den != 0, num / den), 6).alias("zipf_slope"),
    )


SQL_ZIPF_SLOPE = r"""
WITH ztoks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
),
ztf AS (SELECT source, tok, COUNT(*) AS tf FROM ztoks WHERE tok <> '' GROUP BY 1, 2),
ztop AS (
  SELECT source, tf,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY tf DESC, tok) AS rank
  FROM ztf QUALIFY rank <= 100
),
zl AS (
  SELECT source,
         CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS lr,
         CAST(round(ln(CAST(tf AS DOUBLE)) * 1e6) AS BIGINT) AS lf
  FROM ztop
),
zm AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM(lr) AS sx, SUM(lf) AS sy, SUM(lr * lr) AS sxx, SUM(lr * lf) AS sxy
  FROM zl GROUP BY 1
)
SELECT source, n_terms,
       ROUND(CAST(n_terms * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n_terms * sxx - sx * sx AS DOUBLE), 0.0), 6) AS zipf_slope
FROM zm
"""


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer-fertility audit per (lang, source): chars per BPE-ish
    token — the compression read that sizes token budgets per domain
    and flags scripts a tokenizer fragments (high chars/token drift
    within a lang means mixed content).

    Scale shape: pure row-local column expressions (regexp_count /
    length) reduced by ONE hash agg with map-side combine to
    |lang × source| rows; exact BIGINT sums, one guarded division."""
    from docs2kg_spark.operators.text import bpe_token_count

    d = _t(spark, sf_dir, "documents")
    g = (
        d.select(
            "lang",
            "source",
            F.length("text").cast("bigint").alias("nc"),
            bpe_token_count("text").cast("bigint").alias("nt"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nc").alias("n_chars"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    return g.select(
        "lang",
        "source",
        "n_docs",
        "n_chars",
        "n_tokens",
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_chars").cast("double") / F.col("n_tokens"),
            ),
            6,
        ).alias("chars_per_token"),
    )


SQL_TOKENIZER_FERTILITY = r"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS n_chars,
       CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(length(text)) AS DOUBLE)
             / NULLIF(CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DOUBLE), 0.0), 6)
         AS chars_per_token
FROM documents
GROUP BY 1, 2
"""


def q_perplexity_bands(spark, sf_dir):
    """Perplexity-filter profile: documents banded by their mean unigram
    log-probability (half-nat bands) — the CCNet-style read that picks
    the keep/drop thresholds for an LM-perplexity quality filter by
    showing where the corpus mass sits.

    Scale shape: composes the one-pass logprob operator (integer-scaled
    per-token sums) and reduces it with a single |bands|-row hash agg;
    the band id is floor arithmetic on values both engines already
    agree on bit-for-bit."""
    lp = _logprob_memo(spark, sf_dir)
    band = F.floor(F.col("avg_logprob") * 2).cast("bigint")
    total = lp.agg(F.count("*").alias("n_total"))
    return (
        lp.select(band.alias("band"), "n_tokens")
        .groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "band",
            "n_docs",
            "n_tokens",
            # empty-corpus guard: ANSI Spark throws on /0 where DuckDB
            # yields NULL — F.when matches the twin's NULLIF
            F.round(
                F.when(
                    F.col("n_total") > 0,
                    F.col("n_docs").cast("double") / F.col("n_total"),
                ),
                6,
            ).alias("share"),
        )
    )


SQL_PERPLEXITY_BANDS = f"""
WITH pb_lp AS ({SQL_DOC_LOGPROB}),
pb_t AS (SELECT COUNT(*) AS n_total FROM pb_lp)
SELECT CAST(FLOOR(avg_logprob * 2) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       ROUND(CAST(COUNT(*) AS DOUBLE) / NULLIF((SELECT n_total FROM pb_t), 0), 6) AS share
FROM pb_lp GROUP BY 1
"""


def q_quality_length_corr(spark, sf_dir):
    """Pearson correlation between document length and the composite
    quality score, per source — the audit that catches a quality filter
    silently proxying for length (a classic curation bias).

    Exactness: the quality score is rounded to 6dp (as in
    quality_scores) then integer-scaled, so all five moments are exact
    BIGINTs; the variance products are combined in DOUBLE (they exceed
    int64 at corpus scale) from those exact integers — deterministic on
    both engines.  Scale shape: row-local expressions, ONE hash agg."""
    from docs2kg_spark.operators.text import quality_columns

    d = _t(spark, sf_dir, "documents")
    q6 = F.round(F.round(quality_columns("text")["quality"], 6) * 1e6).cast("bigint")
    m = (
        d.select("source", F.col("n_chars").cast("bigint").alias("x"), q6.alias("y"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = F.col("n").cast("double") * F.col("sxx").cast("double") - (
        F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    vy = F.col("n").cast("double") * F.col("syy").cast("double") - (
        F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    den = F.sqrt(vx * vy)
    return m.select(
        "source", "n", F.round(F.when(den > 0, num / den), 6).alias("corr")
    )


def _quality_length_corr_sql() -> str:
    return f"""
WITH qc_q AS ({SQL_QUALITY}),
qc_m AS (
  SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(d.n_chars) AS sx,
         SUM(CAST(round(q.quality * 1e6) AS BIGINT)) AS sy,
         SUM(d.n_chars * CAST(round(q.quality * 1e6) AS BIGINT)) AS sxy,
         SUM(d.n_chars * d.n_chars) AS sxx,
         SUM(CAST(round(q.quality * 1e6) AS BIGINT) * CAST(round(q.quality * 1e6) AS BIGINT)) AS syy
  FROM documents d JOIN qc_q q USING (doc_id)
  GROUP BY 1
)
SELECT source, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 0.0), 6)
         AS corr
FROM qc_m
"""


RAKE_STOP_RE = r"\b(?:the|a|an|and|or|of|to|in|is|it)\b"


def q_rake_keywords(spark, sf_dir):
    """RAKE-style keyword extraction: stopword-delimited candidate
    phrases scored by Σ degree(w)/freq(w) over corpus-wide word
    statistics, top-3 phrases per document — the unsupervised
    keyword/topic tagger a curation pass runs to label domains.

    Exactness: degree and frequency are exact BIGINT aggregates; the
    per-word ratio is integer division of deg·10⁶ by freq (no float
    rounding anywhere until the display column), so phrase scores are
    exact integers on both engines.

    Scale shape: the phrase split is row-local; word stats reduce with
    ONE (word) hash agg broadcast back onto the exploded phrase-word
    stream; the top-3 window runs per doc over already-scored
    phrases."""
    d = _t(spark, sf_dir, "documents")
    phrase = F.trim(F.regexp_replace(F.col("ph_raw"), WS_RE, " "))
    phrases = (
        d.select(
            "doc_id", F.explode(F.split(F.lower("text"), RAKE_STOP_RE)).alias("ph_raw")
        )
        .select("doc_id", phrase.alias("phrase"))
        .filter(F.col("phrase") != "")
        .localCheckpoint(eager=False)  # word stats + scoring read ONE pass
    )
    words = phrases.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("w"),
        F.size(F.split("phrase", " ")).alias("plen"),
    )
    wstats = (
        words.groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
        .select("w", F.expr("deg * 1000000 DIV freq").alias("wscore"))
    )
    scored = (
        phrases.select("doc_id", "phrase").distinct()
        .select("doc_id", "phrase", F.explode(F.split("phrase", " ")).alias("w"))
        .join(wstats, "w")
        .groupBy("doc_id", "phrase")
        .agg(F.sum("wscore").cast("bigint").alias("score6"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score6").desc(), F.col("phrase"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "phrase",
            F.round(F.col("score6").cast("double") / 1e6, 6).alias("score"),
        )
    )


SQL_RAKE_KEYWORDS = r"""
WITH rk_raw AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '\b(?:the|a|an|and|or|of|to|in|is|it)\b')) AS ph_raw
  FROM documents
),
rk_p AS (
  SELECT doc_id, trim(regexp_replace(ph_raw, '[ \t\n\r\f\x0B]+', ' ', 'g')) AS phrase
  FROM rk_raw
),
rk_ph AS (SELECT doc_id, phrase FROM rk_p WHERE phrase <> ''),
rk_w AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w,
         len(string_split(phrase, ' ')) AS plen
  FROM rk_ph
),
rk_ws AS (
  SELECT w, (CAST(SUM(plen) AS BIGINT) * 1000000) // CAST(COUNT(*) AS BIGINT) AS wscore
  FROM rk_w GROUP BY 1
),
rk_scored AS (
  SELECT doc_id, phrase, CAST(SUM(wscore) AS BIGINT) AS score6
  FROM (
    SELECT DISTINCT doc_id, phrase FROM rk_ph
  ), LATERAL unnest(string_split(phrase, ' ')) AS u(w)
  JOIN rk_ws USING (w)
  GROUP BY 1, 2
)
SELECT doc_id, CAST(rank AS INT) AS rank, phrase,
       ROUND(CAST(score6 AS DOUBLE) / 1e6, 6) AS score
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score6 DESC, phrase) AS rank
  FROM rk_scored
) WHERE rank <= 3
"""


def q_flesch_readability(spark, sf_dir):
    """Flesch reading-ease per document, exactly: words W, sentences S
    (≥1), vowel-run syllable proxy Y, and the score's numerator
    num6 = 206835·S·W − 1015·W² − 84600·Y·S (= flesch·1000·S·W) kept
    as a BIGINT so the readability BAND is decided by integer
    comparison on both engines — the corpus-quality read a curation
    pass bands on.  The displayed 4-dp score is ALSO computed in
    integer space — half-away-from-zero on the exact rational
    num6·10/(s·w), then one division by 10⁴ — because ROUND(double, 4)
    diverges between engines exactly on .5 ties (Spark rounds the
    decimal rendering, DuckDB the binary double; the randomized gate
    caught 76.91375 → 76.9138 vs 76.9137 at seed 47).  Scale shape:
    pure row-local column expressions, zero shuffle."""
    return (
        _t(spark, sf_dir, "documents")
        .selectExpr(
            "doc_id",
            "CAST(size(regexp_extract_all(text, '[A-Za-z]+', 0)) AS BIGINT) AS w",
            "CAST(greatest(1, size(regexp_extract_all(text, '[.!?]', 0))) AS BIGINT) AS s",
            "CAST(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) AS BIGINT) AS y",
        )
        .filter("w > 0")
        .selectExpr(
            "doc_id",
            "w",
            "s",
            "y",
            "206835*s*w - 1015*w*w - 84600*y*s AS num6",
            "CASE WHEN 206835*s*w - 1015*w*w - 84600*y*s >= 60000*s*w THEN 'easy' "
            "WHEN 206835*s*w - 1015*w*w - 84600*y*s >= 30000*s*w THEN 'standard' "
            "ELSE 'difficult' END AS band",
        )
        .selectExpr(
            "doc_id",
            "w",
            "s",
            "y",
            "num6",
            "band",
            "CAST(CASE WHEN num6 >= 0 THEN (20*num6 + s*w) DIV (2*s*w) "
            "ELSE -((-20*num6 + s*w) DIV (2*s*w)) END AS DOUBLE) / 10000 AS flesch",
        )
    )


SQL_FLESCH = r"""
WITH fr AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS w,
         CAST(greatest(1, len(regexp_extract_all(text, '[.!?]'))) AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS y
  FROM documents
),
fn AS (
  SELECT doc_id, w, s, y,
         206835*s*w - 1015*w*w - 84600*y*s AS num6,
         CASE WHEN 206835*s*w - 1015*w*w - 84600*y*s >= 60000*s*w THEN 'easy'
              WHEN 206835*s*w - 1015*w*w - 84600*y*s >= 30000*s*w THEN 'standard'
              ELSE 'difficult' END AS band
  FROM fr WHERE w > 0
)
SELECT doc_id, w, s, y, num6, band,
       CAST(CASE WHEN num6 >= 0 THEN (20*num6 + s*w) // (2*s*w)
            ELSE -((-20*num6 + s*w) // (2*s*w)) END AS DOUBLE) / 10000 AS flesch
FROM fn
"""


def q_doc_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per document against the corpus top-1000
    token vocabulary — the tokenizer-coverage read (what fraction of a
    doc's tokens would map to <unk> under a frequency-built vocab).
    Vocabulary membership is decided by exact counts with a
    deterministic (count desc, token) boundary tie-break.

    Scale shape: tokens exploded ONCE (lazy checkpoint feeds both the
    vocab agg and the per-doc count); the vocab is a TakeOrdered top-N
    over the (token) hash agg — per-partition partial top-k merged on
    the driver, NEVER a global-window single-reducer sort — and joins
    back as a broadcast; per-doc reduction is one (doc) hash agg."""
    d = _t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=False)  # vocab + per-doc: ONE token pass
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(1000)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tok"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .selectExpr(
            "doc_id", "n_tok", "n_oov",
            "ROUND(CAST(n_oov AS DOUBLE) / n_tok, 6) AS oov_rate",
        )
    )


SQL_DOC_OOV_RATE = r"""
WITH ov_raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
ov_t AS (SELECT doc_id, tok FROM ov_raw WHERE tok <> ''),
ov_v AS (
  SELECT tok FROM (
    SELECT tok, ROW_NUMBER() OVER (ORDER BY count(*) DESC, tok) AS r
    FROM ov_t GROUP BY tok
  ) WHERE r <= 1000
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(count(*) FILTER (v.tok IS NULL) AS BIGINT) AS n_oov,
       ROUND(CAST(count(*) FILTER (v.tok IS NULL) AS DOUBLE) / count(*), 6) AS oov_rate
FROM ov_t t LEFT JOIN ov_v v ON v.tok = t.tok
GROUP BY 1
"""


_BLOOM_M = 4096
_BLOOM_K = 3


def q_length_lang_eta(spark, sf_dir):
    """One-way variance decomposition of document length by language:
    η² = SSB/SST (how much of length variance language explains) — the
    stratification-decision read (η² ≈ 0 ⇒ per-language length
    policies are pointless).  Group sums stay exact BIGINTs; the
    Σ S_g²/n_g fold runs over a SORTED in-row array (the
    label_centroid_cos discipline), never a float SUM across a
    hash-partitioned group.

    Scale shape: one (lang) hash agg to |langs| rows collected into a
    single in-row array; SST from the same exact moments."""
    d = _t(spark, sf_dir, "documents").selectExpr(
        "lang", "CAST(n_chars AS BIGINT) AS y"
    )
    g = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_g"),
        F.sum("y").cast("bigint").alias("s_g"),
    )
    packed = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sort_array(
            F.collect_list(F.struct("lang", "s_g", "n_g"))
        ).alias("groups"),
    )
    ss = d.agg(F.sum(F.expr("y * y")).cast("bigint").alias("syy"))
    ssb_between = F.aggregate(
        F.col("groups"),
        F.lit(0.0),
        lambda acc, x: acc
        + (x["s_g"].cast("double") * x["s_g"].cast("double")) / x["n_g"].cast("double"),
    )
    return (
        packed.crossJoin(F.broadcast(ss))
        .withColumn(
            "ssb",
            ssb_between - F.col("s").cast("double") * F.col("s") / F.col("n"),
        )
        .withColumn(
            "sst",
            F.col("syy").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"),
        )
        .selectExpr(
            "n", "n_groups",
            "CASE WHEN sst > 0 THEN ROUND(ssb / sst, 6) ELSE NULL END AS eta2",
        )
    )


SQL_LENGTH_LANG_ETA = """
WITH le_d AS (SELECT lang, CAST(n_chars AS BIGINT) AS y FROM documents),
le_g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_g, CAST(sum(y) AS BIGINT) AS s_g
  FROM le_d GROUP BY 1
),
le_p AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_groups,
         list_sum(list_transform(
           list(struct_pack(s_g := s_g, n_g := n_g) ORDER BY lang),
           t -> CAST(t.s_g AS DOUBLE) * t.s_g / t.n_g
         )) AS sum_sg2
  FROM le_g
),
le_s AS (SELECT CAST(sum(y * y) AS BIGINT) AS syy FROM le_d)
SELECT p.n, p.n_groups,
       CASE WHEN (s.syy - CAST(p.s AS DOUBLE) * p.s / p.n) > 0
            THEN ROUND((p.sum_sg2 - CAST(p.s AS DOUBLE) * p.s / p.n)
                       / (s.syy - CAST(p.s AS DOUBLE) * p.s / p.n), 6)
            ELSE NULL END AS eta2
FROM le_p p CROSS JOIN le_s s
"""


def q_doc_casing_profile(spark, sf_dir):
    """Casing hygiene per source: uppercase-letter share (scaled to
    basis points by integer division), ALL-CAPS token count, and
    TitleCase token count — the shouting/template detector a curation
    pass runs per provenance.  All counts exact BIGINTs.

    Scale shape: row-local regexp counts folded into one (source)
    hash agg."""
    d = _t(spark, sf_dir, "documents")
    upper = F.size(F.expr("regexp_extract_all(text, '[A-Z]', 0)")).cast("bigint")
    letters = F.size(F.expr("regexp_extract_all(text, '[A-Za-z]', 0)")).cast("bigint")
    allcaps = F.size(
        F.expr(r"regexp_extract_all(text, '\\b[A-Z]{2,}\\b', 0)")
    ).cast("bigint")
    title = F.size(
        F.expr(r"regexp_extract_all(text, '\\b[A-Z][a-z]+', 0)")
    ).cast("bigint")
    return (
        d.select(
            "source",
            upper.alias("u"),
            letters.alias("l"),
            allcaps.alias("ac"),
            title.alias("tc"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("u").cast("bigint").alias("n_upper"),
            F.sum("l").cast("bigint").alias("n_letters"),
            F.sum("ac").cast("bigint").alias("n_allcaps_tokens"),
            F.sum("tc").cast("bigint").alias("n_title_tokens"),
        )
        .selectExpr(
            "source", "n_docs", "n_upper", "n_letters",
            "n_allcaps_tokens", "n_title_tokens",
            "CASE WHEN n_letters > 0 THEN n_upper * 10000 DIV n_letters ELSE 0 END AS upper_bp",
        )
    )


SQL_DOC_CASING_PROFILE = r"""
WITH cp AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS u,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS l,
         CAST(len(regexp_extract_all(text, '\b[A-Z]{2,}\b')) AS BIGINT) AS ac,
         CAST(len(regexp_extract_all(text, '\b[A-Z][a-z]+')) AS BIGINT) AS tc
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(u) AS BIGINT) AS n_upper,
       CAST(sum(l) AS BIGINT) AS n_letters,
       CAST(sum(ac) AS BIGINT) AS n_allcaps_tokens,
       CAST(sum(tc) AS BIGINT) AS n_title_tokens,
       CASE WHEN sum(l) > 0 THEN CAST(sum(u) AS BIGINT) * 10000 // CAST(sum(l) AS BIGINT) ELSE 0 END AS upper_bp
FROM cp GROUP BY 1
"""


def q_doc_numeric_density(spark, sf_dir):
    """Numeric payload share per source: digit-character basis points
    and numeric-token counts — tables and logs masquerading as prose
    show up here first.  Exact integers; one integer-scaled share.

    Scale shape: row-local regexp counts into one (source) hash agg."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "source",
            F.size(F.expr("regexp_extract_all(text, '[0-9]', 0)")).cast("bigint").alias("dg"),
            F.length("text").cast("bigint").alias("ch"),
            F.size(
                F.expr(r"regexp_extract_all(text, '\\b[0-9]+(\\.[0-9]+)?\\b', 0)")
            ).cast("bigint").alias("nt"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("dg").cast("bigint").alias("n_digits"),
            F.sum("ch").cast("bigint").alias("n_chars"),
            F.sum("nt").cast("bigint").alias("n_numeric_tokens"),
        )
        .selectExpr(
            "source", "n_docs", "n_digits", "n_chars", "n_numeric_tokens",
            "CASE WHEN n_chars > 0 THEN n_digits * 10000 DIV n_chars ELSE 0 END AS digit_bp",
        )
    )


SQL_DOC_NUMERIC_DENSITY = r"""
WITH nd AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS dg,
         CAST(length(text) AS BIGINT) AS ch,
         CAST(len(regexp_extract_all(text, '\b[0-9]+(\.[0-9]+)?\b')) AS BIGINT) AS nt
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(dg) AS BIGINT) AS n_digits,
       CAST(sum(ch) AS BIGINT) AS n_chars,
       CAST(sum(nt) AS BIGINT) AS n_numeric_tokens,
       CASE WHEN sum(ch) > 0 THEN CAST(sum(dg) AS BIGINT) * 10000 // CAST(sum(ch) AS BIGINT) ELSE 0 END AS digit_bp
FROM nd GROUP BY 1
"""


def q_vocab_coverage_curve(spark, sf_dir):
    """Tokenizer-budget curve: corpus token coverage at vocabulary
    cutoffs 100 / 1 000 / 10 000 (frequency-built, deterministic
    (count DESC, token) boundary) — the read that prices a vocab size
    before training a tokenizer (doc_oov_rate fixes N=1000; this is
    the whole curve).

    Scale shape: ONE (token) hash agg builds the vocabulary; the curve
    is three conditional sums over the vocab table itself, ranked by
    the two-phase ``global_row_number`` (range-repartition + local
    rank + bounded prefix offsets — a web-scale vocabulary is 10⁸⁺
    rows and must never sort through one reducer; round-4 verdict
    perf item 2); the token STREAM is never re-scanned."""
    from docs2kg_spark.functions.skew import global_row_number

    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = global_row_number(
        vocab, [F.col("cnt").desc(), F.col("tok").asc()], "rk"
    ).localCheckpoint(eager=False)
    tot = ranked.agg(
        F.sum("cnt").alias("total_tokens"), F.count("*").alias("total_types")
    )
    out = None
    for n in (100, 1000, 10000):
        row = (
            ranked.filter(F.col("rk") <= n)
            .agg(
                F.lit(n).cast("int").alias("cutoff"),
                F.count("*").cast("bigint").alias("n_types"),
                F.sum("cnt").cast("bigint").alias("n_covered"),
            )
            .crossJoin(F.broadcast(tot))
            .selectExpr(
                "cutoff",
                "n_types",
                "n_covered",
                "CAST(total_tokens AS BIGINT) AS total_tokens",
                "n_covered * 10000 DIV total_tokens AS coverage_bp",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def _vocab_coverage_curve_sql() -> str:
    parts = []
    for n in (100, 1000, 10000):
        parts.append(f"""
SELECT CAST({n} AS INT) AS cutoff,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(cnt) AS BIGINT) AS n_covered,
       (SELECT CAST(sum(cnt) AS BIGINT) FROM vc_r) AS total_tokens,
       CAST(sum(cnt) AS BIGINT) * 10000
         // (SELECT CAST(sum(cnt) AS BIGINT) FROM vc_r) AS coverage_bp
FROM vc_r WHERE rk <= {n}""")
    return (
        """
WITH vc_v AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
    FROM documents
  ) WHERE tok != '' GROUP BY 1
),
vc_r AS (
  SELECT tok, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rk FROM vc_v
)"""
        + "\nUNION ALL\n".join(parts)
    )


def q_conv_lang_mix(spark, sf_dir):
    """Language mixing inside conversations: per conversation the
    distinct source-document languages, the dominant language and its
    turn share — mixed-language conversations need language-aware
    chunking before SFT assembly.

    Scale shape: (conv, lang) agg → conv argmax window + totals join
    (same shape as conv_label_purity, over turns)."""
    d = _t(spark, sf_dir, "documents")
    # language is a document attribute; the conv↔doc mapping is the
    # transcript derivation's (doc_id % 50)
    t = d.select(
        F.format_string("conv-%04d", (F.col("doc_id") % 50).cast("int")).alias(
            "conv_id"
        ),
        "lang",
    )
    cl = t.groupBy("conv_id", "lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("conv_id").orderBy(F.desc("n"), "lang")
    top = cl.withColumn("rk", F.row_number().over(w)).filter("rk = 1")
    tot = cl.groupBy("conv_id").agg(
        F.sum("n").alias("n_turns"), F.count("*").alias("n_langs")
    )
    return top.join(tot, "conv_id").selectExpr(
        "conv_id",
        "lang AS top_lang",
        "CAST(n_turns AS BIGINT) AS n_turns",
        "CAST(n_langs AS BIGINT) AS n_langs",
        "n * 10000 DIV n_turns AS dominance_bp",
    )


SQL_CONV_LANG_MIX = """
WITH lm_t AS (
  SELECT printf('conv-%04d', CAST(doc_id % 50 AS INT)) AS conv_id, lang
  FROM documents
),
lm_cl AS (
  SELECT conv_id, lang, CAST(count(*) AS BIGINT) AS n FROM lm_t GROUP BY 1, 2
),
lm_top AS (
  SELECT conv_id, lang, n FROM (
    SELECT conv_id, lang, n,
           ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY n DESC, lang) AS rk
    FROM lm_cl
  ) WHERE rk = 1
),
lm_tot AS (
  SELECT conv_id, CAST(sum(n) AS BIGINT) AS n_turns,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM lm_cl GROUP BY 1
)
SELECT t.conv_id, t.lang AS top_lang, o.n_turns, o.n_langs,
       t.n * 10000 // o.n_turns AS dominance_bp
FROM lm_top t JOIN lm_tot o USING (conv_id)
"""


def q_doc_line_stats(spark, sf_dir):
    """C4-style line profile per source: line counts, blank-line and
    short-line (<20 chars) shares — the pre-filter read before
    line-level cleaning rules are chosen.

    Scale shape: row-local line split + size/filter folds, one
    |sources|-row agg."""
    d = _t(spark, sf_dir, "documents")
    lines = F.split(F.col("text"), "\n")
    n_lines = F.size(lines).cast("bigint")
    blanks = F.size(F.filter(lines, lambda s: F.length(F.trim(s)) == 0)).cast("bigint")
    shorts = F.size(
        F.filter(lines, lambda s: (F.length(s) < 20) & (F.length(F.trim(s)) > 0))
    ).cast("bigint")
    return (
        d.select("source", n_lines.alias("nl"), blanks.alias("nb"), shorts.alias("ns"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nl").cast("bigint").alias("n_lines"),
            F.sum("nb").cast("bigint").alias("n_blank"),
            F.sum("ns").cast("bigint").alias("n_short"),
        )
        .selectExpr(
            "source", "n_docs", "n_lines", "n_blank", "n_short",
            "n_blank * 10000 DIV n_lines AS blank_bp",
            "n_short * 10000 DIV n_lines AS short_bp",
        )
    )


SQL_DOC_LINE_STATS = r"""
WITH ls AS (
  SELECT source,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
         CAST(len(list_filter(string_split(text, chr(10)), s -> length(trim(s)) = 0)) AS BIGINT) AS nb,
         CAST(len(list_filter(string_split(text, chr(10)), s -> length(s) < 20 AND length(trim(s)) > 0)) AS BIGINT) AS ns
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nl) AS BIGINT) AS n_lines,
       CAST(sum(nb) AS BIGINT) AS n_blank,
       CAST(sum(ns) AS BIGINT) AS n_short,
       CAST(sum(nb) AS BIGINT) * 10000 // CAST(sum(nl) AS BIGINT) AS blank_bp,
       CAST(sum(ns) AS BIGINT) * 10000 // CAST(sum(nl) AS BIGINT) AS short_bp
FROM ls GROUP BY 1
"""


def q_doc_encoding_artifacts(spark, sf_dir):
    """Encoding-damage QA per source: replacement characters (U+FFFD),
    C0 control characters (excluding tab/newline/CR), and the classic
    UTF-8-as-Latin-1 mojibake digraphs ('Ã©'-style: Ã or Â followed by
    a non-ASCII char) — the triage counts that decide whether a source
    needs re-decoding before any text op trusts it.

    Scale shape: three row-local regexp counts, one |sources|-row
    agg."""
    d = _t(spark, sf_dir, "documents")
    repl = F.size(F.expr("regexp_extract_all(text, '\\uFFFD', 0)")).cast("bigint")
    ctrl = F.size(
        F.expr(r"regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', 0)")
    ).cast("bigint")
    moji = F.size(
        F.expr("regexp_extract_all(text, '[\\u00C3\\u00C2][\\u0080-\\u00FF]', 0)")
    ).cast("bigint")
    return (
        d.select("source", repl.alias("r"), ctrl.alias("c"), moji.alias("m"))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("r").cast("bigint").alias("n_replacement"),
            F.sum("c").cast("bigint").alias("n_control"),
            F.sum("m").cast("bigint").alias("n_mojibake"),
            F.sum(
                F.when((F.col("r") + F.col("c") + F.col("m")) > 0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_damaged_docs"),
        )
    )


SQL_DOC_ENCODING_ARTIFACTS = r"""
WITH ea AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT) AS r,
         CAST(len(regexp_extract_all(text, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]')) AS BIGINT) AS c,
         CAST(len(regexp_extract_all(text, '[\x{C3}\x{C2}][\x{80}-\x{FF}]')) AS BIGINT) AS m
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(r) AS BIGINT) AS n_replacement,
       CAST(sum(c) AS BIGINT) AS n_control,
       CAST(sum(m) AS BIGINT) AS n_mojibake,
       CAST(sum(CASE WHEN r + c + m > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_damaged_docs
FROM ea GROUP BY 1
"""


def q_doc_markup_profile(spark, sf_dir):
    """Markdown-structure census per source: header lines, bullet
    lines, fenced-code blocks, and inline links — the structure signal
    that routes a source to the layout-aware segmenter (many headers)
    vs the plain-prose path (none).

    Scale shape: four row-local regexp counts, one |sources|-row
    agg."""
    d = _t(spark, sf_dir, "documents")
    headers = F.size(
        F.expr("regexp_extract_all(text, '(?m)^#{1,6} ', 0)")
    ).cast("bigint")
    bullets = F.size(
        F.expr("regexp_extract_all(text, '(?m)^[-*] ', 0)")
    ).cast("bigint")
    fences = F.size(F.expr("regexp_extract_all(text, '```', 0)")).cast("bigint")
    links = F.size(
        F.expr(r"regexp_extract_all(text, '\\[[^\\]]+\\]\\([^)]+\\)', 0)")
    ).cast("bigint")
    return (
        d.select(
            "source",
            headers.alias("h"),
            bullets.alias("b"),
            fences.alias("f"),
            links.alias("l"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("h").cast("bigint").alias("n_headers"),
            F.sum("b").cast("bigint").alias("n_bullets"),
            F.sum("f").cast("bigint").alias("n_fence_marks"),
            F.sum("l").cast("bigint").alias("n_links"),
            F.sum(F.when(F.col("h") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_structured_docs"),
        )
    )


SQL_DOC_MARKUP_PROFILE = r"""
WITH mp AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '(?m)^#{1,6} ')) AS BIGINT) AS h,
         CAST(len(regexp_extract_all(text, '(?m)^[-*] ')) AS BIGINT) AS b,
         CAST(len(regexp_extract_all(text, '```')) AS BIGINT) AS f,
         CAST(len(regexp_extract_all(text, '\[[^\]]+\]\([^)]+\)')) AS BIGINT) AS l
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(h) AS BIGINT) AS n_headers,
       CAST(sum(b) AS BIGINT) AS n_bullets,
       CAST(sum(f) AS BIGINT) AS n_fence_marks,
       CAST(sum(l) AS BIGINT) AS n_links,
       CAST(sum(CASE WHEN h > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_structured_docs
FROM mp GROUP BY 1
"""


def q_source_vocab_overlap(spark, sf_dir):
    """Source-pair similarity by top-200 vocabulary overlap (Jaccard of
    the per-source frequency-top token sets) — finds near-duplicate
    SOURCES (mirrors, re-crawls under a new name) at the catalog level
    before any document-level dedup spends compute on them.

    Scale shape: one (source, token) agg; per-source top-200 via a
    source-partitioned window; the pair join runs on the top-token
    table only (|sources|·200 rows)."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select(
            "source", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "tok")
    top = (
        tf.withColumn("rk", F.row_number().over(w))
        .filter("rk <= 200")
        .select("source", "tok")
        .localCheckpoint(eager=False)
    )
    sz = top.groupBy("source").agg(F.count("*").alias("n"))
    inter = (
        top.selectExpr("source AS sa", "tok")
        .join(top.selectExpr("source AS sb", "tok"), "tok")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        inter.join(F.broadcast(sz).selectExpr("source AS sa", "n AS na"), "sa")
        .join(F.broadcast(sz).selectExpr("source AS sb", "n AS nb"), "sb")
        .selectExpr(
            "sa", "sb", "n_common",
            "n_common * 10000 DIV (na + nb - n_common) AS jaccard_bp",
        )
        .filter("n_common >= 10")
    )


SQL_SOURCE_VOCAB_OVERLAP = """
WITH sv_tf AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT source, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
    FROM documents
  ) WHERE tok != '' GROUP BY 1, 2
),
sv_top AS (
  SELECT source, tok FROM (
    SELECT source, tok,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, tok) AS rk
    FROM sv_tf
  ) WHERE rk <= 200
),
sv_sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM sv_top GROUP BY 1),
sv_i AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS n_common
  FROM sv_top a JOIN sv_top b ON b.tok = a.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.sa, i.sb, i.n_common,
       i.n_common * 10000 // (za.n + zb.n - i.n_common) AS jaccard_bp
FROM sv_i i
JOIN sv_sz za ON za.source = i.sa
JOIN sv_sz zb ON zb.source = i.sb
WHERE i.n_common >= 10
"""


def q_lang_margin_profile(spark, sf_dir):
    """Language-ID confidence margin per labeled language: the gap
    between the best and second-best stopword-signal scores, banded —
    margin 0 documents are the ones the n-gram heuristic effectively
    guesses on, and a language whose margins concentrate at 0 needs a
    richer signal set before its labels are trusted.

    Scale shape: the lang score expressions are row-local regexp
    counts; the second-max is the max-over-pairwise-min identity (6
    terms for 4 scores); one (lang, band) agg."""
    from docs2kg_spark.operators.text import lang_scores

    d = _t(spark, sf_dir, "documents")
    sc = lang_scores("text")
    langs = sorted(sc)
    cols = [sc[lang].alias(f"s_{lang}") for lang in langs]
    names = [f"s_{lang}" for lang in langs]
    top1 = F.greatest(*[F.col(c) for c in names])
    import itertools

    top2 = F.greatest(
        *[
            F.least(F.col(a), F.col(b))
            for a, b in itertools.combinations(names, 2)
        ]
    )
    band = (
        F.when(F.col("margin") == 0, "0")
        .when(F.col("margin") <= 2, "1-2")
        .when(F.col("margin") <= 5, "3-5")
        .otherwise("6+")
    )
    return (
        d.select("lang", *cols)
        .select("lang", (top1 - top2).cast("long").alias("margin"))
        .groupBy("lang", band.alias("margin_band"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


def _lang_margin_profile_sql() -> str:
    import itertools

    from docs2kg_spark.operators.text import LANG_SIGNALS

    langs = sorted(LANG_SIGNALS)
    scores = ", ".join(
        f"{_sql_lang_score(LANG_SIGNALS[lang])} AS s_{lang}" for lang in langs
    )
    names = [f"s_{lang}" for lang in langs]
    top1 = "GREATEST(" + ", ".join(names) + ")"
    top2 = "GREATEST(" + ", ".join(
        f"LEAST({a}, {b})" for a, b in itertools.combinations(names, 2)
    ) + ")"
    return f"""
WITH lmp_s AS (
  SELECT lang, {scores} FROM documents
),
lmp_m AS (
  SELECT lang, CAST({top1} - {top2} AS BIGINT) AS margin FROM lmp_s
)
SELECT lang,
       CASE WHEN margin = 0 THEN '0'
            WHEN margin <= 2 THEN '1-2'
            WHEN margin <= 5 THEN '3-5'
            ELSE '6+' END AS margin_band,
       CAST(count(*) AS BIGINT) AS n_docs
FROM lmp_m GROUP BY 1, 2
"""


def q_token_len_distribution(spark, sf_dir):
    """Token-length histogram over the corpus (char-length bands 1-2 /
    3-5 / 6-10 / 11-20 / 21+) — long-token mass predicts subword
    fragmentation (fertility) before any tokenizer is trained; the
    21+ band is usually URLs/ids that want their own normalizer.

    Scale shape: tokens explode once, row-local banding, one 5-row
    agg."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower("text"), WS_RE)).alias("tok")
    ).filter(F.col("tok") != "")
    band = (
        F.when(F.length("tok") <= 2, "01-02")
        .when(F.length("tok") <= 5, "03-05")
        .when(F.length("tok") <= 10, "06-10")
        .when(F.length("tok") <= 20, "11-20")
        .otherwise("21+")
    )
    tot = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.groupBy(band.alias("len_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.countDistinct("tok").cast("bigint").alias("n_types"),
        )
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "len_band", "n_tokens", "n_types",
            "n_tokens * 10000 DIV n_total AS share_bp",
        )
    )


SQL_TOKEN_LEN_DISTRIBUTION = r"""
WITH tl_t AS (
  SELECT tok FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+')) AS tok
    FROM documents
  ) WHERE tok != ''
),
tl_b AS (
  SELECT CASE WHEN length(tok) <= 2 THEN '01-02'
              WHEN length(tok) <= 5 THEN '03-05'
              WHEN length(tok) <= 10 THEN '06-10'
              WHEN length(tok) <= 20 THEN '11-20'
              ELSE '21+' END AS len_band, tok
  FROM tl_t
),
tl_tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM tl_t)
SELECT len_band,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT tok) AS BIGINT) AS n_types,
       CAST(count(*) AS BIGINT) * 10000 // t.n_total AS share_bp
FROM tl_b CROSS JOIN tl_tot t GROUP BY 1, t.n_total
"""


def q_source_gram_novelty(spark, sf_dir):
    """Marginal-novelty attribution: processing sources in name order,
    how many of each source's distinct 8-grams were NOT contributed by
    any earlier source — the acquisition read ('does adding this
    source buy new content or re-buy the template core?').  Computed
    without any iterative scan: a gram's novelty owner IS its minimum
    source, so one (gram → min source) agg attributes the whole
    corpus.

    Scale shape: (source, gram) dedup, a per-gram min agg, one
    |sources|-row rollup joined to per-source distinct counts."""
    d = _t(spark, sf_dir, "documents")
    n = 8
    toks = d.select(
        "source", F.split(F.lower(F.trim("text")), WS_RE).alias("toks")
    )
    grams = (
        toks.select(
            "source",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0)))
            ).alias("i"),
            "toks",
        )
        .select(
            "source", F.concat_ws(" ", F.slice("toks", F.col("i") + 1, n)).alias("gram")
        )
        .filter(F.length("gram") > 0)
        .distinct()
        .localCheckpoint(eager=False)
    )
    per_src = grams.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_grams")
    )
    owners = (
        grams.groupBy("gram")
        .agg(F.min("source").alias("source"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return (
        per_src.join(owners, "source", "left")
        .selectExpr(
            "source",
            "n_grams",
            "CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel",
            "coalesce(n_novel, 0) * 10000 DIV n_grams AS novelty_bp",
        )
    )


SQL_SOURCE_GRAM_NOVELTY = r"""
WITH gn_t AS (
  SELECT source, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w
  FROM documents
),
gn_g AS (
  SELECT DISTINCT source, array_to_string(w[i+1:i+8], ' ') AS gram
  FROM gn_t, unnest(range(0, greatest(len(w) - 8, 0) + 1)) t(i)
  WHERE len(array_to_string(w[i+1:i+8], ' ')) > 0
),
gn_s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM gn_g GROUP BY 1),
gn_o AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_novel FROM (
    SELECT gram, min(source) AS source FROM gn_g GROUP BY 1
  ) GROUP BY 1
)
SELECT s.source, s.n_grams,
       CAST(COALESCE(o.n_novel, 0) AS BIGINT) AS n_novel,
       COALESCE(o.n_novel, 0) * 10000 // s.n_grams AS novelty_bp
FROM gn_s s LEFT JOIN gn_o o USING (source)
"""


def q_sentence_len_profile(spark, sf_dir):
    """Sentence-length profile per source: sentences split on [.!?]
    runs, length bands in whitespace tokens (1-5 / 6-15 / 16-30 / 31+)
    — wall-of-text sources (heavy 31+) and fragment dumps (heavy 1-5)
    both need different cleaning than prose.

    Scale shape: row-local double split (sentences, then tokens per
    sentence inside a transform — no explode of the token stream),
    one (source, band) agg."""
    d = _t(spark, sf_dir, "documents")
    sent_lens = F.expr(
        r"""transform(
              filter(split(text, '[.!?]+'), s -> length(trim(s)) > 0),
              s -> size(split(trim(s), '[ \\t\\n\\r\\f\\x0B]+')))"""
    )
    sents = d.select("source", F.explode(sent_lens).alias("n_tok"))
    band = (
        F.when(F.col("n_tok") <= 5, "01-05")
        .when(F.col("n_tok") <= 15, "06-15")
        .when(F.col("n_tok") <= 30, "16-30")
        .otherwise("31+")
    )
    return (
        sents.groupBy("source", band.alias("len_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_sentences"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )


SQL_SENTENCE_LEN_PROFILE = r"""
WITH sl AS (
  SELECT source, len(regexp_split_to_array(trim(s.sent), '[ \t\n\r\f\x0B]+')) AS n_tok
  FROM documents,
       unnest(list_filter(regexp_split_to_array(text, '[.!?]+'),
                          x -> length(trim(x)) > 0)) s(sent)
)
SELECT source,
       CASE WHEN n_tok <= 5 THEN '01-05'
            WHEN n_tok <= 15 THEN '06-15'
            WHEN n_tok <= 30 THEN '16-30'
            ELSE '31+' END AS len_band,
       CAST(count(*) AS BIGINT) AS n_sentences,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM sl GROUP BY 1, 2
"""
