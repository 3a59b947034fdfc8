"""Document-corpus operations: splits, sampling, packing, contamination, PII, retrieval fusion, source mixes.

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
    _doc_dedup_map_memo,
    _jaccard_leg_sql,
    _retrieval_legs,
    _t,
    derive_transcripts,
)



def q_clean_text(spark, sf_dir):
    """regexp-replace cleanup chain (§2.8 — the HTML-clean substep of
    html_parser.py:124-128,162-168 as column expressions)."""
    from docs2kg_spark.operators.textclean import clean_html

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(clean_html("text")).alias("clean_digest"))


SQL_CLEAN_TEXT = r"""
SELECT doc_id, md5(trim(
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      '(?s)<[^>]+>', ' ', 'g'),
    '\n\s*\n+', '\n', 'g'),
  '[ \t]+', ' ', 'g'))) AS clean_digest
FROM documents
"""


def q_doc_split(spark, sf_dir):
    from docs2kg_spark.operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents")
    return hash_split(d, "doc_id").select("doc_id", "split")


def _doc_split_sql() -> str:
    from docs2kg_spark.operators.sampling import split_sql

    return split_sql("documents", "doc_id")


def q_doc_split_leakfree(spark, sf_dir):
    """Dedup-aware train/val/test split: the hash bucket is keyed on
    the near-dup CLUSTER id (doc_dedup_map's min-id survivor), so a
    near-duplicate can never straddle train and test — the standard
    leakage failure of naive per-doc splits.  → (doc_id, split)."""
    from docs2kg_spark.operators.sampling import hash_split

    cmap = _doc_dedup_map_memo(spark, sf_dir)
    return hash_split(cmap, "canonical_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "split"
    )


def _doc_split_leakfree_sql() -> str:
    from docs2kg_spark.operators.sampling import split_sql
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    inner = split_sql("ddm", "canonical_id", extra_cols=("doc_id",))
    return f"""
WITH ddm AS ({doc_dedup_map_sql()})
SELECT CAST(doc_id AS BIGINT) AS doc_id, split
FROM ({inner})
"""


def q_doc_stratified(spark, sf_dir):
    from docs2kg_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents")
    # downsample the over-represented languages, keep the rest whole
    return stratified_sample(
        d, "lang", {"en": 0.25, "de": 0.5}, default_fraction=1.0, id_col="doc_id"
    ).select("doc_id", "lang")


SQL_DOC_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR) || '|sample-v1'), 1, 4) < '4000')
   OR (lang = 'de' AND substr(md5(CAST(doc_id AS VARCHAR) || '|sample-v1'), 1, 4) < '8000')
   OR (lang NOT IN ('en', 'de')
       AND substr(md5(CAST(doc_id AS VARCHAR) || '|sample-v1'), 1, 4) < 'ffffg')
"""


def q_contamination(spark, sf_dir):
    """Benchmark-contamination: word-3-gram overlap of every document
    against a deterministic 'benchmark set' (the 5 lowest doc_ids,
    derived from the same table in both engines — no external data)."""
    from docs2kg_spark.operators.contamination import contamination_scores

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    s = contamination_scores(d, bench, n=3)
    return s.select(
        "doc_id",
        "bench_id",
        F.col("shared_grams").cast("bigint").alias("shared_grams"),
        F.round("contaminated_frac", 6).alias("contaminated_frac"),
    )


SQL_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS t FROM documents
), grams AS (
  SELECT DISTINCT id, array_to_string(list_slice(t, i+1, i+3), ' ') AS gram
  FROM toks, UNNEST(range(0, greatest(len(t)-3, 0)+1)) AS u(i)
  WHERE length(array_to_string(list_slice(t, i+1, i+3), ' ')) > 0
), bench AS (
  SELECT id AS bench_id, gram FROM grams WHERE id < 5
), sizes AS (
  SELECT bench_id, COUNT(*) AS n FROM bench GROUP BY 1
), shared AS (
  SELECT g.id AS doc_id, b.bench_id, COUNT(*) AS shared_grams
  FROM grams g JOIN bench b ON g.gram = b.gram
  GROUP BY 1, 2
)
SELECT s.doc_id, s.bench_id, CAST(s.shared_grams AS BIGINT) AS shared_grams,
       ROUND(CAST(s.shared_grams AS DOUBLE) / z.n, 6) AS contaminated_frac
FROM shared s JOIN sizes z ON s.bench_id = z.bench_id
"""


def q_doc_packing(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing over the documents
    table (whitespace token counts, 512-token packs, 16 shards so the
    small corpus still exercises multi-doc packs)."""
    from docs2kg_spark.operators.packing import pack_documents
    from docs2kg_spark.operators.text import whitespace_token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", whitespace_token_count("text").alias("n_tok")
    )
    return pack_documents(d, "n_tok", budget=512, n_shards=16).select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "pack_first",
        "pack_last",
        "pack_offset",
        "token_count",
    )


SQL_DOC_PACKING = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+')) END AS n_tok,
         md5(CAST(doc_id AS VARCHAR) || '|pack-v1') AS h
  FROM documents
), sharded AS (
  SELECT doc_id, n_tok, h,
         ('0x' || substr(h, 1, 4))::UBIGINT % 16 AS shard
  FROM toks
), cum AS (
  SELECT doc_id, shard, CAST(n_tok AS BIGINT) AS token_count,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, CAST(doc_id AS VARCHAR)
                          ROWS UNBOUNDED PRECEDING) AS c
  FROM sharded
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard,
       CAST((c - token_count) // 512 AS BIGINT) AS pack_first,
       CAST(greatest((c - 1) // 512, (c - token_count) // 512) AS BIGINT) AS pack_last,
       CAST((c - token_count) % 512 AS BIGINT) AS pack_offset,
       token_count
FROM cum
"""


def q_doc_length_quantiles(spark, sf_dir):
    from docs2kg_spark.operators.profiling import length_quantiles

    return length_quantiles(_t(spark, sf_dir, "documents"), "source", "text")


SQL_DOC_LENGTH_QUANTILES = """
SELECT source AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(quantile_cont(length(text), 0.5), 6) AS p50,
       ROUND(quantile_cont(length(text), 0.9), 6) AS p90,
       ROUND(quantile_cont(length(text), 0.99), 6) AS p99
FROM documents
GROUP BY source
"""


def q_source_mixture(spark, sf_dir):
    """Grouped by lang (the skewed column in the synthetic corpus —
    en dominates) so the α=0.5 flattening is non-vacuous: the head lang
    gets sample_rate < 1, tail langs are boosted to the cap."""
    from docs2kg_spark.operators.sampling import sqrt_temperature_mixture

    return sqrt_temperature_mixture(_t(spark, sf_dir, "documents"), "lang")


# sqrt is IEEE-correctly-rounded in both engines (pow is not — that is
# why α is pinned at 0.5), and the α-mass sum is integer-scaled so it
# is associative; see operators/sampling.py::sqrt_temperature_mixture
SQL_SOURCE_MIXTURE = """
WITH counts AS (
  SELECT lang AS grp, COUNT(*) AS n_docs FROM documents GROUP BY 1
), scaled AS (
  SELECT grp, n_docs,
         CAST(ROUND(ROUND(sqrt(n_docs), 6) * 1000000) AS BIGINT) AS s
  FROM counts
), tot AS (SELECT SUM(s) AS mass, SUM(n_docs) AS n_total FROM scaled)
SELECT grp, CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(s / CAST(mass AS DOUBLE), 6) AS weight,
       ROUND(LEAST(1.0, s / CAST(mass AS DOUBLE) * n_total / n_docs), 6) AS sample_rate
FROM scaled CROSS JOIN tot
"""


def q_doc_chunking(spark, sf_dir):
    """Boundary-respecting chunking (the SFT layout: no window spans two
    examples) — same token convention / budget / shards as doc_packing
    so the two layouts are directly comparable."""
    from docs2kg_spark.operators.packing import chunk_examples
    from docs2kg_spark.operators.text import whitespace_token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", whitespace_token_count("text").alias("n_tok")
    )
    return chunk_examples(d, "n_tok", budget=512, n_shards=16).select(
        "doc_id",
        F.col("shard").cast("bigint").alias("shard"),
        "n_tokens",
        "n_windows",
        "win_first",
        "pad_tokens",
    )


SQL_DOC_CHUNKING = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+')) END AS n_tok,
         md5(CAST(doc_id AS VARCHAR) || '|pack-v1') AS h
  FROM documents
), sharded AS (
  SELECT doc_id, n_tok, h,
         ('0x' || substr(h, 1, 4))::UBIGINT % 16 AS shard,
         greatest((n_tok + 511) // 512, 1) AS nw
  FROM toks
), cum AS (
  SELECT doc_id, shard, CAST(n_tok AS BIGINT) AS n_tokens, CAST(nw AS BIGINT) AS n_windows,
         SUM(nw) OVER (PARTITION BY shard ORDER BY h, CAST(doc_id AS VARCHAR)
                       ROWS UNBOUNDED PRECEDING) AS cw
  FROM sharded
)
SELECT doc_id, CAST(shard AS BIGINT) AS shard, n_tokens, n_windows,
       CAST(cw - n_windows AS BIGINT) AS win_first,
       CAST(n_windows * 512 - n_tokens AS BIGINT) AS pad_tokens
FROM cum
"""


def q_doc_resample(spark, sf_dir):
    from docs2kg_spark.operators.sampling import weighted_keep
    from docs2kg_spark.operators.text import quality_columns

    d = _t(spark, sf_dir, "documents")
    q = quality_columns("text")
    scored = d.select("doc_id", F.round(q["quality"], 6).alias("quality"))
    return weighted_keep(scored, "doc_id", "quality").select("doc_id", "quality")


# keep iff bucket < floor(round(quality,6) * 65536): 65536 = 2^16 makes
# the scaling EXACT in binary floating point, so the kept set is
# engine-identical (see operators/sampling.py::weighted_keep)
SQL_DOC_RESAMPLE = r"""
WITH m AS (
  SELECT doc_id, length(text) AS n_chars,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '[ \t\n\r\f\x0B]+')) END AS n_tokens,
         len(regexp_extract_all(text, '[^\w\s]')) AS n_punct,
         len(regexp_extract_all(lower(text), '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
  FROM documents
), q AS (
  SELECT doc_id, ROUND(0.4 * LEAST(n_chars / 500.0, 1.0)
       + 0.3 * LEAST(CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 2, 1.0)
       + 0.3 * (1.0 - LEAST(CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 4, 1.0)), 6) AS quality
  FROM m
)
SELECT doc_id, quality FROM q
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|resample-v1'), 1, 4))::INT
      < CAST(floor(ROUND(GREATEST(LEAST(quality, 1.0), 0.0), 6) * 65536) AS INT)
"""


def q_bm25(spark, sf_dir):
    """BM25 top-10 retrieval for 3 probe queries (the 3 lowest doc_ids,
    derived from the same table in both engines — no external data):
    decontamination-by-retrieval / near-dup triage over the corpus."""
    from docs2kg_spark.operators.retrieval import bm25_topk

    d = _t(spark, sf_dir, "documents")
    probes = d.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_topk(d, probes, top_k=10)


# BM25 constants reach both engines as repr()'d doubles: a
# correctly-rounding parser (DuckDB's) round-trips repr exactly, so both
# engines compute the identical IEEE expression (see operators/retrieval.py
# for the full cross-engine-exactness argument).
_BM25_K1, _BM25_B = 1.2, 0.75
SQL_BM25 = rf"""
WITH toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
), tf AS (
  SELECT id, tok, COUNT(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2
), dl AS (
  SELECT id, SUM(tf) AS dl FROM tf GROUP BY 1
), dfreq AS (
  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
), stats AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS total_toks FROM dl
), qterms AS (
  SELECT DISTINCT id AS query_id, tok FROM tf WHERE id < 3
), cand AS (
  SELECT q.query_id, tf.id, tf.tf,
         ROUND(ln((s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0), 6) AS idf,
         ROUND((dl.dl * s.n_docs) / CAST(s.total_toks AS DOUBLE), 6) AS ratio
  FROM tf JOIN qterms q USING (tok) JOIN dfreq USING (tok) JOIN dl USING (id)
       CROSS JOIN stats s
), terms AS (
  SELECT query_id, id,
         CAST(ROUND(ROUND(idf * (tf * {_BM25_K1 + 1.0!r})
              / (tf + {_BM25_K1!r} * (1.0 - {_BM25_B!r} + {_BM25_B!r} * ratio)), 6)
              * 1000000) AS BIGINT) AS t_i
  FROM cand
), scores AS (
  SELECT query_id, id,
         ROUND(CAST(SUM(t_i) AS DOUBLE) / 1000000.0, 6) AS score
  FROM terms GROUP BY 1, 2
), ranked AS (
  SELECT query_id, id AS doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rnk
  FROM scores
)
SELECT query_id, doc_id, score, CAST(rnk AS INT) AS rnk FROM ranked WHERE rnk <= 10
"""


# ---------------------------------------------------------------------------
# per-source cap (operators/sampling.py — the per-domain crawl cap)
# ---------------------------------------------------------------------------


def q_doc_source_cap(spark, sf_dir):
    """At most 10 docs per source, chosen by deterministic content-hash
    rank — the per-domain cap that stops megasites dominating the mix."""
    from docs2kg_spark.operators.sampling import source_cap

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return source_cap(d, "source", "doc_id", cap=10)


SQL_DOC_SOURCE_CAP = """
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|cap-v1'), doc_id
         ) AS rnk
  FROM documents
)
SELECT doc_id, source, n_chars FROM ranked WHERE rnk <= 10
"""


def q_doc_length_filter(spark, sf_dir):
    """Keep docs inside their source's [p10, p90] length band — the
    percentile-threshold quality trim (outlier-length removal)."""
    d = _t(spark, sf_dir, "documents")
    ln = F.length("text")
    th = d.groupBy("source").agg(
        F.round(F.percentile(ln, F.lit(0.1)), 6).alias("lo"),
        F.round(F.percentile(ln, F.lit(0.9)), 6).alias("hi"),
    )
    return (
        d.join(F.broadcast(th), on="source")
        .filter((ln >= F.col("lo")) & (ln <= F.col("hi")))
        .select("doc_id", "source", "n_chars")
    )


SQL_DOC_LENGTH_FILTER = """
WITH lf_th AS (
  SELECT source,
         ROUND(quantile_cont(length(text), 0.1), 6) AS lo,
         ROUND(quantile_cont(length(text), 0.9), 6) AS hi
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d JOIN lf_th t ON t.source = d.source
WHERE length(d.text) >= t.lo AND length(d.text) <= t.hi
"""


# ---------------------------------------------------------------------------
# snapshot diff (operators/diff.py — the CDC / MERGE-planning read)
# ---------------------------------------------------------------------------


def q_doc_snapshot_diff(spark, sf_dir):
    """Diff the documents table against a deterministically perturbed
    second snapshot (every 50th doc removed, every 7th text uppercased,
    5 new ids appended) → (doc_id, change).  The CDC derivation an
    incremental pipeline MERGEs from."""
    from docs2kg_spark.operators.diff import table_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    new = (
        d.filter(F.col("doc_id") % 50 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text")))
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .unionByName(
            d.filter(F.col("doc_id") < 5).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
            )
        )
    )
    return table_diff(d, new, ["doc_id"])


SQL_DOC_SNAPSHOT_DIFF = """
WITH sd_old AS (SELECT doc_id, text, lang FROM documents),
sd_new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 50 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id < 5
)
SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN n.doc_id IS NULL THEN 'removed'
            WHEN o.text IS DISTINCT FROM n.text
              OR o.lang IS DISTINCT FROM n.lang THEN 'changed'
       END AS change
FROM sd_old o FULL JOIN sd_new n ON o.doc_id = n.doc_id
WHERE CASE WHEN o.doc_id IS NULL THEN 'added'
           WHEN n.doc_id IS NULL THEN 'removed'
           WHEN o.text IS DISTINCT FROM n.text
             OR o.lang IS DISTINCT FROM n.lang THEN 'changed'
      END IS NOT NULL
"""


def q_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion of the BM25 leg and the n-gram-Jaccard leg
    for the same 3 probe queries — the zero-training hybrid-retrieval
    combiner; integer-scaled contributions keep the fused score exact."""
    from docs2kg_spark.operators.retrieval import rrf_fuse

    bm, jc = _retrieval_legs(spark, sf_dir)
    return rrf_fuse([bm, jc], top_k=10)


SQL_JACCARD_LEG = _jaccard_leg_sql()


def _rrf_fusion_sql() -> str:
    return f"""
WITH bm AS ({SQL_BM25}),
{SQL_JACCARD_LEG.strip().rstrip()},
rrf_u AS (
  SELECT query_id, doc_id,
         CAST(ROUND(1000000.0 / (60 + rnk)) AS BIGINT) AS c
  FROM bm
  UNION ALL
  SELECT query_id, doc_id, CAST(ROUND(1000000.0 / (60 + rnk)) AS BIGINT)
  FROM jl_ranked WHERE rnk <= 10
),
rrf_f AS (
  SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_micro,
         CAST(count(*) AS BIGINT) AS n_lists
  FROM rrf_u GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_micro, n_lists, CAST(rnk AS INT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id) AS rnk
      FROM rrf_f)
WHERE rnk <= 10
"""


def q_packing_splits(spark, sf_dir):
    """Boundary-fragmentation audit of the sequence packer: per shard,
    how many documents the 512-token chunking splits across a chunk
    boundary (pack_last > pack_first) — fragmented documents lose
    coherence at training time, so curation tracks the split ratio per
    shard before committing a budget.

    Scale shape: composes the shard-local packing layout (no global
    sort) and reduces it with one |shards|-row hash agg; exact BIGINTs
    plus one rounded ratio."""
    packed = q_doc_packing(spark, sf_dir)
    split = (F.col("pack_last") > F.col("pack_first")).cast("bigint")
    return (
        packed.select("shard", "token_count", "pack_last", split.alias("is_split"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("is_split").cast("bigint").alias("n_split"),
            F.sum("token_count").cast("bigint").alias("n_tokens"),
            (F.max("pack_last") + 1).cast("bigint").alias("n_chunks"),
        )
        .select(
            "shard",
            "n_docs",
            "n_split",
            "n_tokens",
            "n_chunks",
            F.round(F.col("n_split").cast("double") / F.col("n_docs"), 6).alias(
                "split_ratio"
            ),
        )
    )


SQL_PACKING_SPLITS = f"""
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN pack_last > pack_first THEN 1 ELSE 0 END) AS BIGINT) AS n_split,
       CAST(SUM(token_count) AS BIGINT) AS n_tokens,
       CAST(MAX(pack_last) + 1 AS BIGINT) AS n_chunks,
       ROUND(CAST(SUM(CASE WHEN pack_last > pack_first THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS split_ratio
FROM ({SQL_DOC_PACKING}) GROUP BY 1
"""


def q_retrieval_overlap(spark, sf_dir):
    """Leg-agreement audit for the hybrid retriever: per probe query,
    how much the BM25 top-10 and the n-gram-Jaccard top-10 agree
    (set intersection + Jaccard of the result sets) — low agreement is
    the signal that RRF fusion is actually adding recall rather than
    re-ranking one leg.

    Scale shape: consumes the memoized legs (each already thin top-k
    tables), one equi-join on (query, doc) and two |queries|-row aggs."""
    bm, jc = _retrieval_legs(spark, sf_dir)
    bn = bm.groupBy("query_id").agg(F.count("*").cast("bigint").alias("n_bm25"))
    jn = jc.groupBy("query_id").agg(F.count("*").cast("bigint").alias("n_jacc"))
    cn = (
        bm.select("query_id", "doc_id")
        .join(jc.select("query_id", "doc_id"), ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    j = (
        bn.join(jn, "query_id")
        .join(cn, "query_id", "left")
        .fillna(0, subset=["n_common"])
    )
    denom = F.col("n_bm25") + F.col("n_jacc") - F.col("n_common")
    return j.select(
        "query_id",
        "n_bm25",
        "n_jacc",
        F.col("n_common").cast("bigint").alias("n_common"),
        F.round(F.col("n_common").cast("double") / denom, 6).alias("set_jaccard"),
    )


def _retrieval_overlap_sql() -> str:
    return f"""
WITH bm AS ({SQL_BM25}),
{SQL_JACCARD_LEG.strip().rstrip()},
ro_j AS (SELECT query_id, doc_id FROM jl_ranked WHERE rnk <= 10),
ro_b AS (SELECT query_id, doc_id FROM bm),
ro_bn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_bm25 FROM ro_b GROUP BY 1),
ro_jn AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_jacc FROM ro_j GROUP BY 1),
ro_cn AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM ro_b JOIN ro_j USING (query_id, doc_id) GROUP BY 1
)
SELECT b.query_id, b.n_bm25, j.n_jacc,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       ROUND(CAST(COALESCE(c.n_common, 0) AS DOUBLE)
             / (b.n_bm25 + j.n_jacc - COALESCE(c.n_common, 0)), 6) AS set_jaccard
FROM ro_bn b JOIN ro_jn j USING (query_id) LEFT JOIN ro_cn c USING (query_id)
"""


def q_source_kl(spark, sf_dir):
    """Domain-shift scalar per source: KL(source unigram ‖ corpus
    unigram) in nats — the distribution-distance read (DSIR's global
    cousin) that ranks sources by how far their token mix sits from the
    corpus mode before weighting a training mixture.

    KL = (Σ tf·(ln tf − ln ctf))/Nₛ + ln(N_c) − ln(Nₛ); every log is
    integer-scaled (ln·1e6 BIGINT), sums exact, two double ops at the
    end.  Scale shape: ONE (source, tok) hash agg feeds both the
    corpus-marginal agg and the KL join (lazy localCheckpoint — the
    corpus is token-exploded once); the join keys on tok and the final
    agg is |sources| rows."""
    d = _t(spark, sf_dir, "documents")
    tf = (
        d.select("source", F.explode(F.split(F.lower("text"), WS_RE)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
        .localCheckpoint(eager=False)
    )
    ctf = tf.groupBy("tok").agg(F.sum("tf").cast("bigint").alias("ctf"))
    ln6 = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("bigint")
    per = (
        tf.join(ctf, "tok")
        .groupBy("source")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * (ln6(F.col("tf")) - ln6(F.col("ctf"))))
            .cast("bigint")
            .alias("_s"),
        )
    )
    nc = per.agg(F.sum("n_tokens").cast("bigint").alias("n_corpus"))
    kl = (
        F.col("_s").cast("double") / F.col("n_tokens")
        + ln6(F.col("n_corpus")).cast("double")
        - ln6(F.col("n_tokens")).cast("double")
    ) / 1e6
    return (
        per.crossJoin(F.broadcast(nc))
        .select("source", "n_tokens", F.round(kl, 6).alias("kl_nats"))
    )


SQL_SOURCE_KL = r"""
WITH kl_toks AS (
  SELECT source, unnest(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents
),
kl_tf AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM kl_toks WHERE tok <> '' GROUP BY 1, 2
),
kl_ctf AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS ctf FROM kl_tf GROUP BY 1),
kl_per AS (
  SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         SUM(tf * (CAST(round(ln(CAST(tf AS DOUBLE)) * 1e6) AS BIGINT)
                   - CAST(round(ln(CAST(ctf AS DOUBLE)) * 1e6) AS BIGINT))) AS s
  FROM kl_tf JOIN kl_ctf USING (tok) GROUP BY 1
),
kl_nc AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_corpus FROM kl_per)
SELECT source, n_tokens,
       ROUND((CAST(s AS DOUBLE) / n_tokens
              + CAST(CAST(round(ln(CAST(n_corpus AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)
              - CAST(CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT) AS DOUBLE)) / 1e6, 6)
         AS kl_nats
FROM kl_per CROSS JOIN kl_nc
"""


def q_priority_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield-Lund-Thorup, JACM'07): each doc gets priority
    q = weight · 2³² DIV (h+1) with h a 32-bit md5 hash (the
    deterministic stand-in for the uniform draw), and the top-20
    priorities are the sample — heavier docs proportionally likelier,
    fully reproducible.  Priorities are exact BIGINTs, so rank is
    never decided by a float.  Scale shape: one row-local projection +
    a TakeOrdered top-k; no shuffle beyond the k-row reduction."""
    d = _t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("psample-v1"), F.col("doc_id"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            h.alias("h32"),
        )
        .withColumn("pri", F.expr("weight * 4294967296 DIV (h32 + 1)"))
        .orderBy(F.col("pri").desc(), F.col("doc_id"))
        .limit(20)
    )


SQL_PRIORITY_SAMPLE = r"""
SELECT doc_id, weight, h32, (weight * 4294967296) // (h32 + 1) AS pri
FROM (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         CAST(CAST(('0x' || substr(md5('psample-v1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) AS h32
  FROM documents
)
ORDER BY pri DESC, doc_id
LIMIT 20
"""


def q_group_sample(spark, sf_dir):
    """Deterministic k-per-group sample: 3 documents per (lang, source)
    cell chosen by md5 hash order — uniform-without-replacement within
    every cell, reproducible across runs and engines (the eval-set
    carve-out a pipeline does per stratum; doc_stratified downsamples
    by RATE, this caps by COUNT).

    Scale shape: one group-partitioned window over row-local hash
    keys; no global sort, no shuffle beyond the group key."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    hkey = F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit("gsample-v1")))
    w = Window.partitionBy("lang", "source").orderBy(hkey, "doc_id")
    return (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", "source", F.col("rank").cast("int").alias("rank"), "doc_id")
    )


SQL_GROUP_SAMPLE = """
SELECT lang, source, CAST(rank AS INT) AS rank, doc_id
FROM (
  SELECT lang, source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR) || '|' || 'gsample-v1'), doc_id
         ) AS rank
  FROM documents
) WHERE rank <= 3
"""


def q_turn_length_drift(spark, sf_dir):
    """Does turn length drift over a conversation, per role?  Per
    (conv, role) an exact integer least-squares slope of
    length(text) over turn_idx (num = nΣxy − ΣxΣy, den = nΣx² − (Σx)²,
    both BIGINT; conversations with < 2 turns of the role or zero
    x-variance are excluded by den > 0), then per role the median
    slope and the shares of rising vs falling conversations — the
    discourse-progression read an SFT-curation pass checks (assistant
    verbosity creep).

    Scale shape: one (conv, role) hash agg of the five integer
    moments; the per-role reduction is an order-statistics agg over
    |convs|·|roles| rows."""
    t = derive_transcripts(spark, sf_dir)
    per = (
        t.selectExpr(
            "conv_id",
            "role",
            "CAST(turn_idx AS BIGINT) AS x",
            "CAST(length(text) AS BIGINT) AS y",
        )
        .groupBy("conv_id", "role")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        )
        .selectExpr(
            "role",
            "n * sxy - sx * sy AS num",
            "n * sxx - sx * sx AS den",
        )
        .filter("den > 0")
    )
    return per.groupBy("role").agg(
        F.count("*").cast("bigint").alias("n_convs"),
        F.round(
            F.expr("percentile(CAST(num AS DOUBLE) / den, 0.5)"), 6
        ).alias("med_slope"),
        F.sum(F.when(F.col("num") > 0, 1).otherwise(0)).cast("bigint").alias("n_rising"),
        F.sum(F.when(F.col("num") < 0, 1).otherwise(0)).cast("bigint").alias("n_falling"),
    )


def _turn_length_drift_sql() -> str:
    return f"""
WITH {TRANSCRIPTS_CTE.strip()},
td_m AS (
  SELECT conv_id, role,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(turn_idx) AS BIGINT) AS sx,
         CAST(sum(length(text)) AS BIGINT) AS sy,
         CAST(sum(turn_idx * length(text)) AS BIGINT) AS sxy,
         CAST(sum(turn_idx * turn_idx) AS BIGINT) AS sxx
  FROM transcripts GROUP BY 1, 2
),
td_s AS (
  SELECT role, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
  FROM td_m
)
SELECT role, CAST(count(*) AS BIGINT) AS n_convs,
       ROUND(quantile_cont(CAST(num AS DOUBLE) / den, 0.5), 6) AS med_slope,
       CAST(count(*) FILTER (num > 0) AS BIGINT) AS n_rising,
       CAST(count(*) FILTER (num < 0) AS BIGINT) AS n_falling
FROM td_s WHERE den > 0
GROUP BY 1
"""


def q_doc_prefix_groups(spark, sf_dir):
    """Header-boilerplate discovery: documents sharing an identical
    normalized 120-char PREFIX (the template-stamped opening
    dup_sentences can miss when bodies diverge after the header) —
    groups of ≥ 2 with exact member counts and the min doc id as the
    exemplar.

    Scale shape: the prefix is a row-local projection; ONE (prefix)
    hash agg; no pairwise join anywhere (group-by beats self-join for
    exact-key duplicate discovery at any scale)."""
    d = _t(spark, sf_dir, "documents")
    prefix = F.substring(
        F.trim(F.regexp_replace(F.lower("text"), WS_RE, " ")), 1, 120
    )
    return (
        d.select(prefix.alias("prefix"), "doc_id")
        .groupBy("prefix")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("exemplar"),
        )
        .filter("n_docs >= 2")
    )


SQL_DOC_PREFIX_GROUPS = r"""
SELECT substr(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')), 1, 120) AS prefix,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS exemplar
FROM documents
GROUP BY 1 HAVING count(*) >= 2
"""


def q_doc_script_mismatch(spark, sf_dir):
    """Script-vs-language QA: per (lang, dominant_script) cell, doc
    counts and whether the cell contradicts the language's expected
    script (a 'zh' document whose characters are all Latin is either a
    mislabeled row or romanized text — both need routing before
    tokenizer training).  Explicit codepoint ranges (not named Unicode
    classes) so the Java and RE2 regex engines count identically.

    Scale shape: three row-local regexp counts + a greatest()-argmax,
    then one hash agg to ≤ |langs|·4 cells."""
    d = _t(spark, sf_dir, "documents")
    lat = F.size(F.expr("regexp_extract_all(text, '[A-Za-z]', 0)")).cast("bigint")
    cyr = F.size(
        F.expr("regexp_extract_all(text, '[\\u0400-\\u04FF]', 0)")
    ).cast("bigint")
    cjk = F.size(
        F.expr("regexp_extract_all(text, '[\\u4E00-\\u9FFF]', 0)")
    ).cast("bigint")
    dom = (
        F.when((lat >= cyr) & (lat >= cjk) & (lat > 0), "latin")
        .when((cyr >= cjk) & (cyr > 0), "cyrillic")
        .when(cjk > 0, "cjk")
        .otherwise("none")
    )
    expected = (
        F.when(F.col("lang").isin("en", "es", "fr", "de"), "latin")
        .when(F.col("lang") == "zh", "cjk")
        .when(F.col("lang") == "ru", "cyrillic")
        .otherwise("any")
    )
    return (
        d.select(
            "lang",
            dom.alias("dominant_script"),
            expected.alias("exp_script"),
            lat.alias("lat"),
            cjk.alias("cjk"),
        )
        .groupBy("lang", "dominant_script")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("lat").cast("bigint").alias("latin_chars"),
            F.sum("cjk").cast("bigint").alias("cjk_chars"),
            F.max(
                F.when(
                    (F.col("exp_script") != "any")
                    & (F.col("exp_script") != F.col("dominant_script")),
                    1,
                ).otherwise(0)
            ).cast("boolean").alias("mismatch"),
        )
    )


SQL_DOC_SCRIPT_MISMATCH = r"""
WITH sm AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS lat,
         CAST(len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) AS BIGINT) AS cyr,
         CAST(len(regexp_extract_all(text, '[\x{4E00}-\x{9FFF}]')) AS BIGINT) AS cjk
  FROM documents
), sm_c AS (
  SELECT lang, lat, cjk,
         CASE WHEN lat >= cyr AND lat >= cjk AND lat > 0 THEN 'latin'
              WHEN cyr >= cjk AND cyr > 0 THEN 'cyrillic'
              WHEN cjk > 0 THEN 'cjk'
              ELSE 'none' END AS dominant_script,
         CASE WHEN lang IN ('en', 'es', 'fr', 'de') THEN 'latin'
              WHEN lang = 'zh' THEN 'cjk'
              WHEN lang = 'ru' THEN 'cyrillic'
              ELSE 'any' END AS exp_script
  FROM sm
)
SELECT lang, dominant_script,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(lat) AS BIGINT) AS latin_chars,
       CAST(sum(cjk) AS BIGINT) AS cjk_chars,
       CAST(max(CASE WHEN exp_script != 'any' AND exp_script != dominant_script
                     THEN 1 ELSE 0 END) AS BOOLEAN) AS mismatch
FROM sm_c GROUP BY 1, 2
"""


def q_split_balance_audit(spark, sf_dir):
    """Stratification audit of the hash split: per (split, lang) cell,
    observed count vs the independence expectation, with the relative
    deviation in integer basis points — the check that the md5 bucket
    split didn't correlate with language (it must not: any systematic
    dev_bp at scale means the hash key leaks the stratum).

    Scale shape: the split predicate is row-local; one (split, lang)
    hash agg; the marginals join back as two broadcast aggregates."""
    from docs2kg_spark.operators.sampling import hash_split

    d = hash_split(_t(spark, sf_dir, "documents"), "doc_id").select("split", "lang")
    cells = d.groupBy("split", "lang").agg(F.count("*").cast("bigint").alias("n_docs"))
    ms = d.groupBy("split").agg(F.count("*").cast("bigint").alias("n_split"))
    ml = d.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_lang"))
    tot = d.agg(F.count("*").cast("bigint").alias("n_total"))
    return (
        cells.join(F.broadcast(ms), "split")
        .join(F.broadcast(ml), "lang")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "split",
            "lang",
            "n_docs",
            "n_split * n_lang * 1000 DIV n_total AS expected_milli",
            "(n_docs * n_total - n_split * n_lang) * 10000 DIV (n_split * n_lang) AS dev_bp",
        )
    )


def _split_balance_audit_sql() -> str:
    from docs2kg_spark.operators.sampling import split_sql

    return f"""
WITH sb_s AS ({split_sql("documents", "doc_id", extra_cols=("lang",))}),
sb_c AS (
  SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs FROM sb_s GROUP BY 1, 2
),
sb_m AS (SELECT split, CAST(count(*) AS BIGINT) AS n_split FROM sb_s GROUP BY 1),
sb_l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM sb_s GROUP BY 1),
sb_t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM sb_s)
SELECT c.split, c.lang, c.n_docs,
       m.n_split * l.n_lang * 1000 // t.n_total AS expected_milli,
       (c.n_docs * t.n_total - m.n_split * l.n_lang) * 10000
         // (m.n_split * l.n_lang) AS dev_bp
FROM sb_c c
JOIN sb_m m USING (split)
JOIN sb_l l USING (lang)
CROSS JOIN sb_t t
"""


def q_turn_position_length_curve(spark, sf_dir):
    """Turn length vs conversation position: per position band (first
    5 turns, 6-15, 16-40, 40+), the per-role length profile — the
    'conversations trail off' curve that decides truncation points for
    SFT context assembly.

    Scale shape: row-local banding over the already-windowed turn
    index, one (band, role) agg."""
    t = derive_transcripts(spark, sf_dir)
    band = (
        F.when(F.col("turn_idx") < 5, "00-04")
        .when(F.col("turn_idx") < 15, "05-14")
        .when(F.col("turn_idx") < 40, "15-39")
        .otherwise("40+")
    )
    return (
        t.select(band.alias("pos_band"), "role", F.length("text").cast("bigint").alias("n_chars"))
        .groupBy("pos_band", "role")
        .agg(
            F.count("*").cast("bigint").alias("n_turns"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .selectExpr(
            "pos_band", "role", "n_turns", "n_chars",
            "n_chars DIV n_turns AS mean_chars",
        )
    )


SQL_TURN_POSITION_LENGTH = f"""
WITH {TRANSCRIPTS_CTE},
tp AS (
  SELECT CASE WHEN turn_idx < 5 THEN '00-04'
              WHEN turn_idx < 15 THEN '05-14'
              WHEN turn_idx < 40 THEN '15-39'
              ELSE '40+' END AS pos_band,
         role, CAST(length(text) AS BIGINT) AS n_chars
  FROM transcripts
)
SELECT pos_band, role,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(n_chars) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_chars
FROM tp GROUP BY 1, 2
"""
