"""Deduplication family: exact/MinHash/SimHash/n-gram/winnowing/PPJoin, span profiles, scrubbing, dedup audits.

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
    _SWEEP_T,
    _doc_dedup_map_memo,
    _kg_memo,
    _minhash_pairs_memo,
    _t,
    derive_transcripts,
)

from docs2kg_spark.queries.text import (
    SQL_CORPUS_FILTER,
    SQL_QUALITY,
    q_corpus_filter,
)



def q_event_dedup_first(spark, sf_dir):
    """first-wins dedup — the mention-dedup shape (§2.4,
    semantic_kg/base.py:107-121): keep the earliest event per
    (user_id, event_type)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


SQL_EVENT_DEDUP = """
SELECT user_id, event_type, event_id
FROM (SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# text-analysis / dedup / similarity queries
# ---------------------------------------------------------------------------


def q_fingerprint_groups(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    from docs2kg_spark.operators.text import fingerprint

    return (
        d.select("doc_id", fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


SQL_FINGERPRINT = r"""
SELECT sha256(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1
"""


def q_doc_exact_dedup(spark, sf_dir):
    """exact dedup: keep the min-id document per normalized-content
    fingerprint (dedup.exact_dedup, the hash-groupBy family's keep-list)."""
    from docs2kg_spark.operators.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    return exact_dedup(d).select("doc_id")


SQL_DOC_EXACT_DEDUP = r"""
SELECT doc_id FROM documents
WHERE doc_id IN (
    SELECT MIN(doc_id) FROM documents
    GROUP BY sha256(trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g')))
)
"""



SQL_NGRAM_JACCARD = r"""
WITH toks AS (
  SELECT doc_id AS id, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS t FROM documents
), grams AS (
  SELECT DISTINCT id, array_to_string(list_slice(t, i+1, i+3), ' ') AS gram
  FROM toks, UNNEST(range(0, greatest(len(t)-3, 0)+1)) AS u(i)
  WHERE length(array_to_string(list_slice(t, i+1, i+3), ' ')) > 0
), capped AS (
  SELECT g.* FROM grams g
  WHERE gram NOT IN (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) > 1000)
), sizes AS (
  SELECT id, COUNT(*) AS n FROM capped GROUP BY id
), inter AS (
  SELECT a.id AS a, b.id AS b, COUNT(*) AS i
  FROM capped a JOIN capped b ON a.gram = b.gram AND a.id < b.id
  GROUP BY 1, 2
)
SELECT inter.a AS a, inter.b AS b, ROUND(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS sim
FROM inter JOIN sizes sa ON inter.a = sa.id JOIN sizes sb ON inter.b = sb.id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
"""



# DuckDB twin of the simhash near-dup query.  The simhash is fully
# deterministic (md5 token hashes), so SQL can recompute it bit-for-bit;
# candidate generation differs (SQL does exact all-pairs, Spark uses the
# 16-bit-chunk pigeonhole) but for max_hamming=3 over 4 chunks the
# pigeonhole is exact, so the RESULT sets are identical.  Every SUM is
# cast back to BIGINT: DuckDB widens SUM(BIGINT) to HUGEINT, and
# bit_count over a negative HUGEINT counts 64 extra sign bits.
SQL_SIMHASH = r"""
WITH toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
), th AS (
  SELECT id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks WHERE tok <> ''
), bits AS (
  SELECT id, i AS bit, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM th, UNNEST(range(0, 64)) AS u(i) GROUP BY 1, 2
), sigs_s AS (
  SELECT id, SUM(CASE WHEN c > 0 THEN
                   CASE WHEN bit = 63 THEN (-9223372036854775807::BIGINT - 1) ELSE (1::BIGINT << bit) END
                 ELSE 0::BIGINT END)::BIGINT AS sg
  FROM bits GROUP BY 1
), sigs AS (
  SELECT a.doc_id AS id, COALESCE(s.sg, 0::BIGINT) AS sig
  FROM documents a LEFT JOIN sigs_s s ON a.doc_id = s.id
)
SELECT a.id AS a, b.id AS b, bit_count(xor(a.sig, b.sig))::BIGINT AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


def q_doc_near_dup_minhash(spark, sf_dir):
    return _minhash_pairs_memo(spark, sf_dir).select(
        "a", "b", F.round("sim", 6).alias("sim")
    )


def q_minhash_estimator_audit(spark, sf_dir):
    """Estimator-vs-truth audit of the MinHash dedup path: one row per
    banded candidate pair with the 32-perm agreement count (what the
    est-J prefilter thresholds on) beside the exact shingle
    intersection/union (what the verifier computes) — the estimator's
    bias/variance is itself an oracled quantity.  All-integer output.
    Memoized: the threshold sweep consumes the same pair table, so the
    signature + banding + exact-Jaccard work runs once per session."""
    from docs2kg_spark.operators.dedup import minhash_estimator_audit

    d = _t(spark, sf_dir, "documents")
    return _kg_memo(
        spark, sf_dir, "minhash_audit",
        lambda: minhash_estimator_audit(d, sample_mod=None)
    )


def q_doc_near_dup_simhash(spark, sf_dir):
    from docs2kg_spark.operators.dedup import simhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(d, max_hamming=3)


def q_doc_ngram_jaccard(spark, sf_dir):
    from docs2kg_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=3, threshold=0.5).select("a", "b", F.round("sim", 6).alias("sim"))


def q_doc_dedup_map(spark, sf_dir):
    """near-dup clusters → min-id survivor map over documents (the
    transitive-closure completion of the pairwise near-dup queries)."""
    return _doc_dedup_map_memo(spark, sf_dir)


def _doc_dedup_map_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return doc_dedup_map_sql()


def q_pii_scrub(spark, sf_dir):
    """PII scrub over documents.  The synthetic corpus carries no real
    PII, so the query injects deterministic doc_id-derived PII spans
    into the text first (identically in the SQL twin) — the oracle then
    value-checks nonzero counts AND the exact redacted output, not a
    vacuous all-zeros row set."""
    from docs2kg_spark.operators.pii import scrub_documents

    d = _t(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ssn 123-45-6789"),
        ).alias("text"),
    )
    s = scrub_documents(injected)
    return s.select(
        "doc_id",
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
        F.col("n_ssn").cast("bigint").alias("n_ssn"),
        F.col("n_ccn").cast("bigint").alias("n_ccn"),
        F.md5("redacted").alias("redacted_digest"),
    )


# DuckDB twin: RE2 and Java interpret these conservative patterns
# identically (ASCII \d/\b, char classes, bounded quantifiers,
# non-capturing groups); DuckDB needs the explicit 'g' flag where Spark
# replaces globally by default, and len(regexp_extract_all(...)) is the
# regexp_count twin.
SQL_PII_SCRUB = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 ssn 123-45-6789' AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS n_phone,
  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b')) AS BIGINT) AS n_ccn,
  md5(
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b', '<CREDIT_CARD>', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
    '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b', '<PHONE>', 'g')
  ) AS redacted_digest
FROM injected
"""


def q_dup_spans(spark, sf_dir):
    """Gram-granular exact-substring duplication profile (per-doc share
    of word-8-gram positions repeated across ≥2 distinct docs) — the
    distributed stand-in for suffix-array substring dedup."""
    from docs2kg_spark.operators.dedup import dup_span_profile

    return dup_span_profile(_t(spark, sf_dir, "documents"), n=8, min_df=2)


SQL_DUP_SPANS = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
  FROM toks, unnest(range(1, greatest(len(w) - 8, 0) + 2)) AS t(i)
), pairs AS (
  SELECT doc_id, gram, COUNT(*) AS occ FROM grams WHERE len(gram) > 0 GROUP BY 1, 2
), flagged AS (
  SELECT doc_id, occ, COUNT(*) OVER (PARTITION BY gram) AS df FROM pairs
), per_doc AS (
  SELECT doc_id, SUM(occ) AS n_grams,
         COALESCE(SUM(occ) FILTER (WHERE df >= 2), 0) AS n_dup
  FROM flagged GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_grams,
       ROUND(COALESCE(p.n_dup / CAST(p.n_grams AS DOUBLE), 0.0), 6) AS dup_fraction
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_semdedup(spark, sf_dir):
    """SemDeDup over the embeddings table: min-id-seeded clusters,
    within-cluster cosine ≥ 0.3 duplicate groups, keep the member least
    similar to its centroid.  τ=0.3 because the synthetic embeddings
    have no true near-dups (max pairwise cos ≈ 0.51) — non-vacuous at
    both SFs (≥180 within-cluster pairs).

    n_clusters auto-scales with the corpus (semdedup_auto_k: expected
    cluster size ≤ 625, floor 16) so the within-cluster pair cost grows
    linearly — the paper's own scaling argument, now implemented (r5
    sf1 stress follow-up).  Both driver-oracle scales resolve to 16,
    matching the twin's LIMIT-16 centroid seeding exactly."""
    from docs2kg_spark.operators.similarity import semdedup

    return semdedup(_t(spark, sf_dir, "embeddings"), n_clusters=None, tau=0.3)


SQL_SEMDEDUP = """
WITH RECURSIVE cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS centv FROM embeddings ORDER BY vec_id LIMIT 16
), emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), assigned AS MATERIALIZED (
  SELECT vec_id, v, cid, ROUND(ccos, 6) AS cos_c FROM (
    SELECT e.vec_id, e.v, c.cid, list_cosine_similarity(e.v, c.centv) AS ccos,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.v, c.centv) DESC, c.cid ASC) AS r
    FROM emb e CROSS JOIN cents c) WHERE r = 1
), sd_edges AS (
  SELECT a.vec_id AS a, b.vec_id AS b
  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.3
), sd_sym AS (SELECT a, b FROM sd_edges UNION SELECT b, a FROM sd_edges),
sd_reach(n, c) AS (
  SELECT a, a FROM sd_sym
  UNION
  SELECT s.b, r.c FROM sd_reach r JOIN sd_sym s ON s.a = r.n
), sd_comp AS (SELECT n AS vec_id, MIN(c) AS comp FROM sd_reach GROUP BY 1),
labeled AS (
  SELECT x.vec_id, x.cid, x.cos_c, COALESCE(cp.comp, x.vec_id) AS comp
  FROM assigned x LEFT JOIN sd_comp cp USING (vec_id)
), surv AS (
  SELECT comp, vec_id AS canonical_id FROM (
    SELECT comp, vec_id,
           ROW_NUMBER() OVER (PARTITION BY comp ORDER BY cos_c ASC, vec_id ASC) AS r
    FROM labeled) WHERE r = 1
)
SELECT l.vec_id, CAST(l.cid AS BIGINT) AS cid, l.cos_c,
       CAST(s.canonical_id AS BIGINT) AS canonical_id,
       (l.vec_id = s.canonical_id) AS kept
FROM labeled l JOIN surv s USING (comp)
"""


# ---------------------------------------------------------------------------
# winnowing fingerprints (operators/dedup.py — MOSS local-overlap dedup)
# ---------------------------------------------------------------------------


def q_doc_winnow_pairs(spark, sf_dir):
    """Near-dup candidate pairs by shared winnowing fingerprints —
    order-SENSITIVE local overlap (shared token runs), where n-gram
    Jaccard is order-blind set overlap."""
    from docs2kg_spark.operators.dedup import winnow_pairs

    return winnow_pairs(_t(spark, sf_dir, "documents"), min_shared=2)


def _winnow_thin_ctes(k: int = 3, window: int = 4, max_df: int = 50) -> str:
    """CTE chain ending at wn_thin (the df-filtered per-doc fingerprint
    table) — shared by the pair twin and the containment twin."""
    from docs2kg_spark.operators.dedup import _WINNOW_POS_BITS

    p = _WINNOW_POS_BITS
    # Build the k-token gram concat from k (ADVICE r3): previously the
    # generate_series bounds used k but the concat hardcoded 3 tokens,
    # so a k != 3 caller silently hashed different grams than Spark.
    gram_expr = " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(k))
    return rf"""wn_arrs AS (
  SELECT doc_id AS id,
         list_filter(regexp_split_to_array(trim(lower(text)), '[ \t\n\r\f\x0B]+'),
                     x -> x <> '') AS toks
  FROM documents
),
wn_g AS (
  SELECT id,
    [CAST(CAST(('0x' || substr(md5({gram_expr}), 1, 8))
          AS UBIGINT) AS BIGINT) * {p} + i
     for i in generate_series(1, len(toks) - {k - 1})] AS enc
  FROM wn_arrs WHERE len(toks) >= {k}
),
wn_fp AS (
  SELECT DISTINCT id, CAST(s // {p} AS BIGINT) AS fp
  FROM (
    SELECT id,
           unnest(list_distinct([list_min(enc[j:j+{window - 1}])
                                 for j in generate_series(1, greatest(len(enc) - {window - 1}, 1))])) AS s
    FROM wn_g)
),
wn_ok AS (SELECT fp FROM wn_fp GROUP BY fp HAVING count(*) <= {max_df}),
wn_thin AS (SELECT id, fp FROM wn_fp JOIN wn_ok USING (fp))"""


def _doc_winnow_pairs_sql(k: int = 3, window: int = 4, min_shared: int = 2,
                          max_df: int = 50) -> str:
    return f"""
WITH {_winnow_thin_ctes(k, window, max_df)}
SELECT a.id AS doc_a, b.id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
FROM wn_thin a JOIN wn_thin b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
"""


def _doc_winnow_containment_sql(k: int = 3, window: int = 4, min_shared: int = 2,
                                max_df: int = 50) -> str:
    return f"""
WITH {_winnow_thin_ctes(k, window, max_df)},
wn_cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_fp FROM wn_thin GROUP BY 1),
wn_pairs AS (
  SELECT a.id AS doc_a, b.id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM wn_thin a JOIN wn_thin b ON a.fp = b.fp AND a.id < b.id
  GROUP BY 1, 2 HAVING count(*) >= {min_shared}
)
SELECT p.doc_a, p.doc_b, p.n_shared, ca.n_fp AS n_a, cb.n_fp AS n_b,
       ROUND(CAST(p.n_shared AS DOUBLE) / least(ca.n_fp, cb.n_fp), 6) AS containment
FROM wn_pairs p
JOIN wn_cnt ca ON ca.id = p.doc_a
JOIN wn_cnt cb ON cb.id = p.doc_b
"""


def q_doc_dup_rate_by_source(spark, sf_dir):
    """Per-source near-duplication rate: join the transitive near-dup
    survivor map back to each document's source and count non-survivors
    — the standard triage for which crawl/feed is flooding the corpus
    with copies (its permille is exact integer arithmetic).

    Scale shape: the dedup map is doc-keyed, so the join is a plain
    equi-join on the already-shuffled key; the rollup is |sources|
    rows."""
    d = _t(spark, sf_dir, "documents")
    cmap = _doc_dedup_map_memo(spark, sf_dir)
    j = d.select(F.col("doc_id").cast("string").alias("doc_id"), "source").join(
        cmap, on="doc_id"
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("canonical_id") != F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dups"),
        )
        .withColumn("dup_permille", F.expr("CAST((1000 * n_dups) DIV n_docs AS BIGINT)"))
    )


def _doc_dup_rate_by_source_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return f"""
WITH ddm AS ({doc_dedup_map_sql()})
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ddm.canonical_id <> ddm.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       CAST((1000 * SUM(CASE WHEN ddm.canonical_id <> ddm.doc_id THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS dup_permille
FROM documents d JOIN ddm ON CAST(d.doc_id AS VARCHAR) = ddm.doc_id
GROUP BY d.source
"""


def q_doc_dup_source_matrix(spark, sf_dir):
    """Cross-source near-duplication matrix: every MinHash near-dup
    pair mapped to its (source, source) cell — WHICH feeds copy WHICH
    (unordered: the pair's two sources are normalized with
    least/greatest, so the matrix is upper-triangular and
    deterministic).  The per-source dup RATE (doc_dup_rate_by_source)
    says how much; this says from where.

    Scale shape: the pair table is id-only (two strings); the two
    source lookups are doc-keyed equi-joins against an id→source
    projection, then one |sources|² hash agg."""
    d = _t(spark, sf_dir, "documents")
    pairs = _minhash_pairs_memo(spark, sf_dir).select("a", "b")
    src = d.select(
        F.col("doc_id").cast("string").alias("id"), F.col("source").alias("_src")
    )
    j = (
        pairs.join(src.withColumnRenamed("id", "a").withColumnRenamed("_src", "sa"), "a")
        .join(src.withColumnRenamed("id", "b").withColumnRenamed("_src", "sb"), "b")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_lo"),
            F.greatest("sa", "sb").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def _doc_dup_source_matrix_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import minhash_pairs_parts

    ctes, pairs_select = minhash_pairs_parts()
    return f"""
WITH {ctes},
dsm_pairs AS ({pairs_select})
SELECT least(da.source, db.source) AS source_lo,
       greatest(da.source, db.source) AS source_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM dsm_pairs p
JOIN documents da ON CAST(da.doc_id AS VARCHAR) = p.a
JOIN documents db ON CAST(db.doc_id AS VARCHAR) = p.b
GROUP BY 1, 2
"""


def q_role_boilerplate(spark, sf_dir):
    """Boilerplate discovery per role: the top-5 most frequent
    turn-initial trigram prefixes for each speaker role — the
    template-stamping read an SFT-curation pass runs before dropping
    canned openers (data-driven, unlike a fixed refusal lexicon, so it
    finds THIS corpus's boilerplate).

    Scale shape: the prefix is row-local array arithmetic (split →
    filter empties → slice 3 → join) — no explode; one (role, prefix)
    hash agg with map-side combine; the rank window runs over the
    already-reduced prefix relation.  Deterministic total order
    (count DESC, prefix ASC)."""
    t = derive_transcripts(spark, sf_dir)
    prefix = F.array_join(
        F.slice(
            F.filter(F.split(F.lower("text"), WS_RE), lambda x: x != F.lit("")),
            1,
            3,
        ),
        " ",
    )
    counted = (
        t.select(
            "role",
            prefix.alias("prefix"),
            F.size(
                F.filter(F.split(F.lower("text"), WS_RE), lambda x: x != F.lit(""))
            ).alias("_n"),
        )
        .filter(F.col("_n") >= 3)
        .groupBy("role", "prefix")
        .agg(F.count("*").cast("bigint").alias("n_turns"))
    )
    w = Window.partitionBy("role").orderBy(F.col("n_turns").desc(), F.col("prefix"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("role", F.col("rank").cast("int").alias("rank"), "prefix", "n_turns")
    )


def _role_boilerplate_sql() -> str:
    return rf"""
WITH {TRANSCRIPTS_CTE.strip().rstrip()},
bp AS (
  SELECT role,
         array_to_string(list_filter(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+'),
                                     x -> x <> '')[1:3], ' ') AS prefix,
         length(list_filter(regexp_split_to_array(lower(text), '[ \t\n\r\f\x0B]+'),
                            x -> x <> '')) AS n
  FROM transcripts
),
bpc AS (
  SELECT role, prefix, CAST(COUNT(*) AS BIGINT) AS n_turns
  FROM bp WHERE n >= 3 GROUP BY 1, 2
)
SELECT role, CAST(rnk AS INT) AS rank, prefix, n_turns FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY role ORDER BY n_turns DESC, prefix) AS rnk
  FROM bpc
) WHERE rnk <= 5
"""


def q_turn_dedup(spark, sf_dir):
    """Corpus-wide turn-level exact dedup over the derived transcripts
    (C4's line dedup at chat-turn granularity): a turn survives iff it
    is the FIRST occurrence of its text in (conv_id, turn_idx) order;
    returns the per-conversation survival profile — the read an SFT
    curation pass uses to drop template-stamped conversations.

    Scale shape: the first-wins window partitions by sha2(text) (a
    fixed-width key — the wide text column never rides the shuffle) and
    each partition is one duplicate group; the per-conv rollup is a
    second thin agg.  Same first-wins discipline as mention dedup."""
    t = derive_transcripts(spark, sf_dir)
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("conv_id", "turn_idx")
    flagged = t.select(
        "conv_id",
        (F.row_number().over(w) == 1).cast("int").alias("is_first"),
    )
    return flagged.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_turns"),
        F.sum("is_first").cast("bigint").alias("n_kept"),
        (F.count("*") - F.sum("is_first")).cast("bigint").alias("n_dropped"),
    )


SQL_TURN_DEDUP = f"""
WITH {TRANSCRIPTS_CTE},
td AS (
  SELECT conv_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY text ORDER BY conv_id, turn_idx) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM transcripts
)
SELECT conv_id,
       CAST(COUNT(*) AS BIGINT) AS n_turns,
       CAST(SUM(is_first) AS BIGINT) AS n_kept,
       CAST(COUNT(*) - SUM(is_first) AS BIGINT) AS n_dropped
FROM td GROUP BY 1
"""


def q_simhash_hd_hist(spark, sf_dir):
    """Hamming-distance histogram of the SimHash candidate pairs — the
    threshold-tuning observability read: how many near-dup pairs sit at
    each distance 0..3 tells you whether the ≤3 cutoff is inside the
    duplicate cluster or already into the noise floor.

    Scale shape: composes the pigeonhole-blocked pair join (never
    all-pairs) and reduces it to ≤4 rows with one hash agg."""
    from docs2kg_spark.operators.dedup import simhash_near_dup_pairs

    d = _t(spark, sf_dir, "documents")
    return (
        simhash_near_dup_pairs(d, max_hamming=3)
        .groupBy("hamming")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


SQL_SIMHASH_HD_HIST = f"""
SELECT hamming, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ({SQL_SIMHASH}) GROUP BY 1
"""


def q_minhash_sim_bands(spark, sf_dir):
    """Similarity histogram of the MinHash near-dup pairs (verified
    Jaccard, 0.1-wide bands) — the threshold-tuning observability read
    for the LSH path, the Jaccard analog of simhash_hd_hist.

    Scale shape: composes the memoized pair table and reduces it to
    ≤10 rows with one hash agg."""
    pairs = _minhash_pairs_memo(spark, sf_dir)
    band = F.floor(F.col("sim") * 10).cast("bigint")
    return pairs.groupBy(band.alias("band")).agg(
        F.count("*").cast("bigint").alias("n_pairs")
    )


def _minhash_sim_bands_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import minhash_near_dup_sql

    return f"""
SELECT CAST(FLOOR(sim * 10) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM ({minhash_near_dup_sql()}) GROUP BY 1
"""


def q_dedup_method_venn(spark, sf_dir):
    """Method-agreement audit across the three document dedup paths:
    exact-hash pairs vs MinHash near-dup pairs vs SimHash near-dup
    pairs — per method pair, both set sizes, the intersection, and the
    set-Jaccard.  This is the read that justifies a dedup-stack choice
    (if SimHash ⊂ MinHash the cheaper pass is redundant; a low exact∩
    near-dup overlap means the near-dup passes are doing real work).

    Scale shape: exact pairs expand only within identical-text groups
    (dup clusters are small; same bound as dup_spans); the near-dup
    sets ride their blocked joins (MinHash memoized).  Each set is
    localCheckpointed once and read three times; the venn is nine
    1-row aggs over thin (a, b) tables."""
    d = _t(spark, sf_dir, "documents")
    h = d.select(F.col("doc_id"), F.sha2(F.col("text"), 256).alias("h"))
    ex = (
        h.alias("x")
        .join(h.alias("y"), F.col("x.h") == F.col("y.h"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .localCheckpoint(eager=False)
    )
    mh = _minhash_pairs_memo(spark, sf_dir).select("a", "b")
    from docs2kg_spark.operators.dedup import simhash_near_dup_pairs

    sh = (
        simhash_near_dup_pairs(d, max_hamming=3)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    sets = {"exact": ex, "minhash": mh, "simhash": sh}
    combos = [("exact", "minhash"), ("exact", "simhash"), ("minhash", "simhash")]
    parts = []
    for na, nb in combos:
        ca = sets[na].agg(F.count("*").cast("bigint").alias("n_a"))
        cb = sets[nb].agg(F.count("*").cast("bigint").alias("n_b"))
        cc = (
            sets[na]
            .join(sets[nb], ["a", "b"])
            .agg(F.count("*").cast("bigint").alias("n_common"))
        )
        parts.append(
            ca.crossJoin(cb)
            .crossJoin(cc)
            .select(
                F.lit(na).alias("method_a"),
                F.lit(nb).alias("method_b"),
                "n_a",
                "n_b",
                "n_common",
                # both-sets-empty guard (NULL, matching NULLIF)
                F.round(
                    F.when(
                        (F.col("n_a") + F.col("n_b") - F.col("n_common")) > 0,
                        F.col("n_common").cast("double")
                        / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                    ),
                    6,
                ).alias("set_jaccard"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dedup_method_venn_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import minhash_near_dup_sql

    return f"""
WITH vn_ex AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM documents x JOIN documents y
    ON x.text = y.text AND x.doc_id < y.doc_id
),
vn_mh AS (SELECT a, b FROM ({minhash_near_dup_sql()})),
vn_sh AS (SELECT a, b FROM ({SQL_SIMHASH})),
vn_rows AS (
  SELECT 'exact' AS method_a, 'minhash' AS method_b,
         (SELECT count(*) FROM vn_ex) AS n_a,
         (SELECT count(*) FROM vn_mh) AS n_b,
         (SELECT count(*) FROM vn_ex JOIN vn_mh USING (a, b)) AS n_common
  UNION ALL
  SELECT 'exact', 'simhash',
         (SELECT count(*) FROM vn_ex),
         (SELECT count(*) FROM vn_sh),
         (SELECT count(*) FROM vn_ex JOIN vn_sh USING (a, b))
  UNION ALL
  SELECT 'minhash', 'simhash',
         (SELECT count(*) FROM vn_mh),
         (SELECT count(*) FROM vn_sh),
         (SELECT count(*) FROM vn_mh JOIN vn_sh USING (a, b))
)
SELECT method_a, method_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / NULLIF(n_a + n_b - n_common, 0), 6) AS set_jaccard
FROM vn_rows
"""


def q_winnow_containment(spark, sf_dir):
    """MOSS containment per winnowing candidate pair — the asymmetric
    overlap score (shared fps / smaller fp set) that separates "doc b
    quotes a section of doc a" from global near-duplication; the
    quote-detection read a license/provenance pass runs."""
    from docs2kg_spark.operators.dedup import winnow_containment

    return winnow_containment(_t(spark, sf_dir, "documents"), min_shared=2)


def q_lsh_band_sweep(spark, sf_dir):
    """LSH banding sweep: candidate-pair volume under 4×8 / 8×4 / 16×2
    bandings from ONE signature table — prices the recall/verify-cost
    trade before re-running a petabyte dedup (operators/dedup.py::
    lsh_band_sweep)."""
    from docs2kg_spark.operators.dedup import lsh_band_sweep

    return lsh_band_sweep(_t(spark, sf_dir, "documents"), bandings=(4, 8, 16))


def _lsh_band_sweep_sql(bandings: tuple = (4, 8, 16)) -> str:
    from docs2kg_spark.config import PipelineConfig
    from docs2kg_spark.oracle.sql_twins import (
        _band_keys_expr,
        _shingle_hash_ctes,
        _sig_select,
    )

    cfg = PipelineConfig(shingle_k=5, jaccard_threshold=0.7, lsh_bands=8)
    legs = []
    for bands in bandings:
        keys = _band_keys_expr(cfg.minhash_perms, bands)
        legs.append(
            f"""
SELECT CAST({bands} AS INT) AS bands,
       CAST({cfg.minhash_perms // bands} AS INT) AS rows_per_band,
       CAST((SELECT count(*) FROM (
          SELECT DISTINCT a.id, b.id
          FROM (SELECT id, unnest([{keys}]) AS bk FROM mh_sigs) a
          JOIN (SELECT id, unnest([{keys}]) AS bk FROM mh_sigs) b
            ON a.bk = b.bk AND a.id < b.id)) AS BIGINT) AS n_candidates"""
        )
    return (
        f"WITH {_shingle_hash_ctes(cfg.shingle_k).strip()},\n"
        f"{_sig_select(cfg.minhash_perms, mat='MATERIALIZED ')}\n"
        + "\nUNION ALL\n".join(legs)
    )


def q_dup_quality_gap(spark, sf_dir):
    """Are near-duplicates lower quality?  Mean quality score and mean
    length for duplicate docs (canonical_id ≠ own id in the transitive
    dedup map) vs survivors — the evidence read behind 'dedup first,
    then quality-filter' pipeline ordering.

    Scale shape: the dedup map joins doc-keyed onto row-local quality
    columns; ONE 2-row hash agg with integer-scaled sums."""
    from docs2kg_spark.operators.text import quality_columns

    d = _t(spark, sf_dir, "documents")
    dm = q_doc_dedup_map(spark, sf_dir)
    q6 = F.round(F.round(quality_columns("text")["quality"], 6) * 1e6).cast("bigint")
    j = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("nc"),
        q6.alias("q6"),
    ).join(dm, "doc_id")
    bucket = F.when(F.col("doc_id") == F.col("canonical_id"), "kept").otherwise("dup")
    return (
        j.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.round(F.sum("q6").cast("double") / 1e6 / F.count("*"), 6).alias(
                "mean_quality"
            ),
            F.round(F.sum("nc").cast("double") / F.count("*"), 6).alias("mean_chars"),
        )
    )


def _dup_quality_gap_sql() -> str:
    return f"""
WITH dg_map AS ({_doc_dedup_map_sql()}),
dg_q AS ({SQL_QUALITY})
SELECT CASE WHEN m.doc_id = m.canonical_id THEN 'kept' ELSE 'dup' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(CAST(round(q.quality * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 / COUNT(*), 6)
         AS mean_quality,
       ROUND(CAST(SUM(d.n_chars) AS DOUBLE) / COUNT(*), 6) AS mean_chars
FROM documents d
JOIN dg_map m ON m.doc_id = CAST(d.doc_id AS VARCHAR)
JOIN dg_q q ON q.doc_id = d.doc_id
GROUP BY 1
"""


def q_doc_ppjoin(spark, sf_dir):
    """EXACT 3-shingle similarity self-join via prefix filtering
    (PPJoin-lite; operators/dedup.py::ppjoin_pairs) at Jaccard ≥ 0.5 —
    the exact counterpart to the approximate MinHash/SimHash paths:
    same pair semantics, zero false negatives, candidate generation
    keyed on globally-rarest prefix shingles only.  The DuckDB twin is
    the brute-force all-shared-shingle join, so the gate proves the
    prefix filter loses nothing."""
    from docs2kg_spark.operators.dedup import ppjoin_pairs

    return ppjoin_pairs(_t(spark, sf_dir, "documents"), threshold_pct=50)


SQL_DOC_PPJOIN = r"""
WITH pj_w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
pj_idx AS (
  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
  FROM pj_w WHERE len(w) >= 3
),
pj_t AS (
  SELECT DISTINCT doc_id,
         CAST(CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8)) AS UBIGINT) AS BIGINT) AS tok
  FROM pj_idx
),
pj_n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM pj_t GROUP BY 1),
pj_i AS (
  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
  FROM pj_t x JOIN pj_t y ON x.tok = y.tok AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, inter, na.n AS na, nb.n AS nb,
       ROUND(CAST(inter AS DOUBLE) / (na.n + nb.n - inter), 6) AS jacc
FROM pj_i
JOIN pj_n na ON na.doc_id = a
JOIN pj_n nb ON nb.doc_id = b
WHERE inter * 100 >= 50 * (na.n + nb.n - inter)
"""


def q_dup_sentences(spark, sf_dir):
    """Corpus-wide duplicated-SENTENCE profile: the top-20 sentences
    (≥ 20 chars, whitespace-normalized) appearing in ≥ 2 documents —
    sentence-granular boilerplate discovery (role_boilerplate is
    per-role n-grams; this is cross-corpus verbatim sentences, the
    thing licence headers and templated disclaimers show up as).

    Scale shape: the sentence split is row-local; ONE (sentence) hash
    agg with a distinct-doc count; TakeOrdered top-20."""
    d = _t(spark, sf_dir, "documents")
    sent = F.trim(F.regexp_replace(F.col("s_raw"), WS_RE, " "))
    sents = (
        d.select("doc_id", F.explode(F.split("text", "[.!?]")).alias("s_raw"))
        .select("doc_id", sent.alias("sentence"))
        .filter(F.length("sentence") >= 20)
    )
    return (
        sents.groupBy("sentence")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .filter("n_docs >= 2")
        .orderBy(F.col("n_occ").desc(), F.col("n_docs").desc(), "sentence")
        .limit(20)
    )


SQL_DUP_SENTENCES = r"""
WITH ds_raw AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '[.!?]')) AS s_raw
  FROM documents
),
ds_s AS (
  SELECT doc_id, trim(regexp_replace(s_raw, '[ \t\n\r\f\x0B]+', ' ', 'g')) AS sentence
  FROM ds_raw
)
SELECT sentence, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM ds_s WHERE length(sentence) >= 20
GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_occ DESC, n_docs DESC, sentence
LIMIT 20
"""


def q_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster size histogram: how many clusters have 1, 2, 3…
    members — the dedup-impact summary (singleton share = untouched
    corpus; the tail = template families).  Composes the memoized
    transitive survivor map; exact counts.

    Scale shape: two stacked hash aggs (survivor → size, size → count)
    on the already-materialized map."""
    cmap = _doc_dedup_map_memo(spark, sf_dir)
    return (
        cmap.groupBy("canonical_id")
        .agg(F.count("*").cast("bigint").alias("sz"))
        .groupBy("sz")
        .agg(F.count("*").cast("bigint").alias("n_clusters"))
        .selectExpr("CAST(sz AS BIGINT) AS cluster_size", "n_clusters")
    )


def _dedup_cluster_sizes_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return f"""
WITH dcs_map AS ({doc_dedup_map_sql()}),
dcs_sz AS (
  SELECT canonical_id, CAST(count(*) AS BIGINT) AS sz FROM dcs_map GROUP BY 1
)
SELECT CAST(sz AS BIGINT) AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
FROM dcs_sz GROUP BY 1
"""


def q_dedup_funnel(spark, sf_dir):
    """The curation funnel in 4 exact rows: raw docs → exact-dedup
    survivors → near-dup (MinHash transitive) survivors → quality-gate
    keepers among those — the one-glance answer to "how much corpus
    survives each stage and what does each stage uniquely remove".
    Composes the memoized dedup map and the Gopher/C4 gate.

    Scale shape: three thin aggregates over already-reduced tables +
    one broadcast semi-join for the composed stage; output is 4 rows."""
    d = _t(spark, sf_dir, "documents")
    from docs2kg_spark.operators.text import fingerprint

    n_raw = d.agg(F.count("*").cast("bigint").alias("n"))
    n_exact = d.select(fingerprint(F.col("text")).alias("fp")).distinct().agg(
        F.count("*").cast("bigint").alias("n")
    )
    cmap = _doc_dedup_map_memo(spark, sf_dir)
    survivors = cmap.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id")
    n_near = survivors.agg(F.count("*").cast("bigint").alias("n"))
    kept = q_corpus_filter(spark, sf_dir).filter("kept = 1").select("doc_id")
    n_quality = survivors.join(kept, "doc_id", "left_semi").agg(
        F.count("*").cast("bigint").alias("n")
    )
    stages = [
        ("1_raw", n_raw),
        ("2_exact_dedup", n_exact),
        ("3_near_dedup", n_near),
        ("4_quality_gate", n_quality),
    ]
    out = None
    for name, agg in stages:
        row = agg.select(F.lit(name).alias("stage"), F.col("n").alias("n_docs"))
        out = row if out is None else out.unionByName(row)
    return out


def _dedup_funnel_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return (
        r"""
WITH df_map AS ("""
        + doc_dedup_map_sql()
        + r"""),
df_surv AS (SELECT doc_id FROM df_map WHERE doc_id = canonical_id),
df_kept AS (SELECT doc_id FROM ("""
        + SQL_CORPUS_FILTER
        + r""") WHERE kept = 1)
SELECT '1_raw' AS stage, (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
UNION ALL
SELECT '2_exact_dedup',
       (SELECT CAST(count(DISTINCT trim(regexp_replace(lower(text), '[ \t\n\r\f\x0B]+', ' ', 'g'))) AS BIGINT)
        FROM documents)
UNION ALL
SELECT '3_near_dedup', (SELECT CAST(count(*) AS BIGINT) FROM df_surv)
UNION ALL
SELECT '4_quality_gate',
       (SELECT CAST(count(*) AS BIGINT) FROM df_surv s
        WHERE EXISTS (SELECT 1 FROM df_kept k WHERE k.doc_id = s.doc_id))
"""
    )


def q_shingle_df_profile(spark, sf_dir):
    """Document-frequency histogram of 3-token shingles (log2 buckets)
    — the blocking-cost profile behind every shingle-keyed join
    (PPJoin prefixes, n-gram Jaccard, winnowing): the bucket tail IS
    the worst-case per-key fanout those joins must cap.  Exact counts;
    floor(log2) on integers is engine-stable.

    Scale shape: one (shingle) hash agg over the row-local shingle
    stream, then a second agg to O(log max_df) rows."""
    d = _t(spark, sf_dir, "documents")
    grams = (
        d.select(
            "doc_id",
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
            ).alias("w"),
        )
        .filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(w) - 3), "
                        "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                    )
                )
            ).alias("g"),
        )
    )
    dfreq = grams.groupBy("g").agg(F.count("*").cast("bigint").alias("df"))
    return dfreq.groupBy(
        F.floor(F.log2("df")).cast("bigint").alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.min("df").cast("bigint").alias("min_df"),
        F.max("df").cast("bigint").alias("max_df"),
    )


SQL_SHINGLE_DF_PROFILE = """
WITH sp_w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS w
  FROM documents
),
sp_i AS (
  SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i
  FROM sp_w WHERE len(w) >= 3
),
sp_g AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM sp_i),
sp_df AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM sp_g GROUP BY 1)
SELECT CAST(floor(log2(df)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(min(df) AS BIGINT) AS min_df,
       CAST(max(df) AS BIGINT) AS max_df
FROM sp_df GROUP BY 1
"""


def q_type_user_jaccard(spark, sf_dir):
    """User-audience overlap between event types: |users(A) ∩
    users(B)| / |users(A) ∪ users(B)| for every type pair — the
    set-based complement to event_lift's session co-occurrence (lift
    says "do they happen together"; this says "are they the same
    PEOPLE").  Exact integer set algebra, one rounded division.

    Scale shape: reduces to distinct (type, user) first (≤
    |types|·|users| rows), self-joins on user (per-key fanout ≤
    |types|), and broadcasts the per-type set sizes onto the
    ≤ |types|² pair rows."""
    e = _t(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct().localCheckpoint(eager=False)
    sizes = tu.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_u"))
    pairs = (
        tu.alias("x")
        .join(tu.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_inter"))
    )
    return (
        pairs.join(F.broadcast(sizes.selectExpr("event_type AS type_a", "n_u AS n_a")), "type_a")
        .join(F.broadcast(sizes.selectExpr("event_type AS type_b", "n_u AS n_b")), "type_b")
        .selectExpr(
            "type_a", "type_b", "n_inter", "n_a", "n_b",
            "ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6) AS jacc",
        )
    )


SQL_TYPE_USER_JACCARD = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
tu_n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_u FROM tu GROUP BY 1),
tu_p AS (
  SELECT x.event_type AS type_a, y.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM tu x JOIN tu y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b, p.n_inter, a.n_u AS n_a, b.n_u AS n_b,
       ROUND(CAST(p.n_inter AS DOUBLE) / (a.n_u + b.n_u - p.n_inter), 6) AS jacc
FROM tu_p p
JOIN tu_n a ON a.event_type = p.type_a
JOIN tu_n b ON b.event_type = p.type_b
"""


def q_dup_lang_matrix(spark, sf_dir):
    """Language × language matrix of near-dup pairs: does duplication
    stay within a language or cross it (template reuse / machine
    translation traces)?  Composes the memoized MinHash pair table
    with the documents' lang labels; exact counts + the min/max
    similarity per cell (order-independent extremes, never a float
    mean over a hash-partitioned group).

    Scale shape: two broadcast-able doc-keyed joins onto the thin pair
    table, one (lang, lang) hash agg."""
    pairs = _minhash_pairs_memo(spark, sf_dir)
    langs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    j = (
        pairs.join(langs.selectExpr("doc_id AS a", "lang AS lang_raw_a"), "a")
        .join(langs.selectExpr("doc_id AS b", "lang AS lang_raw_b"), "b")
        .selectExpr(
            "least(lang_raw_a, lang_raw_b) AS lang_a",
            "greatest(lang_raw_a, lang_raw_b) AS lang_b",
            "ROUND(sim, 6) AS sim",  # match the twin's rounded pair sim
        )
    )
    return j.groupBy("lang_a", "lang_b").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.min("sim").alias("min_sim"),
        F.max("sim").alias("max_sim"),
    )


def _dup_lang_matrix_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import minhash_near_dup_sql

    return f"""
WITH dl_p AS ({minhash_near_dup_sql()}),
dl_j AS (
  SELECT least(da.lang, db.lang) AS lang_a, greatest(da.lang, db.lang) AS lang_b, p.sim
  FROM dl_p p
  JOIN documents da ON da.doc_id = p.a
  JOIN documents db ON db.doc_id = p.b
)
SELECT lang_a, lang_b, CAST(count(*) AS BIGINT) AS n_pairs,
       min(sim) AS min_sim, max(sim) AS max_sim
FROM dl_j GROUP BY 1, 2
"""


def q_dedup_threshold_sweep(spark, sf_dir):
    """Dedup-threshold policy sweep over the banded candidate pairs:
    for each Jaccard cutoff, how many pairs the TRUE shingle Jaccard
    admits vs how many the 32-perm ESTIMATE admits — the
    threshold-setting read (where does the estimator over/under-admit)
    with every comparison an exact integer cross-multiplication
    (inter·100 ≥ t·union; agree·100 ≥ t·32).

    Scale shape: one pass over the already-thin audit pair table,
    5 conditional sums → 5 rows."""
    audit = q_minhash_estimator_audit(spark, sf_dir)
    out = None
    for t in _SWEEP_T:
        row = audit.agg(
            F.lit(t).cast("int").alias("t_pct"),
            F.sum(
                F.when(F.col("n_inter") * 100 >= t * F.col("n_union"), 1).otherwise(0)
            ).cast("bigint").alias("n_true"),
            F.sum(
                F.when(F.col("n_agree") * 100 >= t * 32, 1).otherwise(0)
            ).cast("bigint").alias("n_est"),
        ).select("t_pct", "n_true", "n_est")
        out = row if out is None else out.unionByName(row)
    return out


def _dedup_threshold_sweep_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import minhash_estimator_audit_sql

    parts = []
    for t in _SWEEP_T:
        parts.append(f"""
SELECT CAST({t} AS INT) AS t_pct,
       CAST(sum(CASE WHEN n_inter * 100 >= {t} * n_union THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       CAST(sum(CASE WHEN n_agree * 100 >= {t} * 32 THEN 1 ELSE 0 END) AS BIGINT) AS n_est
FROM ts_audit""")
    return (
        f"WITH ts_audit AS ({minhash_estimator_audit_sql()})"
        + "\nUNION ALL\n".join(parts)
    )


def q_doc_scrub(spark, sf_dir):
    """Exact-substring scrub (Lee et al. arXiv:2107.06499 removal
    stage): delete every token position covered by a word-8-gram that
    appears in ≥2 distinct documents and return the char-exact
    scrubbed text — the strongest cross-engine statement in the dedup
    family (the twin must reproduce the rebuilt string byte-for-byte,
    not just counts)."""
    from docs2kg_spark.operators.dedup import exact_substr_scrub

    return exact_substr_scrub(_t(spark, sf_dir, "documents"), n=8, min_df=2)


SQL_DOC_SCRUB = r"""
WITH sc_toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+'),
                     t -> len(t) > 0) AS w
  FROM documents
), sc_g AS (
  SELECT doc_id, len(w) AS length, i, array_to_string(w[i+1:i+8], ' ') AS gram
  FROM sc_toks, unnest(range(0, greatest(len(w) - 8, 0) + 1)) t(i)
  WHERE len(array_to_string(w[i+1:i+8], ' ')) > 0
), sc_dup AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
    FROM (SELECT DISTINCT doc_id, gram FROM sc_g)
  ) WHERE df >= 2
), sc_cov AS (
  SELECT DISTINCT g.doc_id, j
  FROM sc_g g JOIN sc_dup d ON d.doc_id = g.doc_id AND d.gram = g.gram,
       unnest(range(g.i, least(g.i + 8, g.length))) t(j)
), sc_keep AS (
  SELECT t.doc_id, p.j - 1 AS j, t.w[p.j] AS tok
  FROM sc_toks t, unnest(range(1, len(t.w) + 1)) p(j)
), sc_out AS (
  SELECT k.doc_id, string_agg(k.tok, ' ' ORDER BY k.j) AS scrubbed
  FROM sc_keep k LEFT JOIN sc_cov c ON c.doc_id = k.doc_id AND c.j = k.j
  WHERE c.j IS NULL GROUP BY 1
), sc_rm AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM sc_cov GROUP BY 1
)
SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_toks,
       COALESCE(r.n_removed, 0) AS n_removed,
       COALESCE(o.scrubbed, '') AS scrubbed_text
FROM sc_toks t
LEFT JOIN sc_rm r USING (doc_id)
LEFT JOIN sc_out o USING (doc_id)
"""


def q_dup_cluster_purity(spark, sf_dir):
    """Near-dup cluster composition: per cluster-size band, how many
    clusters span multiple sources (mirror/syndication dups) vs stay
    within one source (template/boilerplate dups), and the same for
    languages — the triage read that decides whether dedup should run
    global or per-source at the next scale-up.

    Scale shape: one doc-keyed join of the memoized survivor map onto
    the thin (doc, source, lang) projection, a cluster-grain agg, then
    a ≤4-row band rollup."""
    cmap = _doc_dedup_map_memo(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "source", "lang"
    )
    per = (
        cmap.join(d, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count("*").alias("sz"),
            F.countDistinct("source").alias("ns"),
            F.countDistinct("lang").alias("nl"),
        )
        .filter(F.col("sz") >= 2)
    )
    band = (
        F.when(F.col("sz") <= 2, "2")
        .when(F.col("sz") <= 4, "3-4")
        .when(F.col("sz") <= 8, "5-8")
        .otherwise("9+")
    )
    return (
        per.groupBy(band.alias("size_band"))
        .agg(
            F.count("*").cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_multi_source"),
            F.sum(F.when(F.col("nl") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_multi_lang"),
        )
    )


def _dup_cluster_purity_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return f"""
WITH dcp_map AS ({doc_dedup_map_sql()}),
dcp_j AS (
  SELECT m.canonical_id, d.source, d.lang
  FROM dcp_map m JOIN documents d ON CAST(d.doc_id AS VARCHAR) = m.doc_id
),
dcp_per AS (
  SELECT canonical_id, count(*) AS sz,
         count(DISTINCT source) AS ns, count(DISTINCT lang) AS nl
  FROM dcp_j GROUP BY 1 HAVING count(*) >= 2
)
SELECT CASE WHEN sz <= 2 THEN '2' WHEN sz <= 4 THEN '3-4'
            WHEN sz <= 8 THEN '5-8' ELSE '9+' END AS size_band,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_source,
       CAST(sum(CASE WHEN nl > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi_lang
FROM dcp_per GROUP BY 1
"""


def q_simhash_bit_balance(spark, sf_dir):
    """Sketch-health QA: per SimHash bit position, how far the 0/1
    split across documents deviates from 50/50 (imbalance in basis
    points).  A biased bit weakens the Hamming-distance metric every
    simhash query depends on — this is the estimator audit for the
    simhash family (cf. minhash_estimator_audit).

    Scale shape: the signature UDF runs once (Arrow pass); the 64-way
    bit explode is row-local; one ≤64-row agg."""
    from docs2kg_spark.operators.dedup import simhash64

    d = _t(spark, sf_dir, "documents")
    sig = d.filter(F.length(F.trim("text")) > 0).select(
        simhash64(F.col("text")).alias("sig")
    )
    bits = sig.select(
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"), "sig"
    ).select("bit", F.expr("shiftright(sig, bit) & 1").alias("b"))
    return (
        bits.groupBy("bit")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("b").cast("bigint").alias("n_set"),
        )
        .selectExpr(
            "bit", "n_docs", "n_set",
            "abs(2 * n_set - n_docs) * 10000 DIV n_docs AS imbalance_bp",
        )
    )


SQL_SIMHASH_BIT_BALANCE = r"""
WITH toks AS (
  SELECT doc_id AS id, unnest(regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+')) AS tok
  FROM documents WHERE length(trim(text)) > 0
), th AS (
  SELECT id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks WHERE tok <> ''
), bits AS (
  SELECT id, i AS bit, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS c
  FROM th, UNNEST(range(0, 64)) AS u(i) GROUP BY 1, 2
), sb AS (
  SELECT bit, CASE WHEN c > 0 THEN 1 ELSE 0 END AS b FROM bits
)
SELECT bit, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(b) AS BIGINT) AS n_set,
       abs(2 * CAST(sum(b) AS BIGINT) - CAST(count(*) AS BIGINT)) * 10000
         // CAST(count(*) AS BIGINT) AS imbalance_bp
FROM sb GROUP BY 1
"""


def q_dedup_survivor_bias(spark, sf_dir):
    """Does min-id survivor selection keep the LONGEST copy?  Per
    near-dup cluster the kept doc's length is compared to the cluster
    max — a systematic deficit argues for quality-aware survivor
    selection (keep-longest / keep-highest-quality) before the next
    petabyte dedup run.  Integer chars only.

    Scale shape: doc-keyed join of the memoized survivor map onto the
    thin (doc, n_chars) projection, one cluster agg, one 1-row
    rollup."""
    cmap = _doc_dedup_map_memo(spark, sf_dir)
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "n_chars"
    )
    per = (
        cmap.join(d, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count("*").alias("sz"),
            F.max("n_chars").alias("max_len"),
            # the survivor IS the member whose id equals canonical_id
            # (doc_dedup_map's min-id convention)
            F.max(
                F.when(F.col("doc_id") == F.col("canonical_id"), F.col("n_chars"))
            ).alias("surv_len"),
        )
        .filter((F.col("sz") >= 2) & F.col("surv_len").isNotNull())
        .select("canonical_id", "max_len", "surv_len")
    )
    return per.agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("surv_len") == F.col("max_len"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_survivor_longest"),
        F.sum("max_len").cast("bigint").alias("sum_max_len"),
        F.sum("surv_len").cast("bigint").alias("sum_surv_len"),
    ).selectExpr(
        "n_clusters",
        "n_survivor_longest",
        "sum_max_len",
        "sum_surv_len",
        "(sum_max_len - sum_surv_len) * 10000 DIV sum_max_len AS deficit_bp",
    )


def _dedup_survivor_bias_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import doc_dedup_map_sql

    return f"""
WITH sv_map AS ({doc_dedup_map_sql()}),
sv_j AS (
  SELECT m.canonical_id, m.doc_id, d.n_chars
  FROM sv_map m JOIN documents d ON CAST(d.doc_id AS VARCHAR) = m.doc_id
),
sv_per AS (
  SELECT canonical_id, count(*) AS sz, max(n_chars) AS max_len,
         max(CASE WHEN doc_id = canonical_id THEN n_chars END) AS surv_len
  FROM sv_j GROUP BY 1
  HAVING count(*) >= 2 AND max(CASE WHEN doc_id = canonical_id THEN n_chars END) IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(CASE WHEN surv_len = max_len THEN 1 ELSE 0 END) AS BIGINT) AS n_survivor_longest,
       CAST(sum(max_len) AS BIGINT) AS sum_max_len,
       CAST(sum(surv_len) AS BIGINT) AS sum_surv_len,
       (CAST(sum(max_len) AS BIGINT) - CAST(sum(surv_len) AS BIGINT)) * 10000
         // CAST(sum(max_len) AS BIGINT) AS deficit_bp
FROM sv_per
"""


def q_dup_span_position_profile(spark, sf_dir):
    """WHERE the duplication lives: corpus-duplicated 8-gram
    occurrences bucketed by their position third (head / body / tail
    of the document) — prefix/suffix-heavy duplication is boilerplate
    (headers, footers, signatures) and argues for template stripping
    instead of whole-doc dedup.

    Scale shape: the same (doc, gram)-deduped relation and per-gram df
    window as dup_spans; position thirds are row-local; one 3-row
    agg."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.col("doc_id").alias("id"),
        F.split(F.lower(F.trim("text")), WS_RE).alias("toks"),
    )
    n = 8
    grams = (
        toks.select(
            "id",
            F.size("toks").alias("len"),
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0)))
            ).alias("i"),
            "toks",
        )
        .select(
            "id",
            "len",
            "i",
            F.concat_ws(" ", F.slice("toks", F.col("i") + 1, n)).alias("gram"),
        )
        .filter(F.length("gram") > 0)
    )
    dup = (
        grams.select("id", "gram")
        .distinct()
        .withColumn("df", F.count("*").over(Window.partitionBy("gram")))
        .filter(F.col("df") >= 2)
        .select("id", "gram")
    )
    occ = grams.join(dup, ["id", "gram"]).select(
        F.when(F.col("i") * 3 < F.col("len"), "head")
        .when(F.col("i") * 3 < 2 * F.col("len"), "body")
        .otherwise("tail")
        .alias("third")
    )
    tot = occ.groupBy().agg(F.count("*").alias("n_total"))
    return (
        occ.groupBy("third")
        .agg(F.count("*").cast("bigint").alias("n_occ"))
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "third", "n_occ",
            "n_occ * 10000 DIV n_total AS share_bp",
        )
    )


SQL_DUP_SPAN_POSITION = r"""
WITH dp_toks AS (
  SELECT doc_id AS id, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w
  FROM documents
), dp_g AS (
  SELECT id, len(w) AS length, i, array_to_string(w[i+1:i+8], ' ') AS gram
  FROM dp_toks, unnest(range(0, greatest(len(w) - 8, 0) + 1)) t(i)
  WHERE len(array_to_string(w[i+1:i+8], ' ')) > 0
), dp_dup AS (
  SELECT id, gram FROM (
    SELECT id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
    FROM (SELECT DISTINCT id, gram FROM dp_g)
  ) WHERE df >= 2
), dp_occ AS (
  SELECT CASE WHEN g.i * 3 < g.length THEN 'head'
              WHEN g.i * 3 < 2 * g.length THEN 'body'
              ELSE 'tail' END AS third
  FROM dp_g g JOIN dp_dup d ON d.id = g.id AND d.gram = g.gram
), dp_tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM dp_occ)
SELECT third, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(*) AS BIGINT) * 10000 // t.n_total AS share_bp
FROM dp_occ CROSS JOIN dp_tot t GROUP BY 1, t.n_total
"""


def q_doc_scrub_savings(spark, sf_dir):
    """Executive summary of the exact-substring scrub: per source, how
    many tokens the corpus-duplicated 8-gram removal would delete —
    the template-load ranking that decides WHERE scrubbing pays before
    running it corpus-wide.

    Scale shape: the scrub's count columns only (the rebuilt text is
    never materialized here — column pruning drops the reassembly
    expressions), one |sources|-row agg."""
    from docs2kg_spark.operators.dedup import exact_substr_scrub

    d = _t(spark, sf_dir, "documents")
    s = exact_substr_scrub(d, n=8, min_df=2).select("doc_id", "n_toks", "n_removed")
    return (
        s.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_toks"),
            F.sum("n_removed").cast("bigint").alias("n_removed"),
            F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_docs_touched"),
        )
        .selectExpr(
            "source", "n_docs", "n_toks", "n_removed", "n_docs_touched",
            "n_removed * 10000 DIV n_toks AS removed_bp",
        )
    )


def _doc_scrub_savings_sql() -> str:
    # compose on the scrub twin, dropping its text reassembly
    return f"""
WITH sc_base AS ({SQL_DOC_SCRUB})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(b.n_toks) AS BIGINT) AS n_toks,
       CAST(sum(b.n_removed) AS BIGINT) AS n_removed,
       CAST(sum(CASE WHEN b.n_removed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_touched,
       CAST(sum(b.n_removed) AS BIGINT) * 10000 // CAST(sum(b.n_toks) AS BIGINT) AS removed_bp
FROM sc_base b JOIN documents d USING (doc_id)
GROUP BY 1
"""


def q_top_boilerplate_grams(spark, sf_dir):
    """The actual boilerplate: top-15 word-8-grams by document
    frequency (df ≥ 2) with document and occurrence counts — the
    concrete strings a template-stripping rule would target (the
    dup-span profiles say HOW MUCH duplication exists; this says
    WHAT it is).

    Scale shape: the same (doc, gram)-deduped relation as dup_spans;
    one gram agg; top-15 = TakeOrdered on the (df DESC, occ DESC,
    gram) total order — never a global sort."""
    d = _t(spark, sf_dir, "documents")
    n = 8
    toks = d.select(
        F.col("doc_id").alias("id"),
        F.split(F.lower(F.trim("text")), WS_RE).alias("toks"),
    )
    grams = (
        toks.select(
            "id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("toks") - n, F.lit(0)))
            ).alias("i"),
            "toks",
        )
        .select("id", F.concat_ws(" ", F.slice("toks", F.col("i") + 1, n)).alias("gram"))
        .filter(F.length("gram") > 0)
    )
    stats = (
        grams.groupBy("id", "gram")
        .agg(F.count("*").alias("occ"))
        .groupBy("gram")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("occ").cast("bigint").alias("n_occ"),
        )
        .filter(F.col("df") >= 2)
    )
    return (
        stats.orderBy(F.desc("df"), F.desc("n_occ"), "gram")
        .limit(15)
        .select("gram", "df", "n_occ")
    )


SQL_TOP_BOILERPLATE_GRAMS = r"""
WITH bg_t AS (
  SELECT doc_id AS id, regexp_split_to_array(lower(trim(text)), '[ \t\n\r\f\x0B]+') AS w
  FROM documents
),
bg_g AS (
  SELECT id, array_to_string(w[i+1:i+8], ' ') AS gram
  FROM bg_t, unnest(range(0, greatest(len(w) - 8, 0) + 1)) t(i)
  WHERE len(array_to_string(w[i+1:i+8], ' ')) > 0
),
bg_s AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS df, CAST(sum(occ) AS BIGINT) AS n_occ
  FROM (SELECT id, gram, count(*) AS occ FROM bg_g GROUP BY 1, 2)
  GROUP BY 1 HAVING count(*) >= 2
)
SELECT gram, df, n_occ FROM bg_s
ORDER BY df DESC, n_occ DESC, gram LIMIT 15
"""
