"""BM25 top-k retrieval over the corpus — the inverted-index scoring
primitive a training-data pipeline uses for decontamination-by-retrieval
(find the corpus documents closest to an eval probe), near-duplicate
triage, and RAG-corpus indexing.  The reference has no retrieval stage;
this extends its KG query surface the way SURVEY.md §6 anticipates
(kg_construct tier: the corpus IS the retrieval target).

Okapi BM25 in the Lucene non-negative form:

    idf(t)  = ln( (N - df + 0.5) / (df + 0.5) + 1 )
    s(t, d) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    bm25(q, d) = sum over t in q of s(t, d)

Scale shape (the 100 TB plan):
- the token stream reduces to (doc, tok, tf) in ONE hash aggregate with
  map-side partial agg; doc length and document frequency are both
  second-level aggregates over that already-reduced table (never a
  second corpus pass);
- the query side is small by construction (an eval probe set), so it
  broadcasts onto tf: the only doc-sized shuffles are the tf hash agg
  itself and the per-(query, doc) score sum;
- corpus stats (N, total token count) join in as a broadcast single-row
  relation — no global window, no collect;
- top-k per query is a row_number window partitioned by query — the
  tiny post-join side, never the corpus.

Cross-engine exactness (the doc_logprob/kmeans playbook): only two
things diverge across engines — transcendentals and unordered float
sums.  So idf and the dl·N/total length ratio are rounded to 6dp, the
per-term score (pure IEEE *, /, + on identical inputs from there) is
rounded to 6dp and SCALED TO AN INTEGER (x10^6) before the per-(q, d)
sum — integer sums are associative, so the total is independent of
Spark's partial-agg order and bit-identical to the DuckDB twin.
Constants reach both engines as repr()'d doubles (correctly-rounding
parsers round-trip them exactly).

Ranking is a total order: (score desc, doc id asc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import WS_RE


def _tf(documents: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, tf): lowercased, explicit-whitespace-split (WS_RE — the
    cross-engine-pinned class), empties dropped, one hash aggregate."""
    return (
        documents.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), WS_RE)).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .groupBy("id", "tok")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "query_id",
    q_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-k corpus documents per query under BM25 →
    (query_id, doc_id, score, rnk).

    N and avgdl are defined over documents with at least one token (a
    zero-token document can never score and would only shift the idf
    baseline by a constant); query terms are the DISTINCT tokens of the
    query text (BM25 query-side tf is conventionally binary)."""
    tf = _tf(documents, id_col, text_col).localCheckpoint(eager=False)
    # tf feeds three consumers (dl, df, candidate join): checkpoint so
    # the corpus is scanned and token-exploded once, not three times.
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_toks")
    )

    qterms = (
        queries.select(
            F.col(q_id_col).alias("query_id"),
            F.explode(
                F.split(F.trim(F.lower(F.col(q_text_col))), WS_RE)
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )

    idf6 = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        ),
        6,
    )
    # dl/avgdl = dl * N / total — exact integer products into one double
    # division, rounded so both engines norm against the identical ratio.
    ratio6 = F.round(
        (F.col("dl") * F.col("n_docs")) / F.col("total_toks"), 6
    )
    term6 = F.round(
        F.col("idf") * (F.col("tf") * F.lit(k1 + 1.0))
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("ratio"))),
        6,
    )

    cand = (
        tf.join(F.broadcast(qterms), on="tok")
        .join(dfreq, on="tok")
        .join(dl, on="id")
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", idf6)
        .withColumn("ratio", ratio6)
        .withColumn("t_i", F.round(term6 * 1_000_000).cast("long"))
    )
    scores = (
        cand.groupBy("query_id", "id")
        .agg(F.sum("t_i").alias("s_i"))
        .withColumn(
            "score", F.round(F.col("s_i").cast("double") / 1_000_000.0, 6)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            "score",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


def jaccard_topk(
    documents: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "query_id",
    q_text_col: str = "text",
    n: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """Top-k corpus documents per query by n-token-gram Jaccard →
    (query_id, doc_id, jac, rnk).  The set-overlap retrieval leg that
    complements BM25's term-weighting leg (rrf_fuse combines them);
    self-matches (query_id = doc_id) are excluded.

    Scale shape: grams are built inside the row and DISTINCTed there
    (list_distinct before any explode); the probe gram set is broadcast
    into a gram equi-join; sizes are one hash agg; the ratio
    ni/(nq+nd−ni) is small-int-exact in IEEE doubles, rounded to 6dp,
    ranked with the doc-id tie-break both engines share."""
    def grams(df, idc, txtc):
        toks = F.filter(
            F.split(F.trim(F.lower(F.col(txtc))), WS_RE), lambda x: x != ""
        )
        g = F.expr(
            f"array_distinct(transform(sequence(1, size(toks) - {n - 1}), "
            f"i -> concat_ws(' ', slice(toks, i, {n}))))"
        )
        return (
            df.select(F.col(idc).alias("id"), toks.alias("toks"))
            .filter(F.size("toks") >= n)
            .select("id", F.explode(g).alias("g"))
        )

    dg = grams(documents, id_col, text_col).localCheckpoint(eager=False)
    qg = grams(queries, q_id_col, q_text_col)
    sizes = dg.groupBy("id").agg(F.count("*").alias("ng"))
    qsizes = qg.groupBy("id").agg(F.count("*").alias("nq"))
    inter = (
        dg.join(F.broadcast(qg.select(F.col("id").alias("query_id"), "g")), on="g")
        .filter(F.col("id") != F.col("query_id"))
        .groupBy("query_id", F.col("id").alias("doc_id"))
        .agg(F.count("*").alias("ni"))
    )
    from pyspark.sql import Window

    scored = (
        inter.join(F.broadcast(qsizes.withColumnRenamed("id", "query_id")), on="query_id")
        .join(sizes.withColumnRenamed("id", "doc_id"), on="doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("ni").cast("double") / (F.col("nq") + F.col("ng") - F.col("ni")),
                6,
            ).alias("jac"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("doc_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k_rrf: int = 60,
    top_k: int = 10,
    rank_col: str = "rnk",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09) of
    N rankings → (query_id, doc_id, rrf_micro, n_lists, rnk).

    RRF(d) = Σ_lists 1/(k + rank_list(d)) — the standard zero-training
    way to combine lexical and semantic retrieval legs.  Each
    contribution is integer-scaled (round(10⁶/(k+rank)) as BIGINT)
    BEFORE summing, so the fused score is an exact associative integer
    sum — engine-identical under any partitioning, same playbook as the
    logprob operators.  Final rank breaks ties by doc_id.

    Scale shape: a unionByName of already-top-k (thin) rankings, one
    hash agg, one query-keyed rank window over ≤ N·top_k rows per
    query."""
    from functools import reduce

    from pyspark.sql import Window

    contribs = [
        r.select(
            "query_id",
            "doc_id",
            F.round(F.lit(1_000_000.0) / (F.lit(k_rrf) + F.col(rank_col)))
            .cast("long")
            .alias("c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("bigint").alias("rrf_micro"),
        F.count("*").cast("bigint").alias("n_lists"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= top_k)
    )
