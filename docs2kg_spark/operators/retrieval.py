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
