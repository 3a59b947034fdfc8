"""Relational queries over the TPC-H-ish star schema (scans, joins, aggregates, windows, set ops, string/date functions).

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
    _t,
    derive_transcripts,
)



# ---------------------------------------------------------------------------
# relational / §2 operator queries (all with SQL twins)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the partial+final hash aggregate path (§2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_regional_revenue(spark, sf_dir):
    """4-way join with broadcast dims (§2.3): revenue by region/nation."""
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n, r = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"), _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_REGIONAL_REVENUE = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_customers_with_orders(spark, sf_dir):
    """left-semi join (§2.2 label-allowlist shape)."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_WITH_ORDERS = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def q_customers_without_orders(spark, sf_dir):
    """left-anti join (§2.3 dangling-edge validation shape).  Restricted
    to URGENT orders so the result is non-empty at sf0.01 — an all-zero
    anti-join would make the driver's value check vacuous."""
    c, o = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    o = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


SQL_WITHOUT_ORDERS = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def q_top_orders_per_priority(spark, sf_dir):
    """top-k per group (§2.6)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rnk")
    )


SQL_TOP_ORDERS = """
SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
      FROM orders) WHERE rnk <= 3
"""


def q_next_same_type(spark, sf_dir):
    """lag-based NEXT-sibling linkage (§2.5, neo4j_loader.py:353-364 shape)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn("prev_id", F.lag("event_id").over(w))
        .filter(F.col("prev_type") == F.col("event_type"))
        .select(F.col("prev_id").alias("src"), F.col("event_id").alias("dst"), F.col("event_type"))
    )


SQL_NEXT_SAME_TYPE = """
SELECT prev_id AS src, event_id AS dst, event_type
FROM (SELECT event_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             LAG(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id
      FROM events)
WHERE prev_type = event_type
"""


def q_running_sum(spark, sf_dir):
    """running-sum window — the chunk-offset accumulation shape
    (§2.5, ner_prompt_based.py:114-128)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        e.filter(F.col("user_id") < 50)
        .select("user_id", "event_id", F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 4).alias("prior_sum"))
    )


SQL_RUNNING_SUM = """
SELECT user_id, event_id,
       ROUND(COALESCE(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0), 4) AS prior_sum
FROM events WHERE user_id < 50
"""


def q_last_signup_before(spark, sf_dir):
    """conditional running-last — the header-stack parenting primitive
    (§2.5, neo4j_loader.py:272-309)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        e.filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.last(F.when(F.col("event_type") == "signup", F.col("event_id")), ignorenulls=True)
            .over(w)
            .alias("last_signup_id"),
        )
    )


SQL_LAST_SIGNUP = """
SELECT user_id, event_id,
       LAST_VALUE(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_id
FROM events WHERE user_id < 50
"""


def q_union_distinct(spark, sf_dir):
    """set union + distinct (§2.7, semantic_kg/base.py:73-76)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(F.col("lang").alias("v")).union(d.select(F.col("source").alias("v"))).distinct()


SQL_UNION_DISTINCT = "SELECT DISTINCT v FROM (SELECT lang AS v FROM documents UNION ALL SELECT source FROM documents)"


def q_rollup_orders(spark, sf_dir):
    """rollup/grouping sets (§2.4 'available free')."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


SQL_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_sanitize_labels(spark, sf_dir):
    """label sanitization as pure column expressions (§2.8,
    neo4j_loader.py:411-433)."""
    from docs2kg_spark.functions.labels import sanitize_label_col

    p = _t(spark, sf_dir, "part")
    return p.select("p_type").distinct().select(
        "p_type", sanitize_label_col("p_type").alias("label")
    )


SQL_SANITIZE = r"""
SELECT p_type,
       CASE WHEN regexp_matches(up, '^[0-9]') AND regexp_matches(up, '[^0-9_]')
            THEN regexp_replace(up, '^([0-9][0-9_]*)(.*[^0-9_].*)$', '\2\1')
            ELSE up END AS label
FROM (SELECT DISTINCT p_type, UPPER(REPLACE(REPLACE(p_type, ' ', '_'), '-', '_')) AS up FROM part)
"""


# ---------------------------------------------------------------------------
# metadata-KG queries (documents table twin of metadata_kg.py)
# ---------------------------------------------------------------------------


def q_metadata_nodes(spark, sf_dir):
    from docs2kg_spark.operators.graph import metadata_kg

    docs = _t(spark, sf_dir, "documents").drop("text")
    nodes, _ = metadata_kg(docs, id_col="doc_id")
    return nodes.select("id", "type")


SQL_METADATA_NODES = """
SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS id, 'Document' AS type FROM documents
UNION ALL SELECT DISTINCT 'lang_' || lang, 'lang' FROM documents WHERE lang IS NOT NULL
UNION ALL SELECT DISTINCT 'source_' || source, 'source' FROM documents WHERE source IS NOT NULL
"""


def q_metadata_edges(spark, sf_dir):
    from docs2kg_spark.operators.graph import metadata_kg

    docs = _t(spark, sf_dir, "documents").drop("text")
    _, edges = metadata_kg(docs, id_col="doc_id")
    return edges


SQL_METADATA_EDGES = """
SELECT 'doc_' || CAST(doc_id AS VARCHAR) AS source, 'lang_' || lang AS target, 'HAS_LANG' AS type
FROM documents WHERE lang IS NOT NULL
UNION ALL
SELECT 'doc_' || CAST(doc_id AS VARCHAR), 'source_' || source, 'HAS_SOURCE'
FROM documents WHERE source IS NOT NULL
"""



def q_json_props(spark, sf_dir):
    """JSON parse of a string column (§2.8 — the from_json analog of the
    reference's LLM-output json.loads, ner_prompt_based.py:98-104):
    events.props is a JSON object; extract key 'k' and aggregate."""
    e = _t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k int").alias("p"),
    ).select("event_type", F.col("p.k").alias("k"))
    return parsed.groupBy("event_type").agg(
        F.count("k").alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.max("k").cast("long").alias("max_k"),
    )


SQL_JSON_PROPS = """
SELECT event_type, COUNT(k) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""
# NB: DuckDB widens SUM(INT) to HUGEINT, which the driver's value hash
# serializes differently from Spark's BIGINT even when values are equal
# (same gotcha as SQL_SIMHASH) — hence the explicit casts.


def q_instr_find(spark, sf_dir):
    """first-occurrence substring location (§2.8 — the text.find analog
    of ner_prompt_based.py:201-206, with Spark's 1-based instr mapped to
    the reference's 0-based/-1 sentinel)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.instr(F.lower("text"), "the") - 1).cast("int").alias("first_the"),
        (F.instr(F.lower("text"), "data") - 1).cast("int").alias("first_data"),
    )


SQL_INSTR_FIND = """
SELECT doc_id,
       CAST(strpos(lower(text), 'the') - 1 AS INT) AS first_the,
       CAST(strpos(lower(text), 'data') - 1 AS INT) AS first_data
FROM documents
"""


def q_column_types(spark, sf_dir):
    """continuous-vs-categorical column detection (§2.4,
    metadata_kg.py:27-39) exposed as a table: unique-ratio > 0.5 AND
    numeric dtype → continuous."""
    from docs2kg_spark.operators.graph import split_column_types

    docs = _t(spark, sf_dir, "documents").drop("text")
    continuous, categorical = split_column_types(docs, id_col="doc_id")
    rows = [(c, "continuous") for c in continuous] + [(c, "categorical") for c in categorical]
    return spark.createDataFrame(rows, "column string, kind string")


SQL_COLUMN_TYPES = """
WITH stats AS (
  SELECT COUNT(*) AS n,
         COUNT(DISTINCT lang)   + MAX(CASE WHEN lang   IS NULL THEN 1 ELSE 0 END) AS u_lang,
         COUNT(DISTINCT source) + MAX(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS u_source,
         COUNT(DISTINCT n_chars) + MAX(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS u_n_chars
  FROM documents
)
SELECT 'lang' AS "column", 'categorical' AS kind FROM stats  -- lang: varchar, never continuous
UNION ALL SELECT 'source', 'categorical' FROM stats
UNION ALL SELECT 'n_chars', CASE WHEN u_n_chars / CAST(n AS DOUBLE) > 0.5
                                 THEN 'continuous' ELSE 'categorical' END FROM stats
"""


def q_skew_profile(spark, sf_dir):
    from docs2kg_spark.operators.profiling import key_skew_profile

    return key_skew_profile(_t(spark, sf_dir, "orders"), "o_custkey", top_n=20)


SQL_SKEW_PROFILE = """
WITH counts AS (
  SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS n
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM counts),
top AS (
  SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS rnk
  FROM counts ORDER BY n DESC, key ASC LIMIT 20
)
SELECT key, CAST(n AS BIGINT) AS n,
       ROUND(n / CAST(total AS DOUBLE), 6) AS share,
       CAST(rnk AS INT) AS rnk
FROM top CROSS JOIN tot
"""


def q_shipping_backlog(spark, sf_dir):
    """TPC-H Q3 shape on the available columns: revenue of URGENT
    orders placed before 1995-03-15 whose lineitems ship after it,
    top-10 by revenue — the classic join→agg→TakeOrdered path."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") < F.lit("1995-03-15"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            # Integer-scale to cents BEFORE summing (repo exactness
            # convention, ADVICE r3): the per-row product is the same
            # double in both engines, rounding it to integer cents is
            # deterministic, and the BIGINT sum is associative — so
            # top-10 membership can never flip on a .005 float boundary.
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                ).cast("bigint")
            ).alias("cents")
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("cents").cast("double") / 100).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


SQL_SHIPPING_BACKLOG = """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100
         AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q_order_counts_dist(spark, sf_dir):
    """TPC-H Q13 shape: orders-per-customer histogram INCLUDING the
    zero-order tail (the null-preserving left join every funnel report
    needs).

    Scale shape: orders collapse to (custkey, cnt) FIRST — one hash agg
    with map-side combine — so the big fact table never rides the join;
    the left join is then customer-keyed on two already-reduced sides,
    and the final histogram agg is |distinct counts| rows."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    oc = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    per = c.join(oc, c["c_custkey"] == oc["o_custkey"], "left").select(
        F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count")
    )
    return per.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


SQL_ORDER_COUNTS_DIST = """
WITH oc AS (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1),
per AS (
  SELECT CAST(COALESCE(oc.cnt, 0) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM per GROUP BY c_count
"""


def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: per-segment count/balance of customers with an
    above-average positive balance and NO orders since 2000-01-01 (the
    lapsed-high-value cohort) — a global scalar subquery feeding a
    filter plus an anti-join against a date-pruned fact scan (the
    cutoff predicate pushes into the parquet reader).

    The above-average test is EXACT: balances are integer cents and the
    comparison is cross-multiplied (cents·n > Σcents), so no engine's
    float-avg accumulation order can flip a membership near the
    boundary (the repo's integer-scaling convention).

    Scale shape: the threshold is a broadcast 1-row aggregate
    (crossJoin against one row, the profiling/skew pattern); the
    anti-join is custkey-keyed against the pre-distincted order keys;
    one |segments|-row final agg."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("cents"),
    )
    thr = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("cents").alias("s"), F.count("*").alias("n")
    )
    okeys = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") * F.col("n") > F.col("s"))
        .join(okeys, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_cust"),
            F.sum("cents").cast("bigint").alias("bal_cents"),
        )
    )


SQL_IDLE_RICH = """
WITH c AS (
  SELECT c_custkey, c_mktsegment, c_acctbal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
thr AS (SELECT SUM(cents) AS s, COUNT(*) AS n FROM c WHERE c_acctbal > 0.0)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(cents) AS BIGINT) AS bal_cents
FROM c, thr
WHERE c.cents * thr.n > thr.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
"""


def q_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for every part, the cheapest observed supplier
    (min lineitem price; ties broken by smallest suppkey) decorated
    through the supplier → nation → region dimension chain.

    The argmin is ONE hash aggregate on an integer-packed key
    (cents·10⁹ + suppkey — price ≤ $10M and suppkey < 10⁹ keep the
    pack inside BIGINT), the repo's exact-argmin convention: no window,
    no self-join-back, and both engines decode identical integers.

    Scale shape: lineitem reduces to |parts| rows before any join; the
    dimension joins are equi-joins on the reduced table with tiny
    nation/region broadcast."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
            * F.lit(1000000000)
            + F.col("l_suppkey")
        ).alias("k"),
    )
    best = li.groupBy("l_partkey").agg(F.min("k").alias("k"))
    dec = best.select(
        F.col("l_partkey").alias("p_partkey"),
        F.expr("CAST(k DIV 1000000000 AS BIGINT)").alias("min_price_cents"),
        F.expr("CAST(k % 1000000000 AS BIGINT)").alias("s_suppkey"),
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    nr = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        dec.join(p, "p_partkey")
        .join(s, "s_suppkey")
        .join(nr, s["s_nationkey"] == nr["n_nationkey"])
        .select("p_partkey", "p_name", "s_name", "n_name", "r_name", "min_price_cents")
    )


SQL_MIN_PRICE_SUPPLIER = """
WITH b AS (
  SELECT l_partkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * 1000000000 + l_suppkey) AS k
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, r.r_name,
       CAST(b.k // 1000000000 AS BIGINT) AS min_price_cents
FROM b
JOIN part p ON p.p_partkey = b.l_partkey
JOIN supplier s ON s.s_suppkey = b.k % 1000000000
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
"""


def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: monthly share of revenue from PROMO-type parts
    — the seasonal promotion-effect read.

    Revenue is integer cents (the repo's exactness convention); the
    share is ONE division of two exact BIGINTs, rounded 6dp, so there
    is no accumulation-order float drift on either side.

    Scale shape: lineitem is projected to (partkey, month, cents)
    before the join; part is projected to (p_partkey, is_promo) — a
    2-column dimension that Spark can broadcast when it fits and
    shuffle-join when it doesn't (the fact side never widens); one
    |months|-row hash agg ends the plan."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
        F.expr(
            "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("cents"),
    )
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").cast("int").alias("is_promo")
    )
    return (
        li.join(p, "p_partkey")
        .groupBy("ym")
        .agg(
            F.sum(F.col("cents") * F.col("is_promo")).cast("bigint").alias("promo_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "ym",
            "promo_cents",
            "total_cents",
            F.round(
                F.col("promo_cents").cast("double") / F.col("total_cents"), 6
            ).alias("promo_share"),
        )
    )


SQL_PROMO_REVENUE = """
WITH li AS (
  SELECT l_partkey, strftime(l_shipdate, '%Y-%m') AS ym,
         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents
  FROM lineitem
),
j AS (
  SELECT ym,
         SUM(cents * CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END) AS promo_cents,
         SUM(cents) AS total_cents
  FROM li JOIN part p ON p.p_partkey = li.l_partkey
  GROUP BY ym
)
SELECT ym, CAST(promo_cents AS BIGINT) AS promo_cents,
       CAST(total_cents AS BIGINT) AS total_cents,
       ROUND(CAST(promo_cents AS DOUBLE) / total_cents, 6) AS promo_share
FROM j
"""


def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue locked in unusually small orders — for
    one brand's parts, lineitems whose quantity is under 20% of that
    part's average order quantity.

    The 20%-of-average test is EXACT: quantities are integral by
    construction (CAST to BIGINT), and qty < 0.2·(sum/n) is evaluated
    as 5·qty·n < sum — cross-multiplied integers, no float avg.

    Scale shape: the per-part (sum, n) aggregate reduces lineitem to
    |parts-of-brand| rows BEFORE joining back (a broadcastable
    aggregate at any realistic brand selectivity); the brand predicate
    prunes the part scan and semi-joins the fact scan."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        )
        .join(F.broadcast(p), "p_partkey")
    )
    avg = li.groupBy("p_partkey").agg(
        F.sum("qty").alias("sum_q"), F.count("*").alias("n_q")
    )
    return (
        li.join(F.broadcast(avg), "p_partkey")
        .filter(F.col("qty") * 5 * F.col("n_q") < F.col("sum_q"))
        .agg(
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("total_cents"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


SQL_SMALL_QTY_REVENUE = """
WITH li AS (
  SELECT l_partkey AS p_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1')
),
a AS (SELECT p_partkey, SUM(qty) AS sum_q, COUNT(*) AS n_q FROM li GROUP BY p_partkey)
SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM li JOIN a USING (p_partkey)
WHERE qty * 5 * n_q < sum_q
"""


def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: customers whose single orders aggregate an
    unusually large quantity (> 250 units) — the bulk-buyer audit.

    Scale shape: lineitem reduces to |orders| rows (one hash agg) and
    the HAVING predicate cuts that to the rare tail BEFORE any join;
    the surviving keys then equi-join orders and customer (both joins
    are on the already-tiny filtered side, broadcastable)."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("total_cents"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, "l_orderkey")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.col("l_orderkey").cast("bigint").alias("o_orderkey"),
            "o_orderdate",
            "total_cents",
            F.col("sum_qty").cast("bigint").alias("sum_qty"),
        )
    )


SQL_LARGE_VOLUME = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey, o.o_orderdate,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       CAST(big.sum_qty AS BIGINT) AS sum_qty
FROM big
JOIN orders o ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


def q_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape: revenue from 'widget' parts by supplier nation
    and ship year — the star-join profit rollup (fact ⋈ part ⋈
    supplier ⋈ nation with a LIKE-filtered dimension).

    Scale shape: the p_name LIKE filter prunes part to a fraction
    before it touches the fact table (semi-join / DPP at scale); the
    supplier→nation chain is a tiny broadcast; revenue stays integer
    cents; one |nations|×|years| hash agg ends the plan."""
    pw = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_suppkey").alias("s_suppkey"),
        F.year("l_shipdate").cast("int").alias("yr"),
        F.expr(
            "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        ).alias("cents"),
    )
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(pw), "p_partkey")
        .join(sn, "s_suppkey")
        .groupBy("n_name", "yr")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )


SQL_PROFIT_NATION_YEAR = """
SELECT n.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS yr,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name, yr
"""


def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: revenue increase if mid-band discounts had been
    waived for small-quantity 1996 shipments — the pure filter+agg
    whose entire predicate must reach the parquet scan.

    Discounts are integer percents by construction (0.00..0.10 step
    .01), so `ROUND(l_discount*100)` is exact and the band test is an
    integer BETWEEN — no float-boundary drift between engines; revenue
    is the usual integer-cents sum.

    Scale shape: zero joins, zero wide columns; shipdate/discount/
    quantity predicates all push to the scan (min-max pruning on a
    date-partitioned layout skips whole files), and the agg is one
    partial+final reduce to a single row."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            # pushable ENVELOPE on the raw column first: the exact
            # integer band below is arithmetic, which no parquet reader
            # can push — the redundant implied-superset range restores
            # min-max file pruning; the exact test still decides
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & F.round(F.col("l_discount") * 100).cast("int").between(3, 8)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
                        "bigint"
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("revenue_cents"),
            F.count("*").cast("bigint").alias("n_items"),
        )
    )


SQL_FORECAST_REVENUE = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)), 0) AS BIGINT)
         AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(ROUND(l_discount * 100) AS INT) BETWEEN 3 AND 8
  AND l_quantity < 24
"""


def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-10 customers by revenue lost to returns
    (l_returnflag = 'R') against orders placed in one quarter — the
    churn-triage read.

    Determinism: revenue is integer cents; the top-10 cut orders by
    (revenue DESC, custkey ASC), so ties can never flip membership
    between engines or partitionings.

    Scale shape: the returnflag predicate pushes to the fact scan; the
    quarter predicate prunes orders BEFORE the fact join; the agg
    reduces to |customers-with-returns| rows before touching the
    customer/nation dimensions (tiny broadcasts); the final top-k is a
    TakeOrdered (per-partition heap + driver merge of 10-row heads),
    never a global sort or single-partition Window."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    rev = (
        li.join(o, "l_orderkey")
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )
    c = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("c_custkey").alias("o_custkey"), "c_name", "n_name")
    )
    return (
        rev.orderBy(F.desc("revenue_cents"), F.asc("o_custkey"))
        .limit(10)
        .join(c, "o_custkey")
        .select(
            F.col("o_custkey").cast("bigint").alias("c_custkey"),
            "c_name",
            "n_name",
            "revenue_cents",
        )
    )


SQL_RETURNED_ITEMS = """
WITH rev AS (
  SELECT o.o_custkey,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o.o_custkey
),
topk AS (
  SELECT o_custkey, revenue_cents FROM rev
  ORDER BY revenue_cents DESC, o_custkey ASC LIMIT 10
)
SELECT CAST(t.o_custkey AS BIGINT) AS c_custkey, c.c_name, n.n_name,
       CAST(t.revenue_cents AS BIGINT) AS revenue_cents
FROM topk t
JOIN customer c ON c.c_custkey = t.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
"""


def q_nation_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape: shipped revenue between two trading nations
    (NATION_1 ↔ NATION_2, both directions) by ship year — the
    bidirectional fact ⋈ two-dimension-chain rollup.

    Scale shape: both nation chains (supplier→nation, customer→nation
    via orders) are broadcast dimensions; the asymmetric-pair
    predicate is applied on the broadcast side BEFORE the fact join at
    scale (Catalyst pushes it through); the fact carries only
    (orderkey, suppkey, year, cents); one 2×|years|-row hash agg ends
    the plan."""
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("l_suppkey"), F.col("n_name").alias("supp_nation"))
    )
    cn = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(F.col("c_custkey").alias("o_custkey"), F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("int").alias("yr"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        li.join(sn, "l_suppkey")
        .join(o.join(cn, "o_custkey"), "l_orderkey")
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )


SQL_NATION_TRADE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS yr,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, yr
"""


def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: NATION_3's share of ECONOMY-part revenue sold to
    ASIA-region customers, by order year — the national-market-share
    trend.

    Both the nation's slice and the total are exact BIGINT cents from
    the SAME aggregate pass (a conditional sum, not a second scan);
    the share is ONE division rounded 6dp.

    Scale shape: part (type filter) and the two nation chains are
    broadcast prunes; the fact carries (partkey, suppkey, orderkey,
    cents); one |years|-row agg ends the plan."""
    pe = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    sn = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .join(_t(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(F.col("s_suppkey").alias("l_suppkey"), F.col("n_name").alias("supp_nation"))
    )
    asia_cust = F.broadcast(
        _t(spark, sf_dir, "customer")
        .join(_t(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(_t(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .join(asia_cust, "o_custkey")
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return (
        li.join(F.broadcast(pe), "l_partkey")
        .join(sn, "l_suppkey")
        .join(o, "l_orderkey")
        .groupBy("yr")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("cents")).otherwise(0)
            )
            .cast("bigint")
            .alias("nation_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "yr",
            "nation_cents",
            "total_cents",
            F.round(
                F.col("nation_cents").cast("double") / F.col("total_cents"), 6
            ).alias("mkt_share"),
        )
    )


SQL_MARKET_SHARE = """
WITH vol AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS yr,
         SUM(CASE WHEN sn.n_name = 'NATION_3'
             THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
             ELSE 0 END) AS nation_cents,
         SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS total_cents
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'ECONOMY'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = 'ASIA'
  GROUP BY yr
)
SELECT yr, CAST(nation_cents AS BIGINT) AS nation_cents,
       CAST(total_cents AS BIGINT) AS total_cents,
       ROUND(CAST(nation_cents AS DOUBLE) / total_cents, 6) AS mkt_share
FROM vol
"""


def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue in
    one quarter — the view-then-max pattern, returned as ALL argmax
    rows (exact BIGINT cents ⇒ max equality is unambiguous; ties all
    surface, as in the reference query).

    Scale shape: the quarter predicate pushes to the fact scan;
    revenue reduces to |suppliers| rows in one agg which is
    lazy-localCheckpointed so the argmax side and the max side consume
    ONE materialization (without it the plan scans lineitem twice —
    explain-verified); the max is a 1-row broadcast aggregate joined
    back (never a global sort); the supplier dimension joins the
    surviving argmax rows only."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents")
        )
    ).localCheckpoint(eager=False)
    mx = F.broadcast(rev.agg(F.max("revenue_cents").alias("mx")))
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        rev.join(mx, rev["revenue_cents"] == mx["mx"])
        .join(s, "s_suppkey")
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            "revenue_cents",
        )
    )


SQL_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT CAST(r.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST(r.revenue_cents AS BIGINT) AS revenue_cents
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.revenue_cents = (SELECT MAX(revenue_cents) FROM rev)
"""


def q_late_orders_by_priority(spark, sf_dir):
    """TPC-H Q4 shape (adapted: this corpus has no commitdate, so
    "late" = any lineitem shipped > 100 days after the order date):
    per-priority count of orders with at least one late shipment —
    the EXISTS-semi-join order-quality audit.

    Scale shape: the candidate (orderkey, shipdate-bound) test runs as
    a LEFT SEMI join — the fact side never duplicates orders (no
    post-join distinct), and only (l_orderkey, l_shipdate) leaves the
    fact scan; the final agg is |priorities| rows."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        on=(o["l_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 100 DAYS")),
        how="left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_late_orders"))
    )


SQL_LATE_ORDERS = """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY
)
GROUP BY o.o_orderpriority
"""


def q_part_value_share(spark, sf_dir):
    """TPC-H Q11 shape (adapted: no partsupp table, so "value" is
    shipped revenue): parts whose revenue share exceeds 4/3 of the
    average part's — the HAVING-against-a-global-scalar pattern, with
    a scale-invariant threshold (a fixed fraction empties out as the
    part universe grows).

    Scale shape: one hash agg reduces the fact table to |parts| rows,
    lazy-localCheckpointed so the global scalar and the filter consume
    ONE materialization; the scalar (total + part count) rides a
    broadcast 1-row crossJoin (never a second fact scan); the share
    test is exact integer arithmetic (v·n·3 > total·4) — no float
    threshold."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            )
            .cast("bigint")
            .alias("value_cents")
        )
    ).localCheckpoint(eager=False)
    tot = F.broadcast(
        rev.agg(
            F.sum("value_cents").alias("total_cents"),
            F.count("*").alias("n_parts"),
        )
    )
    return (
        rev.crossJoin(tot)
        .filter(
            F.col("value_cents") * F.col("n_parts") * 3 > F.col("total_cents") * 4
        )
        .select(F.col("p_partkey").cast("bigint").alias("p_partkey"), "value_cents")
    )


SQL_PART_VALUE_SHARE = """
WITH rev AS (
  SELECT l_partkey AS p_partkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS value_cents
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, value_cents
FROM rev
WHERE value_cents * (SELECT COUNT(*) FROM rev) * 3 > (SELECT SUM(value_cents) FROM rev) * 4
"""


def q_supplier_part_variety(spark, sf_dir):
    """TPC-H Q16 shape (adapted: supplier-part relationships observed
    in lineitem stand in for partsupp; the "complaints" exclusion is
    s_acctbal < 1000): how many distinct suppliers can ship each
    surviving (brand, type, size) part class.

    Scale shape: the fact table reduces to DISTINCT (part, supp) pairs
    first (map-side combine) — the class-level countDistinct then runs
    on the reduced pair set, never raw lineitem; the part dimension
    filter and the exclusion list are both broadcast (dimension-sized);
    the exclusion is a LEFT ANTI join, not a NOT IN subquery replay."""
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select(F.col("p_partkey").alias("l_partkey"), "p_brand", "p_type", "p_size")
    )
    excl = F.broadcast(
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        pairs.join(excl, "l_suppkey", "left_anti")
        .join(p, "l_partkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


SQL_SUPPLIER_PART_VARIETY = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p.p_brand, p.p_type, p.p_size
"""


def q_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under a three-way DISJUNCTION of
    (brand, size, quantity-band) conjunctions — the pattern that tests
    whether OR-of-ANDs still prunes.

    Scale shape: the part-only disjuncts are PRE-projected onto the
    broadcast dimension filter (Catalyst cannot derive the per-side OR
    envelope itself), so the join build side carries only candidate
    parts; the full mixed predicate then runs post-join; the result is
    ONE row via exact integer cents."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    p = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(
            ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 5))
            | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 10))
            | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 15))
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    q = F.col("l_quantity")
    matched = li.join(p, "p_partkey").filter(
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size") <= 5)
            & (q >= 1)
            & (q <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size") <= 10)
            & (q >= 10)
            & (q <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & (F.col("p_size") <= 15)
            & (q >= 20)
            & (q <= 30)
        )
    )
    return matched.agg(
        F.coalesce(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("bigint")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("revenue_cents")
    )


SQL_DISJUNCTIVE_REVENUE = """
SELECT CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)), 0) AS BIGINT)
       AS revenue_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size <= 5  AND l.l_quantity BETWEEN 1  AND 11)
   OR (p.p_brand = 'Brand#22' AND p.p_size <= 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#33' AND p.p_size <= 15 AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape (adapted: no partsupp/availqty, so "excess" =
    a supplier shipped MORE THAN 2× a part's average per-supplier
    quantity — a relative dominance test that stays selective as the
    supplier fan-out grows, where TPC-H's absolute 50% empties out):
    suppliers dominating supply of any 'cold *' part — the nested
    semi-join chain (part filter → per-(part,supp) agg → per-part
    threshold → distinct suppliers).

    Scale shape: the name filter rides the broadcast part dimension
    into the first agg, so only candidate parts' lineitems aggregate;
    per-(part,supp) and per-part totals come from ONE reduced table
    (the part total is a window over the small agg output, not a
    second fact scan); quantities are exact BIGINTs so the strict
    q·n > 2·total dominance test cannot float-flip."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_suppkey", "l_quantity"
    )
    cold = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("cold "))
        .select("p_partkey")
    )
    per_ps = (
        li.join(cold, "p_partkey")
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("qty"))
    )
    w_tot = Window.partitionBy("p_partkey")
    dominant = (
        per_ps.withColumn("part_qty", F.sum("qty").over(w_tot))
        .withColumn("n_supp", F.count("*").over(w_tot))
        .filter(F.col("qty") * F.col("n_supp") > F.col("part_qty") * 2)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return dominant.join(s, "s_suppkey").select(
        F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name"
    )


SQL_EXCESS_SHIPPERS = """
WITH per_ps AS (
  SELECT l.l_partkey, l.l_suppkey, SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS qty
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'cold %')
  GROUP BY l.l_partkey, l.l_suppkey
),
dom AS (
  SELECT DISTINCT l_suppkey AS s_suppkey FROM (
    SELECT l_suppkey, qty,
           SUM(qty) OVER (PARTITION BY l_partkey) AS part_qty,
           COUNT(*) OVER (PARTITION BY l_partkey) AS n_supp
    FROM per_ps
  ) WHERE qty * n_supp > part_qty * 2
)
SELECT CAST(d.s_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM dom d JOIN supplier s ON s.s_suppkey = d.s_suppkey
"""


def q_order_value_windows(spark, sf_dir):
    """Per-customer ranking windows over order value — rank,
    dense_rank, percent_rank, cume_dist, ntile(4) in one pass (§2.5
    window coverage beyond row_number/lag/sum).  The order-by key is
    (o_totalprice DESC, o_orderkey), so ties never leave rank to
    engine discretion.  Scale shape: ONE customer-partitioned window
    (all five functions share the frame), never a global sort."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


SQL_ORDER_VALUE_WINDOWS = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       ROUND(percent_rank() OVER w, 6) AS prank,
       ROUND(cume_dist() OVER w, 6) AS cdist,
       CAST(ntile(4) OVER w AS INT) AS quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


def q_shipping_delay_stats(spark, sf_dir):
    """Order→ship latency distribution per order priority: exact
    integer day deltas with min/max and interpolated p50/p90
    (`percentile` in Spark = `quantile_cont` in DuckDB, both the
    standard R-7 continuous quantile over the SAME integers, so the
    doubles agree bit-for-bit) — the SLA read (§2.4 aggregate coverage
    beyond count/sum: exact order-statistic aggregates).

    Scale shape: join is orderkey-equi; the percentile agg is
    per-GROUP (|priorities| groups), never a global sort."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    d = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("delay_d"),
        )
    )
    return d.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("delay_d").alias("min_d"),
        F.max("delay_d").alias("max_d"),
        F.round(F.expr("percentile(delay_d, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(delay_d, 0.9)"), 6).alias("p90"),
    )


SQL_SHIPPING_DELAY_STATS = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
       CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_d,
       CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_d,
       ROUND(quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.5), 6) AS p50,
       ROUND(quantile_cont(date_diff('day', o_orderdate, l_shipdate), 0.9), 6) AS p90
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def q_dq_audit(spark, sf_dir):
    """Deequ-style data-quality audit in ONE row: row counts,
    referential-integrity orphans (lineitem→orders, orders→customer,
    both left-anti shapes), domain violations (quantity outside
    [1, 50], discount outside [0, 0.1]), and null keys — the
    constraint-validation pass a pipeline runs before anything else.
    All counts exact BIGINTs.

    Scale shape: two anti-join counts on their natural keys +
    row-local range predicates folded into one aggregate per table;
    the five 1-row aggregates cross-join (broadcast) into one row."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    li_stats = li.agg(
        F.count("*").cast("bigint").alias("n_lineitem"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        ).cast("bigint").alias("n_bad_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
        ).cast("bigint").alias("n_bad_discount"),
    )
    o_stats = o.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_custkey"),
    )
    li_orphans = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_li_orphans"))
    )
    o_orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_order_orphans"))
    )
    return (
        li_stats.crossJoin(F.broadcast(o_stats))
        .crossJoin(F.broadcast(li_orphans))
        .crossJoin(F.broadcast(o_orphans))
        .select(
            "n_lineitem", "n_orders", "n_li_orphans", "n_order_orphans",
            "n_null_custkey", "n_bad_qty", "n_bad_discount",
        )
    )


SQL_DQ_AUDIT = """
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_lineitem,
  (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem li
     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)) AS n_li_orphans,
  (SELECT CAST(count(*) AS BIGINT) FROM orders o
     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_order_orphans,
  (SELECT CAST(count(*) AS BIGINT) FROM orders WHERE o_custkey IS NULL) AS n_null_custkey,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50) AS n_bad_qty,
  (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_discount < 0 OR l_discount > 0.1) AS n_bad_discount
"""


def q_part_basket_pairs(spark, sf_dir):
    """Co-purchase part-pair mining: the top-20 part pairs appearing
    together in the most orders — the item-to-item affinity read
    (event_lift's session analog over the order basket).  Counts are
    exact; ties break on the part keys.

    Scale shape: the self-join keys on l_orderkey, whose per-key
    fanout is the basket size (bounded small by the data model — a
    basket-size CAP would be the guard at adversarial scale); distinct
    (order, part) first so multi-line parts don't inflate pairs;
    TakeOrdered top-20."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    return (
        li.alias("x")
        .join(li.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("part_a"),
            F.col("y.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


SQL_PART_BASKET_PAIRS = """
WITH bp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT x.l_partkey AS part_a, y.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM bp x JOIN bp y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


def q_monthly_revenue_yoy(spark, sf_dir):
    """Monthly revenue with year-over-year delta: exact BIGINT cents
    per month, lag(12) for the same month last year — the seasonality
    read.  The lag window is global-ordered BUT runs over the
    already-aggregated month table (≤ |months| rows — bounded by the
    calendar, not the data; the same vocabulary-sized-bound argument
    as negative sampling, only tighter).

    Scale shape: one (month) hash agg reduces the corpus to ≤ ~100
    rows; the window sorts those rows only."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "cents",
        F.lag("cents", 12).over(w).alias("prev_year_cents"),
        (F.col("cents") - F.lag("cents", 12).over(w)).alias("yoy_delta"),
    )


SQL_MONTHLY_REVENUE_YOY = """
WITH mr AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT month, cents,
       lag(cents, 12) OVER (ORDER BY month) AS prev_year_cents,
       cents - lag(cents, 12) OVER (ORDER BY month) AS yoy_delta
FROM mr
"""


_PQ_M, _PQ_K, _PQ_SUB = 4, 16, 16


def q_order_gap_stats(spark, sf_dir):
    """Inter-order gap profile per market segment: median and p90 days
    between a customer's consecutive orders — the repurchase-cadence
    read.  Gaps are exact integer day deltas from a customer-
    partitioned lag; percentiles interpolate per group
    (quantile_cont parity).

    Scale shape: one customer-partitioned lag window, a broadcast
    segment join, and a per-segment order-statistics agg."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            F.datediff("o_orderdate", F.lag("o_orderdate", 1).over(w))
            .cast("bigint")
            .alias("gap_d"),
        )
        .filter("gap_d IS NOT NULL")
    )
    return (
        gaps.join(F.broadcast(c), gaps.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_gaps"),
            F.round(F.expr("percentile(gap_d, 0.5)"), 6).alias("med_gap_d"),
            F.round(F.expr("percentile(gap_d, 0.9)"), 6).alias("p90_gap_d"),
        )
    )


SQL_ORDER_GAP_STATS = """
WITH og AS (
  SELECT o_custkey,
         CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS BIGINT) AS gap_d
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
)
SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(g.gap_d, 0.5), 6) AS med_gap_d,
       ROUND(quantile_cont(g.gap_d, 0.9), 6) AS p90_gap_d
FROM og g JOIN customer c ON c.c_custkey = g.o_custkey
WHERE g.gap_d IS NOT NULL
GROUP BY 1
"""


def q_brand_concentration_hhi(spark, sf_dir):
    """Supplier concentration per part brand: the Herfindahl-Hirschman
    index of each supplier's revenue share within the brand, exactly —
    shares integer-scaled to basis points BEFORE squaring (share_bp =
    cents·10⁴ DIV total, identical truncation on both engines), so the
    index is a BIGINT in [0, 10⁸] and never a float sum.  The
    supply-chain-risk read (HHI → monopoly brand).

    Scale shape: revenue reduces to (brand, supplier) cents first; the
    brand totals broadcast back; the HHI is a second hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    bs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(
                F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
            ).alias("cents")
        )
    )
    tot = bs.groupBy("p_brand").agg(F.sum("cents").cast("bigint").alias("total"))
    return (
        bs.join(F.broadcast(tot), "p_brand")
        .selectExpr("p_brand", "cents", "total", "(cents * 10000) DIV total AS share_bp")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.max("total").cast("bigint").alias("total_cents"),
            F.sum(F.expr("share_bp * share_bp")).cast("bigint").alias("hhi_bp2"),
        )
    )


SQL_BRAND_HHI = """
WITH bh_bs AS (
  SELECT p.p_brand, l.l_suppkey,
         CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
bh_t AS (SELECT p_brand, CAST(sum(cents) AS BIGINT) AS total FROM bh_bs GROUP BY 1)
SELECT b.p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(max(t.total) AS BIGINT) AS total_cents,
       CAST(sum(((b.cents * 10000) // t.total) * ((b.cents * 10000) // t.total)) AS BIGINT) AS hhi_bp2
FROM bh_bs b JOIN bh_t t USING (p_brand)
GROUP BY 1
"""


def q_weekday_order_profile(spark, sf_dir):
    """Order volume and revenue by day-of-week (0 = Sunday, aligning
    Spark's 1-based dayofweek with DuckDB's 0-based) — the calendar
    seasonality read at week grain.  Exact counts and cents.

    Scale shape: row-local dow + one ≤7-row hash agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.selectExpr(
            "CAST(dayofweek(o_orderdate) - 1 AS INT) AS dow",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("dow")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
    )


SQL_WEEKDAY_ORDER_PROFILE = """
SELECT CAST(dayofweek(o_orderdate) AS INT) AS dow,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY 1
"""


def q_status_month_mix(spark, sf_dir):
    """Order-status mix per month, PIVOTED to fixed columns by
    conditional aggregation (n_open/n_fulfilled/n_partial) — the
    wide-format trend table a BI layer reads directly; conditional-agg
    pivot keeps the schema static however statuses skew.  Exact
    counts.

    Scale shape: one (month) hash agg with map-side combine; the pivot
    is row-local CASE arithmetic inside the agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
            .cast("bigint")
            .alias("n_open"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_fulfilled"),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0))
            .cast("bigint")
            .alias("n_partial"),
        )
    )


SQL_STATUS_MONTH_MIX = """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_fulfilled,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial
FROM orders GROUP BY 1
"""


def q_props_value_stats(spark, sf_dir):
    """Semi-structured payload profile: the JSON `k` field extracted
    per event and summarized per type (n_present, exact sum, min/max,
    interpolated median) — the schema-on-read pass every event
    pipeline runs before promoting a JSON field to a column.  The
    extraction is get_json_object ≡ json_extract; integers stay
    BIGINT.

    Scale shape: row-local JSON parse + one per-type order-statistics
    agg."""
    e = _t(spark, sf_dir, "events")
    k = F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_present"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.round(F.expr("percentile(k, 0.5)"), 6).alias("med_k"),
        )
    )


SQL_PROPS_VALUE_STATS = """
WITH pv AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events
)
SELECT event_type, CAST(count(k) AS BIGINT) AS n_present,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
       ROUND(quantile_cont(k, 0.5), 6) AS med_k
FROM pv GROUP BY 1
"""


def q_balance_activity_matrix(spark, sf_dir):
    """Customer account-balance band × order-activity matrix: do
    negative-balance customers still order?  Bands are fixed policy
    cuts (no quantile sort); activity is a left-semi-shaped flag.
    Exact counts per cell.

    Scale shape: the activity flag is one left join against the
    distinct order custkeys (a semi-join in disguise that keeps the
    row for the 'inactive' count); one ≤6-row hash agg."""
    c = _t(spark, sf_dir, "customer")
    active = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        c.join(
            active.withColumnRenamed("o_custkey", "c_custkey").withColumn(
                "is_active", F.lit(1)
            ),
            "c_custkey",
            "left",
        )
        .selectExpr(
            "CASE WHEN c_acctbal < 0 THEN 'negative' "
            "WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band",
            "CASE WHEN is_active IS NULL THEN 'inactive' ELSE 'active' END AS activity",
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents",
        )
        .groupBy("balance_band", "activity")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("bal_cents").cast("bigint").alias("total_bal_cents"),
        )
    )


SQL_BALANCE_ACTIVITY_MATRIX = """
WITH ba AS (
  SELECT CASE WHEN c.c_acctbal < 0 THEN 'negative'
              WHEN c.c_acctbal < 5000 THEN 'low' ELSE 'high' END AS balance_band,
         CASE WHEN o.o_custkey IS NULL THEN 'inactive' ELSE 'active' END AS activity,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o ON o.o_custkey = c.c_custkey
)
SELECT balance_band, activity, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(bal_cents) AS BIGINT) AS total_bal_cents
FROM ba GROUP BY 1, 2
"""


def q_tool_usage_profile(spark, sf_dir):
    """Per-tool usage profile over the agent transcripts: call volume,
    conversation spread, payload size, and the share of calls whose
    NEXT turn is an assistant turn (a tool call the assistant never
    reads back is a broken agent loop) — the first QA read over an
    agent-trajectory corpus.

    Scale shape: one lead window partitioned by conv_id (turn-bounded
    partitions, shared shape with role_transitions), then a hash agg
    to |tools| rows; integer basis points, no float accumulation."""
    t = derive_transcripts(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = (
        t.select(
            "conv_id",
            "tool",
            F.length("text").cast("bigint").alias("n_chars"),
            F.lead("role").over(w).alias("next_role"),
        )
        .filter(F.col("tool").isNotNull())
    )
    return (
        calls.groupBy("tool")
        .agg(
            F.count("*").cast("bigint").alias("n_calls"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum(F.when(F.col("next_role") == "assistant", 1).otherwise(0))
            .cast("bigint")
            .alias("n_read_back"),
        )
        .selectExpr(
            "tool", "n_calls", "n_convs", "n_chars",
            "n_read_back * 10000 DIV n_calls AS read_back_bp",
        )
    )


SQL_TOOL_USAGE_PROFILE = f"""
WITH {TRANSCRIPTS_CTE},
tu AS (
  SELECT conv_id, tool, CAST(length(text) AS BIGINT) AS n_chars,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role
  FROM transcripts
)
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(CASE WHEN next_role = 'assistant' THEN 1 ELSE 0 END) AS BIGINT) * 10000
         // CAST(count(*) AS BIGINT) AS read_back_bp
FROM tu WHERE tool IS NOT NULL GROUP BY 1
"""


def q_customer_pareto(spark, sf_dir):
    """Customer revenue concentration (Pareto curve) without a global
    sort: customers band by floor(log2(revenue_cents)) — a row-local
    key — so the curve is a ≤40-row cumulative over band aggregates,
    not a percent_rank over every customer.  Exact BIGINT cents
    throughout; the cumulative share is integer basis points.

    Scale shape: one (custkey) cents agg, one ≤40-row band agg; the
    cumulative window runs on the band rows only (bounded, driver-size)
    — the partitioning-independent replacement for a global ORDER BY
    revenue window."""
    o = _t(spark, sf_dir, "orders")
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
        )
    )
    bands = (
        cust.groupBy(F.expr("CAST(floor(log2(cents)) AS INT)").alias("band"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )
    w = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, 0)
    total = cust.agg(F.sum("cents").alias("total_cents"))
    return (
        bands.crossJoin(F.broadcast(total))
        .withColumn("cum_cents", F.sum("revenue_cents").over(w))
        .selectExpr(
            "band",
            "n_customers",
            "revenue_cents",
            "cum_cents * 10000 DIV total_cents AS cum_share_bp",
        )
    )


SQL_CUSTOMER_PARETO = """
WITH cp_c AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
),
cp_b AS (
  SELECT CAST(floor(log2(cents)) AS INT) AS band,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS revenue_cents
  FROM cp_c GROUP BY 1
),
cp_t AS (SELECT SUM(cents) AS total_cents FROM cp_c)
SELECT band, n_customers, revenue_cents,
       SUM(revenue_cents) OVER (ORDER BY band DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000
         // total_cents AS cum_share_bp
FROM cp_b CROSS JOIN cp_t
"""


def q_tool_bigrams(spark, sf_dir):
    """Tool-chain bigrams: which tool follows which across each
    conversation's TOOL turns (intervening user/assistant turns
    skipped) — the agent's actual tool-composition patterns, the
    transcripts analog of event_trigrams.

    Scale shape: filter to tool turns first (narrow), one conv-keyed
    lag window over the reduced stream, a ≤|tools|² agg."""
    t = derive_transcripts(spark, sf_dir)
    tools = t.filter(F.col("tool").isNotNull()).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        tools.withColumn("prev_tool", F.lag("tool").over(w))
        .filter(F.col("prev_tool").isNotNull())
        .groupBy("prev_tool", "tool")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
        )
    )


SQL_TOOL_BIGRAMS = f"""
WITH {TRANSCRIPTS_CTE},
tb AS (
  SELECT conv_id, tool,
         lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM transcripts WHERE tool IS NOT NULL
)
SELECT prev_tool, tool,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM tb WHERE prev_tool IS NOT NULL GROUP BY 1, 2
"""


def q_lineitem_tax_profile(spark, sf_dir):
    """Effective-tax profile: per (tax percent, return flag), item
    counts plus exact revenue and tax cents (tax = price·(1−disc)·tax
    rounded per line, the invoice arithmetic) — closes the one lineitem
    column (l_tax) no other query touched.

    Scale shape: row-local integer projections, one small hash agg."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
    tax = F.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)"
    )
    return (
        li.select(
            F.expr("CAST(round(l_tax * 100) AS INT)").alias("tax_pct"),
            "l_returnflag",
            rev.alias("rev"),
            tax.alias("tx"),
        )
        .groupBy("tax_pct", "l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum("rev").cast("bigint").alias("revenue_cents"),
            F.sum("tx").cast("bigint").alias("tax_cents"),
        )
    )


SQL_LINEITEM_TAX_PROFILE = """
SELECT CAST(round(l_tax * 100) AS INT) AS tax_pct, l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * l_tax * 100) AS BIGINT)) AS BIGINT) AS tax_cents
FROM lineitem GROUP BY 1, 2
"""


def q_order_size_value_matrix(spark, sf_dir):
    """2-D order census: line-count band × totalprice log10 band →
    order counts and revenue cents — the joint read that catches
    many-line/low-value anomalies a 1-D histogram hides.

    Scale shape: one (orderkey) count agg joined to orders, row-local
    banding, ≤ bands² agg."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_lines"))
    j = o.join(sizes, o.o_orderkey == sizes.l_orderkey)
    size_band = (
        F.when(F.col("n_lines") <= 2, "1-2")
        .when(F.col("n_lines") <= 4, "3-4")
        .otherwise("5+")
    )
    val_band = F.expr("CAST(floor(log10(o_totalprice)) AS INT)")
    return (
        j.select(
            size_band.alias("size_band"),
            val_band.alias("value_decade"),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("size_band", "value_decade")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


SQL_ORDER_SIZE_VALUE_MATRIX = """
WITH sv_sz AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
)
SELECT CASE WHEN s.n_lines <= 2 THEN '1-2'
            WHEN s.n_lines <= 4 THEN '3-4'
            ELSE '5+' END AS size_band,
       CAST(floor(log10(o.o_totalprice)) AS INT) AS value_decade,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o JOIN sv_sz s ON s.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


def q_tool_parrot_profile(spark, sf_dir):
    """Parroting detector: for every turn that directly FOLLOWS a tool
    turn, the share of its distinct tokens already present in the tool
    output — a follow-up that mostly restates the tool output verbatim
    is low-value SFT data (and an assistant doing it is the classic
    copy-through failure).  Per conversation: pair count,
    high-containment (>80%) count, and summed containment in basis
    points (exact integers).

    Scale shape: one conv-keyed lag window carries the previous turn's
    token SET (row-local split+dedup); containment is a row-local
    array_intersect; one conv agg."""
    t = derive_transcripts(spark, sf_dir)
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower("text"), WS_RE), lambda x: F.length(x) > 0
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        t.select(
            "conv_id",
            toks.alias("toks"),
            F.lag("role").over(w).alias("prev_role"),
            F.lag(toks).over(w).alias("prev_toks"),
        )
        .filter(F.col("prev_role") == "tool")
        .select(
            "conv_id",
            F.size("toks").cast("bigint").alias("n_tok"),
            F.size(F.array_intersect("toks", "prev_toks")).cast("bigint").alias("n_shared"),
        )
        .filter(F.col("n_tok") > 0)
    )
    return pairs.groupBy("conv_id").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.sum(
            F.when(F.col("n_shared") * 10 > 8 * F.col("n_tok"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_parrot"),
        F.sum(F.expr("n_shared * 10000 DIV n_tok")).cast("bigint").alias("sum_containment_bp"),
    )


SQL_TOOL_PARROT_PROFILE = f"""
WITH {TRANSCRIPTS_CTE},
pp_t AS (
  SELECT conv_id, turn_idx, role,
         list_distinct(list_filter(regexp_split_to_array(lower(text), '[ \\t\\n\\r\\f\\x0B]+'),
                                   x -> length(x) > 0)) AS toks
  FROM transcripts
),
pp_p AS (
  SELECT conv_id, toks,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         lag(toks) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_toks
  FROM pp_t
),
pp_c AS (
  SELECT conv_id,
         CAST(len(toks) AS BIGINT) AS n_tok,
         CAST(len(list_intersect(toks, prev_toks)) AS BIGINT) AS n_shared
  FROM pp_p
  WHERE prev_role = 'tool' AND len(toks) > 0
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(CASE WHEN n_shared * 10 > 8 * n_tok THEN 1 ELSE 0 END) AS BIGINT) AS n_parrot,
       CAST(sum(n_shared * 10000 // n_tok) AS BIGINT) AS sum_containment_bp
FROM pp_c GROUP BY 1
"""


def q_type_share_by_month(spark, sf_dir):
    """Event-type mix drift by month: per (month, type) counts and the
    within-month share — the composition drift a training-data owner
    watches before re-weighting a mixture (absolute counts rise and
    fall with traffic; SHARE drift is the signal).

    Scale shape: one (month, type) hash agg + month totals joined
    back; integer basis points."""
    e = _t(spark, sf_dir, "events")
    mt = e.groupBy(
        F.date_format("ts", "yyyy-MM").alias("month"), "event_type"
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = mt.groupBy("month").agg(F.sum("n").alias("n_month"))
    return (
        mt.join(tot, "month")
        .selectExpr(
            "month", "event_type", "n",
            "n * 10000 DIV n_month AS share_bp",
        )
    )


SQL_TYPE_SHARE_BY_MONTH = """
WITH tm AS (
  SELECT strftime(ts, '%Y-%m') AS month, event_type,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tm_t AS (SELECT month, CAST(sum(n) AS BIGINT) AS n_month FROM tm GROUP BY 1)
SELECT m.month, m.event_type, m.n,
       m.n * 10000 // t.n_month AS share_bp
FROM tm m JOIN tm_t t USING (month)
"""


def q_mktsegment_profile(spark, sf_dir):
    """Market-segment book of business: customers, active customers,
    orders, exact revenue cents and average order value per
    c_mktsegment — the one-glance segment rollup (Q3 slices one
    segment; this profiles all of them).

    Scale shape: orders reduce to per-customer counts/cents first,
    then a broadcast-joined |segments|-row rollup."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents"),
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(F.when(F.col("n_orders").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_active"),
            F.sum(F.coalesce("n_orders", F.lit(0))).cast("bigint").alias("n_orders"),
            F.sum(F.coalesce("cents", F.lit(0))).cast("bigint").alias("revenue_cents"),
        )
        .selectExpr(
            "c_mktsegment", "n_customers", "n_active", "n_orders", "revenue_cents",
            "CASE WHEN n_orders > 0 THEN revenue_cents DIV n_orders ELSE 0 END AS aov_cents",
        )
    )


SQL_MKTSEGMENT_PROFILE = """
WITH ms_pc AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN p.n_orders IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
       CAST(sum(COALESCE(p.n_orders, 0)) AS BIGINT) AS n_orders,
       CAST(sum(COALESCE(p.cents, 0)) AS BIGINT) AS revenue_cents,
       CASE WHEN sum(COALESCE(p.n_orders, 0)) > 0
            THEN CAST(sum(COALESCE(p.cents, 0)) AS BIGINT) // CAST(sum(COALESCE(p.n_orders, 0)) AS BIGINT)
            ELSE 0 END AS aov_cents
FROM customer c LEFT JOIN ms_pc p ON p.o_custkey = c.c_custkey
GROUP BY 1
"""
