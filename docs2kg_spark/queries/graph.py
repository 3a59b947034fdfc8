"""Graph analytics over the entity graph: degrees, traversals, centralities, communities, structure audits.

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

from docs2kg_spark.queries._shared import _pkg_patchable
from docs2kg_spark.queries._shared import (
    TRANSCRIPTS_CTE,
    _entity_graph_prefix,
    _t,
)

from docs2kg_spark.queries.kg import (
    q_kg_triples,
)



# ---------------------------------------------------------------------------
# graph queries (operators/graphq.py): the read side of the KG — degree
# stats / bounded-hop expansion over a large bipartite graph derived from
# lineitem, PageRank + triangle participation over the entity
# co-occurrence graph (composed on the kg_triples SQL twin)
# ---------------------------------------------------------------------------

_LINEITEM_GRAPH_CTE = (
    "lg_e AS (SELECT DISTINCT 'S' || l_suppkey AS src, 'P' || l_partkey AS dst FROM lineitem)"
)


def _lineitem_graph(spark, sf_dir):
    """supplier→part bipartite graph: S<suppkey> → P<partkey>, distinct."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()


def q_graph_degrees(spark, sf_dir):
    from docs2kg_spark.operators.graphq import degrees

    return degrees(_lineitem_graph(spark, sf_dir))


SQL_GRAPH_DEGREES = f"""
WITH {_LINEITEM_GRAPH_CTE},
o AS (SELECT src AS node, count(*) AS od FROM lg_e GROUP BY src),
i AS (SELECT dst AS node, count(*) AS idg FROM lg_e GROUP BY dst)
SELECT coalesce(o.node, i.node) AS node,
       coalesce(od, 0) AS out_degree,
       coalesce(idg, 0) AS in_degree,
       coalesce(od, 0) + coalesce(idg, 0) AS degree
FROM o FULL JOIN i ON o.node = i.node
"""


def q_graph_khop(spark, sf_dir):
    from docs2kg_spark.operators.graphq import k_hop, undirect

    # materialize the edge table once: the BFS joins it k times, and
    # without the checkpoint every hop replays the lineitem scan +
    # distinct shuffle (in production the edge table is a stored table)
    e = undirect(_lineitem_graph(spark, sf_dir)).localCheckpoint(eager=False)
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 0)
        .select(F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    return k_hop(e, seeds, k=3).select("node", F.col("hops").cast("int").alias("hops"))


# recursive UNION dedups (node, hops) pairs globally, so the frontier is
# bounded by 4x|nodes| rows, not by path counts; GROUP BY min gives the
# same min-hop semantics as the Spark BFS's visited anti-join
SQL_GRAPH_KHOP = f"""
WITH RECURSIVE {_LINEITEM_GRAPH_CTE},
und AS (SELECT src, dst FROM lg_e UNION SELECT dst, src FROM lg_e),
walk(node, hops) AS (
  SELECT 'S' || s_suppkey, 0 FROM supplier WHERE s_suppkey % 10 = 0
  UNION
  SELECT und.dst, walk.hops + 1 FROM walk JOIN und ON und.src = walk.node WHERE walk.hops < 3
)
SELECT node, CAST(min(hops) AS INT) AS hops FROM walk GROUP BY node
"""


def q_graph_pagerank(spark, sf_dir):
    from docs2kg_spark.operators.graphq import pagerank, undirect

    t = q_kg_triples(spark, sf_dir)
    e = undirect(t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    return pagerank(e, iters=5, damping=0.85).select("node", F.round("pr", 6).alias("pr"))


def _graph_pagerank_sql(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank (GraphX convention, same
    recurrence as operators/graphq.py::pagerank) over the undirected
    entity co-occurrence graph.  The (1-d) literal is emitted with repr
    so both engines parse the exact same double."""
    ctes = [
        "und AS (SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e)",
        "nodes AS (SELECT DISTINCT src AS node FROM und)",
        "outd AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY src)",
        "pr0 AS (SELECT node, 1.0::DOUBLE AS pr FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
  SELECT n.node, {1.0 - d!r}::DOUBLE + {d!r}::DOUBLE * coalesce(c.s, 0.0::DOUBLE) AS pr
  FROM nodes n LEFT JOIN (
    SELECT und.dst AS node, sum(p.pr / o.deg) AS s
    FROM und JOIN pr{i - 1} p ON p.node = und.src JOIN outd o ON o.node = und.src
    GROUP BY und.dst) c ON c.node = n.node)"""
        )
    return (
        _entity_graph_prefix()
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(pr, 6) AS pr FROM pr{iters}"
    )


def q_graph_triangles(spark, sf_dir):
    from docs2kg_spark.operators.graphq import triangle_counts

    t = q_kg_triples(spark, sf_dir)
    return triangle_counts(t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")))


def _graph_triangles_sql() -> str:
    return (
        _entity_graph_prefix()
        + """,
tg_u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM eg_e WHERE src <> dst),
tg_t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM tg_u e1 JOIN tg_u e2 ON e1.b = e2.a
  JOIN tg_u e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT node, count(*) AS triangles
FROM (SELECT unnest([x, y, z]) AS node FROM tg_t)
GROUP BY node
"""
    )


def q_graph_components(spark, sf_dir):
    """Weakly-connected components — the gds.wcc analog — over the
    customer↔order bipartite graph.  Chosen over the entity graph
    because that one is a single giant component at every co-occurrence
    threshold (a vacuous oracle); this graph has ~|customers-with-
    orders| star components of varied size, so the min-label spread,
    the component merge, and the multi-component output are all
    exercised for real."""
    from docs2kg_spark.operators.graphq import weakly_connected

    o = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("O"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    return weakly_connected(o)


def _graph_components_sql() -> str:
    """Recursive label propagation (the doc_dedup_map twin's pattern):
    every node's label spreads along the symmetric closure; the
    recursive UNION dedups (node, lab) pairs so rows are bounded by
    Σ|component|² — small here because the components are per-customer
    stars.  min(lab) = the min-id component label both Spark CC paths
    (driver union-find / star loop) produce."""
    return """
WITH RECURSIVE gc_e AS (
  SELECT DISTINCT 'C' || o_custkey AS src, 'O' || o_orderkey AS dst FROM orders
),
gc_und AS (
  SELECT src AS a, dst AS b FROM gc_e WHERE src <> dst
  UNION
  SELECT dst, src FROM gc_e WHERE src <> dst
),
gc_nodes AS (SELECT src AS node FROM gc_e UNION SELECT dst FROM gc_e),
gc_reach(node, lab) AS (
  SELECT node, node FROM gc_nodes
  UNION
  SELECT u.b, r.lab FROM gc_reach r JOIN gc_und u ON u.a = r.node
)
SELECT node, min(lab) AS component FROM gc_reach GROUP BY node
"""


def q_graph_clustering(spark, sf_dir):
    """Local clustering coefficient per entity-graph node — separates
    hub entities that merely co-occur widely from entities whose
    neighborhoods are themselves interlinked."""
    from docs2kg_spark.operators.graphq import clustering_coefficient

    t = q_kg_triples(spark, sf_dir)
    return clustering_coefficient(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )


def _graph_clustering_sql() -> str:
    return (
        _entity_graph_prefix()
        + """,
tg_u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM eg_e WHERE src <> dst),
tg_t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM tg_u e1 JOIN tg_u e2 ON e1.b = e2.a
  JOIN tg_u e3 ON e3.a = e1.a AND e3.b = e2.b),
tcnt AS (
  SELECT node, count(*) AS triangles
  FROM (SELECT unnest([x, y, z]) AS node FROM tg_t) GROUP BY node),
dg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT a AS node FROM tg_u UNION ALL SELECT b FROM tg_u) GROUP BY node)
SELECT dg.node,
       CAST(dg.degree AS BIGINT) AS degree,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN dg.degree >= 2
                  THEN 2.0 * coalesce(t.triangles, 0)
                       / (CAST(dg.degree AS DOUBLE) * (CAST(dg.degree AS DOUBLE) - 1.0))
                  ELSE 0.0 END, 6) AS lcc
FROM dg LEFT JOIN tcnt t ON t.node = dg.node
"""
    )


# ---------------------------------------------------------------------------
# graph reads round 3: neighbor-Jaccard node similarity + label-propagation
# communities (operators/graphq.py), composed on the kg_triples CTE chain
# ---------------------------------------------------------------------------


def q_graph_jaccard(spark, sf_dir):
    """Structural entity similarity: neighbor-set Jaccard over the
    entity co-occurrence graph (the graph-side complement of surface
    MinHash linking — gds.nodeSimilarity's read)."""
    from docs2kg_spark.operators.graphq import neighbor_jaccard

    t = q_kg_triples(spark, sf_dir)
    return neighbor_jaccard(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), min_common=2
    )


def _graph_jaccard_sql(min_common: int = 2) -> str:
    return (
        _entity_graph_prefix()
        + f""",
gj_und AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
gj_deg AS (SELECT src AS node, COUNT(*) AS deg FROM gj_und GROUP BY 1),
gj_common AS (
  SELECT n1.src AS a, n2.src AS b, COUNT(*) AS common
  FROM gj_und n1 JOIN gj_und n2 ON n1.dst = n2.dst AND n1.src < n2.src
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_common}
)
SELECT a, b, CAST(common AS BIGINT) AS common,
       ROUND(CAST(common AS DOUBLE) / (da.deg + db.deg - common), 6) AS jaccard
FROM gj_common JOIN gj_deg da ON da.node = a JOIN gj_deg db ON db.node = b
"""
    )


@_pkg_patchable
def q_graph_communities(spark, sf_dir):
    """Synchronous label-propagation communities (4 fixed iterations,
    min-label tie-break) over the entity co-occurrence graph — the
    community read GraphX ships as LabelPropagation."""
    from docs2kg_spark.operators.graphq import label_propagation

    t = q_kg_triples(spark, sf_dir)
    return label_propagation(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), iters=4
    )


def _graph_lpa_ctes(iters: int = 4) -> str:
    """The unrolled-LPA CTE chain (shared by the communities twin and
    the modularity twin): per iteration neighbor label counts, per-node
    argmax by (count DESC, label ASC), coalesce over the prior labels
    (the exact recurrence of graphq.py::label_propagation).  Exposes
    `lpa_und` (the deduped undirected edge list) and `lp{iters}` (the
    final labels)."""
    ctes = [
        """lpa_und AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e
  ) WHERE src <> dst)""",
        "lp0 AS (SELECT DISTINCT src AS node, src AS community FROM lpa_und)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""nc{i} AS (
  SELECT u.dst AS node, p.community, COUNT(*) AS c
  FROM lpa_und u JOIN lp{i - 1} p ON p.node = u.src GROUP BY 1, 2),
pk{i} AS (
  SELECT node, community FROM (
    SELECT node, community,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, community) AS rn
    FROM nc{i}) WHERE rn = 1),
lp{i} AS (
  SELECT p.node, coalesce(k.community, p.community) AS community
  FROM lp{i - 1} p LEFT JOIN pk{i} k ON k.node = p.node)"""
        )
    return _entity_graph_prefix() + ",\n" + ",\n".join(ctes)


def _graph_lpa_sql(iters: int = 4) -> str:
    return _graph_lpa_ctes(iters) + f"\nSELECT node, community FROM lp{iters}"


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity of the entity graph — do hub entities link
    hubs (positive) or leaves (negative)?  The one-number skew summary."""
    from docs2kg_spark.operators.graphq import degree_assortativity

    t = q_kg_triples(spark, sf_dir)
    return degree_assortativity(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )


def _graph_assortativity_sql() -> str:
    return (
        _entity_graph_prefix()
        + """,
as_u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM eg_e WHERE src <> dst),
as_d AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS node FROM as_u UNION ALL SELECT b FROM as_u) GROUP BY node),
as_b AS (SELECT a, b FROM as_u UNION ALL SELECT b, a FROM as_u),
as_m AS (
  SELECT CAST(count(*) AS BIGINT) AS m2,
         CAST(sum(du.d * dv.d) AS BIGINT) AS sxy,
         CAST(sum(du.d) AS BIGINT) AS sx, CAST(sum(dv.d) AS BIGINT) AS sy,
         CAST(sum(du.d * du.d) AS BIGINT) AS sxx,
         CAST(sum(dv.d * dv.d) AS BIGINT) AS syy
  FROM as_b JOIN as_d du ON du.node = as_b.a JOIN as_d dv ON dv.node = as_b.b)
SELECT CAST(m2 / 2 AS BIGINT) AS m_edges,
       ROUND(CAST(m2 * sxy - sx * sy AS DOUBLE)
             / NULLIF(sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE) * CAST(m2 * syy - sy * sy AS DOUBLE)), 0.0), 6)
         AS assortativity
FROM as_m
"""
    )


def q_graph_kcore(spark, sf_dir):
    """3-core of the entity graph — the densest-region extractor; the
    Spark side peels to fixpoint, the twin unrolls 8 rounds (a parity
    test pins that the unroll depth reaches the fixpoint)."""
    from docs2kg_spark.operators.graphq import k_core

    t = q_kg_triples(spark, sf_dir)
    return k_core(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), k=3
    )


def _graph_kcore_sql(k: int = 3, rounds: int | None = None) -> str:
    # Unroll depth derives from the SAME constant as the Spark side's
    # fixpoint bound (ADVICE r3) — they cannot drift apart.
    if rounds is None:
        from docs2kg_spark.operators.graphq import KCORE_MAX_ITERS

        rounds = KCORE_MAX_ITERS
    # every kc_e{i} is referenced three times by round i+1 (two degree
    # legs + the edge filter): AS MATERIALIZED stops DuckDB from
    # inlining, which would otherwise replicate the whole upstream
    # mention-extraction chain ~3^rounds times
    ctes = [
        "kc_e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b "
        "FROM eg_e WHERE src <> dst)"
    ]
    for i in range(1, rounds + 1):
        p = f"kc_e{i - 1}"
        ctes.append(
            f"kc_d{i} AS (SELECT node, count(*) AS d FROM "
            f"(SELECT a AS node FROM {p} UNION ALL SELECT b FROM {p}) GROUP BY 1)"
        )
        ctes.append(f"kc_k{i} AS MATERIALIZED (SELECT node FROM kc_d{i} WHERE d >= {k})")
        ctes.append(
            f"kc_e{i} AS MATERIALIZED (SELECT e.a, e.b FROM {p} e "
            f"JOIN kc_k{i} ka ON ka.node = e.a JOIN kc_k{i} kb ON kb.node = e.b)"
        )
    last = f"kc_e{rounds}"
    return (
        _entity_graph_prefix()
        + ",\n"
        + ",\n".join(ctes)
        + f"""
SELECT node, CAST(count(*) AS BIGINT) AS core_degree
FROM (SELECT a AS node FROM {last} UNION ALL SELECT b FROM {last})
GROUP BY node
"""
    )


def q_graph_ppr(spark, sf_dir):
    """Personalized PageRank from the 3 lexicographically-smallest
    entity nodes (a deterministic seed set) over the undirected entity
    co-occurrence graph — the 'related to these entities' Cypher-analog
    read."""
    from docs2kg_spark.operators.graphq import personalized_pagerank, undirect

    t = q_kg_triples(spark, sf_dir)
    e = undirect(t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    nodes = e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    seeds = nodes.orderBy("node").limit(3)
    return personalized_pagerank(e, seeds, iters=5, damping=0.85).select(
        "node", F.round("pr", 6).alias("pr")
    )


def _graph_ppr_sql(iters: int = 5, d: float = 0.85) -> str:
    """Unrolled personalized PageRank twin (same recurrence as
    operators/graphq.py::personalized_pagerank; literals via repr so
    both engines parse identical doubles, ROUND(.,6) output like the
    plain-pagerank twin)."""
    ctes = [
        "und AS (SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e)",
        "nodes AS (SELECT DISTINCT src AS node FROM und)",
        "seeds AS (SELECT node FROM nodes ORDER BY node LIMIT 3)",
        "base AS (SELECT n.node, CASE WHEN s.node IS NOT NULL THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS base FROM nodes n LEFT JOIN seeds s ON s.node = n.node)",
        "outd AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY src)",
        "ppr0 AS (SELECT node, base AS pr FROM base)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""ppr{i} AS (
  SELECT b.node, {1.0 - d!r}::DOUBLE * b.base + {d!r}::DOUBLE * coalesce(c.s, 0.0::DOUBLE) AS pr
  FROM base b LEFT JOIN (
    SELECT und.dst AS node, sum(p.pr / o.deg) AS s
    FROM und JOIN ppr{i - 1} p ON p.node = und.src JOIN outd o ON o.node = und.src
    GROUP BY und.dst) c ON c.node = b.node)"""
        )
    return (
        _entity_graph_prefix()
        + ",\n"
        + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(pr, 6) AS pr FROM ppr{iters}"
    )


def q_graph_harmonic(spark, sf_dir):
    """Bounded 3-hop harmonic centrality over the undirected entity
    co-occurrence graph (exact ×6 integer-scaled score)."""
    from docs2kg_spark.operators.graphq import harmonic_centrality

    t = q_kg_triples(spark, sf_dir)
    return harmonic_centrality(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), max_hops=3
    )


def _graph_harmonic_sql() -> str:
    """Layered-BFS twin of operators/graphq.py::harmonic_centrality at
    max_hops=3: distance-d pairs = (distance-(d-1) ⋈ adjacency) minus
    self minus nearer layers (EXCEPT = the left-antis), then one count
    per layer and the exact 6/3/2 weighting."""
    return (
        _entity_graph_prefix()
        + """,
hc_und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM eg_e UNION ALL SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
hc_d2 AS (
  SELECT a.src, b.dst FROM hc_und a JOIN hc_und b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM hc_und
),
hc_d3 AS (
  SELECT a.src, b.dst FROM hc_d2 a JOIN hc_und b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM hc_und
  EXCEPT SELECT src, dst FROM hc_d2
),
hc_n1 AS (SELECT src, COUNT(*) AS n1 FROM hc_und GROUP BY src),
hc_n2 AS (SELECT src, COUNT(*) AS n2 FROM hc_d2 GROUP BY src),
hc_n3 AS (SELECT src, COUNT(*) AS n3 FROM hc_d3 GROUP BY src)
SELECT n.src AS node,
       CAST(COALESCE(n.n1, 0) AS BIGINT) AS n1,
       CAST(COALESCE(hc_n2.n2, 0) AS BIGINT) AS n2,
       CAST(COALESCE(hc_n3.n3, 0) AS BIGINT) AS n3,
       CAST(6 * COALESCE(n.n1, 0) + 3 * COALESCE(hc_n2.n2, 0)
            + 2 * COALESCE(hc_n3.n3, 0) AS BIGINT) AS harmonic6
FROM hc_n1 n
LEFT JOIN hc_n2 ON hc_n2.src = n.src
LEFT JOIN hc_n3 ON hc_n3.src = n.src
"""
    )


def q_graph_linkpred(spark, sf_dir):
    """Common-neighbor link prediction (resource-allocation index) over
    the entity co-occurrence graph — the KG-completion candidate queue
    (operators/graphq.py::link_prediction; RA terms are 1e6 DIV deg so
    the score is an exact BIGINT)."""
    from docs2kg_spark.operators.graphq import link_prediction

    t = q_kg_triples(spark, sf_dir)
    return link_prediction(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")), min_common=2
    )


def _graph_linkpred_sql() -> str:
    """Wedge-join twin of link_prediction: distinct symmetric adjacency,
    per-z degree carried through the wedge, existing edges anti-joined
    out, RA summed in integer arithmetic (1e6 // deg per term)."""
    return (
        _entity_graph_prefix()
        + """,
lp_und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM eg_e UNION ALL SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
lp_deg AS (SELECT src AS z, COUNT(*) AS degz FROM lp_und GROUP BY src),
lp_w AS (SELECT src AS z, dst AS n FROM lp_und),
lp_sc AS (
  SELECT a.n AS a, b.n AS b, COUNT(*) AS common,
         SUM(1000000 // d.degz) AS ra1e6
  FROM lp_w a JOIN lp_w b ON a.z = b.z AND a.n < b.n
  JOIN lp_deg d ON d.z = a.z
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT a, b, CAST(common AS BIGINT) AS common, CAST(ra1e6 AS BIGINT) AS ra1e6
FROM lp_sc s
WHERE NOT EXISTS (SELECT 1 FROM lp_und e WHERE e.src = s.a AND e.dst = s.b)
"""
    )


def q_blocking_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (adapted: no commitdate/receiptdate, so "late"
    = shipped > 100 days after the order date, matching the Q4-shape
    convention): in multi-supplier orders where EXACTLY ONE supplier
    shipped late, count blocked orders per guilty supplier — the
    exists + not-exists double-correlation.

    Scale shape: both correlated subqueries collapse into ONE
    per-order aggregate (n distinct suppliers, n distinct LATE
    suppliers) over the distinct (order, supplier, late) pair set —
    the fact table is touched once; the guilty-pair join then keys on
    o_orderkey against the order-sized aggregate, and the supplier
    dimension joins broadcast at the very end."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    pairs = (
        li.join(o, "l_orderkey")
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
            ).alias("late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("late"))
    ).localCheckpoint(eager=False)  # stats + guilty read ONE materialization
    stats = pairs.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late_supp"),
    )
    guilty = pairs.filter("late").join(
        stats.filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
        "l_orderkey",
    )
    s = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        guilty.groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .join(s, "s_suppkey")
        .select(F.col("s_suppkey").cast("bigint").alias("s_suppkey"), "s_name", "numwait")
    )


SQL_BLOCKING_SUPPLIERS = """
WITH pairs AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
),
stats AS (
  SELECT l_orderkey, COUNT(*) AS n_supp,
         SUM(CASE WHEN late THEN 1 ELSE 0 END) AS n_late_supp
  FROM pairs GROUP BY l_orderkey
)
SELECT CAST(p.l_suppkey AS BIGINT) AS s_suppkey, s.s_name,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM pairs p
JOIN stats t ON t.l_orderkey = p.l_orderkey
JOIN supplier s ON s.s_suppkey = p.l_suppkey
WHERE p.late AND t.n_supp >= 2 AND t.n_late_supp = 1
GROUP BY p.l_suppkey, s.s_name
"""


def q_graph_sssp(spark, sf_dir):
    """Bounded-hop cheapest path over the weighted entity co-occurrence
    graph (operators/graphq.py::sssp_bounded): edge weight is the
    integer affinity cost 1 + ⌊20/n⌋ for a pair co-occurring in n
    triples (frequent pairs are "close"), the seed is the
    lexicographically first entity, and distances are exact BIGINTs —
    the Cypher `shortestPath((s)-[*..4]-(n))` analog with weights.

    Scale shape: the pair-count agg reduces triples to one row per
    unordered pair before anything wide; the relaxation loop touches
    only improved-frontier out-edges per round (broadcast while small);
    the edge table rides one lazy localCheckpoint so four rounds never
    replay the triple derivation."""
    from docs2kg_spark.operators.graphq import sssp_bounded

    t = q_kg_triples(spark, sf_dir)
    pairs = (
        t.filter(F.col("subj") != F.col("obj"))
        .select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )
    w = (F.lit(1) + F.floor(F.lit(20.0) / F.col("n"))).cast("bigint")
    und = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), w.alias("w"))
        .unionByName(
            pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), w.alias("w"))
        )
        .localCheckpoint(eager=False)
    )
    seeds = und.agg(F.min("src").alias("node"))
    return sssp_bounded(und, seeds, max_hops=4).select(
        "node", F.col("dist").cast("bigint").alias("dist")
    )


def _graph_sssp_sql(max_hops: int = 4) -> str:
    """Recursive-CTE twin: enumerate (node, dist, hops) walk states —
    UNION dedups identical states, so rows are bounded by
    |nodes|·|distinct dists|·hops, not path counts — then MIN per node.
    Identical ≤max_hops-edge semantics to the Spark relaxation."""
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH RECURSIVE {kg_triples_ctes(TRANSCRIPTS_CTE)},
sp AS (
  SELECT least(subj, obj) AS a, greatest(subj, obj) AS b, COUNT(*) AS n
  FROM triples WHERE subj <> obj GROUP BY 1, 2
),
sw AS (SELECT a, b, CAST(1 + FLOOR(20.0 / n) AS BIGINT) AS w FROM sp),
und AS (SELECT a AS src, b AS dst, w FROM sw UNION ALL SELECT b, a, w FROM sw),
seed AS (SELECT min(src) AS node FROM und),
walk(node, dist, hops) AS (
  SELECT node, CAST(0 AS BIGINT), 0 FROM seed
  UNION
  SELECT e.dst, walk.dist + e.w, walk.hops + 1
  FROM walk JOIN und e ON e.src = walk.node WHERE walk.hops < {max_hops}
)
SELECT node, MIN(dist) AS dist FROM walk GROUP BY node
"""


def q_graph_modularity(spark, sf_dir):
    """Newman modularity of the LPA partition over the entity
    co-occurrence graph — the single-number community-quality audit
    (is LPA finding structure, or noise?).  Computed EXACTLY in
    integers: with m2 = |directed und edges| = 2m,
    Q·m2² = Σ_c (intra2_c·m2 − d_c²) is a BIGINT (safe while
    m2 ≲ 3·10⁹; beyond that the audit runs per-community anyway), and
    the single float division happens once at the end.

    Scale shape: reuses the memoized triples; one undirected-dedup
    pass; two broadcast label joins onto the edge list; a
    per-community hash agg then a 1-row reduction."""
    t = q_kg_triples(spark, sf_dir)
    e = t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    und = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .filter("src != dst")
        .localCheckpoint(eager=False)  # m2 count + label joins: ONE pass
    )
    labels = q_graph_communities(spark, sf_dir)
    lab = und.join(
        F.broadcast(labels.selectExpr("node AS src", "community AS c_src")), "src"
    ).join(F.broadcast(labels.selectExpr("node AS dst", "community AS c_dst")), "dst")
    per_c = lab.groupBy("c_src").agg(
        F.count("*").cast("bigint").alias("d_sum"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), 1).otherwise(0))
        .cast("bigint")
        .alias("intra2"),
    )
    m2 = und.agg(F.count("*").cast("bigint").alias("m2"))
    return (
        per_c.crossJoin(F.broadcast(m2))
        .groupBy("m2")
        .agg(
            F.count("*").cast("bigint").alias("n_communities"),
            F.sum(F.col("intra2") * F.col("m2") - F.col("d_sum") * F.col("d_sum"))
            .cast("bigint")
            .alias("q_num"),
        )
        .selectExpr(
            "n_communities",
            "m2",
            "q_num",
            "ROUND(CAST(q_num AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2), 6) AS modularity",
        )
    )


def _graph_modularity_sql() -> str:
    return f"""
{_graph_lpa_ctes(4)},
gm_lab AS (
  SELECT u.src, u.dst, ls.community AS c_src, ld.community AS c_dst
  FROM lpa_und u
  JOIN lp4 ls ON ls.node = u.src
  JOIN lp4 ld ON ld.node = u.dst
),
gm_m AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM lpa_und),
gm_c AS (
  SELECT c_src, CAST(count(*) AS BIGINT) AS d_sum,
         CAST(count(*) FILTER (c_src = c_dst) AS BIGINT) AS intra2
  FROM gm_lab GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS n_communities, m2,
       CAST(sum(intra2 * m2 - d_sum * d_sum) AS BIGINT) AS q_num,
       ROUND(CAST(sum(intra2 * m2 - d_sum * d_sum) AS DOUBLE) / (CAST(m2 AS DOUBLE) * m2), 6) AS modularity
FROM gm_c CROSS JOIN gm_m GROUP BY m2
"""


def q_graph_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg, JACM'99) over the directed
    entity co-occurrence graph, 2 full mutual-reinforcement rounds —
    the directed complement to PageRank (pagerank ranks endorsement
    flow; HITS separates pointers-to-good from pointed-at-by-good).

    Exactness: per-iteration NORMALIZATION IS OMITTED (fixed iteration
    count ⇒ rankings identical), which keeps every score an exact
    BIGINT sum of integer degrees — no float accumulates anywhere, the
    trick that makes an iterative spectral method value-oracle-able:
    h¹ = outdeg; a¹(v) = Σ_{u→v} h¹(u); h²(u) = Σ_{u→v} a¹(v);
    a²(v) = Σ_{u→v} h²(u).

    Scale shape: each round is one equi-join of the edge list against
    the node-sized score table + one hash agg — the pagerank loop
    shape; 2 rounds, no driver action between them."""
    t = q_kg_triples(spark, sf_dir)
    e = (
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()  # the entity graph convention every graph read shares (eg_e)
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("node")).union(e.select("dst")).distinct()
    )
    h1 = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("h1")
    )
    a1 = (
        e.join(h1.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("h1").cast("bigint").alias("a1"))
    )
    h2 = (
        e.join(a1.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(F.sum("a1").cast("bigint").alias("h2"))
    )
    a2 = (
        e.join(h2.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("h2").cast("bigint").alias("a2"))
    )
    return (
        nodes.join(h2, "node", "left")
        .join(a2, "node", "left")
        .selectExpr(
            "node",
            "CAST(coalesce(h2, 0) AS BIGINT) AS hub_score",
            "CAST(coalesce(a2, 0) AS BIGINT) AS auth_score",
        )
    )


def _graph_hits_sql() -> str:
    return f"""
{_entity_graph_prefix()},
ht_n AS (SELECT src AS node FROM eg_e UNION SELECT dst FROM eg_e),
ht_h1 AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS h1 FROM eg_e GROUP BY 1),
ht_a1 AS (
  SELECT e.dst AS node, CAST(sum(h.h1) AS BIGINT) AS a1
  FROM eg_e e JOIN ht_h1 h ON h.node = e.src GROUP BY 1
),
ht_h2 AS (
  SELECT e.src AS node, CAST(sum(a.a1) AS BIGINT) AS h2
  FROM eg_e e JOIN ht_a1 a ON a.node = e.dst GROUP BY 1
),
ht_a2 AS (
  SELECT e.dst AS node, CAST(sum(h.h2) AS BIGINT) AS a2
  FROM eg_e e JOIN ht_h2 h ON h.node = e.src GROUP BY 1
)
SELECT n.node,
       CAST(coalesce(h.h2, 0) AS BIGINT) AS hub_score,
       CAST(coalesce(a.a2, 0) AS BIGINT) AS auth_score
FROM ht_n n
LEFT JOIN ht_h2 h ON h.node = n.node
LEFT JOIN ht_a2 a ON a.node = n.node
"""


def q_graph_pagerank_weighted(spark, sf_dir):
    """WEIGHTED PageRank over the entity co-occurrence graph: edge
    weight = co-occurrence multiplicity (how many triples connect the
    pair), so endorsement flows along STRONG associations instead of
    treating a one-off co-mention like a recurring one — the ranking a
    KG consumer actually wants once edges carry counts.

    Float discipline: W(u) aggregates as exact BIGINTs; doubles enter
    only at the per-edge share division (operators/graphq.py::
    pagerank_weighted), mirrored term-for-term in the twin.

    Scale shape: the pagerank loop shape — shares pre-divided once and
    checkpointed, one equi-join + one sum agg per iteration."""
    from docs2kg_spark.operators.graphq import pagerank_weighted

    t = q_kg_triples(spark, sf_dir)
    dw = t.groupBy(F.col("subj").alias("src"), F.col("obj").alias("dst")).agg(
        F.count("*").cast("bigint").alias("w")
    )
    und = (
        dw.unionByName(
            dw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("bigint").alias("w"))
    )
    return pagerank_weighted(und, iters=5, damping=0.85).select(
        "node", F.round("pr", 6).alias("pr")
    )


def _graph_pagerank_weighted_sql(iters: int = 5, d: float = 0.85) -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    ctes = [
        "wp_d AS (SELECT subj AS src, obj AS dst, CAST(count(*) AS BIGINT) AS w FROM triples GROUP BY 1, 2)",
        """wp_u AS (
  SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
    SELECT src, dst, w FROM wp_d UNION ALL SELECT dst, src, w FROM wp_d
  ) GROUP BY 1, 2)""",
        "wp_n AS (SELECT DISTINCT src AS node FROM wp_u)",
        "wp_o AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS wsum FROM wp_u GROUP BY 1)",
        """wp_s AS (
  SELECT u.src, u.dst, CAST(u.w AS DOUBLE) / CAST(o.wsum AS DOUBLE) AS share
  FROM wp_u u JOIN wp_o o ON o.node = u.src)""",
        "wpr0 AS (SELECT node, 1.0::DOUBLE AS pr FROM wp_n)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""wpr{i} AS (
  SELECT n.node, {1.0 - d!r}::DOUBLE + {d!r}::DOUBLE * coalesce(c.s, 0.0::DOUBLE) AS pr
  FROM wp_n n LEFT JOIN (
    SELECT s.dst AS node, sum(p.pr * s.share) AS s
    FROM wp_s s JOIN wpr{i - 1} p ON p.node = s.src
    GROUP BY s.dst) c ON c.node = n.node)"""
        )
    return (
        f"WITH {kg_triples_ctes(TRANSCRIPTS_CTE)},\n"
        + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(pr, 6) AS pr FROM wpr{iters}"
    )


def q_graph_ecc_hubs(spark, sf_dir):
    """Bounded eccentricity of the top-3 degree hubs: per hub, the max
    min-hop distance within 4 hops and the count of reached nodes —
    the small-world check (a hub that reaches most of the graph in ≤4
    hops certifies the KG is navigable).  Exact integer distances via
    4 rounds of frontier relaxation; hubs tie-break on node id.

    Scale shape: the degree agg + TakeOrdered picks the seeds; each
    BFS round is one equi-join + min-agg over the (seed, node)
    distance table (≤ 3·|V| rows), mirroring the khop loop."""
    t = q_kg_triples(spark, sf_dir)
    e = (
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = (
        e.unionByName(e.selectExpr("dst AS src", "src AS dst"))
        .filter("src != dst")
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = und.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    hubs = (
        deg.orderBy(F.col("d").desc(), "node").limit(3)
        .select(F.col("node").alias("hub"))
    )
    dist = F.broadcast(hubs).select(
        "hub", F.col("hub").alias("node"), F.lit(0).cast("bigint").alias("dist")
    )
    for _ in range(4):
        nxt = (
            dist.join(und, dist.node == und.src)
            .select("hub", F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(nxt)
            .groupBy("hub", "node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist.groupBy("hub").agg(
        F.max("dist").cast("bigint").alias("ecc4"),
        F.count("*").cast("bigint").alias("n_reached"),
    )


def _graph_ecc_hubs_sql(max_hops: int = 4) -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH RECURSIVE {kg_triples_ctes(TRANSCRIPTS_CTE)},
ec_e AS (SELECT DISTINCT subj AS src, obj AS dst FROM triples),
ec_u AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM ec_e UNION SELECT dst, src FROM ec_e
  ) WHERE src <> dst
),
ec_d AS (SELECT src AS node, count(*) AS d FROM ec_u GROUP BY 1),
ec_h AS (SELECT node AS hub FROM ec_d ORDER BY d DESC, node LIMIT 3),
walk(hub, node, dist) AS (
  SELECT hub, hub, CAST(0 AS BIGINT) FROM ec_h
  UNION
  SELECT w.hub, e.dst, w.dist + 1
  FROM walk w JOIN ec_u e ON e.src = w.node WHERE w.dist < {max_hops}
),
ec_m AS (SELECT hub, node, MIN(dist) AS dist FROM walk GROUP BY 1, 2)
SELECT hub, CAST(MAX(dist) AS BIGINT) AS ecc4,
       CAST(COUNT(*) AS BIGINT) AS n_reached
FROM ec_m GROUP BY 1
"""


def q_graph_adamic_adar(spark, sf_dir):
    """Adamic–Adar KG-completion scores over the entity co-occurrence
    graph (shared-neighbor weights down-weight hubs; integer micro
    units frozen per neighbor so the sum is associative)."""
    from docs2kg_spark.operators.graphq import adamic_adar

    t = q_kg_triples(spark, sf_dir)
    return adamic_adar(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")),
        min_common=2,
    )


def _graph_adamic_adar_sql(min_common: int = 2) -> str:
    return (
        _entity_graph_prefix()
        + f""",
aa_und AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
aa_deg AS (SELECT src AS w, COUNT(*) AS deg FROM aa_und GROUP BY 1),
aa_w AS (SELECT w, CAST(round(1000000 / ln(deg)) AS BIGINT) AS wt FROM aa_deg)
SELECT n1.src AS a, n2.src AS b,
       CAST(COUNT(*) AS BIGINT) AS common,
       CAST(SUM(aw.wt) AS BIGINT) AS aa_micro
FROM aa_und n1
JOIN aa_w aw ON aw.w = n1.dst
JOIN aa_und n2 ON n2.dst = n1.dst AND n1.src < n2.src
GROUP BY 1, 2 HAVING COUNT(*) >= {min_common}
"""
    )


def q_graph_tie_strength(spark, sf_dir):
    """Tie-strength (embeddedness) profile of the entity co-occurrence
    graph: every undirected edge with its common-neighbor count and
    endpoint degrees, flagged weak when the endpoints share ≤1 other
    neighbor — Granovetter's weak ties, the links community detection
    splits along and the true local bridges when common = 0.  (On a
    clique-heavy co-occurrence graph a strict common=0 filter is
    near-empty, so the full per-edge profile is the useful read.)

    Scale shape: the same wedge join neighbor similarity uses (shared
    neighbor keys only, never all-pairs) aggregated to per-pair counts,
    left-joined onto the edge list; degrees join by node key."""
    from docs2kg_spark.operators.graphq import undirect

    t = q_kg_triples(spark, sf_dir)
    e = undirect(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    canon = e.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("bigint").alias("deg")
    )
    n1 = e.select(F.col("dst").alias("w"), F.col("src").alias("a"))
    n2 = e.select(F.col("dst").alias("w"), F.col("src").alias("b"))
    wedged = (
        n1.join(n2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    return (
        canon.join(wedged, ["a", "b"], "left")
        .withColumn("common", F.coalesce("common", F.lit(0)).cast("bigint"))
        .join(deg.selectExpr("node AS a", "deg AS deg_a"), "a")
        .join(deg.selectExpr("node AS b", "deg AS deg_b"), "b")
        .select(
            "a",
            "b",
            "common",
            "deg_a",
            "deg_b",
            (F.col("common") <= 1).alias("is_weak"),
        )
    )


def _graph_tie_strength_sql() -> str:
    return (
        _entity_graph_prefix()
        + """,
lb_und AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
lb_canon AS (SELECT src AS a, dst AS b FROM lb_und WHERE src < dst),
lb_deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM lb_und GROUP BY 1),
lb_wedge AS (
  SELECT n1.src AS a, n2.src AS b, CAST(COUNT(*) AS BIGINT) AS common
  FROM lb_und n1 JOIN lb_und n2 ON n1.dst = n2.dst AND n1.src < n2.src
  GROUP BY 1, 2
)
SELECT c.a, c.b,
       CAST(COALESCE(w.common, 0) AS BIGINT) AS common,
       da.deg AS deg_a, db.deg AS deg_b,
       COALESCE(w.common, 0) <= 1 AS is_weak
FROM lb_canon c
LEFT JOIN lb_wedge w ON w.a = c.a AND w.b = c.b
JOIN lb_deg da ON da.node = c.a
JOIN lb_deg db ON db.node = c.b
"""
    )


def q_graph_jdd(spark, sf_dir):
    """Joint degree distribution of the entity graph: edge counts per
    ordered (log2-degree-band, log2-degree-band) cell — the detailed
    read behind the single-number assortativity (which bands actually
    wire to which; a hub-hub heavy JDD says the co-occurrence graph is
    core-periphery, a diagonal JDD says it's banded).

    Scale shape: degree agg, band projection (row-local), one
    edge-keyed join of two broadcast-able band maps, ≤ bands² agg."""
    from docs2kg_spark.operators.graphq import undirect

    t = q_kg_triples(spark, sf_dir)
    e = undirect(
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    deg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .selectExpr("node", "CAST(floor(log2(deg)) AS INT) AS band")
    )
    canon = e.filter(F.col("src") < F.col("dst"))
    return (
        canon.join(deg.selectExpr("node AS src", "band AS ba"), "src")
        .join(deg.selectExpr("node AS dst", "band AS bb"), "dst")
        .groupBy(
            F.least("ba", "bb").alias("band_lo"),
            F.greatest("ba", "bb").alias("band_hi"),
        )
        .agg(F.count("*").cast("bigint").alias("n_edges"))
    )


def _graph_jdd_sql() -> str:
    return (
        _entity_graph_prefix()
        + """,
jd_und AS (
  SELECT src, dst FROM (
    SELECT src, dst FROM eg_e UNION SELECT dst, src FROM eg_e
  ) WHERE src <> dst
),
jd_deg AS (
  SELECT src AS node, CAST(floor(log2(count(*))) AS INT) AS band
  FROM jd_und GROUP BY 1
)
SELECT least(da.band, db.band) AS band_lo,
       greatest(da.band, db.band) AS band_hi,
       CAST(count(*) AS BIGINT) AS n_edges
FROM (SELECT src, dst FROM jd_und WHERE src < dst) c
JOIN jd_deg da ON da.node = c.src
JOIN jd_deg db ON db.node = c.dst
GROUP BY 1, 2
"""
    )


def q_graph_reciprocity(spark, sf_dir):
    """Reciprocity of the DIRECTED triple graph: the share of distinct
    (subj → obj) edges whose reverse also exists — co-occurrence
    extraction orders pairs by span position, so high reciprocity
    means the same entity pair keeps appearing in both orders (a
    symmetric-relation signal the directed predicates should not
    carry).

    Scale shape: one distinct reduce, one self equi-join on the
    flipped key, a 1-row agg."""
    t = q_kg_triples(spark, sf_dir)
    e = (
        t.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = e.selectExpr("dst AS src", "src AS dst", "1 AS has_rev")
    return (
        e.join(rev, ["src", "dst"], "left")
        .agg(
            F.count("*").cast("bigint").alias("n_edges"),
            F.sum(F.coalesce("has_rev", F.lit(0))).cast("bigint").alias("n_reciprocal"),
        )
        .selectExpr(
            "n_edges", "n_reciprocal",
            "n_reciprocal * 10000 DIV n_edges AS reciprocity_bp",
        )
    )


def _graph_reciprocity_sql() -> str:
    from docs2kg_spark.oracle.sql_twins import kg_triples_ctes

    return f"""
WITH {kg_triples_ctes(TRANSCRIPTS_CTE)},
rc_e AS (
  SELECT DISTINCT subj AS src, obj AS dst FROM triples WHERE subj != obj
)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal,
       CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 10000
         // CAST(count(*) AS BIGINT) AS reciprocity_bp
FROM rc_e e
LEFT JOIN rc_e r ON r.src = e.dst AND r.dst = e.src
"""


def q_centrality_rank_corr(spark, sf_dir):
    """Spearman rank correlation between PageRank and degree on the
    entity graph — the 'is PageRank buying anything over a degree
    count' read that decides whether the iterative centrality is worth
    its joins at the next scale-up.  ρ = 1 − 6Σd²/(n(n²−1)) with the
    rank difference sum exact BIGINT (ranks are total-ordered by the
    6dp-rounded score then node, identical in the twin).

    Scale shape: both rankings use the two-phase ``global_row_number``
    (range-repartition + local rank + bounded prefix offsets) over the
    |entities| table — a web-scale entity vocabulary is 10⁸⁺ nodes and
    must never sort through one reducer (round-4 verdict perf item 2)
    — then a 1-row moment agg."""
    from docs2kg_spark.functions.skew import global_row_number
    from docs2kg_spark.operators.graphq import pagerank, undirect

    t = q_kg_triples(spark, sf_dir)
    # same input convention as q_graph_pagerank (unfiltered symmetric
    # closure — the twin reuses that exact CTE chain); the degree leg
    # drops self-loops
    e = undirect(t.select(F.col("subj").alias("src"), F.col("obj").alias("dst")))
    pr = pagerank(e, iters=5, damping=0.85).select(
        "node", F.round("pr", 6).alias("pr")
    )
    deg = (
        e.filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    j = pr.join(deg, "node")
    ranked = global_row_number(
        global_row_number(j, [F.col("pr").desc(), F.col("node").asc()], "rp"),
        [F.col("deg").desc(), F.col("node").asc()],
        "rd",
    )
    return (
        ranked.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.expr("CAST((rp - rd) * (rp - rd) AS BIGINT)")).alias("sum_d2"),
        )
        .selectExpr(
            "n",
            "sum_d2",
            "ROUND(1.0 - 6.0 * sum_d2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * n - 1)), 6) AS rho",
        )
    )


def _centrality_rank_corr_sql(iters: int = 5) -> str:
    # extend the pagerank twin's CTE chain in place: strip its final
    # SELECT and continue with the ranking CTEs (so the pr values are
    # definitionally the oracled q_graph_pagerank values)
    base = _graph_pagerank_sql(iters)
    final = f"\nSELECT node, ROUND(pr, 6) AS pr FROM pr{iters}"
    assert base.endswith(final), "pagerank twin tail changed"
    prefix = base[: -len(final)].rstrip()
    return (
        prefix
        + f""",
cr_pr AS (SELECT node, ROUND(pr, 6) AS pr FROM pr{iters}),
cr_deg AS (
  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
  FROM und WHERE src <> dst GROUP BY 1
),
cr_r AS (
  SELECT p.node,
         ROW_NUMBER() OVER (ORDER BY p.pr DESC, p.node) AS rp,
         ROW_NUMBER() OVER (ORDER BY d.deg DESC, p.node) AS rd
  FROM cr_pr p JOIN cr_deg d USING (node)
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum((rp - rd) * (rp - rd)) AS BIGINT) AS sum_d2,
       ROUND(1.0 - 6.0 * sum((rp - rd) * (rp - rd))
             / (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) * count(*) - 1)), 6) AS rho
FROM cr_r
"""
    )
