"""Graph export / import.

Reference: Neo4jTransformer.export dumps the whole graph to JSON
(utils/neo4j_loader.py:446-491) and import_from_json re-creates it with
an old-id → new-id remapping (neo4j_loader.py:493-536).

Rebuild: kg_nodes/kg_edges are already tables, so export is a plain
columnar write (JSON for Neo4j tooling, CSV for neo4j-admin import);
import remaps ids through a deterministic mapping table with two equi
joins — the distributed analog of the reference's per-node dict remap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from docs2kg_spark.functions.ids import det_id_col


def export_graph_json(kg_nodes: DataFrame, kg_edges: DataFrame, out_dir: str) -> None:
    """Neo4j-loadable JSON dump (the analog of neo4j_export.json)."""
    kg_nodes.write.mode("overwrite").json(f"{out_dir}/nodes")
    kg_edges.write.mode("overwrite").json(f"{out_dir}/relationships")


def export_neo4j_admin_csv(kg_nodes: DataFrame, kg_edges: DataFrame, out_dir: str) -> None:
    """CSV shape for `neo4j-admin database import`: nodes with :ID/:LABEL,
    relationships with :START_ID/:END_ID/:TYPE."""
    kg_nodes.select(
        F.col("node_id").alias("nodeId:ID"),
        F.col("type").alias(":LABEL"),
    ).write.mode("overwrite").option("header", True).csv(f"{out_dir}/nodes_csv")
    kg_edges.select(
        F.col("src").alias(":START_ID"),
        F.col("dst").alias(":END_ID"),
        F.col("type").alias(":TYPE"),
    ).write.mode("overwrite").option("header", True).csv(f"{out_dir}/edges_csv")


def import_with_id_remap(
    kg_nodes: DataFrame, kg_edges: DataFrame, namespace: str
) -> tuple[DataFrame, DataFrame]:
    """Re-import a dump under a new id namespace: every node id is
    remapped deterministically (the content-addressed analog of the
    reference's uuid remap dict at neo4j_loader.py:504-514), and edges
    are redirected through the mapping with two equi joins
    (neo4j_loader.py:516-530)."""
    mapping = kg_nodes.select(
        F.col("node_id").alias("old_id"),
        det_id_col(F.lit(namespace), "node_id").alias("new_id"),
    )
    nodes = (
        kg_nodes.join(mapping, kg_nodes.node_id == mapping.old_id)
        .select(
            F.col("new_id").alias("node_id"),
            det_id_col(F.lit(namespace), "canonical_id").alias("canonical_id"),
            "type",
            "properties",
        )
    )
    m_src = mapping.withColumnRenamed("old_id", "src").withColumnRenamed("new_id", "new_src")
    m_dst = mapping.withColumnRenamed("old_id", "dst").withColumnRenamed("new_id", "new_dst")
    edges = (
        kg_edges.join(m_src, on="src")
        .join(m_dst, on="dst")
        .select(
            F.col("new_src").alias("src"),
            F.col("new_dst").alias("dst"),
            "type",
            "conv_id",
            "properties",
        )
    )
    return nodes, edges
