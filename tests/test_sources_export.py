from pyspark.sql import functions as F

from docs2kg_spark.operators.export import export_graph_json, import_with_id_remap
from docs2kg_spark.operators.ontology_gen import updated_ontology
from docs2kg_spark.sources.gazetteer import gazetteer_to_broadcastable, load_gazetteer_csv


def test_gazetteer_last_comma_split(spark, tmp_path):
    """the reference's `sep=r",(?=[^,]*$)"` split (ner_spacy_match.py:43):
    entity text may contain commas; only the LAST comma separates."""
    p = tmp_path / "entity_list.csv"
    p.write_text(
        "entity,entity_type\n"
        "Acme Corp,Organization\n"
        "Acme, Inc,Organization\n"
        "Smith, John, Jr,Person\n"
        "Spark,Tool\n"
    )
    df = load_gazetteer_csv(spark, str(p))
    got = set(gazetteer_to_broadcastable(df))
    assert got == {
        ("Acme Corp", "Organization"),
        ("Acme, Inc", "Organization"),
        ("Smith, John, Jr", "Person"),
        ("Spark", "Tool"),
    }


def _mini_graph(spark):
    nodes = spark.createDataFrame(
        [("n1", "n1", "FILE", {"k": "v"}), ("n2", "n2", "P", {}), ("n3", "n3", "PERSON", {})],
        "node_id string, canonical_id string, type string, properties map<string,string>",
    )
    edges = spark.createDataFrame(
        [("n1", "n2", "CONTAINS", "c1", {}), ("n2", "n3", "HAS_ENTITY", "c1", {})],
        "src string, dst string, type string, conv_id string, properties map<string,string>",
    )
    return nodes, edges


def test_export_and_import_remap(spark, tmp_path):
    nodes, edges = _mini_graph(spark)
    export_graph_json(nodes, edges, str(tmp_path / "dump"))
    back_nodes = spark.read.json(str(tmp_path / "dump/nodes"))
    assert back_nodes.count() == 3

    new_nodes, new_edges = import_with_id_remap(nodes, edges, namespace="proj2")
    new_nodes = new_nodes.cache()
    new_edges = new_edges.cache()
    assert new_nodes.count() == 3 and new_edges.count() == 2
    # no old ids survive
    old_ids = {"n1", "n2", "n3"}
    assert not old_ids & {r.node_id for r in new_nodes.collect()}
    # edges still connect existing nodes (no dangling after remap)
    ids = new_nodes.select(F.col("node_id").alias("x"))
    assert new_edges.join(ids, new_edges.src == F.col("x"), "left_anti").count() == 0
    assert new_edges.join(ids, new_edges.dst == F.col("x"), "left_anti").count() == 0
    # remap is deterministic
    again_nodes, _ = import_with_id_remap(nodes, edges, namespace="proj2")
    assert {r.node_id for r in again_nodes.collect()} == {r.node_id for r in new_nodes.collect()}


def test_updated_ontology(spark):
    from docs2kg_spark.config import Ontology

    m = spark.createDataFrame([("alice", "Person"), ("x1", "Chemical")], "text string, label string")
    ont = Ontology(entity_types=("Person",))
    new, changed = updated_ontology(m, ont)
    assert changed and set(new.entity_types) == {"Person", "Chemical"}
    same, changed2 = updated_ontology(m.filter(F.col("label") == "Person"), new)
    assert not changed2 and same is new
