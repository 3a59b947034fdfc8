"""Ontology maintenance.

Reference: load_entity_type unions the gazetteer's entity types with the
ontology's and writes the ontology back when new types appeared
(semantic_kg/base.py:48-84); the LLM variant proposes types from
document text (entity_type_llm.py:48-77).  Driver-side logic over a
distributed aggregate: the distinct-labels aggregation runs on the
cluster, the tiny set union on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from docs2kg_spark.config import Ontology


def discover_entity_types(mentions: DataFrame) -> list[str]:
    """distinct mention labels, distributed aggregate → driver list."""
    return sorted(r.label for r in mentions.select("label").distinct().collect())


def updated_ontology(mentions: DataFrame, ontology: Ontology) -> tuple[Ontology, bool]:
    """union discovered types with the ontology's
    (set-union semantics of semantic_kg/base.py:73-76); returns
    (ontology, changed)."""
    discovered = set(discover_entity_types(mentions))
    existing = set(ontology.entity_types)
    merged = existing | discovered
    if merged == existing:
        return ontology, False
    return (
        Ontology(
            entity_types=tuple(sorted(merged)),
            relation_types=ontology.relation_types,
            connections=ontology.connections,
        ),
        True,
    )
