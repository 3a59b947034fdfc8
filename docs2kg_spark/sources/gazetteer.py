"""Gazetteer CSV source.

Reference: entity_list.csv loaded with the *last-comma* split
`pd.read_csv(..., sep=r",(?=[^,]*$)")` (ner_spacy_match.py:43,
semantic_kg/base.py:56) — entity surface text may itself contain commas,
so only the final comma separates `entity` from `entity_type`.

Spark version: read each line as one string column (so no CSV quoting
rules interfere), then split on the last comma with regexp_extract —
JVM-side, no UDF, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_gazetteer_csv(spark: SparkSession, path: str, has_header: bool = True) -> DataFrame:
    """→ entity_list(entity string, entity_type string)."""
    lines = spark.read.text(path)
    if has_header:
        # drop the literal header line rather than N rows (order-safe)
        lines = lines.filter(F.col("value") != "entity,entity_type")
    parsed = lines.select(
        F.regexp_extract("value", r"^(.*),([^,]*)$", 1).alias("entity"),
        F.regexp_extract("value", r"^(.*),([^,]*)$", 2).alias("entity_type"),
    )
    return parsed.filter((F.col("entity") != "") & (F.col("entity_type") != ""))


def gazetteer_to_broadcastable(df: DataFrame) -> tuple[tuple[str, str], ...]:
    """collect the (small) gazetteer for broadcast into extraction UDFs."""
    return tuple((r.entity, r.entity_type) for r in df.collect())
