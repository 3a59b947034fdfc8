"""Label sanitization for graph node labels.

Reference: Neo4jTransformer.sanitize_label (utils/neo4j_loader.py:411-433):
- spaces and hyphens → underscores, uppercase;
- leading digits (and the underscores among them) rotate to the end,
  unless the label is all digits/underscores.

Implemented both as a pure-Python function (oracle/tests) and as a
JVM-side Column expression (regexp/translate — stays in whole-stage
codegen; no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sanitize_label_py(label: str) -> str:
    sanitized = label.replace(" ", "_").replace("-", "_").upper()
    if sanitized and sanitized[0].isdigit():
        i = 0
        while i < len(sanitized) and (sanitized[i].isdigit() or sanitized[i] == "_"):
            i += 1
        if i < len(sanitized):
            return sanitized[i:] + sanitized[:i]
        return sanitized
    return sanitized


def sanitize_label_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.translate(c, " -", "__"))
    # rotate leading [0-9_]+ to the end only when a non-digit tail exists
    rotated = F.regexp_replace(up, r"^([0-9][0-9_]*)(.*[^0-9_].*)$", r"$2$1")
    return rotated
