"""PII detection + redaction for large-scale training-data pipelines.

Pure JVM-side column expressions (chained ``regexp_replace`` /
``regexp_count`` — whole-stage codegen, no Python in the hot path), so
the operator is a narrow per-row map at any scale: no shuffle, filters
and column pruning push straight through it to the scan.

Cross-engine determinism: every pattern is written in the conservative
regex subset Java's engine (Spark) and RE2 (DuckDB) interpret
identically — character classes, bounded quantifiers, alternation,
non-capturing groups, ASCII ``\\d``/``\\b`` (Java's default ``\\b`` is
ASCII-word-based like RE2's; no Unicode flags on either side) — so the
DuckDB twin in __spark_entry__.oracle_sql() value-checks the exact
redaction output, not just the counts.

Reference parity note: the reference has no PII stage (its pipeline
stops at KG construction); this operator is part of the
training-data-pipeline surface the brief adds on top (alongside dedup /
quality / sampling), mirroring the cleanup role of the reference's
regex chains (Docs2KG digitization cleanup, html_parser.py:124-168).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: emails are redacted before the numeric patterns (an
# address like user123@h.com contains digit runs), and the replacement
# tokens contain no digits/@ so later patterns never re-match earlier
# redactions — which also makes the chain idempotent (tested).
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (category, pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ccn", r"\b(?:\d{4}[- ]){3}\d{4}\b|\b\d{16}\b", "<CREDIT_CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def redact_pii(text: Column | str) -> Column:
    """Replace every PII match with its typed token, in the fixed
    category order above.  One chained regexp_replace expression —
    Catalyst folds it into a single projection."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category match counts over the RAW text (before redaction —
    counts are independent per category, so e.g. an SSN-shaped span
    inside a longer digit run is counted by every pattern it matches)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        cat: F.coalesce(F.regexp_count(c, F.lit(pattern)), F.lit(0)).alias(f"n_{cat}")
        for cat, pattern, _ in PII_PATTERNS
    }


def scrub_documents(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, per-category counts, redacted text) — the full scrub as one
    narrow projection."""
    counts = pii_counts(text_col)
    return documents.select(
        F.col(id_col),
        *[expr for expr in counts.values()],
        redact_pii(text_col).alias("redacted"),
    )
