"""PII scrub: known-answer redaction + counts, idempotence, and
DuckDB-parity of the regex dialect subset."""

import duckdb
import pandas as pd

from docs2kg_spark.operators.pii import PII_PATTERNS, scrub_documents

ROWS = [
    (1, "mail me at alice.smith+work@example.co.uk today"),
    (2, "card 4111-1111-1111-1111 or 4111 1111 1111 1111 or 4111111111111111"),
    (3, "ssn 123-45-6789 phone 555-010-4242 and 555.010.4242"),
    (4, "server at 192.168.0.1 and 10.0.0.255"),
    (5, "no pii here, just text with numbers 12 345 and v1.2"),
    (6, ""),
]


def test_scrub_known_answers(spark):
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    got = {r["doc_id"]: r.asDict() for r in scrub_documents(df).collect()}

    assert got[1]["n_email"] == 1 and got[1]["redacted"] == "mail me at <EMAIL> today"
    assert got[2]["n_ccn"] == 3
    assert got[2]["redacted"] == "card <CREDIT_CARD> or <CREDIT_CARD> or <CREDIT_CARD>"
    assert got[3]["n_ssn"] == 1 and got[3]["n_phone"] == 2
    assert got[3]["redacted"] == "ssn <SSN> phone <PHONE> and <PHONE>"
    assert got[4]["n_ipv4"] == 2
    assert got[4]["redacted"] == "server at <IP> and <IP>"
    assert all(got[5][f"n_{c}"] == 0 for c, _, _ in PII_PATTERNS)
    assert got[5]["redacted"] == ROWS[4][1]
    assert got[6]["redacted"] == ""


def test_scrub_idempotent(spark):
    """Redacting already-redacted text is a no-op (replacement tokens
    never re-match any pattern)."""
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    once = scrub_documents(df).select("doc_id", "redacted")
    twice = scrub_documents(once, text_col="redacted").select(
        "doc_id", "redacted"
    )
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_regex_dialect_parity(spark):
    """Every pattern produces identical match counts and identical
    replaced text in Java regex (Spark) and RE2 (DuckDB) on the crafted
    rows — the property the value oracle of pii_scrub depends on."""
    df = spark.createDataFrame(ROWS, "doc_id int, text string")
    spark_rows = {
        r["doc_id"]: r.asDict() for r in scrub_documents(df).collect()
    }
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    for doc_id, text in ROWS:
        red = text
        for cat, pattern, token in PII_PATTERNS:
            n = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pattern]
            ).fetchone()[0]
            assert n == spark_rows[doc_id][f"n_{cat}"], (doc_id, cat)
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pattern, token]
            ).fetchone()[0]
        assert red == spark_rows[doc_id]["redacted"], doc_id
