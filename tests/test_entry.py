"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() twin via DuckDB.

Compare semantics replicate the driver exactly (VERDICT r3 item 2):
row count + POSITIONAL column-name schema + order-insensitive equality
of name-sorted row tuples.  A query whose values match but whose
column ORDER differs from its twin (the kg_entity_timeline r3 defect)
fails here, just as it would fail the driver's schema gate."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _rows_set(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(_norm(d[c]) for c in sorted(cols)))
    return sorted(out)


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"subj", "pred", "obj", "n_cooccur"} <= set(df.columns)


def test_column_order_matches_twin_all_queries(spark, duck):
    """Meta-test (VERDICT r3 item 1): for EVERY oracled query, the Spark
    DataFrame's column list must equal the twin's projected column list
    POSITIONALLY.  Uses DuckDB DESCRIBE (plans the SQL, never runs it)
    and Spark plan analysis (df.columns triggers no job), so this covers
    all 101 queries in seconds and makes column-order drift — invisible
    to value-set comparison — un-regressable."""
    oracles = entry_mod.oracle_sql()
    bad = []
    for name, q in sorted(entry_mod.queries().items()):
        sql = oracles.get(name)
        if sql is None:
            continue
        twin_cols = [r[0].lower() for r in duck.execute(f"DESCRIBE {sql}").fetchall()]
        spark_cols = [c.lower() for c in q(spark, SF_DIR).columns]
        if spark_cols != twin_cols:
            bad.append((name, spark_cols, twin_cols))
    assert not bad, "column order/name drift vs twins: " + "; ".join(
        f"{n}: spark={s} twin={t}" for n, s, t in bad
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    spark_rows = df.collect()
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract: must run and return a stable schema
        assert df.columns
        return
    res = duck.execute(sql)
    cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    # Positional, like the driver's schema_match — NOT a name-sorted set
    # compare (that hid the kg_entity_timeline column-order defect in r3).
    assert [c.lower() for c in cols] == [c.lower() for c in df.columns], (
        f"{name}: column order/name mismatch {cols} vs {df.columns}"
    )
    got = _rows_set(spark_rows, df.columns)
    want = _rows_set(duck_rows, cols)
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    assert got == want, f"{name}: value mismatch; first diff: " + str(
        next((a, b) for a, b in zip(got, want) if a != b)
    )
