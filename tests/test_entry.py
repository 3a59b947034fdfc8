"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() twin via DuckDB
(row count + sorted-values equality)."""

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
    assert sorted(map(str.lower, cols)) == sorted(map(str.lower, df.columns)), (
        f"{name}: column mismatch {cols} vs {df.columns}"
    )
    got = _rows_set(spark_rows, df.columns)
    want = _rows_set(duck_rows, cols)
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    assert got == want, f"{name}: value mismatch; first diff: " + str(
        next((a, b) for a, b in zip(got, want) if a != b)
    )
