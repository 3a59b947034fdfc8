"""Randomized-input engine-parity gate for the math-heavy queries.

The driver gate runs fixed tables at two scale factors; integer-scaled
log/moment arithmetic could still hide a rounding boundary that those
particular values never hit.  This test regenerates random documents
and events tables (seeded) and replays the DRIVER compare (row count +
positional schema + order-insensitive name-sorted values) against each
query's DuckDB twin on the SAME data."""

import math
import random

import duckdb
import pandas as pd
import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"  # only used as the memo key / _t fallback

VOCAB = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "the", "a", "of", "to", "and", "in", "is", "it", "spark", "query",
    "join", "merge", "sort", "window", "batch", "stream", "data!", "x9",
]


def _rand_documents(rng, n=160):
    rows = []
    for i in range(n):
        k = rng.randint(0, 40)
        text = " ".join(rng.choice(VOCAB) for _ in range(k))
        rows.append(
            (
                i,
                text,
                rng.choice(["en", "de", "fr"]),
                rng.choice(["s0", "s1", "s2", "s3"]),
                len(text),
            )
        )
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


def _rand_events(rng, n=600):
    rows = []
    for i in range(n):
        # heavy-tailed values incl. outliers; ts over a week
        v = rng.gauss(10, 3) if rng.random() > 0.05 else rng.uniform(-500, 500)
        ts = pd.Timestamp("2025-03-01") + pd.Timedelta(
            seconds=rng.randint(0, 7 * 86400)
        )
        rows.append(
            (
                i,
                ts,
                rng.randint(1, 40),
                rng.choice(["view", "click", "buy", "ship"]),
                round(v, 4),
                None,
            )
        )
    return pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


MATH_QUERIES = [
    "zipf_slope",
    "tokenizer_fertility",
    "source_kl",
    "user_gini",
    "transition_entropy",
    "event_winsorize",
    "event_hour_heatmap",
    "quality_length_corr",
]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    try:  # DuckDB Decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 9)
    except Exception:
        pass
    return v


@pytest.mark.parametrize("seed", [11, 47])
def test_math_queries_match_twins_on_random_tables(spark, seed):
    rng = random.Random(seed)
    docs_pd, ev_pd = _rand_documents(rng), _rand_events(rng)
    docs_df = spark.createDataFrame(docs_pd)
    ev_df = spark.createDataFrame(ev_pd)

    con = duckdb.connect()
    con.register("documents", docs_pd)
    con.register("events", ev_pd)

    orig = Q._t

    def patched(spark, sf_dir, name):
        if name == "documents":
            return docs_df
        if name == "events":
            return ev_df
        return orig(spark, sf_dir, name)

    oracles = Q.ORACLE_SQL
    bad = []
    try:
        Q._t = patched
        for name in MATH_QUERIES:
            df = Q.SPARK_QUERIES[name](spark, SF_DIR)
            scols = df.columns
            srows = sorted(
                tuple(_norm(r[c]) for c in sorted(scols)) for r in df.collect()
            )
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = sorted(
                tuple(_norm(v) for _, v in sorted(zip(ocols, r)))
                for r in res.fetchall()
            )
            if scols != ocols or srows != orows:
                bad.append((name, scols == ocols, len(srows), len(orows)))
    finally:
        Q._t = orig
    assert not bad, f"engine mismatch on random tables (seed {seed}): {bad}"
