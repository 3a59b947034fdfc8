"""Round-4 fixes: regression tests for the VERDICT/ADVICE r3 items —
entity-timeline column order, zero-variance guards (event anomalies,
assortativity), k-core fixpoint enforcement + twin unroll sync,
integer-cent backlog revenue, parameterized gram twins, and the winnow
position-capacity precondition."""

import duckdb
import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_assortativity_regular_graph_null_not_throw(spark):
    """A pure cycle is degree-regular: variance 0.  Under ANSI mode the
    unguarded form throws DIVIDE_BY_ZERO; the guarded form must return
    an explicit NULL (matching the twin's NULLIF)."""
    from docs2kg_spark.operators.graphq import degree_assortativity

    cycle = [(str(i), str((i + 1) % 5)) for i in range(5)]
    row = degree_assortativity(_edges(spark, cycle)).collect()[0]
    assert row["m_edges"] == 5
    assert row["assortativity"] is None


def test_assortativity_normal_graph_still_numeric(spark):
    from docs2kg_spark.operators.graphq import degree_assortativity

    star = [("h", x) for x in "abc"] + [("a", "b")]
    row = degree_assortativity(_edges(spark, star)).collect()[0]
    assert row["assortativity"] is not None


def test_event_anomalies_single_hour_type_null_z(spark, tmp_path):
    """An event type observed in exactly one hour has nh=1 → variance
    0: z must be NULL (not DIVIDE_BY_ZERO), the row still ranks, and
    the DuckDB twin agrees row-for-row."""
    import pandas as pd

    from docs2kg_spark.queries import SQL_EVENT_ANOMALIES, q_event_anomalies

    rows = pd.DataFrame(
        {
            "event_id": list(range(7)),
            "user_id": [1] * 7,
            "event_type": ["solo"] * 3 + ["multi"] * 4,
            "ts": pd.to_datetime(
                ["2024-01-01 10:05", "2024-01-01 10:06", "2024-01-01 10:07"]
                + ["2024-01-01 10:00", "2024-01-01 11:00", "2024-01-01 11:01", "2024-01-01 12:00"]
            ),
        }
    )
    pq = str(tmp_path / "events.parquet")
    # Spark cannot read pandas' default nanosecond parquet timestamps
    rows.to_parquet(pq, coerce_timestamps="us", allow_truncated_timestamps=True)
    got = {
        (r["event_type"], r["hour"]): (r["n"], r["z"], r["rnk"])
        for r in q_event_anomalies(spark, str(tmp_path)).collect()
    }
    assert got[("solo", "2024-01-01 10:00:00")][1] is None  # NULL z, no throw
    assert got[("solo", "2024-01-01 10:00:00")][2] == 1
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{pq}'")
    want = {
        (t, h): (n, z, rk)
        for t, h, n, z, rk in con.execute(SQL_EVENT_ANOMALIES).fetchall()
    }
    norm = lambda v: {k: (n, round(z, 6) if z is not None else None, rk) for k, (n, z, rk) in v.items()}
    assert norm(got) == norm(want)


def test_kcore_fixpoint_raises_when_iters_too_small(spark):
    """A long chain hanging off a triangle needs one peel round per
    chain link for k=2: with max_iters too small the old code silently
    returned a non-k-core; now it raises."""
    from docs2kg_spark.operators.graphq import KCORE_MAX_ITERS, k_core

    chain = [(str(i), str(i + 1)) for i in range(6)]
    tri = [("0", "t1"), ("t1", "t2"), ("t2", "0")]
    e = _edges(spark, chain + tri)
    with pytest.raises(RuntimeError, match="fixpoint"):
        k_core(e, k=2, max_iters=2).collect()
    ok = {r["node"] for r in k_core(e, k=2, max_iters=10).collect()}
    assert ok == {"0", "t1", "t2"}
    assert KCORE_MAX_ITERS >= 10  # twin unroll depth derives from this


def test_kcore_twin_unroll_depth_matches_constant():
    from docs2kg_spark.operators.graphq import KCORE_MAX_ITERS
    from docs2kg_spark.queries import _graph_kcore_sql

    sql = _graph_kcore_sql()
    assert f"kc_e{KCORE_MAX_ITERS} " in sql or f"kc_e{KCORE_MAX_ITERS}\n" in sql
    assert f"kc_e{KCORE_MAX_ITERS + 1}" not in sql


def test_winnow_twin_gram_concat_follows_k():
    from docs2kg_spark.queries import _doc_winnow_pairs_sql, _jaccard_leg_sql

    assert "toks[i+3]" in _doc_winnow_pairs_sql(k=4)
    assert "toks[i+3]" not in _doc_winnow_pairs_sql(k=3)
    assert "toks[i+1]" not in _jaccard_leg_sql(n=1)
    assert "toks[i+4]" in _jaccard_leg_sql(n=5)


def test_winnow_position_capacity_enforced(spark, monkeypatch):
    """A doc with >= 2^20 grams corrupts the hash·2^20+pos encoding —
    the precondition must now raise instead of emitting bogus pairs.
    Patch the capacity down so the test doesn't need a million-token
    doc."""
    import docs2kg_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "_WINNOW_POS_BITS", 8)
    docs = spark.createDataFrame(
        [("big", " ".join(f"w{i}" for i in range(40)))], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="position capacity"):
        dd.winnow_fingerprints(docs).collect()
    small = spark.createDataFrame(
        [("ok", "a b c d e f")], "doc_id string, text string"
    )
    assert dd.winnow_fingerprints(small).count() > 0


def test_shipping_backlog_cents_exact(spark):
    """Revenue is integer-cent summed: the output must be exactly
    representable as cents/100 (no float-accumulation residue)."""
    from docs2kg_spark.queries import q_shipping_backlog

    rows = q_shipping_backlog(spark, "/root/testdata/sf0.001").collect()
    assert rows, "expected a non-empty top-10"
    for r in rows:
        cents = round(r["revenue"] * 100)
        assert abs(r["revenue"] - cents / 100) < 1e-9


def test_negative_triples_two_phase_numbering(spark):
    """The two-phase bucketed vocabulary numbering must draw the exact
    same negatives as the old global-ORDER-BY window (the twin's
    semantics): verify against a brute-force recomputation of
    row_number-by-sorted-cand on a multi-bucket vocabulary, and check
    neg_obj != obj."""
    import hashlib

    from docs2kg_spark.operators.relations import negative_triples

    objs = ["alpha", "apple", "beta", "bravo", "zeta", "1num", "Zed", ""]
    rows = [(f"s{i}", "likes", o) for i, o in enumerate(objs)]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["subj"], r["obj"]): r["neg_obj"] for r in negative_triples(t).collect()}
    vocab = sorted(objs)  # idx = 1-based rank in sorted order
    n = len(vocab)
    for s, _, o in rows:
        h = int(hashlib.md5(f"{s}|likes|{o}|neg-v1".encode()).hexdigest()[:8], 16)
        idx = h % n + 1
        cand1 = vocab[idx - 1]
        want = cand1 if cand1 != o else vocab[idx % n]
        assert got[(s, o)] == want, (s, o)
        assert got[(s, o)] != o


def test_vocab_numbering_plan_and_rank(spark):
    """number_by_sorted_rank: (a) the row_number window is PARTITIONED
    (by the bucket column) — no single-reducer vocabulary sort; the
    only un-partitioned window consumes the per-bucket count aggregate;
    (b) idx equals the global 1-based lexicographic rank."""
    import re

    from docs2kg_spark.operators.relations import number_by_sorted_rank

    vals = ["", "a", "aa", "ab", "b", "ba", "zz", "Z", "1", "!"]
    df = spark.createDataFrame([(v,) for v in vals], "cand string")
    numbered = number_by_sorted_rank(df, "cand")
    got = {r["cand"]: r["idx"] for r in numbered.collect()}
    want = {v: i + 1 for i, v in enumerate(sorted(vals))}
    assert got == want
    plan = numbered._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"row_number\(\) windowspecdefinition\(([^)]*?)\)", plan)
    assert specs, "expected a row_number window in the plan"
    for spec in specs:
        assert spec.lstrip().startswith("_b"), (
            "row_number window is not bucket-partitioned: " + spec
        )


def test_entity_timeline_column_order(spark, transcripts_df):
    """The r3 defect: canonical_text must be the SECOND column, matching
    the twin's projection order (driver compare is order-sensitive)."""
    from docs2kg_spark.config import PipelineConfig
    from docs2kg_spark.operators.linking import build_canonical_map
    from docs2kg_spark.operators.mentions import extract_mentions
    from docs2kg_spark.operators.profiling import entity_timeline
    from docs2kg_spark.operators.segments import segment_transcripts

    cfg = PipelineConfig()
    segs = segment_transcripts(transcripts_df)
    m = extract_mentions(segs, spark, cfg)
    cmap, _ = build_canonical_map(m, spark, cfg)
    tl = entity_timeline(m, segs, cmap)
    assert tl.columns == [
        "canonical_id",
        "canonical_text",
        "n_mentions",
        "n_convs",
        "first_turn",
        "last_turn",
    ]
