"""Sequence-transition mining, sqrt-temperature mixture weighting, and
boundary-respecting chunking — plain-Python parity plus the invariants
the 100 TB design rests on (partitioning independence, per-shard window
contiguity)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from docs2kg_spark.operators.packing import chunk_examples, pack_documents
from docs2kg_spark.operators.sampling import sqrt_temperature_mixture
from docs2kg_spark.operators.sequences import transition_counts

EVENTS = [
    # (user, ts, id, state) — user 1: a b a b; user 2: a a c; user 3: b (terminal only)
    (1, 10, 1, "a"),
    (1, 20, 2, "b"),
    (1, 30, 3, "a"),
    (1, 40, 4, "b"),
    (2, 10, 5, "a"),
    (2, 20, 6, "a"),
    (2, 30, 7, "c"),
    (3, 10, 8, "b"),
]


def test_transition_counts_match_hand_computed(spark):
    df = spark.createDataFrame(EVENTS, "u int, ts int, id int, s string")
    got = {
        (r.src, r.dst): (r.n, r.prob)
        for r in transition_counts(df, "u", ["ts", "id"], "s").collect()
    }
    # user1: a→b, b→a, a→b; user2: a→a, a→c; user3 contributes nothing
    # src=a totals 4: a→b 2 (0.5), a→a 1 (0.25), a→c 1 (0.25); src=b: b→a 1 (1.0)
    assert got == {
        ("a", "b"): (2, 0.5),
        ("a", "a"): (1, 0.25),
        ("a", "c"): (1, 0.25),
        ("b", "a"): (1, 1.0),
    }


def test_transition_probs_sum_to_one_per_src(spark):
    df = spark.createDataFrame(EVENTS, "u int, ts int, id int, s string").repartition(5)
    out = transition_counts(df, "u", ["ts", "id"], "s")
    sums = {r.src: r.p for r in out.groupBy("src").agg(F.sum("prob").alias("p")).collect()}
    for v in sums.values():
        assert abs(v - 1.0) < 1e-6


def _py_mixture(counts: dict[str, int]):
    s = {g: round(round(math.sqrt(n), 6) * 1_000_000) for g, n in counts.items()}
    mass, n_total = sum(s.values()), sum(counts.values())
    out = {}
    for g, n in counts.items():
        w = round(s[g] / mass, 6)
        out[g] = (n, w, round(min(1.0, s[g] / mass * n_total / n), 6))
    return out


def test_sqrt_mixture_matches_python_and_partitioning(spark):
    rows = [("big",)] * 90 + [("mid",)] * 9 + [("tail",)] * 1
    df = spark.createDataFrame(rows, "src string")
    expect = _py_mixture({"big": 90, "mid": 9, "tail": 1})
    for d in (df, df.repartition(13)):
        got = {
            r.grp: (r.n_docs, r.weight, r.sample_rate)
            for r in sqrt_temperature_mixture(d, "src").collect()
        }
        assert got == expect
    # the tail group is boosted to rate 1 (capped); the head is cut
    assert expect["tail"][2] == 1.0 and expect["big"][2] < 1.0


def test_chunk_examples_invariants(spark):
    rows = [(i, t) for i, t in enumerate([0, 1, 99, 100, 101, 250, 1000])]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int")
    out = chunk_examples(df, "n_tok", budget=100, n_shards=4).collect()
    by_id = {r.doc_id: r for r in out}
    # every example ≥1 window; ceil math; pad math
    for i, t in rows:
        r = by_id[i]
        assert r.n_windows == max(-(-t // 100), 1)
        assert r.pad_tokens == r.n_windows * 100 - t
        assert r.n_tokens == t
    # per shard: win_first ranges are disjoint and contiguous from 0
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.win_first)
        nxt = 0
        for r in rs:
            assert r.win_first == nxt
            nxt += r.n_windows


def test_chunk_examples_repartition_stable(spark):
    rows = [(i, (i * 37) % 900) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int")
    a = sorted(map(tuple, chunk_examples(df, "n_tok", 256, 8).collect()))
    b = sorted(map(tuple, chunk_examples(df.repartition(17), "n_tok", 256, 8).collect()))
    assert a == b


def test_chunk_vs_pack_same_shard_and_order(spark):
    """Both layouts hash/order identically, so a document's shard matches
    across them — the two tables join 1:1 for layout comparisons."""
    rows = [(i, (i * 11) % 300) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id int, n_tok int")
    c = {r.doc_id: r.shard for r in chunk_examples(df, "n_tok", 128, 4).collect()}
    p = {r.doc_id: r.shard for r in pack_documents(df, "n_tok", 128, 4).collect()}
    assert c == p


def test_funnel_hand_computed(spark):
    from docs2kg_spark.operators.sequences import funnel_counts

    # u1 completes A->B->C in order (with noise); u2 does B before A
    # (only A counts); u3 does A,B but C precedes B; u4 has no steps
    rows = [
        ("u1", 1, "A"), ("u1", 2, "X"), ("u1", 3, "B"), ("u1", 4, "C"),
        ("u2", 1, "B"), ("u2", 2, "A"),
        ("u3", 1, "A"), ("u3", 2, "C"), ("u3", 3, "B"),
        ("u4", 1, "X"),
    ]
    df = spark.createDataFrame(rows, "user string, seq long, ev string")
    out = {
        r["step_name"]: r["users"]
        for r in funnel_counts(df, "user", ["seq"], "ev", ["A", "B", "C"]).collect()
    }
    assert out == {"A": 3, "B": 2, "C": 1}


def test_funnel_greedy_is_optimal(spark):
    from docs2kg_spark.operators.sequences import funnel_counts

    # A at t1 and t3, B at t2: greedy matches A@1 then B@2 -> progress 2;
    # a non-greedy matcher that took A@3 would miss B
    rows = [("u", 1, "A"), ("u", 2, "B"), ("u", 3, "A")]
    df = spark.createDataFrame(rows, "user string, seq long, ev string")
    out = {
        r["step_name"]: r["users"]
        for r in funnel_counts(df, "user", ["seq"], "ev", ["A", "B"]).collect()
    }
    assert out == {"A": 1, "B": 1}


def test_conversation_profile_flags_violations(spark):
    from docs2kg_spark.operators.segments import conversation_profile

    rows = [
        # clean conversation: dense idx, alternating roles
        ("c1", 0, "system"), ("c1", 1, "user"), ("c1", 2, "assistant"),
        # dirty: adjacent user-user repeat and an idx gap (1 -> 3)
        ("c2", 0, "user"), ("c2", 1, "user"), ("c2", 3, "assistant"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")
    out = {r["conv_id"]: r.asDict() for r in conversation_profile(df).collect()}
    assert out["c1"]["n_role_repeats"] == 0 and out["c1"]["n_idx_gaps"] == 0
    assert out["c1"]["first_role"] == "system" and out["c1"]["last_role"] == "assistant"
    assert out["c2"]["n_role_repeats"] == 1 and out["c2"]["n_idx_gaps"] == 1
    assert out["c2"]["n_user"] == 2 and out["c2"]["n_assistant"] == 1
