"""Profiling operators (key skew, exact length quantiles) and the
unigram-logprob quality score — plain-Python parity plus the plan-shape
claims the 100 TB design rests on (TakeOrdered top-N, no global window
over the counts table)."""

from __future__ import annotations

import math

from docs2kg_spark.operators.profiling import key_skew_profile, length_quantiles
from docs2kg_spark.operators.tfidf import doc_unigram_logprob

ROWS = (
    [("a", i) for i in range(6)]
    + [("b", i) for i in range(3)]
    + [("c", 0)]
    + [(None, 0)]  # null keys never route to a shuffle partition
)


def test_key_skew_profile_counts_and_shares(spark):
    df = spark.createDataFrame(ROWS, "k string, v int")
    got = [(r.key, r.n, r.share, r.rnk) for r in key_skew_profile(df, "k").collect()]
    # total = 10 non-null rows
    assert sorted(got) == [
        ("a", 6, 0.6, 1),
        ("b", 3, 0.3, 2),
        ("c", 1, 0.1, 3),
    ]


def test_key_skew_profile_top_n_cut_is_total_order(spark):
    # two keys tie at n=1: the key string breaks the tie, so top_n=2 is
    # deterministic under any partitioning
    df = spark.createDataFrame(
        [("z", 1), ("y", 1), ("x", 1)], "k string, v int"
    ).repartition(7)
    got = [(r.key, r.rnk) for r in key_skew_profile(df, "k", top_n=2).collect()]
    assert sorted(got) == [("x", 1), ("y", 2)]


def test_key_skew_profile_plan_is_take_ordered(spark):
    df = spark.createDataFrame(ROWS, "k string, v int")
    plan = key_skew_profile(df, "k")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition local top-N


def _py_percentile(vals: list[int], q: float) -> float:
    """Type-7 (linear interpolation) percentile — what both engines use."""
    s = sorted(vals)
    pos = q * (len(s) - 1)
    lo, frac = int(math.floor(pos)), pos - math.floor(pos)
    hi = min(lo + 1, len(s) - 1)
    return round(s[lo] + frac * (s[hi] - s[lo]), 6)


def test_length_quantiles_match_python(spark):
    docs = [("s1", "x" * n) for n in (1, 5, 9, 20, 100)] + [
        ("s2", "y" * n) for n in (3, 4)
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {r.grp: (r.n_docs, r.p50, r.p90, r.p99) for r in
           length_quantiles(df, "source", "text").collect()}
    l1 = [1, 5, 9, 20, 100]
    assert got["s1"] == (
        5,
        _py_percentile(l1, 0.5),
        _py_percentile(l1, 0.9),
        _py_percentile(l1, 0.99),
    )
    assert got["s2"] == (2, 3.5, _py_percentile([3, 4], 0.9), _py_percentile([3, 4], 0.99))


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat cat cat dog"),
    (4, ""),  # zero tokens: no probability mass, absent from output
]


def _py_logprob(docs):
    toks = {i: [t for t in txt.lower().strip().split() if t] for i, txt in docs}
    vocab: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            vocab[t] = vocab.get(t, 0) + 1
    total = sum(vocab.values())
    lp_i = {t: round(round(math.log(n / total), 6) * 1_000_000) for t, n in vocab.items()}
    out = {}
    for i, ts in toks.items():
        if not ts:
            continue
        out[i] = (len(ts), round(sum(lp_i[t] for t in ts) / len(ts) / 1_000_000.0, 6))
    return out


def test_doc_unigram_logprob_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r.id: (r.n_tokens, r.avg_logprob) for r in doc_unigram_logprob(df).collect()}
    assert got == _py_logprob(DOCS)


def test_doc_unigram_logprob_partitioning_independent(spark):
    """Integer-scaled logprobs make the per-doc sum associative: the
    result must be bit-identical under any partitioning."""
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    a = sorted(map(tuple, doc_unigram_logprob(df).collect()))
    b = sorted(map(tuple, doc_unigram_logprob(df.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# interpolated-bigram LM scoring (operators/tfidf.py)
# ---------------------------------------------------------------------------


def _py_bigram_logprob(docs):
    from docs2kg_spark.operators.tfidf import BIGRAM_LAMBDA, BIGRAM_LAMBDA2

    toks = {i: [t for t in txt.lower().strip().split() if t] for i, txt in docs}
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for p in zip(ts, ts[1:]):
            big[p] = big.get(p, 0) + 1
    n_tok = sum(uni.values())
    lp_i = {
        p: round(
            round(
                math.log(
                    BIGRAM_LAMBDA * c / uni[p[0]] + BIGRAM_LAMBDA2 * uni[p[1]] / n_tok
                ),
                6,
            )
            * 1_000_000
        )
        for p, c in big.items()
    }
    out = {}
    for i, ts in toks.items():
        ps = list(zip(ts, ts[1:]))
        if not ps:
            continue
        out[i] = (
            len(ps),
            round(sum(lp_i[p] for p in ps) / len(ps) / 1_000_000.0, 6),
        )
    return out


def test_doc_bigram_logprob_matches_python(spark):
    from docs2kg_spark.operators.tfidf import doc_bigram_logprob

    docs = DOCS + [(5, "solo")]  # 1-token doc: feeds the LM, absent from output
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.id: (r.n_bigrams, r.avg_logprob) for r in doc_bigram_logprob(df).collect()}
    want = _py_bigram_logprob(docs)
    assert got == want
    assert 4 not in got and 5 not in got  # <2-token docs contribute no score


def test_doc_bigram_logprob_partitioning_independent(spark):
    from docs2kg_spark.operators.tfidf import doc_bigram_logprob

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    a = sorted(map(tuple, doc_bigram_logprob(df).collect()))
    b = sorted(map(tuple, doc_bigram_logprob(df.repartition(13)).collect()))
    assert a == b


def test_bigram_beats_unigram_on_shuffled_salad(spark):
    """The discriminative claim in the docstring: a doc made of common
    words in a nonsense ORDER scores near-mode under the unigram model
    but far from a fluent doc under the bigram model."""
    fluent = "the cat sat on the mat " * 10
    salad = "mat the on sat the cat " * 10
    df = spark.createDataFrame(
        [(1, fluent), (2, salad)], "doc_id int, text string"
    )
    from docs2kg_spark.operators.tfidf import doc_bigram_logprob

    uni = {r.id: r.avg_logprob for r in doc_unigram_logprob(df).collect()}
    big = {r.id: r.avg_logprob for r in doc_bigram_logprob(df).collect()}
    # identical bags of words → identical unigram scores
    assert uni[1] == uni[2]
    # but the bigram model separates them
    assert big[1] > big[2]


# ---------------------------------------------------------------------------
# entity timeline (operators/profiling.py)
# ---------------------------------------------------------------------------


def test_entity_timeline_small_fixture(spark):
    from docs2kg_spark.operators.profiling import entity_timeline

    mentions = spark.createDataFrame(
        [
            ("c1", "s1", "alice", "Person"),
            ("c1", "s2", "alyce", "Person"),
            ("c2", "s3", "alice", "Person"),
            ("c2", "s3", "acme", "Organization"),
        ],
        "conv_id string, seg_id string, text string, label string",
    )
    segments = spark.createDataFrame(
        [("s1", 0), ("s2", 3), ("s3", 1)], "seg_id string, seg_idx int"
    )
    cmap = spark.createDataFrame(
        [
            ("n1", "alice", "Person", "n1"),
            ("n2", "alyce", "Person", "n1"),  # variant folded into n1
            ("n3", "acme", "Organization", "n3"),
        ],
        "node_id string, text string, label string, canonical_id string",
    )
    got = {
        r.canonical_id: (r.canonical_text, r.n_mentions, r.n_convs, r.first_turn, r.last_turn)
        for r in entity_timeline(mentions, segments, cmap).collect()
    }
    # n1 aggregates BOTH surfaces (alice + alyce) across both conversations
    assert got == {
        "n1": ("alice", 3, 2, 0, 3),
        "n3": ("acme", 1, 1, 1, 1),
    }
