"""BPE merge learning vs a plain-Python reference — pins the greedy
left→right application fold, the (count DESC, pair ASC) winner total
order, and corpus-pass economy (the corpus is scanned once; iterations
run on the vocabulary)."""

from __future__ import annotations

import re
from collections import Counter

from docs2kg_spark.operators.bpe import bpe_learn, bpe_pair_stats

WS = re.compile(r"[ \t\n\r\f\x0B]+")


def _py_bpe(texts: list[str], n_merges: int):
    vocab = Counter()
    for t in texts:
        vocab.update(w for w in WS.split(t.strip().lower()) if w)
    syms = {w: [c for c in w] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # count DESC, pair ASC — the operator's total order
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w in syms:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wider wide wide wide",
    "low newer wider lowest",
]


def test_bpe_learn_matches_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id int, text string")
    merges, vocab = bpe_learn(df, n_merges=6)
    py_merges, py_syms, py_vocab = _py_bpe(TEXTS, 6)
    assert merges == py_merges
    got = {r.word: (r["count"], list(r.syms)) for r in vocab.collect()}
    assert got == {w: (py_vocab[w], py_syms[w]) for w in py_syms}


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' under merge (a,a) → [aa, aa]; 'aaa' → [aa, a] — the
    left→right greedy fold, not maximal matching."""
    df = spark.createDataFrame([(1, "aaaa aaa aaaa aaaa")], "doc_id int, text string")
    merges, vocab = bpe_learn(df, n_merges=1)
    assert merges == [("a", "a")]
    got = {r.word: list(r.syms) for r in vocab.collect()}
    assert got == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"]}


def test_bpe_early_stop_when_fully_merged(spark):
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id int, text string")
    merges, vocab = bpe_learn(df, n_merges=10)
    assert merges == [("a", "b")]  # after one merge no pairs remain
    assert [list(r.syms) for r in vocab.collect()] == [["ab"]]


def test_bpe_learn_partitioning_independent(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS * 3)],
                               "doc_id int, text string")
    m1, _ = bpe_learn(df, n_merges=4)
    m2, _ = bpe_learn(df.repartition(13), n_merges=4)
    assert m1 == m2


def test_bpe_pair_stats_total_order(spark):
    df = spark.createDataFrame([(1, "ab ab ba xy")], "doc_id int, text string")
    rows = [(r.sym_a, r.sym_b, r.pair_count) for r in bpe_pair_stats(df).collect()]
    assert rows == [("a", "b", 2), ("b", "a", 1), ("x", "y", 1)]
