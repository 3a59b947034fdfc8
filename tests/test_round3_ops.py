"""Round-3 operator additions: bigram-PMI collocations, neighbor-Jaccard
node similarity, label-propagation communities, sliding-context assembly.
Each is checked against a plain-Python reference on a crafted fixture
(the SQL twins get the corpus-level check in test_entry.py)."""

import math
from collections import Counter

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# bigram PMI
# ---------------------------------------------------------------------------


def _py_pmi(texts, min_count, top_n):
    import re

    ws = re.compile(r"[ \t\n\r\f\x0B]+")
    uni, big = Counter(), Counter()
    for t in texts:
        toks = [x for x in ws.split(t.strip().lower()) if x]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_tok = sum(uni.values())
    n_big = sum(big.values())
    out = []
    for (w1, w2), c in big.items():
        if c < min_count:
            continue
        pmi = round(math.log(float(c) * n_tok / uni[w1] * n_tok / uni[w2] / n_big), 6)
        out.append((w1, w2, c, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_n]


def test_bigram_pmi_matches_python_reference(spark):
    from docs2kg_spark.operators.collocations import bigram_pmi

    texts = [
        "new york is a city",
        "new york has a  harbor",  # double space: adjacency must survive
        "a city and a harbor",
        "york new is not new york",
        "",
        "single",
        "  new york  ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.w1, r.w2, r.pair_count, r.pmi)
        for r in bigram_pmi(df, min_count=2, top_n=10).collect()
    ]
    want = _py_pmi(texts, min_count=2, top_n=10)
    assert got == want
    # 'a city' and 'a harbor' tie exactly (2·N²/(4·2·B) each) and the
    # (w1, w2) tie-break orders them; 'new york' survives min_count with
    # all 4 occurrences counted (including across the double space)
    assert [g[:2] for g in got[:2]] == [("a", "city"), ("a", "harbor")]
    assert got[0][3] == got[1][3]
    assert ("new", "york", 4) == got[2][:3]


def test_bigram_pmi_short_docs_contribute_no_pairs(spark):
    from docs2kg_spark.operators.collocations import bigram_pmi

    df = spark.createDataFrame(
        [(0, "only"), (1, ""), (2, "   ")], "doc_id long, text string"
    )
    assert bigram_pmi(df, min_count=1, top_n=10).count() == 0


# ---------------------------------------------------------------------------
# neighbor Jaccard
# ---------------------------------------------------------------------------


def test_neighbor_jaccard_small_graph(spark):
    from docs2kg_spark.operators.graphq import neighbor_jaccard

    # a-{x,y,z}, b-{x,y}, c-{z}; plus a self-loop that must not count
    edges = spark.createDataFrame(
        [
            ("a", "x"), ("a", "y"), ("a", "z"),
            ("b", "x"), ("b", "y"),
            ("c", "z"),
            ("a", "a"),
        ],
        "src string, dst string",
    )
    got = {
        (r.a, r.b): (r.common, r.jaccard)
        for r in neighbor_jaccard(edges).collect()
    }
    # undirected: deg(a)=3, deg(b)=2, deg(c)=1; x: nbrs {a,b}; etc.
    assert got[("a", "b")] == (2, round(2 / (3 + 2 - 2), 6))
    assert got[("a", "c")] == (1, round(1 / (3 + 1 - 1), 6))
    # b and c share no neighbour -> absent, not zero
    assert ("b", "c") not in got
    # neighbourhood pairs through the endpoints themselves:
    # x,y share {a,b}; x,z share {a}; y,z share {a}
    assert got[("x", "y")] == (2, 1.0)
    assert got[("x", "z")][0] == 1


def test_neighbor_jaccard_min_filters(spark):
    from docs2kg_spark.operators.graphq import neighbor_jaccard

    edges = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y"), ("b", "y"), ("c", "y")],
        "src string, dst string",
    )
    allp = neighbor_jaccard(edges)
    assert neighbor_jaccard(edges, min_common=2).count() < allp.count()
    assert (
        neighbor_jaccard(edges, min_sim=0.99).filter(F.col("jaccard") < 0.99).count()
        == 0
    )


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_two_cliques(spark):
    from docs2kg_spark.operators.graphq import label_propagation

    # two 4-cliques joined by a single bridge edge: LPA must settle each
    # clique on its own min label, and the bridge must not merge them
    c1 = [("a1", "a2"), ("a1", "a3"), ("a1", "a4"), ("a2", "a3"), ("a2", "a4"), ("a3", "a4")]
    c2 = [("b1", "b2"), ("b1", "b3"), ("b1", "b4"), ("b2", "b3"), ("b2", "b4"), ("b3", "b4")]
    edges = spark.createDataFrame(c1 + c2 + [("a4", "b1")], "src string, dst string")
    got = {r.node: r.community for r in label_propagation(edges, iters=4).collect()}
    assert {got[n] for n in ("a1", "a2", "a3", "a4")} == {"a1"}
    assert {got[n] for n in ("b1", "b2", "b3", "b4")} == {"b1"}


def test_label_propagation_sync_recurrence_exact(spark):
    """One synchronous round on a path graph, checked against the
    hand-computed recurrence (each node takes the min — by count then
    label — of its neighbours' CURRENT labels)."""
    from docs2kg_spark.operators.graphq import label_propagation

    edges = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n3", "n4")], "src string, dst string"
    )
    got = {r.node: r.community for r in label_propagation(edges, iters=1).collect()}
    # neighbours: n1:{n2} n2:{n1,n3} n3:{n2,n4} n4:{n3}; all counts tie at 1
    assert got == {"n1": "n2", "n2": "n1", "n3": "n2", "n4": "n3"}


# ---------------------------------------------------------------------------
# context assembly
# ---------------------------------------------------------------------------


def test_context_assembly_frames(spark):
    from docs2kg_spark.operators.sequences import context_assembly

    rows = [
        ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "d"), ("u1", 5, "e"),
        ("u2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "user string, seq int, state string")
    got = {
        (r.user, r.seq): r.ctx
        for r in context_assembly(df, "user", ["seq"], "state", k=3).collect()
    }
    assert got[("u1", 1)] == ""           # sequence start: empty, not null
    assert got[("u1", 2)] == "a"
    assert got[("u1", 4)] == "a>b>c"
    assert got[("u1", 5)] == "b>c>d"      # frame slides, oldest drops
    assert got[("u2", 1)] == ""           # keys are independent
