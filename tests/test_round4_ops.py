"""Round-4 batch-2 operators: bounded harmonic centrality, KWIC
concordance, and the composite Gopher/C4 quality filter — unit checks
against hand-computed expectations on crafted fixtures (the oracle
twins cover the corpus-scale parity; these pin the semantics)."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


# ---------------------------------------------------------------------------
# harmonic centrality
# ---------------------------------------------------------------------------


def test_harmonic_path_graph(spark):
    """Path a-b-c-d: distances are hand-enumerable.
    a: d1={b} d2={c} d3={d} → 6+3+2 = 11
    b: d1={a,c} d2={d}      → 12+3  = 15  (symmetric for c)
    """
    from docs2kg_spark.operators.graphq import harmonic_centrality

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["node"]: r for r in harmonic_centrality(e).collect()}
    assert (got["a"]["n1"], got["a"]["n2"], got["a"]["n3"]) == (1, 1, 1)
    assert got["a"]["harmonic6"] == 11
    assert got["b"]["harmonic6"] == 15 and got["c"]["harmonic6"] == 15
    assert got["d"]["harmonic6"] == 11


def test_harmonic_direction_ignored_and_dups_collapsed(spark):
    """The graph is undirected: reversed and duplicated edges change
    nothing; self-loops are dropped."""
    from docs2kg_spark.operators.graphq import harmonic_centrality

    base = harmonic_centrality(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    noisy = harmonic_centrality(
        _edges(
            spark,
            [("a", "b"), ("b", "a"), ("b", "c"), ("b", "c"), ("a", "a")],
        )
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, noisy))


def test_harmonic_triangle_all_distance_one(spark):
    from docs2kg_spark.operators.graphq import harmonic_centrality

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    for r in harmonic_centrality(e).collect():
        assert (r["n1"], r["n2"], r["n3"], r["harmonic6"]) == (2, 0, 0, 12)


def test_harmonic_scale_derived_from_depth(spark):
    """max_hops=2 → scale lcm(1,2)=2, column harmonic2 (the k-vs-twin
    drift class from ADVICE r3 — the scale factor cannot be hardcoded)."""
    from docs2kg_spark.operators.graphq import harmonic_centrality

    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    df = harmonic_centrality(e, max_hops=2)
    assert "harmonic2" in df.columns and "n3" not in df.columns
    got = {r["node"]: r["harmonic2"] for r in df.collect()}
    assert got["a"] == 2 * 1 + 1 * 1  # d1={b}, d2={c}


# ---------------------------------------------------------------------------
# KWIC contexts
# ---------------------------------------------------------------------------


def _kwic(spark, text, mentions, window=24):
    from docs2kg_spark.operators.profiling import kwic_contexts

    segs = spark.createDataFrame(
        [("c1", "s1", text)], "conv_id string, seg_id string, text string"
    )
    m = spark.createDataFrame(
        [("c1", "s1", s, e, surf, "Person") for s, e, surf in mentions],
        "conv_id string, seg_id string, start int, end int, text string, label string",
    )
    return kwic_contexts(m, segs, window=window).collect()


def test_kwic_mid_string_window(spark):
    text = "0123456789abcdefghij KEY tail text here"
    # 'key' at lowered offsets 21..24 (end exclusive)
    rows = _kwic(spark, text, [(21, 24, "key")], window=5)
    assert rows[0]["left_ctx"] == "ghij " and rows[0]["right_ctx"] == " tail"
    assert rows[0]["surface"] == "key"


def test_kwic_start_of_text_clamps(spark):
    rows = _kwic(spark, "Key at start", [(0, 3, "key")], window=8)
    assert rows[0]["left_ctx"] == "" and rows[0]["right_ctx"] == " at star"


def test_kwic_end_of_text_truncates(spark):
    rows = _kwic(spark, "ends with key", [(10, 13, "key")], window=8)
    assert rows[0]["left_ctx"] == "ds with " and rows[0]["right_ctx"] == ""


def test_kwic_slices_lowered_text(spark):
    """Offsets index lower(text); contexts must come from the lowered
    string so mixed-case source can never misalign or leak case."""
    rows = _kwic(spark, "AAA key BBB", [(4, 7, "key")], window=4)
    assert rows[0]["left_ctx"] == "aaa " and rows[0]["right_ctx"] == " bbb"


# ---------------------------------------------------------------------------
# composite quality filter
# ---------------------------------------------------------------------------


def _filter_rows(spark, texts):
    from docs2kg_spark.operators.quality import gopher_filter

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r["doc_id"]: r for r in gopher_filter(docs).collect()}


GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs "
    "off to the woods where an owl is watching all of this in quiet wonder"
)


def test_filter_good_doc_kept(spark):
    from docs2kg_spark.operators.quality import R_SHORT

    got = _filter_rows(spark, [GOOD])[0]
    assert got["reasons"] == 0 and got["kept"] == 1
    assert got["n_words"] > 20


def test_filter_short_doc(spark):
    from docs2kg_spark.operators.quality import R_SHORT

    got = _filter_rows(spark, ["just five words right here"])[0]
    assert got["reasons"] & R_SHORT and got["kept"] == 0


def test_filter_top_word_dominates(spark):
    from docs2kg_spark.operators.quality import R_TOPWORD

    # 30 words, 'spam' 10 times = 33% > 20%
    text = " ".join(["spam"] * 10 + GOOD.split()[:20])
    got = _filter_rows(spark, [text])[0]
    assert got["reasons"] & R_TOPWORD


def test_filter_duplicate_bigrams(spark):
    from docs2kg_spark.operators.quality import R_DUPGRAM

    text = " ".join(["tick tock"] * 15)  # every bigram repeats
    got = _filter_rows(spark, [text])[0]
    assert got["reasons"] & R_DUPGRAM


def test_filter_no_stopwords(spark):
    from docs2kg_spark.operators.quality import R_LOWSTOP

    text = " ".join(f"w{i}" for i in range(40))
    got = _filter_rows(spark, [text])[0]
    assert got["reasons"] & R_LOWSTOP


def test_filter_empty_doc_only_short(spark):
    from docs2kg_spark.operators.quality import R_SHORT

    got = _filter_rows(spark, ["   "])[0]
    assert got["n_words"] == 0
    assert got["reasons"] == R_SHORT and got["kept"] == 0


def test_filter_mean_word_len(spark):
    from docs2kg_spark.operators.quality import R_WORDLEN

    # 25 single-char words → mean 1 < 3
    text = " ".join(["a b c d e"] * 5)
    got = _filter_rows(spark, [text])[0]
    assert got["reasons"] & R_WORDLEN


# ---------------------------------------------------------------------------
# MinHash estimator audit
# ---------------------------------------------------------------------------


def test_estimator_audit_exact_counts_and_candidate_parity(spark):
    """On a crafted corpus: (1) the audit's candidate set equals the
    production near-dup query's candidate superset (same banding), and
    (2) n_inter/n_union are the EXACT char-5-shingle counts, verified
    against Python sets; identical docs must show n_agree == 32."""
    from docs2kg_spark.operators.dedup import (
        minhash_estimator_audit,
        minhash_near_dup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical → J=1, must be a candidate with n_agree=32
            (3, base.replace("lazy", "sleepy")),  # near-dup
            (4, "completely unrelated text about spark physical plans " * 8),
        ],
        "doc_id long, text string",
    )
    rows = {(r["a"], r["b"]): r for r in minhash_estimator_audit(docs).collect()}
    assert (1, 2) in rows
    r12 = rows[(1, 2)]
    assert r12["n_agree"] == 32 and r12["n_inter"] == r12["n_union"]

    def sh(s):
        s = s.lower()
        return {s[i : i + 5] for i in range(len(s) - 4)} if len(s) > 5 else {s}

    texts = {1: base, 2: base, 3: base.replace("lazy", "sleepy")}
    for (a, b), r in rows.items():
        if a in texts and b in texts:
            sa, sb = sh(texts[a]), sh(texts[b])
            assert r["n_inter"] == len(sa & sb), (a, b)
            assert r["n_union"] == len(sa | sb), (a, b)
            # the 32-perm estimate tracks truth within binomial noise
            assert abs(r["n_agree"] / 32 - r["n_inter"] / r["n_union"]) < 0.35

    # every pair the production query keeps is a banded candidate here
    kept = {(r["a"], r["b"]) for r in minhash_near_dup_pairs(docs).collect()}
    assert kept <= set(rows)
