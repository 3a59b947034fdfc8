"""Round-4 batch-18: PPJoin exact set-similarity join, entity
salience, Flesch readability, priority sampling.  Twin parity is
covered by the gate; these pin semantics on crafted inputs."""

import hashlib
import random

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _shingles(txt):
    import re

    w = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _brute_pairs(docs, t_pct):
    """Reference: exact all-pairs 3-shingle-set Jaccard at threshold."""
    toks = {i: _shingles(txt) for i, txt in docs}
    out = set()
    ids = sorted(toks)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not toks[a] or not toks[b]:
                continue
            inter = len(toks[a] & toks[b])
            union = len(toks[a] | toks[b])
            if inter * 100 >= t_pct * union:
                out.add((a, b, inter, len(toks[a]), len(toks[b])))
    return out


def test_ppjoin_equals_brute_force_random(spark):
    """The exactness theorem: prefix filtering loses no qualifying
    pair.  Seeded random corpus with planted near-dups."""
    from docs2kg_spark.operators.dedup import ppjoin_pairs

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(40):
        n = rng.randint(4, 14)
        docs.append((i, " ".join(rng.sample(vocab, n))))
    # planted near-dups: shared word SEQUENCE (shingles match on order)
    for j, base in enumerate((40, 42, 44)):
        words = rng.sample(vocab, 10)
        docs.append((base, " ".join(words)))
        docs.append((base + 1, " ".join(words[: 9 - j] + rng.sample(vocab, j + 1))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["a"], r["b"], r["inter"], r["na"], r["nb"])
        for r in ppjoin_pairs(df, threshold_pct=50).collect()
    }
    assert got == _brute_pairs(docs, 50)
    assert any(a >= 40 for a, *_ in got)  # planted pairs actually found


def test_ppjoin_threshold_is_integer_exact(spark):
    """A pair at exactly J = 0.5 (inter=2, union=4 shingles) must be
    INCLUDED (>=, not >) — the integer test has no float wobble —
    and a pair just under (1/3) is excluded."""
    from docs2kg_spark.operators.dedup import ppjoin_pairs

    # {a b c, b c d} vs {a b c, b c d, c d e, d e f}: inter 2, union 4
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d e f")], "doc_id long, text string"
    )
    rows = ppjoin_pairs(df, threshold_pct=50).collect()
    assert len(rows) == 1 and rows[0]["inter"] == 2 and rows[0]["jacc"] == 0.5
    # {a b c, b c d} vs {a b c, b c x}: inter 1, union 3 -> excluded
    df2 = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x")], "doc_id long, text string"
    )
    assert ppjoin_pairs(df2, threshold_pct=50).count() == 0


def test_flesch_exact_counts(spark):
    """Crafted doc: known word/sentence/vowel-run counts → exact num6."""
    orig = Q._t
    df = spark.createDataFrame(
        [(0, "The cat sat. The dog ran!", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    try:
        Q._t = lambda spark, sf_dir, name: df if name == "documents" else orig(spark, sf_dir, name)
        r = Q.q_flesch_readability(spark, SF_DIR).collect()[0]
    finally:
        Q._t = orig
    # words: The cat sat The dog ran = 6; sentences: . ! = 2
    # vowel runs in lowercase: e,a,a,e,o,a = 6
    assert (r["w"], r["s"], r["y"]) == (6, 2, 6)
    num6 = 206835 * 2 * 6 - 1015 * 36 - 84600 * 6 * 2
    assert r["num6"] == num6
    assert r["band"] == ("easy" if num6 >= 60000 * 12 else "standard")


def test_priority_sample_deterministic_and_exact(spark):
    """Priorities recompute bit-for-bit from md5 in plain Python; the
    result is the top-20 by that integer priority."""
    rows = Q.q_priority_sample(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        h = int(hashlib.md5(f"psample-v1|{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert r["h32"] == h
        assert r["pri"] == r["weight"] * 4294967296 // (h + 1)
    pris = [(r["pri"], -r["doc_id"]) for r in rows]
    assert pris == sorted(pris, reverse=True)


def test_entity_salience_rank_semantics(spark):
    """Per conversation: ranks are 1..k (k<=3), ordered by the exact
    integer salience with canonical_id tie-break."""
    rows = Q.q_kg_entity_salience(spark, SF_DIR).collect()
    assert rows, "salience query returned nothing at sf0.001"
    per_conv = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append(r)
    for rs in per_conv.values():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        keys = [
            (-(r["n_mentions"] * 1000000 // (1 + r["first_turn"])), r["canonical_id"])
            for r in rs
        ]
        assert keys == sorted(keys)
