"""Repetition-signal operator (operators/quality.py) vs hand-computed
values and a plain-Python reference."""

import pytest

from docs2kg_spark.operators.quality import repetition_signals


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}


def _py_signals(text):
    words = [w for w in text.strip().lower().split() if w]
    n = len(words)
    out = {"n_words": n}
    if n:
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        out["top_word_frac"] = round(max(counts.values()) / n, 6)
        out["mean_word_len"] = round(sum(map(len, words)) / n, 6)
        syms = sum(text.count(c) for c in "#…")
        out["symbol_word_ratio"] = round(syms / n, 6)
    grams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    if grams:
        out["dup_2gram_frac"] = round(1.0 - len(set(grams)) / len(grams), 6)
    lines = [l for l in text.split("\n") if l.strip()]
    if lines:
        bullets = sum(1 for l in lines if l.lstrip()[:1] in "-*•")
        out["bullet_line_frac"] = round(bullets / len(lines), 6)
    return out


def test_hand_computed(spark):
    got = _run(spark, ["the cat the dog the bird"])
    r = got[0]
    assert r["n_words"] == 6
    assert r["top_word_frac"] == pytest.approx(3 / 6)
    # 2-grams: "the cat","cat the","the dog","dog the","the bird" — all distinct
    assert r["dup_2gram_frac"] == pytest.approx(0.0)
    assert r["mean_word_len"] == pytest.approx((3 + 3 + 3 + 3 + 3 + 4) / 6)


def test_repeated_phrase(spark):
    got = _run(spark, ["buy now buy now buy now"])
    r = got[0]
    assert r["top_word_frac"] == pytest.approx(0.5)
    # grams: "buy now" x3, "now buy" x2 → 2 distinct of 5
    assert r["dup_2gram_frac"] == pytest.approx(1 - 2 / 5)


def test_bullets_symbols_and_empty(spark):
    texts = [
        "- item one\n* item two\nplain line\n  • indented bullet",
        "# header … with # symbols",
        "",
        "   ",
        "one",
    ]
    got = _run(spark, texts)
    assert got[0]["bullet_line_frac"] == pytest.approx(3 / 4)
    # words: ['#','header','…','with','#','symbols'] → 3 symbols / 6 words
    assert got[1]["symbol_word_ratio"] == pytest.approx(3 / 6)
    # empty / whitespace-only: no words → null ratios, no crash
    assert got[2]["n_words"] == 0 and got[2]["top_word_frac"] is None
    assert got[3]["n_words"] == 0 and got[3]["mean_word_len"] is None
    # single word: no 2-grams → null dup_2gram_frac
    assert got[4]["n_words"] == 1 and got[4]["dup_2gram_frac"] is None
    assert got[4]["top_word_frac"] == pytest.approx(1.0)


def test_matches_python_reference_on_varied_texts(spark):
    texts = [
        "a a a b b c",
        "lorem ipsum dolor sit amet lorem ipsum dolor",
        "x\ny\nz",
        "tab\tseparated   words and  runs",
        "mixed CASE Mixed case MIXED",
        "- a\n- a\n- a",
        "…#…# four words here now",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        ref = _py_signals(t)
        for k, v in ref.items():
            assert got[i][k] == pytest.approx(v, abs=1e-9), (i, k, t)
