import re

from pyspark.sql import functions as F

from docs2kg_spark.operators.text import (
    BPE_TOKEN_RE,
    analyze,
    bpe_token_count,
    fingerprint,
    lang_id,
    whitespace_token_count,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0].v


def test_whitespace_token_count(spark):
    assert _one(spark, "a b  c", whitespace_token_count("text")) == 3
    assert _one(spark, "   ", whitespace_token_count("text")) == 0
    assert _one(spark, "", whitespace_token_count("text")) == 0
    assert _one(spark, "one", whitespace_token_count("text")) == 1


def test_bpe_token_count_matches_python_regex(spark):
    texts = ["hello, world! 42x", "", "a1b2", "...", "Ünïcode stuff 123"]
    for t in texts:
        want = len(re.findall(BPE_TOKEN_RE, t))
        assert _one(spark, t, bpe_token_count("text")) == want, t


def test_lang_id(spark):
    assert _one(spark, "the cat and the dog is here", lang_id("text")) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", lang_id("text")) == "de"
    assert _one(spark, "zzz qqq xxx", lang_id("text")) == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, "Hello   World", fingerprint("text"))
    b = _one(spark, " hello world\t", fingerprint("text"))
    c = _one(spark, "hello worlds", fingerprint("text"))
    assert a == b != c


def test_analyze_runs_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = analyze(docs)
    row = out.agg(
        F.min("quality"), F.max("quality"), F.count(F.when(F.col("pred_lang") == "en", 1))
    ).collect()[0]
    assert 0.0 <= row[0] <= row[1] <= 1.0
    assert row[2] > 0


def test_char_entropy_known_values(spark):
    from docs2kg_spark.operators.text import char_entropy

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "AbAb"), (4, ""), (5, None), (6, "abcd")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in char_entropy(docs).collect()}
    # empty / null docs are excluded — no distribution to measure
    assert set(rows) == {1, 2, 3, 6}
    # uniform single char → 0 bits
    assert rows[1].entropy == 0.0 and rows[1].n_alphabet == 1
    # two equiprobable symbols → exactly 1 bit; case-folded so AbAb == abab
    assert rows[2].entropy == 1.0 and rows[3].entropy == 1.0
    # four equiprobable symbols → exactly 2 bits
    assert rows[6].entropy == 2.0 and rows[6].n_alphabet == 4
    assert rows[6].n_chars == 4


def test_char_entropy_matches_float_formula(spark):
    """The integer-scaled pipeline stays within 1e-5 of the plain float
    Shannon entropy on real testdata (6dp per-term quantization only)."""
    import math
    from collections import Counter

    from docs2kg_spark.operators.text import char_entropy

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {r.doc_id: r.entropy for r in char_entropy(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        s = (row.text or "").lower()
        if not s:
            continue
        n = len(s)
        want = -sum(c / n * math.log2(c / n) for c in Counter(s).values())
        assert abs(got[row.doc_id] - want) < 1e-5, row.doc_id


def test_char_entropy_property_random_texts(spark):
    """Property: for random ASCII texts the integer-scaled Spark
    entropy stays within 6dp quantization error of the float formula,
    and bounds hold (0 <= H <= log2(alphabet))."""
    import math
    import random
    from collections import Counter

    from docs2kg_spark.operators.text import char_entropy

    rng = random.Random(7)
    alpha = "abcdefgh XYZ.,!019"
    texts = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 400)))
        for _ in range(60)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in char_entropy(docs).collect()}
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        s = t.lower()
        n = len(s)
        cnt = Counter(s)
        want = -sum(c / n * math.log2(c / n) for c in cnt.values())
        r = got[i]
        assert abs(r.entropy - want) < 1e-5, (i, r.entropy, want)
        assert 0.0 <= r.entropy <= math.log2(max(len(cnt), 2)) + 1e-9
        assert r.n_chars == n and r.n_alphabet == len(cnt)
