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
