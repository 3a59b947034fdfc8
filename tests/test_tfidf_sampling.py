"""Term statistics (TF-IDF, vocabulary) and deterministic resampling
(weighted keep, class balance) — plain-Python parity plus the
partitioning-stability property every resumable sampler must hold."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from docs2kg_spark.operators.sampling import balance_by_class, weighted_keep
from docs2kg_spark.operators.tfidf import doc_tfidf_topk, vocabulary_topn

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, "cat cat cat dog"),
    (4, ""),
]


def _py_tfidf(docs, top_k):
    toks = {i: [t for t in txt.lower().strip().split() if t] for i, txt in docs}
    n = len(docs)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = []
    for i, ts in toks.items():
        tf: dict[str, int] = {}
        for t in ts:
            tf[t] = tf.get(t, 0) + 1
        scored = [
            (t, c, round(c * round(math.log((1 + n) / (1 + df[t])) + 1.0, 6), 6))
            for t, c in tf.items()
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        out.extend((i, t, c, s, r + 1) for r, (t, c, s) in enumerate(scored[:top_k]))
    return sorted(out)


def test_tfidf_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = sorted(
        (r.id, r.tok, r.tf, r.score, r.rnk)
        for r in doc_tfidf_topk(df, top_k=3).collect()
    )
    assert got == _py_tfidf(DOCS, 3)


def test_vocabulary_topn_ties_break_on_token(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    rows = vocabulary_topn(df, top_n=3).collect()
    counts = {r.tok: r.n for r in rows}
    # cat 4, the 3, dog 2, sat 2 → the n=2 tie admits only 'dog' (< 'sat')
    assert counts == {"cat": 4, "the": 3, "dog": 2}


def _bucket(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:4], 16)


def test_weighted_keep_extremes_and_exactness(spark):
    df = spark.createDataFrame(
        [(i, 0.0) for i in range(50)] + [(i, 1.0) for i in range(50, 100)],
        "doc_id int, w double",
    )
    kept = weighted_keep(df, "doc_id", "w").collect()
    assert {r.doc_id for r in kept} == set(range(50, 100))  # p=0 none, p=1 all

    mid = spark.createDataFrame([(i, 0.25) for i in range(400)], "doc_id int, w double")
    got = {r.doc_id for r in weighted_keep(mid, "doc_id", "w").collect()}
    want = {i for i in range(400) if _bucket(i, "resample-v1") < int(0.25 * 65536)}
    assert got == want


def test_weighted_keep_stable_under_repartition(spark):
    df = spark.createDataFrame([(i, 0.5) for i in range(300)], "doc_id int, w double")
    a = {r.doc_id for r in weighted_keep(df, "doc_id", "w").collect()}
    b = {r.doc_id for r in weighted_keep(df.repartition(7), "doc_id", "w").collect()}
    assert a == b


def test_balance_by_class_downsamples_to_min(spark):
    rows = [(i, "big") for i in range(2000)] + [(i + 2000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id int, label string")
    kept = balance_by_class(df, "label", "doc_id").collect()
    by_class: dict[str, int] = {}
    for r in kept:
        by_class[r.label] = by_class.get(r.label, 0) + 1
    # exact per-row predicate: bucket * class_n < 65536 * min_n
    assert by_class["small"] == sum(
        1 for i in range(100) if _bucket(i + 2000, "balance-v1") * 100 < 65536 * 100
    )
    assert by_class["big"] == sum(
        1 for i in range(2000) if _bucket(i, "balance-v1") * 2000 < 65536 * 100
    )
    # the hot class lands near the target with hash noise, never above 2x
    assert 50 <= by_class["big"] <= 200


def test_balance_by_class_explicit_target(spark):
    rows = [(i, "x") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id int, label string")
    kept = balance_by_class(df, "label", "doc_id", target=250).collect()
    want = sum(1 for i in range(1000) if _bucket(i, "balance-v1") * 1000 < 65536 * 250)
    assert len(kept) == want
