"""Benchmark-contamination: exact known-answer overlap fractions and a
plain-Python reference parity check."""

from pyspark.sql import functions as F

from docs2kg_spark.operators.contamination import contamination_scores, word_ngrams

DOCS = [
    (10, "the quick brown fox jumps over the lazy dog"),
    (11, "a quick brown fox jumps high"),          # shares grams with bench 1
    (12, "totally unrelated content goes here now"),
    (13, "the quick brown fox jumps over the lazy dog"),  # exact dup of bench 1
    (14, "one two"),                               # shorter than n → single sub-gram
]
BENCH = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "alpha beta gamma delta"),
]


def _py_grams(text: str, n: int = 3) -> set:
    toks = text.lower().strip().split()
    if not toks:
        return set()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_known_answers(spark):
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    b = spark.createDataFrame(BENCH, "bench_id int, text string")
    got = {
        (r["doc_id"], r["bench_id"]): (r["shared_grams"], r["contaminated_frac"])
        for r in contamination_scores(d, b).collect()
    }
    want = {}
    for doc_id, dt in DOCS:
        dg = _py_grams(dt)
        for bench_id, bt in BENCH:
            bg = _py_grams(bt)
            shared = len(dg & bg)
            if shared:
                want[(doc_id, bench_id)] = (shared, shared / len(bg))
    assert got == want
    # the exact duplicate is fully contaminated; the unrelated doc absent
    assert got[(13, 1)][1] == 1.0
    assert all(doc != 12 for doc, _ in got)


def test_word_ngrams_short_doc_convention(spark):
    """docs shorter than n tokens yield their single sub-n gram — the
    same convention the green n-gram-Jaccard SQL twin encodes."""
    d = spark.createDataFrame([(1, "one two"), (2, " "), (3, "x")], "doc_id int, text string")
    got = {(r["id"], r["gram"]) for r in word_ngrams(d, "doc_id", "text", 3).collect()}
    assert got == {(1, "one two"), (3, "x")}


def test_contamination_plan_broadcasts_bench(spark):
    """the benchmark gram side must reach the join as a broadcast — no
    document-side shuffle before the hit aggregation."""
    d = spark.createDataFrame(DOCS, "doc_id int, text string")
    b = spark.createDataFrame(BENCH, "bench_id int, text string")
    plan = contamination_scores(d, b)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
