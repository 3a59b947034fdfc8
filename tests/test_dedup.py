import duckdb
from pyspark.sql import functions as F

from docs2kg_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    exact_duplicates,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id bigint, text string")


def test_exact_dedup_normalization(spark):
    docs = _docs(spark, ["Hello  World", "hello world", "HELLO\tWORLD ", "different"])
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1 and groups[0].n_docs == 3 and groups[0].keep_id == 0
    kept = exact_dedup(docs)
    assert kept.count() == 2
    assert {r.doc_id for r in kept.collect()} == {0, 3}


def test_minhash_near_dup_finds_planted_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    far = "completely unrelated content about spark shuffles and parquet files " * 5
    docs = _docs(spark, [base, near, far])
    pairs = {(r.a, r.b) for r in minhash_near_dup_pairs(docs).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_near_dup(spark):
    import random

    rng = random.Random(3)
    words = [f"w{i:03d}" for i in range(400)]
    base = " ".join(rng.choice(words) for _ in range(600))
    near = base.replace("w000", "zzz", 1)  # one token occurrence changed
    far = " ".join(f"q{i}" for i in range(600))
    docs = _docs(spark, [base, base, near, far])
    # identical texts → hamming 0 at the tight default threshold
    tight = {(r.a, r.b): r.hamming for r in simhash_near_dup_pairs(docs).collect()}
    assert tight.get((0, 1)) == 0
    assert (0, 3) not in tight and (1, 3) not in tight
    # one-token edit in a long doc → small hamming at a loose threshold
    loose = {(r.a, r.b) for r in simhash_near_dup_pairs(docs, max_hamming=16).collect()}
    assert (0, 2) in loose
    assert (0, 3) not in loose


def test_ngram_jaccard_exact_values(spark):
    a = "a b c d e"
    b = "a b c d f"     # trigrams: {abc,bcd,cde} vs {abc,bcd,cdf} → J = 2/4
    docs = _docs(spark, [a, b])
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
    assert len(pairs) == 1
    assert abs(pairs[0].sim - 0.5) < 1e-9


def test_embedding_near_dup_vs_duckdb(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {
        (r.a, r.b, round(r.cos, 6))
        for r in embedding_near_dup_pairs(emb, threshold=0.5).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE VIEW e AS SELECT * FROM '/root/testdata/sf0.001/embeddings.parquet'")
    want = {
        (r[0], r[1], round(r[2], 6))
        for r in con.execute(
            """
            SELECT a.vec_id, b.vec_id,
                   list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
            FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.5
            """
        ).fetchall()
    }
    assert got == want


def test_embedding_near_dup_bucketed_degenerate_equals_brute(spark):
    # 0 hyperplanes → one global bucket → the bucketed join IS the
    # brute-force join (the ann_ivf-style degenerate-parity check)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {
        (r.a, r.b, round(r.cos, 6))
        for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    bucketed = {
        (r.a, r.b, round(r.cos, 6))
        for r in embedding_near_dup_pairs(
            emb, threshold=0.3, bucket_above=0, n_planes=0
        ).collect()
    }
    assert bucketed == brute and len(brute) > 0


def test_embedding_near_dup_bucketed_is_subset_with_high_recall(spark):
    # real hyperplanes: result must be a subset of brute force (same
    # verified cosine, only candidate generation differs) and identical
    # vectors (cos≈1) always collide in every bucket
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {
        (r.a, r.b) for r in embedding_near_dup_pairs(emb, threshold=0.3).collect()
    }
    bucketed = {
        (r.a, r.b)
        for r in embedding_near_dup_pairs(
            emb, threshold=0.3, bucket_above=0, n_planes=8
        ).collect()
    }
    assert bucketed <= brute
    exact = {
        (r.a, r.b)
        for r in embedding_near_dup_pairs(emb, threshold=0.999999).collect()
    }
    assert exact <= bucketed


# ---------------------------------------------------------------------------
# winnowing fingerprints (MOSS)
# ---------------------------------------------------------------------------


def test_winnow_shared_run_guarantee(spark):
    """The SIGMOD'03 guarantee: a shared run of >= window+k-1 tokens
    (here 4+3-1 = 6) yields at least one shared selected fingerprint."""
    from docs2kg_spark.operators.dedup import winnow_pairs

    run = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, f"completely unrelated prefix words here {run}"),
         (2, f"{run} and then a totally different tail of text"),
         (3, "nothing in common with either document at all whatsoever")],
        "doc_id int, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in winnow_pairs(df, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnow_order_sensitive(spark):
    """Same BAG of tokens, different order → no shared 3-gram runs, so
    winnowing finds nothing (where set-semantics dedup would fire)."""
    from docs2kg_spark.operators.dedup import winnow_pairs

    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten"),
         (2, "ten nine eight seven six five four three two one")],
        "doc_id int, text string",
    )
    assert winnow_pairs(df, min_shared=1).count() == 0


def test_winnow_density_and_positions(spark):
    """Selected fingerprints are a small fraction of all grams (~2/(w+1))
    and positions are valid 1-based gram indexes."""
    from docs2kg_spark.operators.dedup import winnow_fingerprints

    words = " ".join(f"w{i * 7 % 101}" for i in range(200))
    df = spark.createDataFrame([(1, words)], "doc_id int, text string")
    rows = winnow_fingerprints(df).collect()
    n_grams = 200 - 2
    assert 0 < len(rows) <= n_grams // 2  # far below all-grams
    assert all(1 <= r.pos <= n_grams for r in rows)


def test_winnow_max_df_drops_boilerplate(spark):
    """A fingerprint present in more docs than max_df never generates
    pairs (the boilerplate guard that bounds join fanout)."""
    from docs2kg_spark.operators.dedup import winnow_pairs

    boiler = "this footer appears on every single page of the site"
    df = spark.createDataFrame(
        [(i, f"unique{i} openers number{i * 3} here {boiler}") for i in range(6)],
        "doc_id int, text string",
    )
    assert winnow_pairs(df, min_shared=1, max_df=3).count() == 0
    assert winnow_pairs(df, min_shared=1, max_df=10).count() == 15  # all C(6,2)


def test_winnow_repartition_stable(spark):
    from docs2kg_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta t{i * 11 % 7} end") for i in range(40)],
        "doc_id int, text string",
    )
    a = sorted(map(tuple, winnow_fingerprints(df).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df.repartition(13)).collect()))
    assert a == b
