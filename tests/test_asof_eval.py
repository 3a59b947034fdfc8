import duckdb
from pyspark.sql import functions as F

from docs2kg_spark.operators.asof import asof_join, sessionize
from docs2kg_spark.operators.evaluate import triple_pr


def test_asof_join_vs_duckdb(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    logins = e.filter(F.col("event_type") == "login").select(
        "user_id", "ts", F.col("ts").alias("login_ts")
    )
    out = asof_join(purchases, logins, key="user_id", ts="ts", right_value_cols=["login_ts"])
    got = {(r.user_id, r.event_id, str(r.login_ts_asof)) for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM '/root/testdata/sf0.001/events.parquet'")
    want = {
        (r[0], r[1], str(r[2]))
        for r in con.execute(
            """
            SELECT l.user_id, l.event_id, r.ts
            FROM (SELECT user_id, event_id, ts FROM events WHERE event_type='purchase') l
            ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type='login') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            """
        ).fetchall()
    }
    assert got == want


def test_sessionize_basic(spark):
    rows = [
        ("u1", 1, "2025-01-01 00:00:00"),
        ("u1", 2, "2025-01-01 00:10:00"),   # same session (10 min)
        ("u1", 3, "2025-01-01 02:00:00"),   # new session (>60 min gap)
        ("u1", 4, "2025-01-01 02:30:00"),   # same session
        ("u2", 5, "2025-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_id int, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    got = {r.event_id: r.session_idx for r in sessionize(df, "user_id", "ts", 60.0).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_triple_pr_exact_and_partial(spark, transcripts_df, oracle_result, tmp_path):
    from docs2kg_spark.operators.mentions import extract_fused
    from docs2kg_spark.operators.segments import segment_transcripts

    segs = segment_transcripts(transcripts_df)
    _, _, triples = extract_fused(segs, spark)
    golden = spark.createDataFrame(
        [(t["subj"], t["pred"], t["obj"]) for t in oracle_result["triples"]],
        "subj string, pred string, obj string",
    )
    pr = triple_pr(triples, golden)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0  # exact parity on fixture

    # degrade: drop some golden rows → precision < 1, recall stays 1
    partial_golden = golden.limit(max(1, golden.count() // 2))
    pr2 = triple_pr(triples, partial_golden)
    assert pr2["recall"] == 1.0 and pr2["precision"] < 1.0


# ---------------------------------------------------------------------------
# interval-overlap join
# ---------------------------------------------------------------------------


def _overlap_fixture(spark):
    left = spark.createDataFrame(
        [
            ("k1", 0, 5, "a"),       # overlaps r1 [3,8)
            ("k1", 10, 20, "b"),     # overlaps r2 [19,40) at the edge
            ("k1", 50, 60, "c"),     # disjoint
            ("k2", 0, 5, "d"),       # same coords, different key: no match
            ("k1", 90, 100, "e"),    # touches r3 [100,110) — half-open: no
            ("k1", 7, 7, "z"),       # empty span: dropped
        ],
        "key string, start int, end int, tag string",
    )
    right = spark.createDataFrame(
        [
            ("k1", 3, 8, "r1"),
            ("k1", 19, 40, "r2"),
            ("k1", 100, 110, "r3"),
        ],
        "key string, start int, end int, tag string",
    )
    return left, right


def test_span_overlap_join_semantics(spark):
    from docs2kg_spark.operators.asof import span_overlap_join

    left, right = _overlap_fixture(spark)
    got = {(r.key, r.l_tag, r.r_tag) for r in
           span_overlap_join(left, right, key="key").collect()}
    assert got == {("k1", "a", "r1"), ("k1", "b", "r2")}


def test_span_overlap_join_bucket_spanning_emits_once(spark):
    """A pair whose overlap crosses several buckets must appear exactly
    once (the max(start)/bucket dedup rule), for any bucket width."""
    from docs2kg_spark.operators.asof import span_overlap_join

    left = spark.createDataFrame(
        [("k", 0, 100, "wide")], "key string, start int, end int, tag string"
    )
    right = spark.createDataFrame(
        [("k", 5, 95, "alsowide")], "key string, start int, end int, tag string"
    )
    for b in (4, 32, 1000):
        rows = span_overlap_join(left, right, key="key", bucket=b).collect()
        assert len(rows) == 1, f"bucket={b}"


def test_span_overlap_join_matches_naive_inequality_join(spark):
    """Parity vs the per-key cross-product formulation on a randomized
    span set — the blocking must change the plan, not the answer."""
    import random

    from docs2kg_spark.operators.asof import span_overlap_join

    rng = random.Random(13)
    mk = lambda n: [
        (f"k{rng.randrange(4)}", s, s + rng.randrange(1, 30), i)
        for i, s in enumerate(rng.randrange(0, 300) for _ in range(n))
    ]
    left = spark.createDataFrame(mk(60), "key string, start int, end int, i int")
    right = spark.createDataFrame(mk(60), "key string, start int, end int, i int")
    got = {(r.key, r.l_i, r.r_i) for r in
           span_overlap_join(left, right, key="key", bucket=16).collect()}
    naive = {
        (r["key"], r["li"], r["ri"])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.key") == F.col("r.key"))
            & (F.col("l.start") < F.col("r.end"))
            & (F.col("r.start") < F.col("l.end")),
        )
        .select(F.col("l.key").alias("key"), F.col("l.i").alias("li"), F.col("r.i").alias("ri"))
        .collect()
    }
    assert got == naive and len(got) > 0
