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
