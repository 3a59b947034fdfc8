from docs2kg_spark.operators.mentions import extract_mentions
from docs2kg_spark.operators.relations import cooccurrence_triples
from docs2kg_spark.operators.segments import segment_transcripts


def test_triple_parity_with_oracle(spark, transcripts_df, oracle_result):
    segs = segment_transcripts(transcripts_df)
    m = extract_mentions(segs, spark)
    got = {
        (r.seg_id, r.subj, r.pred, r.obj, r.confidence)
        for r in cooccurrence_triples(m, spark).collect()
    }
    want = {
        (t["seg_id"], t["subj"], t["pred"], t["obj"], t["confidence"])
        for t in oracle_result["triples"]
    }
    assert got == want


def test_fused_triples_equal_join_triples(spark, transcripts_df, oracle_result):
    """the pipeline's fused (in-UDF) triple emission must match the
    join-based operator AND the oracle exactly."""
    from docs2kg_spark.operators.mentions import extract_fused

    segs = segment_transcripts(transcripts_df)
    _, m, t_fused = extract_fused(segs, spark)
    got = {
        (r.seg_id, r.subj, r.subj_label, r.pred, r.obj, r.obj_label, r.confidence)
        for r in t_fused.collect()
    }
    t_join = cooccurrence_triples(extract_mentions(segs, spark), spark)
    want = {
        (r.seg_id, r.subj, r.subj_label, r.pred, r.obj, r.obj_label, r.confidence)
        for r in t_join.collect()
    }
    assert got == want
    want_oracle = {
        (t["seg_id"], t["subj"], t["pred"], t["obj"], t["confidence"])
        for t in oracle_result["triples"]
    }
    assert {(a, b, d, e, g) for a, b, c, d, e, f, g in got} == want_oracle


def test_triples_sql_twin_duckdb(spark, transcripts_df):
    """The join-based triple derivation has an exact ANSI-SQL twin —
    cross-checked with DuckDB over the same mention rows."""
    import duckdb

    segs = segment_transcripts(transcripts_df)
    m = extract_mentions(segs, spark).cache()
    got = {
        (r.seg_id, r.subj, r.pred, r.obj, round(r.confidence, 9))
        for r in cooccurrence_triples(m, spark).collect()
    }

    mpdf = m.toPandas()
    con = duckdb.connect()
    con.register("mentions", mpdf)
    con.execute(
        "CREATE TABLE conns(pred VARCHAR, src_type VARCHAR, dst_type VARCHAR);"
        "INSERT INTO conns VALUES ('WorksFor','Person','Organization'),"
        "('Uses','Person','Tool'),('Uses','Organization','Tool'),"
        "('LocatedIn','Organization','Location'),('LocatedIn','Person','Location')"
    )
    sql = """
    WITH pairs AS (
      SELECT a.conv_id, a.seg_id, a.text AS subj, b.text AS obj,
             COALESCE(c.pred, 'RELATES_TO') AS pred,
             LEAST(a.confidence, b.confidence) AS conf,
             ROW_NUMBER() OVER (
               PARTITION BY a.seg_id, a.text, COALESCE(c.pred,'RELATES_TO'), b.text
               ORDER BY a.start, a."end", a.text, a.label, b.start, b."end", b.text, b.label
             ) AS rn
      FROM mentions a JOIN mentions b
        ON a.seg_id = b.seg_id
       AND (a.start, a."end", a.text, a.label) < (b.start, b."end", b.text, b.label)
       AND NOT (a.text = b.text AND a.label = b.label)
      LEFT JOIN conns c ON a.label = c.src_type AND b.label = c.dst_type
    )
    SELECT seg_id, subj, pred, obj, conf FROM pairs WHERE rn = 1
    """
    want = {(r[0], r[1], r[2], r[3], round(r[4], 9)) for r in con.execute(sql).fetchall()}
    assert got == want


def test_salted_self_join_parity(spark, transcripts_df):
    # the (seg_id, _salt) salted shuffle must be output-identical to the
    # plain seg_id self-join (functions/skew.py wiring, config knob
    # relation_salts)
    segs = segment_transcripts(transcripts_df)
    m = extract_mentions(segs, spark)
    plain = {
        (r.seg_id, r.subj, r.pred, r.obj, r.confidence)
        for r in cooccurrence_triples(m, spark).collect()
    }
    salted = {
        (r.seg_id, r.subj, r.pred, r.obj, r.confidence)
        for r in cooccurrence_triples(m, spark, n_salts=4).collect()
    }
    assert salted == plain and len(plain) > 0


# ---------------------------------------------------------------------------
# co-mention PMI + negative sampling
# ---------------------------------------------------------------------------


def test_comention_pmi_hand_computed(spark):
    import math

    from docs2kg_spark.operators.relations import comention_pmi

    # 4 conversations; entities via identity canonical map
    mentions = spark.createDataFrame(
        [
            ("c1", "a", "P"), ("c1", "b", "P"),
            ("c2", "a", "P"), ("c2", "b", "P"),
            ("c3", "a", "P"), ("c3", "x", "P"),
            ("c4", "b", "P"),
            ("c1", "a", "P"),  # duplicate mention in same conv: must not double-count
        ],
        "conv_id string, text string, label string",
    )
    cmap = spark.createDataFrame(
        [(e, e, "P", e) for e in ("a", "b", "x")],
        "node_id string, text string, label string, canonical_id string",
    )
    got = {(r.ent_a, r.ent_b): (r.n_co, r.pmi) for r in
           comention_pmi(mentions, cmap, min_co=2).collect()}
    # N=4 convs, c_a=3, c_b=3, c_ab=2; (a,x) and (b,x) fall under min_co
    assert got == {("a", "b"): (2, round(math.log(2.0 * 4.0 / 3 / 3), 6))}


def test_comention_pmi_respects_canonicalization(spark):
    from docs2kg_spark.operators.relations import comention_pmi

    # "alyce" folds into "alice": the pair is counted at the canonical id
    mentions = spark.createDataFrame(
        [("c1", "alice", "P"), ("c1", "bob", "P"),
         ("c2", "alyce", "P"), ("c2", "bob", "P")],
        "conv_id string, text string, label string",
    )
    cmap = spark.createDataFrame(
        [("n1", "alice", "P", "n1"), ("n2", "alyce", "P", "n1"),
         ("n3", "bob", "P", "n3")],
        "node_id string, text string, label string, canonical_id string",
    )
    got = {(r.ent_a, r.ent_b): r.n_co for r in
           comention_pmi(mentions, cmap, min_co=2).collect()}
    assert got == {("n1", "n3"): 2}


def test_negative_triples_deterministic_and_valid(spark):
    from docs2kg_spark.operators.relations import negative_triples

    rows = [(f"s{i}", "REL", f"o{i % 5}") for i in range(20)] + [
        ("s1", "OTHER", "o9")
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = negative_triples(t).collect()
    vocab = {r.obj for r in t.select("obj").distinct().collect()}
    # one row per distinct positive, negative drawn from the vocabulary,
    # never the true object (vocabulary has 6 > 1 entries)
    assert len(out) == t.distinct().count()
    for r in out:
        assert r.neg_obj in vocab
        assert r.neg_obj != r.obj
    # identical under any partitioning (the whole point of the hash draw)
    again = negative_triples(t.repartition(7)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
