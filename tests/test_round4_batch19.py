"""Round-4 batch-19: embedding contamination, event burstiness,
duplicated sentences, OOV rate.  Twin parity is covered by the gate;
these pin semantics on crafted inputs."""


import pytest

import docs2kg_spark.queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _patch(monkey_docs=None, monkey_events=None, monkey_emb=None):
    orig = Q._t

    def t(spark, sf_dir, name):
        if name == "documents" and monkey_docs is not None:
            return monkey_docs
        if name == "events" and monkey_events is not None:
            return monkey_events
        if name == "embeddings" and monkey_emb is not None:
            return monkey_emb
        return orig(spark, sf_dir, name)

    return orig, t


def test_embedding_contamination_finds_planted_copy(spark):
    """A corpus vector that is an exact copy of a benchmark vector must
    be its top_vec with max_cos = 1.0 and count toward n_above."""
    rows = [
        (0, [1.0, 0.0, 0.0], 0),      # bench (0 % 97 == 0)
        (97, [0.0, 1.0, 0.0], 0),     # bench
        (1, [1.0, 0.0, 0.0], 0),      # exact copy of bench 0
        (2, [0.0, 0.0, 1.0], 0),      # orthogonal to both
        (3, [0.6, 0.8, 0.0], 0),      # cos 0.6 to bench 0, 0.8 to bench 97
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    orig, t = _patch(monkey_emb=emb)
    try:
        Q._t = t
        out = {r["bench_id"]: r for r in Q.q_embedding_contamination(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out[0]["top_vec"] == 1 and out[0]["max_cos"] == pytest.approx(1.0)
    assert out[0]["n_above"] == 2  # copy (1.0) + the 0.6 neighbor
    assert out[0]["n_corpus"] == 3
    assert out[97]["top_vec"] == 3 and out[97]["max_cos"] == pytest.approx(0.8)


def test_event_burstiness_poisson_vs_bursty(spark):
    """Constant hourly counts → Fano 0; all events in one hour of many
    → Fano grows.  Exact integer moments checked by hand."""
    rows = []
    eid = 0
    from datetime import datetime

    # type 'flat': 2 events in each of 3 hours → variance 0
    for hr in range(3):
        for _ in range(2):
            rows.append((eid, datetime(2025, 3, 1, 10 + hr), 1, "flat", 0.0, "{}"))
            eid += 1
    # type 'burst': counts 1 and 5 over two hours
    for hr, k in ((0, 1), (1, 5)):
        for _ in range(k):
            rows.append((eid, datetime(2025, 3, 2, 10 + hr), 1, "burst", 0.0, "{}"))
            eid += 1
    e = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    orig, t = _patch(monkey_events=e)
    try:
        Q._t = t
        out = {r["event_type"]: r for r in Q.q_event_burstiness(spark, SF_DIR).collect()}
    finally:
        Q._t = orig
    assert out["flat"]["fano_num"] == 0 and out["flat"]["fano"] == 0.0
    # burst: n=2, s1=6, s2=26 → num = 2*26-36 = 16, den = 12
    assert out["burst"]["fano_num"] == 16 and out["burst"]["fano_den"] == 12
    assert out["burst"]["fano"] == pytest.approx(16 / 12, abs=1e-6)


def test_dup_sentences_cross_doc_only(spark):
    """A sentence repeated within ONE doc doesn't qualify (n_docs >= 2);
    a verbatim cross-doc sentence does, with exact counts."""
    boiler = "this message contains confidential information"
    docs = spark.createDataFrame(
        [
            (0, f"Unique one. {boiler}. More text here today.", "en", "s", 0),
            (1, f"{boiler}. {boiler}. Something else entirely now.", "en", "s", 0),
            (2, "Repeated inside only. Repeated inside only.", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig, t = _patch(monkey_docs=docs)
    try:
        Q._t = t
        rows = Q.q_dup_sentences(spark, SF_DIR).collect()
    finally:
        Q._t = orig
    got = {r["sentence"]: (r["n_docs"], r["n_occ"]) for r in rows}
    assert got == {boiler: (2, 3)}


def test_doc_oov_rate_vocab_boundary(spark):
    """With a vocab cap, the rarest tokens fall out and count as OOV;
    rates are exact fractions of exploded token counts."""
    rows = Q.q_doc_oov_rate(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tok"]
        assert r["oov_rate"] == pytest.approx(r["n_oov"] / r["n_tok"], abs=1e-6)
    # the corpus-level OOV mass must be positive iff vocab > 1000 types
    total_types = (
        Q._t(spark, SF_DIR, "documents")
        .selectExpr("explode(split(lower(text), '[^a-z0-9]+')) AS tok")
        .filter("tok != ''")
        .select("tok")
        .distinct()
        .count()
    )
    oov_mass = sum(r["n_oov"] for r in rows)
    assert (oov_mass > 0) == (total_types > 1000)
