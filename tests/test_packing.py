"""Concat-and-chunk sequence packing: Python-reference parity,
boundary-spanning semantics, repartition stability."""

import hashlib

from docs2kg_spark.operators.packing import pack_documents


def _py_pack(rows, budget, n_shards):
    """plain-Python reference: shard by md5 bucket, order by (hash, id),
    running sum, chunk at budget boundaries."""
    def h(i):
        return hashlib.md5(f"{i}|pack-v1".encode()).hexdigest()

    shards = {}
    for doc_id, toks in rows:
        s = int(h(doc_id)[:4], 16) % n_shards
        shards.setdefault(s, []).append((doc_id, toks))
    out = {}
    for s, docs in shards.items():
        docs.sort(key=lambda r: (h(r[0]), str(r[0])))
        cum = 0
        for doc_id, toks in docs:
            prev = cum
            cum += toks
            first = prev // budget
            last = max((cum - 1) // budget, first)
            out[doc_id] = (s, first, last, prev % budget, toks)
    return out


ROWS = [(i, (i * 37) % 900) for i in range(200)] + [(1000, 0), (1001, 5000)]


def test_packing_matches_python_reference(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: (r["shard"], r["pack_first"], r["pack_last"], r["pack_offset"], r["token_count"])
        for r in pack_documents(df, "n_tok", budget=512, n_shards=16).collect()
    }
    assert got == _py_pack(ROWS, 512, 16)


def test_packing_boundary_semantics(spark):
    """one shard (n_shards=1): spans, offsets, and the oversized doc's
    multi-pack chunking are exactly the concat layout."""
    rows = [(1, 300), (2, 300), (3, 1200), (4, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r["doc_id"]: r.asDict()
        for r in pack_documents(df, "n_tok", budget=512, n_shards=1).collect()
    }
    want = _py_pack(rows, 512, 1)
    for doc_id, (s, first, last, off, toks) in want.items():
        g = got[doc_id]
        assert (g["shard"], g["pack_first"], g["pack_last"], g["pack_offset"], g["token_count"]) == (
            s, first, last, off, toks
        )
    # the 1200-token doc spans ≥2 packs; total layout is gap-free:
    big = got[3]
    assert big["pack_last"] >= big["pack_first"] + 2 or (
        big["pack_last"] - big["pack_first"]
    ) * 512 + (512 - big["pack_offset"]) >= 1200


def test_packing_repartition_stable(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, n_tok long")
    a = sorted(map(tuple, pack_documents(df, "n_tok", 512, 16).collect()))
    b = sorted(
        map(tuple, pack_documents(df.repartition(13), "n_tok", 512, 16).collect())
    )
    assert a == b
