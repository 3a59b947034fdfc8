"""Deterministic distributed generators for scale-and-skew stress runs
(round-4 verdict item 1).

Two fixtures, both synthesized EXECUTOR-SIDE from ``spark.range`` +
hash expressions (no driver-side data, so fixture size is bounded by
cluster capacity — the same discipline as
``fixtures.transcripts.transcripts_spark``):

- ``gen_tables(spark, out, scale)``: all ten driver-contract tables at
  ``scale`` × the sf1 row counts, schema-identical to
  /root/testdata/sf* (TESTDATA.md).  Values are NOT the driver
  generator's (its seed stream is private) — the stress contract is
  plan shape and wall-clock scaling, not value parity; DuckDB twins are
  only compared at the driver's own sf dirs.  The corpus keeps the
  structural features the query families need: multi-source documents,
  5 langs, near- and exact-duplicate groups, clustered embeddings,
  time-windowed events.

- ``gen_tables(..., skew=...)``: the hot-key variant — one dominant
  events user, one dominant document source, and a block of documents
  whose doc_ids are multiples of lcm(50, 16) = 400, so they all land
  in conversation conv-0000 AND inject gazetteer surface #0
  (TRANSCRIPTS_CTE derives conv from doc_id % 50 and the injected
  surface from doc_id % 16): one conversation with a large share of
  all turns, one entity surface in the same share of segments — the
  degenerate shapes SURVEY §4.3.1 and functions/skew.py exist for.

Determinism: every value is a pure function of (row id, seed) via
xxhash64, so any partitioning/ordering produces the same table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sf1 row counts = 10 × the driver's sf0.1 (TESTDATA.md)
SF1_ROWS = {
    "region": 5,
    "nation": 25,
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "lineitem": 6_000_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}

_VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data vector join shuffle stage task executor driver plan codegen "
    "broadcast skew salt bucket memo cache arrow pandas"
).split()

_LANGS = ["en", "en", "es", "zh", "fr", "de"]  # en-heavy like the driver's
_EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]
_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _h(seed: int, tag: str, *cols):
    return F.xxhash64(F.lit(seed), F.lit(tag), *cols)


def _pm(expr, n: int):
    return F.pmod(expr, F.lit(n))


def _pick(arr: list[str], expr):
    return F.array(*[F.lit(x) for x in arr])[_pm(expr, len(arr)).cast("int")]


def _doc_text(gid, seed: int):
    """Deterministic word-soup text from a document group id: 12–72
    words drawn from the shared vocab (sources overlap heavily, like
    the driver corpus), built row-locally."""
    n_words = (_pm(_h(seed, "dlen", gid), 61) + 12).cast("int")
    return F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda i: _pick(_VOCAB, _h(seed, "dw", gid, i)),
        ),
    )


def gen_tables(
    spark: SparkSession,
    out_dir: str,
    scale: float = 1.0,
    seed: int = 20260821,
    skew: dict | None = None,
    partitions: int | None = None,
) -> dict:
    """Write all ten tables under ``out_dir`` and return row counts.

    ``skew`` (all optional): {"hot_user_frac": 0.3, "hot_source_frac":
    0.5, "hot_doc_frac": 0.2} — fractions of events routed to user 7,
    documents routed to source src0, and documents whose doc_id is a
    multiple of 400 (one conversation + one injected surface).
    """
    import os

    skew = skew or {}
    parts = partitions or spark.sparkContext.defaultParallelism
    counts = {}

    def rows(name: str):
        n = max(1, int(SF1_ROWS[name] * scale))
        # dims stay full-size: the star schema's FKs need the full range
        if name in ("region", "nation"):
            n = SF1_ROWS[name]
        return n, spark.range(n).repartition(parts)

    def write(df: DataFrame, name: str, n: int):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        counts[name] = n

    # --- dims -----------------------------------------------------------
    n, r = rows("region")
    write(r.select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.concat(F.lit("region-"), F.col("id")).alias("r_name"),
    ), "region", n)

    n, r = rows("nation")
    write(r.select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("nation-"), F.col("id")).alias("n_name"),
        _pm(F.col("id"), 5).cast("int").alias("n_regionkey"),
    ), "nation", n)

    n, r = rows("customer")
    write(r.select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("c_name"),
        _pm(_h(seed, "cn", F.col("id")), 25).cast("int").alias("c_nationkey"),
        ((_pm(_h(seed, "cb", F.col("id")), 1_099_999) - 99_999) / 100.0).alias("c_acctbal"),
        _pick(_SEGMENTS, _h(seed, "cs", F.col("id"))).alias("c_mktsegment"),
    ), "customer", n)

    n, r = rows("supplier")
    write(r.select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        _pm(_h(seed, "sn", F.col("id")), 25).cast("int").alias("s_nationkey"),
        ((_pm(_h(seed, "sb", F.col("id")), 1_099_999) - 99_999) / 100.0).alias("s_acctbal"),
    ), "supplier", n)

    n, r = rows("part")
    write(r.select(
        F.col("id").alias("p_partkey"),
        F.concat(F.lit("part "), _pick(_VOCAB, _h(seed, "pn1", F.col("id"))),
                 F.lit(" "), _pick(_VOCAB, _h(seed, "pn2", F.col("id")))).alias("p_name"),
        F.concat(F.lit("Brand#"), _pm(_h(seed, "pb", F.col("id")), 55)).alias("p_brand"),
        F.concat(_pick(_VOCAB, _h(seed, "pt1", F.col("id"))), F.lit(" "),
                 _pick(_VOCAB, _h(seed, "pt2", F.col("id")))).alias("p_type"),
        (_pm(_h(seed, "ps", F.col("id")), 50) + 1).cast("int").alias("p_size"),
        ((_pm(_h(seed, "pr", F.col("id")), 190_000) + 90_000) / 100.0).alias("p_retailprice"),
    ), "part", n)

    # --- facts ----------------------------------------------------------
    n_cust = counts["customer"]
    n, r = rows("orders")
    write(r.select(
        F.col("id").alias("o_orderkey"),
        _pm(_h(seed, "oc", F.col("id")), n_cust).alias("o_custkey"),
        _pick(["O", "F", "P"], _h(seed, "os", F.col("id"))).alias("o_orderstatus"),
        ((_pm(_h(seed, "ot", F.col("id")), 45_000_000) + 90_000) / 100.0).alias("o_totalprice"),
        F.timestamp_seconds(
            F.lit(788918400) + _pm(_h(seed, "od", F.col("id")), 207_360_000)
        ).alias("o_orderdate"),  # 1995-01-01 + up to ~6.5y
        _pick(_PRIORITIES, _h(seed, "op", F.col("id"))).alias("o_orderpriority"),
    ), "orders", n)

    n_ord, n_part, n_supp = counts["orders"], counts["part"], counts["supplier"]
    n, r = rows("lineitem")
    write(r.select(
        _pm(_h(seed, "lo", F.col("id")), n_ord).alias("l_orderkey"),
        _pm(_h(seed, "lp", F.col("id")), n_part).alias("l_partkey"),
        _pm(_h(seed, "ls", F.col("id")), n_supp).alias("l_suppkey"),
        (_pm(F.col("id"), 7) + 1).cast("int").alias("l_linenumber"),
        (_pm(_h(seed, "lq", F.col("id")), 50) + 1).cast("double").alias("l_quantity"),
        ((_pm(_h(seed, "le", F.col("id")), 10_000_000) + 100_000) / 100.0).alias("l_extendedprice"),
        (_pm(_h(seed, "ld", F.col("id")), 11) / 100.0).alias("l_discount"),
        (_pm(_h(seed, "lt", F.col("id")), 9) / 100.0).alias("l_tax"),
        _pick(["A", "N", "R"], _h(seed, "lr", F.col("id"))).alias("l_returnflag"),
        _pick(["O", "F"], _h(seed, "ll", F.col("id"))).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(788918400) + _pm(_h(seed, "lsd", F.col("id")), 220_000_000)
        ).alias("l_shipdate"),
    ), "lineitem", n)

    # --- events ---------------------------------------------------------
    hot_user_frac = float(skew.get("hot_user_frac", 0.0))
    n, r = rows("events")
    user = _pm(_h(seed, "eu", F.col("id")), 1500)
    if hot_user_frac > 0:
        user = F.when(
            _pm(_h(seed, "ehot", F.col("id")), 1000) < int(hot_user_frac * 1000),
            F.lit(7),
        ).otherwise(user)
    write(r.select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(
            F.lit(1704067200) + _pm(_h(seed, "ets", F.col("id")), 2_592_000)
        ).alias("ts"),  # 2024-01-01 + 30 days
        user.alias("user_id"),
        _pick(_EVENT_TYPES, _h(seed, "ety", F.col("id"))).alias("event_type"),
        (_pm(_h(seed, "ev", F.col("id")), 100_000) / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), _pm(_h(seed, "ek", F.col("id")), 100), F.lit("}")).alias("props"),
    ), "events", n)

    # --- documents ------------------------------------------------------
    hot_doc_frac = float(skew.get("hot_doc_frac", 0.0))
    hot_source_frac = float(skew.get("hot_source_frac", 0.0))
    n, r = rows("documents")
    n_hot = int(n * hot_doc_frac)
    # doc_id scheme (unique, deterministic): contiguous like the driver
    # corpus unless hot_doc_frac is set, in which case hot rows i <
    # n_hot get 400·i (conv-0000 + injected surface #0 via the %50/%16
    # derivations) and the rest get their own 400-block with a nonzero
    # offset in [1, 399]
    if n_hot > 0:
        doc_id = F.when(
            F.col("id") < n_hot, F.col("id") * 400
        ).otherwise(
            (F.col("id") - n_hot) * 400 + 1 + _pm(_h(seed, "doff", F.col("id")), 399)
        )
    else:
        doc_id = F.col("id")
    # duplicate structure per 8-group: row%8==0 is the base text,
    # %8==1 a near-duplicate (tail appended), %8==2 an exact duplicate,
    # %8 in 3..7 unique — so exact/minhash/simhash dedup queries find
    # real groups at any scale
    m8 = _pm(F.col("id"), 8)
    gid = F.when(m8 <= 2, F.col("id") - m8).otherwise(F.col("id"))
    base_text = _doc_text(gid, seed)
    text = F.when(
        m8 == 1, F.concat(base_text, F.lit(" near dup tail"))
    ).otherwise(base_text)
    source = _pick([f"src{i}" for i in range(20)], _h(seed, "dsrc", F.col("id")))
    if hot_source_frac > 0:
        source = F.when(
            _pm(_h(seed, "dshot", F.col("id")), 1000) < int(hot_source_frac * 1000),
            F.lit("src0"),
        ).otherwise(source)
    write(r.select(
        doc_id.alias("doc_id"),
        text.alias("text"),
        _pick(_LANGS, _h(seed, "dlang", F.col("id"))).alias("lang"),
        source.alias("source"),
        F.length(text).cast("bigint").alias("n_chars"),
    ), "documents", n)

    # --- embeddings -----------------------------------------------------
    n, r = rows("embeddings")
    # 10 well-separated label clusters in 64-dim: center c has +3.0 on
    # dims {c, c+10, ..}; members add hash noise in [-0.5, 0.5)
    label = _pm(_h(seed, "elab", F.col("id")), 10).cast("int")
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda d: (
            F.when(_pm(d, 10) == label, F.lit(3.0)).otherwise(F.lit(0.0))
            + (_pm(_h(seed, "edim", F.col("id"), d), 1000) - 500) / 1000.0
        ).cast("float"),
    )
    write(r.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        label.alias("label"),
    ), "embeddings", n)

    return counts
