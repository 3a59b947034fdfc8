"""Mergeable distributed sketches — count-min (Cormode & Muthukrishnan,
J.Alg'05) and HyperLogLog (Flajolet et al., AofA'07) — built
DETERMINISTICALLY from md5-derived hashes, so unlike the engine's
built-in approx functions (hash seeds vary) every cell is reproducible
and the DuckDB twin can verify the sketch bit-for-bit.

Why an engine needs them even with exact aggregates available: both
sketches are the MERGEABLE summaries a 1000-executor fleet combines
without re-shuffling raw keys — CMS cells add, HLL registers max — so
per-partition partials union with a fixed-size (d·w or m) reduce while
the exact groupBy shuffles every distinct key.  At sandbox scale the
exact answer rides along as the test of the sketch's guarantees
(CMS: est ≥ true, bounded overestimate; HLL: small relative error).

Reference provenance: none (Docs2KG has no cardinality/frequency
estimation); part of the beyond-the-reference scale toolkit like the
skew profiler (operators/profiling.py).

Scale shape:
- CMS build: one projection fans each row into `depth` (seed, bucket)
  cells (row-local transform+explode), then ONE hash agg to a d×w
  relation — constant size regardless of input;
- CMS query: candidate keys join the d×w cells by (seed, bucket) —
  broadcast-sized sketch side — and min-reduce over seeds;
- HLL: one projection to (bucket, rho), one hash agg of max(rho) to m
  registers, and a single-row combine.  The harmonic sum is computed
  in INTEGER arithmetic (Σ 2^(S−r) at fixed scale S) so it is exact
  and associative — no float-order divergence between engines; the
  one double division happens once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256

HLL_M = 64          # registers (2^6)
HLL_SCALE = 50      # fixed-point scale for the exact harmonic sum
HLL_ALPHA_64 = 0.709  # the standard alpha constant for m = 64


def _cms_bucket(seed_col: F.Column, key_col: F.Column, width: int) -> F.Column:
    """Deterministic cell index: md5(seed|key) first 8 hex, mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", seed_col.cast("string"), key_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of the key column → (seed, bucket, cnt): a
    constant-size d×w relation whatever the input size.  Sketches of
    disjoint inputs merge by summing cells on (seed, bucket)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    keyed = df.select(F.col(key_col).cast("string").alias("k")).select("k", seeds)
    return (
        keyed.groupBy(
            "seed", _cms_bucket(F.col("seed"), F.col("k"), width).alias("bucket")
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key's frequency from the sketch →
    (<key_col>, est).  est = min over seeds of the key's cell; the CMS
    guarantee is est ≥ true count, with overestimate bounded by
    collisions (≤ N·depth/width in expectation)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("seed")
    probes = (
        keys.select(F.col(key_col).cast("string").alias("k"))
        .distinct()
        .select("k", seeds)
    )
    probes = probes.select(
        "k", "seed", _cms_bucket(F.col("seed"), F.col("k"), width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cms), on=["seed", "bucket"], how="left")
        .groupBy(F.col("k").alias(key_col))
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("bigint").alias("est"))
    )


def hll_registers(df: DataFrame, key_col: str, m: int = HLL_M) -> DataFrame:
    """The HLL MERGE form → (bucket, r): per-bucket max first-one
    position — the register table hll_distinct's estimate reads.  Max
    is the merge operator, so register tables from disjoint batches
    combine by groupBy(bucket).max(r) (the streaming maintenance path
    in streaming/dedup.py builds on exactly this)."""
    if m != 64:
        raise ValueError("m must be 64 (6 bucket bits; alpha constant is m-specific)")
    k = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), k)), 1, 12), 16, 10
    ).cast("long")
    hashed = df.select(h.alias("h")).select(
        F.col("h").bitwiseAND(m - 1).alias("bucket"),
        F.shiftright(F.col("h"), 6).alias("h2"),
    )
    # 48-bit hash >> 6 ⇒ h2 in [0, 2^42); rho = first-one position from
    # the left of the 42-bit window = 43 − length(bin(h2)) (bin() has no
    # leading zeros); h2 = 0 ⇒ all zeros ⇒ rho = 43
    rho = F.when(
        F.col("h2") > 0, F.lit(43) - F.length(F.expr("bin(h2)"))
    ).otherwise(F.lit(43))
    return (
        hashed.select("bucket", rho.cast("int").alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(
    df: DataFrame, key_col: str, m: int = HLL_M, include_true: bool = False
) -> DataFrame:
    """HyperLogLog distinct-count estimate → ONE row
    (v_nonempty, raw_est, est[, n_true when include_true]).

    hash = md5('hll|'+key) first 12 hex (48 bits); bucket = h mod m;
    rho = position of the first set bit of h2 = h div m within its
    42-bit window (empty-register convention M[j] = 0).  raw_est is the
    HLL harmonic-mean formula with alpha_64; `est` applies the standard
    small-range LinearCounting correction (raw_est ≤ 2.5m with empty
    buckets present → m·ln(m/V)).  n_true rides along as the exact
    answer the estimate is judged against (and is how the oracle stays
    value-checked end-to-end).

    The Σ 2^(−M[j]) term is computed as Σ 2^(S−M[j]) in BIGINT at fixed
    scale S=50 (max register 43 ⇒ each term ≤ 2^50, m=64 terms ⇒ sum
    < 2^57): exact, associative, engine-identical; doubles appear only
    in the final division and ln, both rounded to 6dp."""
    k = F.col(key_col).cast("string")
    regs = hll_registers(df, key_col, m)
    s = HLL_SCALE
    combined = regs.agg(
        F.count("*").cast("bigint").alias("v_nonempty"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - r)")).alias("hsum"),
    )
    alpha = HLL_ALPHA_64
    two_s = float(2**s)
    est_raw = F.round(
        F.lit(alpha) * m * m * two_s / (F.col("hsum") + (m - F.col("v_nonempty")) * (2**s)),
        6,
    )
    zeros = m - F.col("v_nonempty")
    lc = F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 6)
    out = combined.select(
        F.col("v_nonempty"),
        est_raw.alias("raw_est"),
        F.when((est_raw <= 2.5 * m) & (zeros > 0), lc).otherwise(est_raw).alias("est"),
    )
    if include_true:
        # exact distinct — the very job HLL replaces at scale; computed
        # only when the caller wants the estimate JUDGED (the oracled
        # query does, so the error bound itself is value-checked)
        n_true = df.select(k.alias("k")).distinct().count()
        out = out.withColumn("n_true", F.lit(n_true).cast("bigint"))
    return out


def hll_distinct_by(
    df: DataFrame, key_col: str, group_col: str, m: int = HLL_M
) -> DataFrame:
    """Per-GROUP HyperLogLog distinct estimate with the exact answer
    riding along → one row per group (group, v_nonempty, est, n_true,
    rel_err_pct).

    Same hash/register/fixed-point conventions as hll_distinct; the
    register table is keyed (group, bucket), which is ALSO the sketch's
    merge form — union any number of per-partition register tables and
    re-max to combine, the property that makes HLL the per-group
    distinct of choice at 100 TB (count(DISTINCT) per group expands
    every row; this reduces to |groups|·m registers).

    rel_err_pct is integer-scaled against n_true (|est−true|·10⁴ DIV
    true → 2dp percent) so the sketch's measured error is itself
    engine-exact."""
    if m != 64:
        raise ValueError("m must be 64 (6 bucket bits; alpha constant is m-specific)")
    k = F.col(key_col).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), k)), 1, 12), 16, 10
    ).cast("long")
    hashed = df.select(F.col(group_col).alias("grp"), h.alias("h")).select(
        "grp",
        F.col("h").bitwiseAND(m - 1).alias("bucket"),
        F.shiftright(F.col("h"), 6).alias("h2"),
    )
    rho = F.when(
        F.col("h2") > 0, F.lit(43) - F.length(F.expr("bin(h2)"))
    ).otherwise(F.lit(43))
    regs = (
        hashed.select("grp", "bucket", rho.cast("int").alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    s = HLL_SCALE
    combined = regs.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("v_nonempty"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {s} - r)")).alias("hsum"),
    )
    alpha = HLL_ALPHA_64
    two_s = float(2**s)
    est_raw = F.round(
        F.lit(alpha) * m * m * two_s / (F.col("hsum") + (m - F.col("v_nonempty")) * (2**s)),
        6,
    )
    zeros = m - F.col("v_nonempty")
    lc = F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 6)
    ests = combined.select(
        "grp",
        "v_nonempty",
        F.when((est_raw <= 2.5 * m) & (zeros > 0), lc).otherwise(est_raw).alias("est"),
    )
    true = (
        df.select(F.col(group_col).alias("grp"), k.alias("k"))
        .distinct()
        .groupBy("grp")
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    return (
        ests.join(true, "grp")
        .selectExpr(
            "grp",
            "v_nonempty",
            "est",
            "n_true",
            "CAST(abs(CAST(round(est) AS BIGINT) - n_true) * 10000 DIV n_true AS BIGINT) AS rel_err_bp",
        )
    )
