"""Deterministic splits and stratified sampling for training-data
curation.

A 100 TB corpus needs reproducible train/val/test assignment and
per-class downsampling that (a) never shuffles, (b) is stable across
runs and engines, and (c) keys on content ids, not row positions
(`df.sample` / `randomSplit` are seed- AND partitioning-dependent —
a repartition reshuffles the sample, which is exactly what a resumable
pipeline cannot have).

Mechanism: bucket = the first 4 hex chars of md5(id || '|' || salt) —
a uniform 16-bit value represented as a FIXED-WIDTH lowercase hex
string, so lexicographic comparison equals numeric comparison and the
DuckDB twin can evaluate the identical predicate (md5 is md5 in both
engines; Spark's xxhash64 has no DuckDB counterpart).  Assignment is a
narrow when-chain over that bucket: zero shuffle, whole-stage codegen,
reassignment-free under any repartitioning.  16 bits ⇒ fraction
granularity 1/65536 (ample for split ratios; not for ppm-level
sampling — widen to 8 hex chars if ever needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(id_col: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(id_col.cast("string"), F.lit("|" + salt))), 1, 4)


def _hex_threshold(cum_fraction: float) -> str:
    return format(min(int(cum_fraction * 65536), 65536), "04x") if cum_fraction < 1.0 else "ffffg"
    # "ffffg" sorts after every 4-char hex string → the final split
    # captures all remaining buckets even at cum == 1.0 exactly


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
) -> DataFrame:
    """Add a `split` column assigning each row to a named split with the
    given weights (default 90/5/5 train/val/test), deterministically by
    content id.  Rows with equal ids always land in the same split."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = _bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = b < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    label_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str | None = None,
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep a deterministic per-label fraction of rows (downsampling hot
    classes is the standard rebalancing move in corpus curation).
    Labels absent from ``fractions`` keep ``default_fraction``."""
    key = F.col(id_col) if id_col else F.col(label_col)
    b = _bucket(key, salt)
    if not fractions:
        return df.filter(b < F.lit(_hex_threshold(default_fraction)))
    keep = None
    for label, frac in fractions.items():
        cond = (F.col(label_col) == label) & (b < F.lit(_hex_threshold(frac)))
        keep = cond if keep is None else keep | cond
    other = ~F.col(label_col).isin(*fractions) & (b < F.lit(_hex_threshold(default_fraction)))
    keep = keep | other
    return df.filter(keep)


def _bucket_int(id_col: Column, salt: str) -> Column:
    """The 16-bit bucket as an integer (for thresholds that are COLUMNS —
    a per-row weight or a per-class quota — where the fixed-width hex
    string comparison of _bucket can't apply)."""
    return F.conv(_bucket(id_col, salt), 16, 10).cast("int")


def weighted_keep(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    salt: str = "resample-v1",
) -> DataFrame:
    """Importance resampling: keep each row with probability
    clamp(weight, 0, 1), deterministically by content id — the standard
    quality-weighted corpus filter (keep good documents w.h.p., keep a
    calibrated trickle of mediocre ones).

    Engine-exact by construction: the weight is rounded to 6dp and
    multiplied by 65536 = 2^16 (a power of two, so the scaling is EXACT
    in binary floating point); floor of that is an integer both engines
    compute identically, compared against the integer bucket.  Zero
    shuffle — a narrow filter, stable under repartitioning."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w6 = F.round(F.greatest(F.least(w, F.lit(1.0)), F.lit(0.0)), 6)
    threshold = F.floor(w6 * F.lit(65536)).cast("int")
    return df.filter(_bucket_int(F.col(id_col), salt) < threshold)


def balance_by_class(
    df: DataFrame,
    label_col: str,
    id_col: str,
    target: int | None = None,
    salt: str = "balance-v1",
) -> DataFrame:
    """Downsample every class to ~``target`` rows (default: the size of
    the smallest class) — the language/domain-rebalancing move of corpus
    mixing.  keep iff bucket * n_class < 65536 * target: pure INTEGER
    arithmetic, so the kept set is bit-identical across engines and
    independent of partitioning.

    Plan shape: one hash agg for the class counts (class-cardinality
    rows), broadcast back; the minimum joins in as a broadcast single
    row.  The big table is touched by exactly one narrow filter pass."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("_class_n"))
    out = df.join(F.broadcast(counts), on=label_col)
    if target is None:
        tgt = counts.agg(F.min("_class_n").alias("_target"))
        out = out.crossJoin(F.broadcast(tgt))
    else:
        out = out.withColumn("_target", F.lit(int(target)))
    keep = (
        _bucket_int(F.col(id_col), salt).cast("bigint") * F.col("_class_n")
        < F.lit(65536).cast("bigint") * F.col("_target")
    )
    return out.filter(keep).drop("_class_n", "_target")


def sqrt_temperature_mixture(
    df: DataFrame,
    group_col: str,
) -> DataFrame:
    """→ (grp, n_docs, weight, sample_rate): α=0.5 temperature-scaled
    mixture weights per group — the multilingual-corpus rebalancing rule
    (sampling probability ∝ n^α flattens the head and boosts the tail;
    α=0.5 is the common published setting).  ``weight`` is the group's
    share of the α-scaled mass; ``sample_rate`` = min(1, weight·N/n) is
    the per-row keep probability that realizes the mixture at the same
    corpus size (feed it to ``weighted_keep``).

    α is FIXED at 0.5 because IEEE-754 requires sqrt to be correctly
    rounded — both engines produce the bit-identical double, unlike
    pow(n, α) whose last ulp is libm-specific.  The α-mass sum is made
    associative the same way operators/tfidf.py's logprob sum is: each
    sqrt is rounded to 6dp and scaled to an INTEGER before summing, so
    the result is independent of Spark's partial-agg order and exact in
    the DuckDB twin.

    Plan shape: ONE hash aggregate reduces the corpus to |groups| rows;
    everything after is arithmetic over that tiny relation (the two
    single-row totals broadcast in).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    scaled = counts.withColumn(
        "_s", F.round(F.round(F.sqrt(F.col("n_docs")), 6) * 1_000_000).cast("long")
    )
    tot = scaled.agg(
        F.sum("_s").alias("_mass"), F.sum("n_docs").alias("_n_total")
    )
    return scaled.crossJoin(F.broadcast(tot)).select(
        "grp",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.col("_s") / F.col("_mass"), 6).alias("weight"),
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("_s") / F.col("_mass")) * F.col("_n_total") / F.col("n_docs"),
            ),
            6,
        ).alias("sample_rate"),
    )


def split_sql(
    table: str,
    id_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "split-v1",
    extra_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB twin of hash_split — the same md5 hex-bucket predicate.
    ``extra_cols`` are carried through unchanged (e.g. doc_id when the
    split is keyed on a cluster id)."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = f"substr(md5(CAST({id_col} AS VARCHAR) || '|{salt}'), 1, 4)"
    cases = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cases.append(f"WHEN {bucket} < '{_hex_threshold(cum)}' THEN '{name}'")
    case = "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"
    cols = ", ".join([*extra_cols, id_col])
    return f"SELECT {cols}, {case} AS split FROM {table}"


def source_cap(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap-v1",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    content-hash rank — the per-domain cap of web-crawl pipelines
    (CommonCrawl-style corpora limit docs per host so megasites can't
    dominate the training mix).  Returns the input columns unchanged.

    Rank = row_number ordered by (md5(id|salt) hex, id) within the
    group: a content-keyed total order, so the kept set is a stable
    pseudo-random sample — independent of partitioning, resume-safe,
    and identical in the DuckDB twin (md5 is md5, hex strings compare
    identically, id breaks the one-in-2^128 tie).

    Scale shape: ONE group-keyed window shuffle.  row_number needs no
    full-group sort buffer beyond the shuffle's sort (whole-stage
    window with running counter); a pathologically hot group is still
    one partition's sort — at true hot-key scale swap in the two-phase
    per-partition top-cap (TakeOrdered per group-shard, re-rank the
    ≤ cap·shards survivors), which this operator's oracle also covers
    since the kept SET is rank-defined, not partitioning-defined."""
    from pyspark.sql import Window

    okey = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + salt)))
    w = Window.partitionBy(group_col).orderBy(okey, F.col(id_col))
    return (
        df.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= cap)
        .drop("_rnk")
    )
