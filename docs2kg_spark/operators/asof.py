"""As-of join and sessionization — time-series operators the reference
lacks (SURVEY §2.3 notes their absence) but a transcript/event engine at
scale needs.

as-of join, Spark-first: Spark has no native ASOF JOIN; the idiomatic
distributed formulation is the union-sort-window trick — tag both
streams, union, and take the running-last right-side row per key ordered
by (ts, tag).  One shuffle (the key window), no per-group pandas, no
range-explosion; ties (equal ts) resolve right-before-left, matching
ASOF JOIN's `right.ts <= left.ts` semantics.

sessionization: gap-based session ids via lag + conditional cumsum
(the batch analog of session_window in streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row with
    right.ts <= left.ts on the same key.  Returns left columns + the
    requested right columns (nullable when no prior right row exists)."""
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    l_cols = [c for c in left.columns]
    all_cols = set(l_cols) | set(right_value_cols) | {key, ts}

    def pad(df, cols):
        for c in all_cols:
            if c not in cols:
                df = df.withColumn(c, F.lit(None))
        return df.select(*sorted(all_cols), "_side")

    unioned = pad(lt, l_cols).unionByName(pad(rt, [key, ts] + right_value_cols))
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in right_value_cols:
        unioned = unioned.withColumn(
            f"{c}{suffix}",
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True).over(w),
        )
    return unioned.filter(F.col("_side") == 1).select(
        *l_cols, *[f"{c}{suffix}" for c in right_value_cols]
    )


def sessionize(
    events: DataFrame, key: str, ts: str, gap_minutes: float = 30.0
) -> DataFrame:
    """gap-based sessionization: a new session starts when the time since
    the previous event on the key exceeds the gap.  session_idx is the
    running count of boundaries (lag + cumsum windows, one shuffle)."""
    w = Window.partitionBy(key).orderBy(ts)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_s = gap_minutes * 60.0
    prev_ts = F.lag(ts).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp(F.col(ts)) - F.unix_timestamp(prev_ts)) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("_new_session", is_new).withColumn(
        "session_idx", F.sum("_new_session").over(wrun).cast("int") - 1
    ).drop("_new_session")


def span_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "key",
    start: str = "start",
    end: str = "end",
    bucket: int = 32,
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """Interval-overlap join: every (left, right) pair on the same
    ``key`` whose half-open spans [start, end) overlap
    (l.start < r.end AND r.start < l.end).  Returns all left columns
    prefixed `l_` and all right columns prefixed `r_` (key unprefixed).

    The annotation-alignment primitive (gazetteer spans vs LLM spans,
    OCR boxes vs layout regions) that Spark has no native operator for:
    a raw inequality join is a per-key cross product.

    Spark-first shape — bucketized interval blocking: each span is
    replicated into the fixed-width buckets it touches
    (floor(start/b) … floor((end-1)/b) — spans are short relative to
    `bucket` in the annotation use-case, so replication is ~1), the
    join becomes EQUI-keyed on (key, bucket) + the overlap predicate,
    and each overlapping pair is emitted exactly once by keeping only
    the bucket containing max(l.start, r.start) — the standard
    dedup-free blocking trick, no distinct needed.  Skewed keys split
    across buckets by construction; AQE handles the residue."""
    def burst(df, prefix):
        b = F.lit(bucket)
        cols = [F.col(c).alias(c if c == key else prefix + c) for c in df.columns]
        return df.filter(F.col(end) > F.col(start)).select(
            *cols,
            F.explode(
                F.sequence(
                    F.floor(F.col(start) / b), F.floor((F.col(end) - 1) / b)
                )
            ).alias("_bkt"),
        )

    ls, le = F.col(l_prefix + start), F.col(l_prefix + end)
    rs, re_ = F.col(r_prefix + start), F.col(r_prefix + end)
    lb = burst(left, l_prefix)
    rb = burst(right, r_prefix).withColumnRenamed(key, "_rkey")
    out = (
        lb.join(
            rb,
            (F.col(key) == F.col("_rkey"))
            & (lb["_bkt"] == rb["_bkt"])
            & (ls < re_)
            & (rs < le)
            & (lb["_bkt"] == F.floor(F.greatest(ls, rs) / F.lit(bucket))),
        )
    )
    keep = [key] + [l_prefix + c for c in left.columns if c != key] + [
        r_prefix + c for c in right.columns if c != key
    ]
    return out.select(*keep)
