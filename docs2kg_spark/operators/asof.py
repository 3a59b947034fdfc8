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
