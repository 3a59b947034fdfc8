"""Suite-wide plan meta-test (round-4 verdict perf item 2 follow-up):
no query's physical plan may contain a partition-less ORDERED
WindowExec over a non-whitelisted relation — every ranking over an
unbounded relation must use the two-phase numbering
(skew.global_row_number / relations.number_by_sorted_rank), whose only
un-partitioned window runs over a constant-bounded count relation
(skipped via its sentinel order columns).

The whitelist below is every query whose global window provably runs
over a BOUNDED relation, with the bound stated.  Adding a name here
requires the same justification in the query's docstring.
"""

import pytest

from docs2kg_spark.plans.audit import global_ordered_windows, physical_plan
from docs2kg_spark.queries import SPARK_QUERIES

SF_DIR = "/root/testdata/sf0.001"

# query -> why its global ordered window is bounded
WHITELIST = {
    # window runs over the already-cut top-20 relation (limit BEFORE window)
    "skew_profile": "top_n=20 rows after TakeOrdered cut",
    # offsets window over one row per DISTINCT per-user count value
    "user_gini": "distinct count-value relation (≤ O(√Σx) rows)",
    # lag over the month list — bounded by the calendar span of the data
    "monthly_revenue_yoy": "per-month aggregate rows",
    # cumulative over floor(log2(revenue_cents)) bands — ≤ ~40 rows
    "customer_pareto": "log2 revenue bands (≤ ~40 rows)",
}


def test_no_unbounded_global_window_in_any_query_plan(spark):
    offenders = {}
    for name, fn in sorted(SPARK_QUERIES.items()):
        df = fn(spark, SF_DIR)
        gw = global_ordered_windows(physical_plan(df))
        if gw and name not in WHITELIST:
            offenders[name] = gw
    assert not offenders, (
        "unbounded single-partition windows (use skew.global_row_number "
        "or whitelist with a documented bound): "
        + "; ".join(f"{k}: {v[0]}" for k, v in offenders.items())
    )


def test_whitelist_entries_still_have_global_windows(spark):
    """If a whitelisted query stops producing a global window (e.g. it
    was rewritten), the stale entry must be removed so the whitelist
    never masks a future regression elsewhere."""
    stale = []
    for name in WHITELIST:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        if not global_ordered_windows(physical_plan(df)):
            stale.append(name)
    assert not stale, f"stale whitelist entries: {stale}"
