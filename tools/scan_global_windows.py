"""Scan every SPARK_QUERIES plan for partition-less ORDERED WindowExec
nodes — the single-reducer global sorts that stop scaling at the first
vocabulary-sized relation (round-4 verdict perf item 2).

Physical plan text forms:
  Window [exprs], [order]          — 2 groups, order has ASC/DESC  → GLOBAL
  Window [exprs], [part]           — 2 groups, no ASC/DESC         → partition-only
  Window [exprs], [part], [order]  — 3 groups                      → partitioned

Helper-internal bounded offsets windows are skipped by their sentinel
order columns: `_pid#` (skew.global_row_number — ≤ shuffle-partitions
rows) and `_b#` (relations.number_by_sorted_rank — ≤ |alphabet| rows).

Blind spot: a window upstream of a .localCheckpoint() boundary is
invisible (the plan shows Scan ExistingRDD); the checkpoint call sites
are few and each documents its upstream shape.
"""
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUNDED_SENTINELS = ("_pid#", "_b#")


def _groups(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
            if depth == 1:
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return out


def global_ordered_windows(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        m = re.search(r"(?:\*\(\d+\) )?Window (\[.*)$", line.strip())
        if not m:
            continue
        gs = _groups(m.group(1))
        if len(gs) != 2:
            continue
        order = gs[1]
        if (" ASC" not in order) and (" DESC" not in order):
            continue  # partition-only window
        if any(s in order for s in BOUNDED_SENTINELS):
            continue  # helper-internal bounded offsets window
        out.append(line.strip()[:160])
    return out


def main():
    from docs2kg_spark.queries import SPARK_QUERIES
    from docs2kg_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(app_name="window_scan", master="local[8]", shuffle_partitions=8)
    flagged = {}
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            gw = global_ordered_windows(plan)
            if gw:
                flagged[name] = gw
                print(f"FLAG {name}: {len(gw)} global ordered window(s)")
                for g in gw:
                    print(f"    {g}")
        except Exception:
            print(f"ERR {name}")
            traceback.print_exc(limit=2)
    print(f"\n{len(flagged)} flagged of {len(only or SPARK_QUERIES)}")
    spark.stop()


if __name__ == "__main__":
    main()
