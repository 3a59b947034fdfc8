"""Plan-shape audits: structural checks that a physical plan keeps the
shapes the 100 TB story depends on.

``global_ordered_windows`` detects partition-less ORDERED WindowExec
nodes — the single-reducer global sorts that stop scaling at the first
vocabulary-sized relation (round-4 verdict perf item 2).  Physical
plan text forms:

  Window [exprs], [order]          — 2 groups, order has ASC/DESC  → GLOBAL
  Window [exprs], [part]           — 2 groups, no ASC/DESC         → partition-only
  Window [exprs], [part], [order]  — 3 groups                      → partitioned

Helper-internal bounded offsets windows are skipped by their sentinel
order columns: ``_pid#`` (skew.global_row_number — ≤ shuffle-partitions
rows) and ``_b#`` (relations.number_by_sorted_rank — ≤ |alphabet|
rows).  Known blind spot: a window upstream of a ``.localCheckpoint()``
boundary is invisible (the plan shows Scan ExistingRDD); the checkpoint
call sites are few and each documents its upstream shape.
"""

from __future__ import annotations

import re

BOUNDED_SENTINELS = ("_pid#", "_b#")

_WINDOW_RE = re.compile(r"(?:\*\(\d+\) )?Window (\[.*)$")


def _groups(s: str) -> list[str]:
    out: list[str] = []
    depth, cur = 0, []
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
    """Lines of ``plan`` that are partition-less ordered Window nodes
    (excluding the helper-internal bounded sentinels)."""
    out = []
    for line in plan.splitlines():
        m = _WINDOW_RE.search(line.strip())
        if not m:
            continue
        gs = _groups(m.group(1))
        if len(gs) != 2:
            continue
        order = gs[1]
        if (" ASC" not in order) and (" DESC" not in order):
            continue
        if any(s in order for s in BOUNDED_SENTINELS):
            continue
        out.append(line.strip()[:200])
    return out


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()
