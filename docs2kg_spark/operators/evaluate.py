"""Triple precision/recall evaluation against a golden set — the
automated replacement for the reference's human annotation metrics
(README.md:121-129) and the scorer for BASELINE.json's P/R ≥ 0.95 gate.

Set semantics on (subj, pred, obj) per SURVEY §1.4.9 (ids excluded —
the reference's are nondeterministic).  Computed with two left-anti
joins, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def triple_pr(got: DataFrame, golden: DataFrame, keys=("subj", "pred", "obj")) -> dict:
    """→ {'precision', 'recall', 'f1', 'n_got', 'n_golden',
    'false_pos', 'false_neg'}."""
    g = got.select(*keys).distinct()
    o = golden.select(*keys).distinct()
    n_got = g.count()
    n_gold = o.count()
    fp = g.join(o, on=list(keys), how="left_anti").count()
    fn = o.join(g, on=list(keys), how="left_anti").count()
    tp = n_got - fp
    precision = tp / n_got if n_got else 1.0
    recall = (n_gold - fn) / n_gold if n_gold else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_got": n_got,
        "n_golden": n_gold,
        "false_pos": fp,
        "false_neg": fn,
    }
