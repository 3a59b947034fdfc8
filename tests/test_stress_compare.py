"""jobs/stress.py --compare: ratio math, the absolute floor, and the
budget gate (pure-Python, no Spark)."""

import importlib.util
import json
import os
import sys


def _load():
    spec = importlib.util.spec_from_file_location(
        "stressmod", os.path.join(os.path.dirname(__file__), "..", "jobs", "stress.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _write(tmp_path, name, queries):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        json.dump({"queries": queries, "errors": {}}, f)
    return p


def test_compare_flags_only_over_budget_above_floor(tmp_path, capsys):
    m = _load()
    base = _write(tmp_path, "base.json", {"a": 1.0, "b": 0.05, "c": 2.0, "d": 1.0})
    big = _write(tmp_path, "big.json", {
        "a": 25.0,   # ratio 25 > 20, wall >= 2s  -> offender
        "b": 1.9,    # ratio 38 but wall < 2s     -> floor-exempt
        "c": 19.0,   # ratio 9.5                  -> fine
        "d": 2.1,    # ratio 2.1                  -> fine
        "e": 99.0,   # no base entry              -> skipped
    })
    rc = m.cmd_compare(base, big, floor=2.0, budget=20.0)
    out = capsys.readouterr().out
    assert rc == 1
    assert "['a']" in out
    assert "1 over budget" in out


def test_compare_clean_run_exits_zero(tmp_path, capsys):
    m = _load()
    base = _write(tmp_path, "base.json", {"a": 1.0})
    big = _write(tmp_path, "big.json", {"a": 9.0})
    assert m.cmd_compare(base, big, floor=2.0, budget=20.0) == 0
