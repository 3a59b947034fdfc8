"""jobs/run_query.py CLI surface: --list and argument validation run
without a JVM (subprocess, import-only paths); the Spark execution path
is exercised by the verify recipe and the gate."""

import subprocess
import sys

CLI = "/root/repo/jobs/run_query.py"


def test_list_enumerates_registry():
    out = subprocess.run(
        [sys.executable, CLI, "--list"], capture_output=True, text=True, timeout=120
    )
    assert out.returncode == 0
    names = out.stdout.split()
    from docs2kg_spark.queries import SPARK_QUERIES

    assert set(names) == set(SPARK_QUERIES)


def test_unknown_query_rejected_before_spark_starts():
    out = subprocess.run(
        [sys.executable, CLI, "--query", "no_such_query"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2
    assert "unknown queries" in out.stderr


def test_out_requires_single_query():
    out = subprocess.run(
        [sys.executable, CLI, "--query", "pricing_summary", "--query", "lang_id",
         "--out", "/tmp/x.parquet"],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2
    assert "exactly one" in out.stderr
