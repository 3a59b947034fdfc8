#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "triples_per_sec": ..., ...}

The flagship measurement is the end-to-end KG pipeline
(extract → link → canonicalize → materialize, BASELINE.json::metric)
over a deterministically synthesized transcript table sized to the SF.

--pipeline-only : run just the KG pipeline, print its JSON (used by the
                  scaling mode so each parallelism level gets a fresh JVM).
--scaling       : run --pipeline-only at local[8] and local[32] in
                  subprocesses and write BENCH/BASELINE.md with
                  throughput at both + scaling efficiency
                  (the sandbox stand-in for N vs 4N executors).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# transcript synthesis size per SF (≈1M turns/unit-SF design point,
# scaled down to sandbox wall-clock budgets)
SF_TO_CONVS = {"0.001": 120, "0.01": 1200, "0.1": 6000}


def _sf_of(sf_dir: str) -> str:
    base = os.path.basename(sf_dir.rstrip("/"))
    return base[2:] if base.startswith("sf") else base


def _make_spark(cpus: str):
    from docs2kg_spark.session import get_spark

    return get_spark(app_name="docs2kg_bench", master=f"local[{cpus}]", shuffle_partitions=max(int(cpus), 8))


def _force(df) -> int:
    """fully execute a plan; return row count (count is itself the action)."""
    return df.count()


def run_kg_pipeline(spark, sf: str) -> dict:
    """End-to-end pipeline over synthesized transcripts; returns metrics."""
    from docs2kg_spark.fixtures import transcripts_pandas
    from docs2kg_spark.plans import run_pipeline

    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", SF_TO_CONVS.get(sf, 1200)))
    pdf = transcripts_pandas(n_convs=n_convs, mean_turns=10, seed=7)
    tdf = spark.createDataFrame(pdf).repartition(max(int(CPUS), 8), "conv_id")
    tdf.cache().count()  # exclude synthesis/ingest from the measured window

    workdir = tempfile.mkdtemp(prefix="docs2kg_bench_")
    t0 = time.monotonic()
    res = run_pipeline(spark, tdf, workdir, resume=False)
    n_triples = res["triples"].count()
    n_edges = res["kg_edges"].count()
    secs = time.monotonic() - t0
    return {
        "n_turns": len(pdf),
        "n_convs": n_convs,
        "n_triples": n_triples,
        "n_kg_edges": n_edges,
        "secs": round(secs, 3),
        "triples_per_sec": round(n_triples / secs, 2),
        "turns_per_sec": round(len(pdf) / secs, 2),
    }


HEADLINE = [
    "pricing_summary",
    "regional_revenue",
    "top_orders_per_priority",
    "event_ordering",
    "doc_near_dup_minhash",
    "embedding_near_dup",
    "ann_topk",
    "quality_scores",
    "kg_segments",
    "kg_mentions",
    "kg_triples",
]


def main() -> None:
    if "--scaling" in sys.argv:
        return scaling_main()

    pipeline_only = "--pipeline-only" in sys.argv
    sf = _sf_of(SF_DIR)
    spark = _make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if pipeline_only:
        out = run_kg_pipeline(spark, sf)
        out.update({"cpus": int(CPUS), "sf": sf})
        print(json.dumps(out))
        spark.stop()
        return

    from docs2kg_spark.queries import SPARK_QUERIES

    query_secs: dict[str, float] = {}
    total = 0.0

    # flagship: end-to-end KG pipeline throughput
    kg = run_kg_pipeline(spark, sf)
    query_secs["kg_pipeline_e2e"] = kg["secs"]
    total += kg["secs"]

    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        t0 = time.monotonic()
        _force(fn(spark, SF_DIR))
        dt = round(time.monotonic() - t0, 3)
        query_secs[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "kg_construct_e2e_plus_headline_queries",
                "value": round(total, 3),
                "unit": "sec",
                "queries": query_secs,
                "sf": sf,
                "cpus": int(CPUS),
                "n_turns": kg["n_turns"],
                "n_triples": kg["n_triples"],
                "triples_per_sec": kg["triples_per_sec"],
                "turns_per_sec": kg["turns_per_sec"],
            }
        )
    )
    spark.stop()


def scaling_main() -> None:
    """north_rule scaling evidence: same job, same input, at N and 4N
    parallelism; efficiency = tput(4N) / (4 · tput(N)), ideal 1.0.

    Defaults to local[4] vs local[16] with median-of-3: the sandbox box
    has 32 cores but is SHARED (external load routinely >12), so pinning
    the experiment inside the reliably-free core budget keeps the
    measurement about *our* scaling rather than tenant contention.
    Override with SPARK_GRAFT_SCALING_CPUS="8,32" and
    SPARK_GRAFT_SCALING_RUNS when the box is idle."""
    lo, hi = os.environ.get("SPARK_GRAFT_SCALING_CPUS", "4,16").split(",")
    n_runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    # compute-dominated input (~1.2M turns) so fixed JVM/driver costs
    # don't mask the parallelizable work
    scaling_convs = os.environ.get("SPARK_GRAFT_SCALING_CONVS", "80000")

    # interleave levels so external-load drift hits both equally
    runs_lo, runs_hi = [], []
    for i in range(n_runs):
        for cpus, acc in ((lo, runs_lo), (hi, runs_hi)):
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=cpus,
                SPARK_GRAFT_SF_DIR=SF_DIR,
                SPARK_GRAFT_BENCH_CONVS=scaling_convs,
            )
            out = subprocess.run(
                [sys.executable, __file__, "--pipeline-only"],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
            acc.append(json.loads(line))

    def median(runs: list[dict]) -> dict:
        return sorted(runs, key=lambda r: r["secs"])[len(runs) // 2]

    m_lo, m_hi = median(runs_lo), median(runs_hi)
    efficiency = round(m_hi["triples_per_sec"] / (4 * m_lo["triples_per_sec"]), 3)
    sf = _sf_of(SF_DIR)

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH baseline — KG pipeline throughput & scaling evidence\n\n"
            "End-to-end pipeline (extract → link → canonicalize → materialize,\n"
            "`BASELINE.json::metric`) on the same deterministic synthetic transcript\n"
            f"table at two parallelism levels (local[{lo}] vs local[{hi}], fresh JVM\n"
            "each, median of "
            f"{n_runs} interleaved runs) — the sandbox stand-in for N vs 4N\n"
            "executors (north_rule scaling criterion).  The box has 32 cores but is\n"
            "shared with external load, so the experiment is sized to the reliably\n"
            "free core budget.\n\n"
            f"- input: sf={sf}, {m_hi['n_turns']} turns, "
            f"{m_hi['n_convs']} conversations (seed=7)\n"
            f"- triples emitted: {m_hi['n_triples']}; kg_edges: {m_hi['n_kg_edges']}\n\n"
            "| parallelism | wall (s, median) | triples/sec | turns/sec | all runs (s) |\n"
            "|---|---|---|---|---|\n"
            f"| local[{lo}]  | {m_lo['secs']} | {m_lo['triples_per_sec']} | "
            f"{m_lo['turns_per_sec']} | {[r['secs'] for r in runs_lo]} |\n"
            f"| local[{hi}] | {m_hi['secs']} | {m_hi['triples_per_sec']} | "
            f"{m_hi['turns_per_sec']} | {[r['secs'] for r in runs_hi]} |\n\n"
            f"**Scaling efficiency (local[{lo}] → local[{hi}], 4× cores): "
            f"{efficiency}** (target ≥ 0.8 per north_rule; single shared JVM —\n"
            "driver-side fixed costs are not divided by 4, so this under-reports\n"
            "true multi-executor scaling).\n"
        )
    print(
        json.dumps(
            {
                f"t{lo}": m_lo["secs"],
                f"t{hi}": m_hi["secs"],
                "efficiency": efficiency,
                "runs_lo": [r["secs"] for r in runs_lo],
                "runs_hi": [r["secs"] for r in runs_hi],
            }
        )
    )


if __name__ == "__main__":
    main()
