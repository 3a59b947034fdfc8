"""SparkSession factory with scale-oriented defaults.

Every knob here is chosen for the 100 TB / 1000-executor design point and
merely *shrunk* for local testing:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing) —
  the backstop for hot-entity / long-conversation skew called out in
  BASELINE.json::north_rule.
- Arrow on — all Python extraction UDFs are pandas/Arrow batched
  (reference does one synchronous LLM HTTP call per mention,
  ner_spacy_match.py:132-136; we do thousands of rows per Arrow batch).
- shuffle.partitions sized to cores locally; on a real cluster this is
  set to ~2-3x total cores via spark-submit conf.
- session timezone pinned UTC so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "docs2kg_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # default to ~4x slots, never 1x: with exactly one shuffle task
        # per core a single straggler sets the stage wall (measured: the
        # kg_edges write scaled 2.3x from 2->8 cores at 1 task/core and
        # 4.05x at 4 tasks/core).  AQE parallelismFirst coalescing keeps
        # the effective floor at defaultParallelism, so the only cost of
        # the finer granularity is per-task overhead — noise at these
        # task sizes.  On a real fleet this is the operator-set
        # spark.sql.shuffle.partitions ≈ 2-4x total cores convention.
        n = master[6:-1] if master.startswith("local[") else ""
        shuffle_partitions = 4 * int(n) if n.isdigit() else 32

    # --- virtualized-host hygiene -------------------------------------
    # This sandbox runs in a VM where memory unmap/remap traffic is
    # disproportionately expensive (TLB-shootdown IPIs hit every vCPU;
    # measured: 40-60% system time, low context switches, random stages
    # stalling 30-45s at local[32] while raw CPU scales 26x).  Three
    # mitigations, all no-ops or standard practice on a real cluster:
    # 1. shuffle/spill local dirs on tmpfs when available (a cluster
    #    provisions fast executor-local disks; the shared virtio boot
    #    disk here is NOT that) — override with SPARK_GRAFT_LOCAL_DIR;
    # 2. fixed pre-touched driver heap (-Xms=-Xmx -XX:+AlwaysPreTouch):
    #    G1's periodic heap uncommit/recommit was the main unmap source;
    # 3. glibc malloc tuned so Python UDF workers stop munmap'ing large
    #    pandas/Arrow buffers back on every free (workers inherit env).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark_local"  # per-app spark-<uuid> subdirs
    driver_mem = os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "268435456")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # deterministic float/ts behavior for oracle comparison
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.driver.memory", driver_mem)
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{driver_mem} -XX:+AlwaysPreTouch "
            + os.environ.get("SPARK_GRAFT_EXTRA_JAVA", ""),
        )
        # dump the Python worker's stack on crash/hang signals — a reused
        # UDF worker was once observed desynced from its executor (JVM
        # blocked on read, worker blocked on recv); this makes the next
        # occurrence diagnosable
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
