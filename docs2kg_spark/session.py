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
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

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
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # dump the Python worker's stack on crash/hang signals — a reused
        # UDF worker was once observed desynced from its executor (JVM
        # blocked on read, worker blocked on recv); this makes the next
        # occurrence diagnosable
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
