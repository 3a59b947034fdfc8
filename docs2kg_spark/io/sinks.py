"""Catalog-agnostic table store.

The design target is Iceberg (`df.writeTo(...).overwritePartitions()`
with snapshot-id-based lineage); the sandbox has no Iceberg runtime, so
the store is parquet-backed behind the same narrow interface — swapping
`format="iceberg"` changes nothing upstream (SURVEY.md §7 phase 4).

Replaces the reference's per-stage full-JSON-rewrite persistence
(semantic_kg/base.py:86-96 rewrites the whole layout file after every
enrichment stage) with idempotent overwrite-by-stage table writes, and
its per-file error swallowing (cli.py:208-213) with an explicit
quarantine table.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> str:
        """Idempotent full overwrite of one stage table (the parquet
        stand-in for Iceberg overwritePartitions)."""
        p = self.path(name)
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(p)
        return p

    def read(self, name: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(name))

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and (
            os.path.exists(os.path.join(p, "_SUCCESS")) or any(f.endswith(".parquet") for f in os.listdir(p))
        )

    def drop(self, name: str) -> None:
        shutil.rmtree(self.path(name), ignore_errors=True)

    # ---- stage markers (resume support) --------------------------------
    # the parquet stand-in for Iceberg snapshot lineage: a stage is
    # complete iff its marker exists AND records the same input
    # fingerprint — kill-and-rerun converges (north_rule: "resumable
    # from checkpoint")
    def marker_path(self, stage: str) -> str:
        return os.path.join(self.root, f"_lineage_{stage}.json")

    def write_marker(self, stage: str, fingerprint: str, extra: dict | None = None) -> None:
        with open(self.marker_path(stage), "w") as f:
            json.dump({"stage": stage, "fingerprint": fingerprint, **(extra or {})}, f)

    def read_marker(self, stage: str) -> dict | None:
        p = self.marker_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def stage_complete(self, stage: str, fingerprint: str) -> bool:
        m = self.read_marker(stage)
        return bool(m and m.get("fingerprint") == fingerprint)
