"""End-to-end KG construction pipeline (the distributed replacement for
the reference's sequential per-file loop, cli.py:174-215).

transcripts ─ quarantine split
  → segments        (window ordering; checkpoint)
  → mentions        (Arrow UDF, narrow; checkpoint)
  → triples         (seg self-join + broadcast ontology; checkpoint)
  → canonical_map   (MinHash-LSH + CC fixpoint; checkpoint)
  → kg_nodes/edges  (joins through canonical_map; final tables)
  → metadata_kg     (conversation-level value nodes + HAS_* edges)
  → metrics/_lineage (per-partition counts + stage wall-times)

Resume semantics (north_rule "resumable from checkpoint"): every stage
writes a lineage marker containing the input fingerprint; a rerun skips
stages whose marker matches, so a mid-run kill converges on rerun —
content-addressed ids make outputs byte-stable across runs.

Error semantics: rows with null conv_id / turn_idx / unparseable shape
go to a quarantine table instead of killing the job — the distributed
analog of the reference's per-file exception swallowing (cli.py:208-213),
but visible instead of silent.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docs2kg_spark.config import PipelineConfig
from docs2kg_spark.io.sinks import TableStore
from docs2kg_spark.operators.graph import conversation_metadata_kg, materialize_kg
from docs2kg_spark.operators.linking import build_canonical_map
from docs2kg_spark.operators.segments import segment_transcripts


def input_fingerprint(transcripts: DataFrame) -> str:
    """Order-insensitive content fingerprint of the input table — one agg
    pass (xxhash64 per row, summed).  Stands in for Iceberg's snapshot id."""
    row = transcripts.agg(
        F.count("*").alias("n"),
        # bit_xor: order-insensitive and overflow-free under ANSI mode
        F.bit_xor(F.xxhash64("conv_id", "turn_idx", "text")).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


def split_quarantine(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    bad = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    return transcripts.filter(~bad), transcripts.filter(bad).withColumn(
        "quarantine_reason", F.lit("null conv_id or turn_idx")
    )


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts (SURVEY §2.4 'stage metrics'): the
    lineage/metrics rollup north_rule requires per stage."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .withColumn("stage", F.lit(stage))
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    cfg: PipelineConfig | None = None,
    resume: bool = True,
) -> dict:
    cfg = cfg or PipelineConfig()
    store = TableStore(spark, workdir)
    fp = input_fingerprint(transcripts)
    stage_times: dict[str, float] = {}
    metrics_frames: list[DataFrame] = []

    def run_stage(name: str, build, partition_by: list[str] | None = None) -> DataFrame:
        """Build + persist one stage unless its checkpoint is current."""
        if resume and store.stage_complete(name, fp) and store.exists(name):
            stage_times[name] = 0.0
            return store.read(name)
        t0 = time.monotonic()
        df = build()
        store.write(df, name, partition_by)
        store.write_marker(name, fp)
        stage_times[name] = time.monotonic() - t0
        out = store.read(name)
        metrics_frames.append(partition_metrics(out, name))
        return out

    good, quarantined = split_quarantine(transcripts)
    store.write(quarantined, "quarantine")

    segments = run_stage("segments", lambda: segment_transcripts(good))

    # fused extraction: mentions + triples in ONE Arrow pass, no shuffle
    # (the per-segment pair generation of operators/relations.py is
    # computed inside the UDF; see mentions.py::_triples_of)
    if resume and all(
        store.stage_complete(s, fp) and store.exists(s) for s in ("mentions", "triples")
    ):
        stage_times["mentions"] = stage_times["triples"] = 0.0
        mentions = store.read("mentions")
        triples = store.read("triples")
    else:
        t0 = time.monotonic()
        from docs2kg_spark.operators.mentions import extract_fused

        enriched, _, _ = extract_fused(segments, spark, cfg)
        # checkpoint the UDF output itself: guarantees exactly ONE
        # extraction pass (a .persist() can evict under memory pressure
        # and silently re-run the UDF) and adds a resume point at the
        # most expensive stage
        store.write(enriched, "extraction")
        store.write_marker("extraction", fp)
        enriched_t = store.read("extraction")
        mentions_df = enriched_t.select(
            "conv_id", "seg_id", F.explode_outer("ext.mentions").alias("m")
        ).filter(F.col("m").isNotNull()).select(
            "conv_id", "seg_id", "m.start", "m.end", "m.text", "m.label", "m.confidence", "m.method"
        )
        store.write(mentions_df, "mentions")
        stage_times["mentions"] = time.monotonic() - t0
        store.write_marker("mentions", fp)
        t0 = time.monotonic()
        triples_df = enriched_t.select(
            "conv_id", "seg_id", F.explode_outer("ext.triples").alias("t")
        ).filter(F.col("t").isNotNull()).select(
            "conv_id", "seg_id", "t.subj", "t.subj_label", "t.pred", "t.obj", "t.obj_label", "t.confidence"
        )
        store.write(triples_df, "triples")
        store.write_marker("triples", fp)
        stage_times["triples"] = time.monotonic() - t0
        mentions = store.read("mentions")
        triples = store.read("triples")
        metrics_frames.append(partition_metrics(mentions, "mentions"))
        metrics_frames.append(partition_metrics(triples, "triples"))

    def _canonical():
        cmap, block_stats = build_canonical_map(mentions, spark, cfg)
        stats = block_stats.collect()[0].asDict()
        store.write_marker("canonical_block_stats", fp, extra=stats)
        return cmap

    canonical_map = run_stage("canonical_map", _canonical)

    def _nodes():
        nodes, edges = materialize_kg(segments, mentions, triples, canonical_map)
        store.write(edges, "kg_edges")
        store.write_marker("kg_edges", fp)
        return nodes

    kg_nodes = run_stage("kg_nodes", _nodes)
    kg_edges = store.read("kg_edges")

    def _meta_nodes():
        n, e = conversation_metadata_kg(good)
        store.write(e, "metadata_edges")
        store.write_marker("metadata_edges", fp)
        return n

    metadata_nodes = run_stage("metadata_nodes", _meta_nodes)
    metadata_edges = store.read("metadata_edges")

    # metrics table: per-partition rows per stage + wall time rows
    if metrics_frames:
        all_metrics = metrics_frames[0]
        for m in metrics_frames[1:]:
            all_metrics = all_metrics.unionByName(m)
        times_df = spark.createDataFrame(
            [(-1, int(v * 1000), k) for k, v in stage_times.items()],
            "partition_id int, rows bigint, stage string",
        ).withColumn("stage", F.concat(F.col("stage"), F.lit("__wall_ms")))
        store.write(all_metrics.unionByName(times_df), "metrics")

    return {
        "fingerprint": fp,
        "segments": segments,
        "mentions": mentions,
        "triples": triples,
        "canonical_map": canonical_map,
        "kg_nodes": kg_nodes,
        "kg_edges": kg_edges,
        "metadata_nodes": metadata_nodes,
        "metadata_edges": metadata_edges,
        "stage_times": stage_times,
        "store": store,
    }
