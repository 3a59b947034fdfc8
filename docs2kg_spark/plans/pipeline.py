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
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
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


INPUT_SCHEMA = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
}


def normalize_input(transcripts: DataFrame) -> DataFrame:
    """Project + cast to the contract schema (BASELINE.json::input_hint).
    Real 10^12-turn tables drift (an all-null column written by one
    producer arrives as a different parquet physical type); casting at
    the boundary means every stage downstream sees exactly one schema."""
    return transcripts.select(
        *[F.col(c).cast(t).alias(c) for c, t in INPUT_SCHEMA.items() if c in transcripts.columns]
    )


def split_quarantine(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    transcripts = normalize_input(transcripts)
    bad = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
    return transcripts.filter(~bad), transcripts.filter(bad).withColumn(
        "quarantine_reason", F.lit("null conv_id or turn_idx")
    )


def partition_metrics(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition row counts (SURVEY §2.4 'stage metrics') computed at
    runtime — the generic form for any DataFrame.  The pipeline itself
    sources the same numbers from parquet footers after each stage write
    (TableStore.partition_counts): O(files) driver-side metadata reads
    instead of one full re-scan Spark job per stage, which at 1000
    executors would serialize a scan of every stage output through the
    metrics path."""
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
    # the fingerprint exists to key resume markers; with resume=False the
    # markers are write-only, so skip the extra full input scan (a rerun
    # with resume=True recomputes the real fp, mismatches, and rebuilds —
    # safe in both directions)
    fp = input_fingerprint(transcripts) if resume else "ephemeral"
    stage_times: dict[str, float] = {}
    # side jobs (quarantine / metadata / metrics / secondary table writes)
    # are independent of the critical path segments → extraction →
    # canonicalize → materialize, so they run as concurrently submitted
    # Spark jobs from driver threads (job submission is thread-safe; on a
    # cluster this is standard driver-side job parallelism, and locally it
    # fills scheduler gaps instead of adding serial barriers)
    side = ThreadPoolExecutor(max_workers=4, thread_name_prefix="docs2kg-side")
    side_futures: list = []

    def submit_side(fn, *args):
        side_futures.append(side.submit(fn, *args))

    meta_future = None

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
        return store.read(name)

    # Any critical-path failure must still join the background
    # quarantine/metrics/metadata writes: otherwise those threads keep
    # writing into the workdir after the run has died, and their own
    # failures are swallowed because nothing ever awaits the futures
    # (round-1 advice item 4).  The happy path drains them explicitly
    # below (their errors propagate there); this except only runs on
    # the failure path and must not mask the original error.
    try:
        # Quarantine detection rides the segments pass as an Observation
        # (zero extra scan): the common case — a clean input — costs
        # nothing, and only when bad rows are OBSERVED does a side job
        # scan the input again to materialize them with reasons.  The
        # old always-on side write re-scanned the full input every run.
        normalized = normalize_input(transcripts)
        bad_cond = F.col("conv_id").isNull() | F.col("turn_idx").isNull()
        seg_fresh = not (resume and store.stage_complete("segments", fp) and store.exists("segments"))
        q_obs = Observation("quarantine_probe") if seg_fresh else None
        src = normalized.observe(q_obs, F.sum(bad_cond.cast("long")).alias("n_bad")) if q_obs else normalized
        good = src.filter(~bad_cond)
        quarantined = normalized.filter(bad_cond).withColumn(
            "quarantine_reason", F.lit("null conv_id or turn_idx")
        )
        quarantine_ddl = ", ".join(
            f"{c} {t}" for c, t in INPUT_SCHEMA.items() if c in normalized.columns
        ) + ", quarantine_reason string"

        if cfg.segment_bucket_turns > 0:
            from docs2kg_spark.operators.segments import segment_transcripts_bucketed

            segments = run_stage(
                "segments", lambda: segment_transcripts_bucketed(good, cfg.segment_bucket_turns)
            )
        else:
            segments = run_stage("segments", lambda: segment_transcripts(good))

        if q_obs is not None:
            # segments just materialized → the observation is bound
            if int(q_obs.get["n_bad"] or 0) > 0:
                submit_side(lambda: store.write(quarantined, "quarantine"))
            else:
                store.write_rows([], quarantine_ddl, "quarantine")
        elif not store.exists("quarantine"):
            # segments resumed but quarantine missing (partial workdir)
            submit_side(lambda: store.write(quarantined, "quarantine"))

        # metadata KG depends only on the raw turns — overlap it with the
        # whole extraction/linking critical path
        def _meta_branch():
            t0 = time.monotonic()
            n, e = conversation_metadata_kg(good)
            store.write(n, "metadata_nodes")
            store.write(e, "metadata_edges")
            store.write_marker("metadata_nodes", fp)
            store.write_marker("metadata_edges", fp)
            stage_times["metadata_nodes"] = time.monotonic() - t0

        import os as _os

        # Overlapping the metadata branch with the extraction critical path
        # measured NEGATIVE at high local parallelism (local[32]: +50s — its
        # shuffle/write tasks interleave into the Arrow-UDF stage's slots and
        # strangle it) but POSITIVE at low (local[8]: −4s, where the branch
        # is otherwise a pure serial insertion).  Default: overlap on real
        # clusters (the branch's tasks land on OTHER executors) and in
        # local mode up to 8 slots; serial above that.  DOCS2KG_OVERLAP_META
        # overrides either way.
        # The paired same-stage table writes (mentions+triples,
        # kg_nodes+kg_edges) measured POSITIVE at both levels (local[32]:
        # 37s vs 55s serial) — two jobs over the SAME checkpointed input keep
        # all slots busy through each other's write tails — so they stay
        # concurrent by default.
        _ov = _os.environ.get("DOCS2KG_OVERLAP_META")
        if _ov is not None:
            overlap_meta = _ov != "0"
        elif spark.sparkContext.master.startswith("local"):
            overlap_meta = spark.sparkContext.defaultParallelism <= 8
        else:
            overlap_meta = True
        paired_writes = _os.environ.get("DOCS2KG_PAIRED_WRITES", "1") != "0"
        if resume and store.stage_complete("metadata_nodes", fp) and store.exists("metadata_nodes"):
            stage_times["metadata_nodes"] = 0.0
            meta_future = None
        elif overlap_meta:
            meta_future = side.submit(_meta_branch)
        else:
            _meta_branch()
            meta_future = None

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
            stage_times["x_extraction_write"] = time.monotonic() - t0
            store.write_marker("extraction", fp)
            enriched_t = store.read("extraction")
            mentions_df = enriched_t.select(
                "conv_id", "seg_id", F.explode_outer("ext.mentions").alias("m")
            ).filter(F.col("m").isNotNull()).select(
                "conv_id", "seg_id", "m.start", "m.end", "m.text", "m.label", "m.confidence", "m.method"
            )
            triples_df = enriched_t.select(
                "conv_id", "seg_id", F.explode_outer("ext.triples").alias("t")
            ).filter(F.col("t").isNotNull()).select(
                "conv_id", "seg_id", "t.subj", "t.subj_label", "t.pred", "t.obj", "t.obj_label", "t.confidence"
            )
            # the two explode-projections read the same checkpoint and are
            # independent → concurrent jobs

            def _timed_write(df, name):
                s = time.monotonic()
                store.write(df, name)
                return time.monotonic() - s

            if paired_writes:
                with ThreadPoolExecutor(max_workers=2) as pool:
                    fm = pool.submit(_timed_write, mentions_df, "mentions")
                    ft = pool.submit(_timed_write, triples_df, "triples")
                    stage_times["x_mentions_write"] = fm.result()
                    stage_times["triples"] = ft.result()
            else:
                stage_times["x_mentions_write"] = _timed_write(mentions_df, "mentions")
                stage_times["triples"] = _timed_write(triples_df, "triples")
            store.write_marker("mentions", fp)
            store.write_marker("triples", fp)
            stage_times["mentions"] = time.monotonic() - t0
            mentions = store.read("mentions")
            triples = store.read("triples")

        # ontology round-trip (reference: semantic_kg/base.py:60-82): merge
        # newly discovered mention types into the persisted ontology so an
        # incremental rerun starts from them — tiny distinct agg + tiny
        # write, runs as a side job off the critical path
        from docs2kg_spark.operators.ontology_gen import persist_updated_ontology

        submit_side(lambda: persist_updated_ontology(store, mentions, cfg.ontology))

        def _canonical():
            cmap, block_stats = build_canonical_map(mentions, spark, cfg)
            # the stats collect is lineage bookkeeping, not a canonical_map
            # dependency — run it off the critical path (for the small-vocab
            # driver fast path it is a local relation, not even a job)
            submit_side(
                lambda: store.write_marker(
                    "canonical_block_stats", fp, extra=block_stats.collect()[0].asDict()
                )
            )
            return cmap

        canonical_map = run_stage("canonical_map", _canonical)

        if resume and store.stage_complete("kg_nodes", fp) and store.exists("kg_nodes"):
            stage_times["kg_nodes"] = 0.0
        else:
            t0 = time.monotonic()
            schema = dict(cfg.layout_schema) if cfg.layout_schema is not None else None
            nodes_df, edges_df = materialize_kg(
                segments, mentions, triples, canonical_map, layout_schema=schema
            )
            def _timed_store_write(df, name):
                s = time.monotonic()
                store.write(df, name)
                return time.monotonic() - s

            if paired_writes:
                # node and edge tables share inputs but not outputs → concurrent
                with ThreadPoolExecutor(max_workers=2) as pool:
                    fn = pool.submit(_timed_store_write, nodes_df, "kg_nodes")
                    fe = pool.submit(_timed_store_write, edges_df, "kg_edges")
                    stage_times["x_kg_nodes_write"] = fn.result()
                    stage_times["x_kg_edges_write"] = fe.result()
            else:
                stage_times["x_kg_nodes_write"] = _timed_store_write(nodes_df, "kg_nodes")
                stage_times["x_kg_edges_write"] = _timed_store_write(edges_df, "kg_edges")
            store.write_marker("kg_nodes", fp)
            store.write_marker("kg_edges", fp)
            stage_times["kg_nodes"] = time.monotonic() - t0
        kg_nodes = store.read("kg_nodes")
        kg_edges = store.read("kg_edges")

        if meta_future is not None:
            meta_future.result()
        metadata_nodes = store.read("metadata_nodes")
        metadata_edges = store.read("metadata_edges")

        # drain side jobs (quarantine, ontology, block stats), then assemble
        # the combined metrics table driver-side: per-partition rows come
        # from the parquet footers of each stage table (no re-scan jobs),
        # wall times from the stage_times dict — the whole metrics table is
        # a driver-side metadata write, zero Spark jobs
        for f in side_futures:
            f.result()
        side.shutdown(wait=True)
        metric_rows: list[tuple] = [
            (-1, int(v * 1000), f"{k}__wall_ms") for k, v in stage_times.items()
        ]
        for name in (
            "segments",
            "mentions",
            "triples",
            "canonical_map",
            "kg_nodes",
            "kg_edges",
            "metadata_nodes",
            "metadata_edges",
            "quarantine",
        ):
            if store.exists(name):
                metric_rows.extend(
                    (pid, rows, name) for pid, rows in store.partition_counts(name)
                )
        store.write_rows(metric_rows, "partition_id int, rows bigint, stage string", "metrics")

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
    except BaseException:
        if meta_future is not None:
            meta_future.exception()
        for f in side_futures:
            f.exception()
        side.shutdown(wait=True)
        raise
