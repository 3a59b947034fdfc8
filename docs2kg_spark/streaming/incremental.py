"""Incremental ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9 — no streaming anywhere
in the tree), and so is the main pipeline.  This module is the §2.9
"lift": the same extraction operators applied to a stream of transcript
files with `readStream` + `foreachBatch`, giving incremental KG
construction with exactly-once file-source semantics and the same
content-addressed idempotence (re-delivered turns produce identical
seg_ids/mention rows → downstream MERGE/dedup is a no-op).

The per-batch body reuses the *batch* operators untouched — no operator
forks between batch and streaming (foreachBatch hands us a plain
DataFrame).  Stateful windows/watermarks are intentionally NOT used:
segmentation needs per-conversation total order, which for append-only
transcript logs is re-established per micro-batch per conv_id (late
turns for an already-materialized conversation land in the mentions
table idempotently and are folded by the next canonicalization run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from docs2kg_spark.config import PipelineConfig
from docs2kg_spark.operators.mentions import extract_fused
from docs2kg_spark.operators.segments import segment_transcripts

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: PipelineConfig | None = None,
    available_now: bool = True,
):
    """readStream(parquet dir) → segments → fused extraction →
    append-mode mentions/triples sinks.  With available_now=True this
    drains everything currently in the directory and stops (the batch
    -compatible trigger used in tests); with False it runs continuously.
    Returns the StreamingQuery."""
    cfg = cfg or PipelineConfig()
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        segs = segment_transcripts(batch_df)
        enriched, mentions, triples = extract_fused(segs, spark, cfg)
        enriched.persist()
        mentions.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{output_dir}/mentions"
        )
        triples.withColumn("_batch_id", F.lit(batch_id)).write.mode("append").parquet(
            f"{output_dir}/triples"
        )
        enriched.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
