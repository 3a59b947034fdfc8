"""docs2kg_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the capabilities of AI4WA/Docs2KG, re-targeted
to Iceberg/Parquet-backed multi-turn conversation transcripts.

The reference (/root/reference, snapshot 2025-03-10) is a single-threaded
batch ETL pipeline; this package re-expresses every one of its dataflow
steps (SURVEY.md §2) as distributed DataFrame transforms designed for
10^12-turn scale: stable-ordered segmentation (windows), vectorized
mention extraction (Arrow pandas UDFs over a broadcast gazetteer),
co-occurrence triple emission, MinHash-LSH entity linking with
large-star/small-star connected components, and Neo4j-loadable
node/edge table materialization — plus the training-data operators a
100 TB corpus pipeline needs (dedup family, ANN similarity, text
quality, multimodal plumbing).
"""

__version__ = "0.1.0"
