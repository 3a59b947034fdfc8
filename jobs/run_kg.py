#!/usr/bin/env python
"""spark-submit entry point for the KG construction pipeline.

Cluster usage (north_rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    cd /root/repo && zip -r /tmp/docs2kg_spark.zip docs2kg_spark
    spark-submit --py-files /tmp/docs2kg_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        jobs/run_kg.py --input <transcripts parquet/iceberg path> \
        --workdir <checkpoint/output dir> [--no-resume]

Local smoke:

    python jobs/run_kg.py --synthesize 1000 --workdir /tmp/kg_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running as `python jobs/run_kg.py` puts jobs/ (not the repo root) on
# sys.path; under spark-submit --py-files the zip provides the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts table path (parquet dir)")
    p.add_argument("--synthesize", type=int, default=0, help="generate N synthetic conversations instead of --input")
    p.add_argument(
        "--distributed-synthesis",
        action="store_true",
        help="synthesize in executors (mapInPandas, per-conv RNG) — not driver-bounded, "
        "for fixture sizes beyond a few million turns; content differs from the "
        "driver-side generator (independent RNG streams)",
    )
    p.add_argument("--workdir", required=True, help="stage checkpoint + output directory")
    p.add_argument("--no-resume", action="store_true", help="recompute all stages")
    p.add_argument("--master", default=None, help="override master (default: from spark-submit / local[*])")
    args = p.parse_args(argv)

    from docs2kg_spark.plans import run_pipeline
    from docs2kg_spark.session import get_spark

    spark = get_spark(app_name="docs2kg_kg_construct", master=args.master)
    if args.synthesize and args.distributed_synthesis:
        from docs2kg_spark.fixtures import transcripts_spark

        transcripts = transcripts_spark(spark, args.synthesize, 10, seed=7)
    elif args.synthesize:
        from docs2kg_spark.fixtures import transcripts_pandas

        transcripts = spark.createDataFrame(transcripts_pandas(args.synthesize, 10, seed=7))
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        p.error("need --input or --synthesize")

    res = run_pipeline(spark, transcripts, args.workdir, resume=not args.no_resume)
    summary = {
        "fingerprint": res["fingerprint"],
        "stage_times": {k: round(v, 2) for k, v in res["stage_times"].items()},
        "counts": {
            k: res[k].count()
            for k in ("segments", "mentions", "triples", "canonical_map", "kg_nodes", "kg_edges")
        },
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
