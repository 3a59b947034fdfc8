#!/usr/bin/env python
"""spark-submit entry point for the analytics query surface: run any
registered query (138 in `docs2kg_spark.queries.SPARK_QUERIES`) against
a table directory, print a sample or write parquet.

    spark-submit --py-files /tmp/docs2kg_spark.zip jobs/run_query.py \
        --sf-dir /root/testdata/sf0.1 --query kg_triples \
        [--out /path/out.parquet] [--show 20] [--explain]

    python jobs/run_query.py --list        # enumerate query names
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="table directory (parquet per table)")
    p.add_argument("--query", action="append", default=[], help="query name (repeatable)")
    p.add_argument("--list", action="store_true", help="list registered query names and exit")
    p.add_argument("--out", help="write result parquet here (single query only)")
    p.add_argument("--show", type=int, default=20, help="rows to print when not writing")
    p.add_argument("--explain", action="store_true", help="print the formatted physical plan")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from docs2kg_spark.queries import SPARK_QUERIES

    if args.list:
        for name in sorted(SPARK_QUERIES):
            print(name)
        return 0
    if not args.query:
        p.error("need --query (or --list)")
    unknown = [q for q in args.query if q not in SPARK_QUERIES]
    if unknown:
        p.error(f"unknown queries: {unknown} (see --list)")
    if args.out and len(args.query) != 1:
        p.error("--out takes exactly one --query")

    from docs2kg_spark.session import get_spark

    spark = get_spark(app_name="docs2kg_query", master=args.master)
    for name in args.query:
        df = SPARK_QUERIES[name](spark, args.sf_dir)
        if args.explain:
            print(f"== {name} ==")
            df.explain("formatted")
        t0 = time.monotonic()
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            n = spark.read.parquet(args.out).count()
            print(f"{name}: wrote {n} rows to {args.out} in {time.monotonic() - t0:.2f}s")
        else:
            df.show(args.show, truncate=80)
            print(f"{name}: {df.count()} rows in {time.monotonic() - t0:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
