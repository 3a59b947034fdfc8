"""CLI wrapper around docs2kg_spark.plans.audit: scan every
SPARK_QUERIES plan for partition-less ORDERED WindowExec nodes (the
single-reducer global sorts).  The enforcing version of this scan is
tests/test_plan_meta.py; this tool exists for ad-hoc runs against other
sf dirs or query subsets:

    python tools/scan_global_windows.py [SF_DIR] [name1,name2,...]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from docs2kg_spark.plans.audit import global_ordered_windows, physical_plan
    from docs2kg_spark.queries import SPARK_QUERIES
    from docs2kg_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(app_name="window_scan", master="local[8]", shuffle_partitions=8)
    flagged = {}
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        try:
            gw = global_ordered_windows(physical_plan(fn(spark, sf_dir)))
            if gw:
                flagged[name] = gw
                print(f"FLAG {name}: {len(gw)} global ordered window(s)")
                for g in gw:
                    print(f"    {g}")
        except Exception:
            print(f"ERR {name}")
            traceback.print_exc(limit=2)
    print(f"\n{len(flagged)} flagged of {len(only or SPARK_QUERIES)}")
    spark.stop()


if __name__ == "__main__":
    main()
