"""Scale-and-skew stress runner (round-4 verdict item 1).

Generate self-synthesized stress fixtures (schema-identical to the
driver's TESTDATA tables; fixtures.stress docstring explains why value
parity is out of scope) and time the FULL query surface against them:

    python jobs/stress.py --generate sf1   # localdata/sf1 (10x sf0.1)
    python jobs/stress.py --generate sf01  # localdata/sf01 (same-size control)
    python jobs/stress.py --generate skew  # localdata/skew (hot keys)
    python jobs/stress.py --run localdata/sf01 --out BENCH/stress_sf01.json
    python jobs/stress.py --run localdata/sf1 --out BENCH/stress_sf1.json
    python jobs/stress.py --compare BENCH/stress_sf01.json BENCH/stress_sf1.json

The compare prints per-query wall ratios (sf1 / sf01) sorted worst
first; with perfectly linear scaling the ratio is ~10 for data-bound
queries and ~1 for constant-size ones.  Queries whose sf1 wall is
below --floor (default 2 s) are reported but never counted as
offenders — at that absolute cost fixed overheads dominate and the
ratio is noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark(cpus: int):
    from docs2kg_spark.session import get_spark

    return get_spark(
        app_name="stress",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32),
    )


def _force(df) -> int:
    return df.count()


def cmd_generate(which: str, cpus: int) -> None:
    from docs2kg_spark.fixtures.stress import gen_tables

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.monotonic()
    if which == "sf1":
        counts = gen_tables(spark, "localdata/sf1", scale=1.0)
    elif which == "sf01":
        counts = gen_tables(spark, "localdata/sf01", scale=0.1)
    elif which == "skew":
        counts = gen_tables(
            spark,
            "localdata/skew",
            scale=0.1,
            skew={"hot_user_frac": 0.3, "hot_source_frac": 0.5, "hot_doc_frac": 0.2},
        )
    else:
        raise SystemExit(f"unknown fixture {which}")
    print(json.dumps({"fixture": which, "counts": counts,
                      "secs": round(time.monotonic() - t0, 1)}))
    spark.stop()


def cmd_run(sf_dir: str, out: str, cpus: int, only: list[str] | None) -> None:
    from docs2kg_spark.queries import SPARK_QUERIES

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    secs: dict[str, float] = {}
    errs: dict[str, str] = {}
    t_all = time.monotonic()
    for name, fn in SPARK_QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            n = _force(fn(spark, sf_dir))
            secs[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — survey run, keep going
            errs[name] = f"{type(exc).__name__}: {exc}"[:300]
            secs[name] = round(time.monotonic() - t0, 3)
        print(f"{name}: {secs[name]}s" + (" ERR" if name in errs else ""),
              file=sys.stderr, flush=True)
    result = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "total_secs": round(time.monotonic() - t_all, 1),
        "queries": secs,
        "errors": errs,
    }
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"total_secs": result["total_secs"],
                      "n_queries": len(secs), "n_errors": len(errs)}))
    spark.stop()


def cmd_compare(base_path: str, big_path: str, floor: float, budget: float) -> int:
    base = json.load(open(base_path))["queries"]
    big = json.load(open(big_path))["queries"]
    rows = []
    for name, tb in big.items():
        t0 = base.get(name)
        if t0 is None:
            continue
        ratio = tb / max(t0, 0.001)
        rows.append((ratio, name, t0, tb))
    rows.sort(reverse=True)
    offenders = []
    print(f"{'query':42s} {'base_s':>8s} {'big_s':>8s} {'ratio':>7s}")
    for ratio, name, t0, tb in rows[:40]:
        flag = ""
        if tb >= floor and ratio > budget:
            offenders.append(name)
            flag = "  <-- OVER BUDGET"
        print(f"{name:42s} {t0:8.2f} {tb:8.2f} {ratio:7.1f}{flag}")
    print(f"\n{len(offenders)} over budget (ratio > {budget} at wall >= {floor}s): {offenders}")
    return 1 if offenders else 0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--generate", choices=["sf1", "sf01", "skew"])
    p.add_argument("--run", metavar="SF_DIR")
    p.add_argument("--out", default="BENCH/stress.json")
    p.add_argument("--only", help="comma-separated query names")
    p.add_argument("--compare", nargs=2, metavar=("BASE", "BIG"))
    p.add_argument("--floor", type=float, default=2.0)
    p.add_argument("--budget", type=float, default=20.0,
                   help="max allowed big/base wall ratio for 10x data")
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = p.parse_args()
    if args.generate:
        cmd_generate(args.generate, args.cpus)
    elif args.run:
        cmd_run(args.run, args.out, args.cpus,
                args.only.split(",") if args.only else None)
    elif args.compare:
        sys.exit(cmd_compare(args.compare[0], args.compare[1], args.floor, args.budget))
    else:
        p.error("need --generate, --run, or --compare")


if __name__ == "__main__":
    main()
