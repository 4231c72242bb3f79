"""Capture .explain("formatted") output (and optionally timings) for
registry queries — the measurement harness of the optimization rounds
(guide §1: measure first, keep the before/after plans as evidence).

Usage:
    python tests/capture_plans.py --out plans/r11 --suffix before q1 q2 ...
    python tests/capture_plans.py --time 3 q1 q2 ...   # timings only

Plans are written to <out>/<query>_<suffix>.txt. Timing mirrors
bench.py methodology exactly (wall-clock of fn(spark, sf_dir).collect(),
min of N) so numbers are comparable with BENCH_r*.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="directory for plan files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--time", type=int, default=0, metavar="N",
                    help="also time each query (min of N runs)")
    ap.add_argument("--warm", action="store_true",
                    help="run each query once before timing")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from delta_lake_platform_spark.session import get_spark
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.queries.registry import QUERIES
    from delta_lake_platform_spark.plans.introspect import explain_str

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")

    for name in args.names:
        fn = QUERIES[name]
        if args.out:
            df = fn(spark, sf_dir)
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(explain_str(df))
            print(f"wrote {path}", file=sys.stderr)
        if args.time:
            from delta_lake_platform_spark.blocks import free_persisted_rdds

            spark.sparkContext.setJobDescription(f"time:{name}")
            if args.warm:
                fn(spark, sf_dir).collect()
            reps = []
            for _ in range(args.time):
                free_persisted_rdds(spark)  # bench.py methodology
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                reps.append(round(time.perf_counter() - t0, 3))
            print(f"{name}: min={min(reps)} runs={reps}")
            spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
