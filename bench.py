"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The per-query time is wall-clock for plan + execute + collect (the
driver-visible latency). Each query runs once after a warm-up of the
flagship (JVM + parquet footer caches warm, as a long-lived cluster
would be).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from delta_lake_platform_spark.session import get_spark
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.queries.registry import QUERIES

    spark = get_spark("dlp-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT + parquet footers.
    QUERIES["q1_pricing_summary"](spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name, fn in sorted(QUERIES.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
