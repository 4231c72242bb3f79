"""Dump every Spark job of one warm query run: duration, #tasks,
description — the "which jobs does one fold actually run" evidence the
fold-phase profiler can't see (it times Python calls, not jobs).

Usage: python tests/profile_job_dump.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _jobs(store):
    it = store.jobsList(None).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def main() -> None:
    names = sys.argv[1:]
    from delta_lake_platform_spark.session import get_spark
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.queries.registry import QUERIES
    from delta_lake_platform_spark.blocks import free_persisted_rdds

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-dump")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark.sparkContext._jsc.sc().statusStore()

    for name in names:
        QUERIES[name](spark, sf_dir).collect()  # warm
        free_persisted_rdds(spark)
        before = {j.jobId() for j in _jobs(store)}
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        rows = []
        for j in _jobs(store):
            if j.jobId() in before:
                continue
            st, en = j.submissionTime(), j.completionTime()
            if not (st.isDefined() and en.isDefined()):
                continue
            dur = (en.get().getTime() - st.get().getTime()) / 1e3
            desc = j.description()
            desc = desc.get() if desc.isDefined() else ""
            rows.append(
                (
                    st.get().getTime(),
                    dur,
                    j.numTasks(),
                    " ".join(str(desc).split())[:90],
                )
            )
        rows.sort()
        print(f"\n== {name}  wall {wall:.2f}s  jobs {len(rows)}  "
              f"job-sum {sum(r[1] for r in rows):.2f}s")
        prev_end = None
        for ts, dur, ntasks, desc in rows:
            gap = "" if prev_end is None else f" (+{(ts - prev_end)/1e3:.2f}s gap)"
            prev_end = ts + dur * 1e3
            print(f"  {dur*1000:7.0f} ms  {ntasks:4d} tasks  {desc}{gap}")
        free_persisted_rdds(spark)

    spark.stop()


if __name__ == "__main__":
    main()
