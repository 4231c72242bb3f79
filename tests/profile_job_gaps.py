"""Split a query's wall-clock into Spark-job time vs driver-side gaps.

For each named query: run once warm, then run again recording every
Spark job's (start, end) from a SparkListener. Wall time minus the
union of job intervals = driver gap (log/footer JSON reads, planning,
Python, commit bookkeeping). Prints per query: wall, #jobs, job-union
seconds, gap seconds.

Usage: python tests/profile_job_gaps.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    from delta_lake_platform_spark.session import get_spark
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.queries.registry import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job-gaps")
    spark.sparkContext.setLogLevel("ERROR")

    sc = spark.sparkContext
    jvm = sc._jvm
    # Collect job start/end via the status tracker polling is lossy;
    # use the AppStatusStore through the REST-less statusTracker:
    # simpler: wrap with a Python-side listener via the Py4J callback
    # server is heavyweight. Instead poll jobs from the status store
    # after the run using the jobs API.
    store = sc._jsc.sc().statusStore()

    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm
        before_ids = {j.jobId() for j in _jobs(store, jvm)}
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        intervals = []
        njobs = 0
        for j in _jobs(store, jvm):
            if j.jobId() in before_ids:
                continue
            njobs += 1
            st = j.submissionTime()
            en = j.completionTime()
            if st.isDefined() and en.isDefined():
                intervals.append(
                    (st.get().getTime() / 1e3, en.get().getTime() / 1e3)
                )
        union = 0.0
        for s, e in sorted(intervals):
            if not union:
                lo, hi = s, e
                union = 1e-9
                spans = [(s, e)]
                continue
            if s > spans[-1][1]:
                spans.append((s, e))
            elif e > spans[-1][1]:
                spans[-1] = (spans[-1][0], e)
        union_s = sum(e - s for s, e in spans) if intervals else 0.0
        print(
            f"{name}: wall={wall:.2f}s jobs={njobs} "
            f"job_union={union_s:.2f}s driver_gap={wall - union_s:.2f}s"
        )

    spark.stop()


def _jobs(store, jvm):
    it = store.jobsList(None).iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


if __name__ == "__main__":
    main()
