"""Phase-level wall-clock profile of the streaming-maintenance
queries (VERDICT r10 #2 targets: docs_stream_neardup_gate <= 5s,
docs_bm25_stream_maintained <= 4s at sf0.1 quiet).

Not a pytest module — run directly:
    python tests/profile_stream_folds.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Marks:
    def __init__(self):
        self.t0 = time.perf_counter()
        self.last = self.t0
        self.rows = []

    def mark(self, label):
        now = time.perf_counter()
        self.rows.append((label, now - self.last))
        self.last = now

    def dump(self, title):
        print(f"\n== {title}  total {self.last - self.t0:.2f}s")
        for label, dt in self.rows:
            print(f"  {dt * 1000:8.0f} ms  {label}")


def profile_bm25_stream(spark):
    from delta_lake_platform_spark.queries.tpch import load_table
    from delta_lake_platform_spark.operators.search import bm25_probe_index
    from delta_lake_platform_spark.sources.managed_table import ManagedTable
    from delta_lake_platform_spark.streaming import search_index as si

    m = Marks()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    d = tempfile.mkdtemp(prefix="prof_bm25_stream_")
    src = f"{d}/src"
    docs.repartition(4).write.parquet(src)
    m.mark("src parquet write")
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    idx = ManagedTable(spark, f"{d}/idx")

    # wrap build/extend to time each fold
    orig_build, orig_extend = si.build_bm25_index, si.extend_bm25_index

    def timed_build(*a, **k):
        t = time.perf_counter()
        r = orig_build(*a, **k)
        m.rows.append(("  fold: build", time.perf_counter() - t))
        return r

    def timed_extend(*a, **k):
        t = time.perf_counter()
        r = orig_extend(*a, **k)
        m.rows.append(("  fold: extend", time.perf_counter() - t))
        return r

    si.build_bm25_index = timed_build
    si.extend_bm25_index = timed_extend
    try:
        si.bm25_maintain_stream(stream, idx, f"{d}/ckpt", stream_id="prof")
    finally:
        si.build_bm25_index, si.extend_bm25_index = orig_build, orig_extend
    m.last = time.perf_counter()
    m.rows.append(("stream drain TOTAL (incl folds above)", m.last - m.t0))
    t = time.perf_counter()
    bm25_probe_index(idx, "spark stream window merge", k=15).orderBy(
        "rank"
    ).collect()
    m.mark("probe")
    shutil.rmtree(d, ignore_errors=True)
    m.dump("docs_bm25_stream_maintained")


def profile_gate(spark):
    from delta_lake_platform_spark.queries.registry import QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401
    from delta_lake_platform_spark.streaming import dedup_gate as dg

    m = Marks()
    orig = dg.neardup_gate_stream

    def timed(*a, **k):
        t = time.perf_counter()
        r = orig(*a, **k)
        m.rows.append(("  gate stream drain", time.perf_counter() - t))
        return r

    dg.neardup_gate_stream = timed
    # the query module imported the symbol at call time via the module,
    # so patch where it is looked up
    import delta_lake_platform_spark.queries.streaming_queries as sq

    had = getattr(sq, "neardup_gate_stream", None)
    try:
        QUERIES["docs_stream_neardup_gate"](spark, SF_DIR).collect()
    finally:
        dg.neardup_gate_stream = orig
        if had is not None:
            sq.neardup_gate_stream = had
    m.mark("query end-to-end (incl drain above)")
    m.dump("docs_stream_neardup_gate")


def profile_ivf_stream(spark):
    from delta_lake_platform_spark.queries.registry import QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401

    m = Marks()
    QUERIES["ann_ivf_stream_maintained"](spark, SF_DIR).collect()
    m.mark("query end-to-end")
    m.dump("ann_ivf_stream_maintained")


if __name__ == "__main__":
    from delta_lake_platform_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile_stream_folds",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: pay JVM/codegen/first-job costs outside the marks
    profile_bm25_stream(spark)
    print("\n######## warm runs below ########")
    for fn in (profile_bm25_stream, profile_gate, profile_ivf_stream):
        fn(spark)
    spark.stop()
