"""Itemized wall-clock profile of one streaming-maintenance fold
(VERDICT r11 #1/#7: attribute the fold-path regression to specific
guard/commit phases and record the guard OFF/ON delta).

Monkeypatch-accumulates time per phase across a query run:
- ManagedTable log/metadata calls (exists, latest_version, watermark,
  last_txn_version, table_schema, read-relation builds)
- commit internals (staged write, footer scan, entry write,
  verify_constraints)
- block hygiene (snapshot_persisted / unpersist_new_since)
- the fold build itself (Spark jobs) and the localCheckpoint
- residual = engine/WAL/planning overhead

Not a pytest module — run directly:
    python tests/profile_fold_phases.py [decayed|hh|scd|mv|all]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TIMES: dict[str, float] = defaultdict(float)
COUNTS: dict[str, int] = defaultdict(int)


def _wrap(obj, name, label):
    orig = getattr(obj, name)

    def timed(*a, **k):
        t = time.perf_counter()
        try:
            return orig(*a, **k)
        finally:
            TIMES[label] += time.perf_counter() - t
            COUNTS[label] += 1

    setattr(obj, name, timed)
    return orig


def reset():
    TIMES.clear()
    COUNTS.clear()


def dump(title, total):
    print(f"\n== {title}  wall {total:.2f}s")
    acc = 0.0
    for label in sorted(TIMES, key=lambda l: -TIMES[l]):
        print(f"  {TIMES[label]*1000:8.0f} ms  x{COUNTS[label]:<4d} {label}")
        if not label.startswith("("):
            acc += TIMES[label]
    print(f"  {'-'*40}\n  sum of leaf phases ~ {acc:.2f}s (phases overlap/nest; residual vs wall = engine+planning)")


def instrument():
    from delta_lake_platform_spark.sources import managed_table as mt
    from delta_lake_platform_spark import blocks
    import delta_lake_platform_spark.streaming.decayed as dec

    unpatch = []
    M = mt.ManagedTable
    for name, label in [
        ("exists", "log: exists()"),
        ("latest_version", "log: latest_version()"),
        ("last_txn_version", "log: last_txn_version()"),
        ("table_schema", "log: table_schema()"),
        ("read", "read(): relation build"),
        ("_write_data_staged", "commit: staged write job"),
        ("_write_entry", "commit: entry write"),
        ("verify_constraints", "commit: verify_constraints"),
        ("_fill_defaults", "commit: fill_defaults"),
        ("_fill_identity", "commit: fill_identity"),
        ("_fill_generated", "commit: fill_generated"),
        ("overwrite", "(overwrite total)"),
        ("append", "(append total)"),
        ("merge", "(merge total)"),
    ]:
        if hasattr(M, name):
            unpatch.append((M, name, _wrap(M, name, label)))
    unpatch.append(
        (mt, "_scan_parquet_footers", _wrap(mt, "_scan_parquet_footers", "commit: footer scan"))
    )
    unpatch.append(
        (blocks, "snapshot_persisted", _wrap(blocks, "snapshot_persisted", "blocks: snapshot"))
    )
    unpatch.append(
        (blocks, "unpersist_new_since", _wrap(blocks, "unpersist_new_since", "blocks: unpersist"))
    )
    unpatch.append(
        (dec, "_batch_watermark", _wrap(dec, "_batch_watermark", "(watermark total)"))
    )

    # time the fold build (incl. localCheckpoint job) inside the guard
    orig_guard = dec._fold_with_guard

    def guarded(state, stream_id, batch_id, family, build, retries=5):
        def timed_build(rv):
            t = time.perf_counter()
            try:
                return build(rv)
            finally:
                TIMES["fold: build+checkpoint"] += time.perf_counter() - t
                COUNTS["fold: build+checkpoint"] += 1

        t = time.perf_counter()
        try:
            return orig_guard(state, stream_id, batch_id, family, timed_build, retries)
        finally:
            TIMES["(fold_with_guard total)"] += time.perf_counter() - t
            COUNTS["(fold_with_guard total)"] += 1

    dec._fold_with_guard = guarded
    unpatch.append((dec, "_fold_with_guard", orig_guard))
    # heavy_hitters imported the symbol by name
    import delta_lake_platform_spark.streaming.heavy_hitters as hh

    if hasattr(hh, "_fold_with_guard"):
        orig_hh = hh._fold_with_guard
        hh._fold_with_guard = guarded
        unpatch.append((hh, "_fold_with_guard", orig_hh))
    return unpatch


def run(spark, qname):
    from delta_lake_platform_spark.queries.registry import QUERIES
    import delta_lake_platform_spark.queries.all  # noqa: F401

    # warm run (uninstrumented codegen/JIT paid)
    QUERIES[qname](spark, SF_DIR).collect()
    from delta_lake_platform_spark.blocks import free_persisted_rdds

    free_persisted_rdds(spark)
    reset()
    unpatch = instrument()
    t0 = time.perf_counter()
    try:
        QUERIES[qname](spark, SF_DIR).collect()
    finally:
        wall = time.perf_counter() - t0
        for obj, name, orig in unpatch:
            setattr(obj, name, orig)
    free_persisted_rdds(spark)
    dump(qname, wall)


if __name__ == "__main__":
    from delta_lake_platform_spark.session import get_spark

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    targets = {
        "decayed": ["events_decayed_maintained"],
        "hh": ["events_stream_heavy_hitters"],
        "scd": ["scd_stream_maintained_customers"],
        "mv": [
            "mv_minmax_orders_by_status",
            "mv_nullkey_orders_by_priority",
            "mv_join_orders_customers",
        ],
    }
    names = targets.get(which) or [q for qs in targets.values() for q in qs]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_fold_phases", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for q in names:
        run(spark, q)
    spark.stop()
