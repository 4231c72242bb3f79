"""Distributed dense identity assignment — the Spark-native equivalent
of the reference's Delta identity column (``account_key BIGINT
GENERATED ALWAYS AS IDENTITY (START WITH 10)``, reference
test_scd_handler.py:41).

Spark has no engine-managed identity columns, and the two obvious
substitutes both fail at scale or at correctness:

- ``row_number()`` over a global window = Exchange SinglePartition —
  every row through one task; dead at 100 TB.
- ``monotonically_increasing_id()`` alone is sparse and placement-
  dependent — not dense, not reproducible.

The scalable shape (the same one RDD ``zipWithIndex`` uses, expressed
DataFrame-first): range-partition by the ordering key, sort within
partitions, let ``monotonically_increasing_id`` provide the
per-partition sequential counter, then add per-partition offsets
computed from partition row counts. Offsets are one tiny collect
(#partitions rows); no row ever passes through a single task, and with
unique ordering keys the result equals the global
``ROW_NUMBER() OVER (ORDER BY ...)`` — which is exactly what makes it
oracle-checkable and reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Below this optimizer size estimate, a global ROW_NUMBER window (one
# Exchange SinglePartition) beats the range-partition machinery: its
# sort folds into the consuming job — zero extra jobs — versus the
# scalable path's sampling job + eager checkpoint + offsets collect.
# 64 MB through one task is milliseconds; the estimate comes from the
# optimized plan's stats (driver-side, no job), and anything unknown or
# join-inflated falls through to the scalable path.
SMALL_BATCH_BYTES = 64 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the plan (file sizes for scans,
    propagated through the operators). None when unavailable."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return None

# monotonically_increasing_id() = (partition_id << 33) + in-partition
# sequence (Spark's documented layout; 8 billion rows per partition).
_MID_SEQ_BITS = 33
_MID_SEQ_MASK = (1 << _MID_SEQ_BITS) - 1


def _range_sorted(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Range-partition + in-partition sort: ascending partition id ==
    ascending key range, rows sorted inside each partition. Exposed for
    the plan-shape test (the public API checkpoints, which truncates
    the visible plan)."""
    cols = [F.col(c) for c in order_cols]
    parted = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    return parted.sortWithinPartitions(*cols)


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    start: int = 1,
    id_col: str = "row_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` = ``start - 1 + rank(order_cols)`` (dense,
    gap-free, deterministic when ``order_cols`` are unique per row).

    Cost: one range shuffle + in-partition sort, a #partitions-row
    collect for the offsets, zero single-partition stages. The
    checkpoint pins partition placement so the offset job and the id
    job see identical layouts.

    Small-batch fast path: when the optimizer's size estimate says the
    input is tiny (< ``SMALL_BATCH_BYTES``), a plain global ROW_NUMBER
    window is used instead — same result, ZERO extra jobs (the sort
    folds into whichever job consumes the frame), and the single
    partition it implies is exactly right at that size. Unknown or
    large estimates take the scalable path, so a 100 TB initial load
    never sees a single-partition stage.
    """
    est = _plan_size_bytes(df) if num_partitions is None else None
    if est is not None and 0 <= est < SMALL_BATCH_BYTES:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.select(
            "*",
            (F.lit(start) - 1 + F.row_number().over(w))
            .cast("long")
            .alias(id_col),
        )
    pinned = _range_sorted(df, order_cols, num_partitions).localCheckpoint(
        eager=True
    )
    return _ids_over_pinned(pinned, start, id_col)


def assign_unique_ids(
    df: DataFrame, start: int = 1, id_col: str = "row_id", step: int = 1
) -> DataFrame:
    """Batch-dense unique ids WITHOUT an ordering contract — the
    GENERATED ALWAYS AS IDENTITY allocation path. The batch keeps its
    existing partitioning (no shuffle at all); per-partition sequences
    come from ``monotonically_increasing_id`` and cross-partition
    offsets from a #partitions-row collect over the pinned layout.
    Values are ``start, start+step, ...`` — exactly #rows ids, but
    WHICH row gets which id depends on partition placement (identity
    columns guarantee uniqueness, not order — Delta's contract)."""
    pinned = df.localCheckpoint(eager=True)
    return _ids_over_pinned(pinned, start, id_col, step=step)


def _ids_over_pinned(
    pinned: DataFrame,
    start: int,
    id_col: str,
    step: int = 1,
) -> DataFrame:
    with_mid = pinned.select(
        "*", F.monotonically_increasing_id().alias("__mid")
    )
    pid = F.shiftrightunsigned(F.col("__mid"), _MID_SEQ_BITS)
    seq = F.col("__mid").bitwiseAND(F.lit(_MID_SEQ_MASK))

    counts = (
        with_mid.groupBy(pid.alias("__pid")).count().collect()
    )  # one row per partition — driver-side is O(#partitions), not O(rows)
    sizes = {int(r["__pid"]): r["count"] for r in counts}
    offsets, acc = {}, 0
    for p in sorted(sizes):  # ascending pid == ascending key range
        offsets[p] = acc
        acc += sizes[p]
    if not offsets:
        return pinned.select(
            "*", F.lit(None).cast("long").alias(id_col)
        ).limit(0)
    off_map = F.create_map(
        *[F.lit(x) for p_off in sorted(offsets.items()) for x in p_off]
    )
    return (
        with_mid.select(
            "*",
            (
                F.lit(start)
                + F.lit(step) * (off_map[pid].cast("long") + seq)
            ).cast("long").alias(id_col),
        )
        .drop("__mid")
    )


def fill_identity(
    df: DataFrame,
    id_col: str,
    order_cols: list[str],
    next_value: int,
) -> DataFrame:
    """GENERATED-ALWAYS semantics for an incremental write: rows whose
    ``id_col`` is null receive fresh dense ids starting at
    ``next_value`` (ordered by ``order_cols``); rows that already have
    one keep it. This is the SCD insert path: surviving versions keep
    their surrogate key, brand-new rows and new SCD2 versions draw from
    the table's high-water mark."""
    keep = df.filter(F.col(id_col).isNotNull())
    fresh = assign_dense_ids(
        df.filter(F.col(id_col).isNull()).drop(id_col),
        order_cols,
        start=next_value,
        id_col=id_col,
    )
    return keep.unionByName(fresh.select(*df.columns))
