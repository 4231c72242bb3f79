"""Reusable relational operator helpers.

Derived from the reference's dataflow idioms:
- ``latest_per_key`` — the dedupe-to-latest window pattern
  (scd_handler.py:73-74: row_number over partitionBy(pk) orderBy desc,
  filter rn==1).
- ``topk_per_group`` — the same pattern generalized to k rows.
- ``split_matched`` — the inner + left_anti split of incoming rows vs
  an existing keyset (scd_handler.py:111-134).

All are pure DataFrame compositions: Catalyst plans the window with a
single shuffle on the partition keys, and Spark >= 3.3 inserts a
WindowGroupLimit (partial top-k on the map side) for rank<=k filters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column]
) -> DataFrame:
    """One row per key: the first under ``order``. Reference A4/W1."""
    return topk_per_group(df, keys, order, 1).drop("__rn")


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column], k: int
) -> DataFrame:
    """Top-k rows per key group; keeps helper column ``__rn`` (1-based)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)


def split_matched(
    incoming: DataFrame, existing: DataFrame, on: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """(rows whose key exists in ``existing``, rows that are new).

    Mirrors the reference's inner/left_anti pair (scd_handler.py:111-134).
    ``existing`` should be pre-projected to the key columns so the semi
    side stays small (broadcastable when the keyset fits).
    """
    keyset = existing.select(*on).distinct()
    matched = incoming.join(keyset, on=list(on), how="left_semi")
    new = incoming.join(keyset, on=list(on), how="left_anti")
    return matched, new


def stats_planned_join(
    left,
    right,
    on: list[str] | str,
    how: str = "inner",
    broadcast_threshold: int | None = None,
) -> "DataFrame":
    """Join two ManagedTables with an ANALYZE-stats-driven strategy —
    the cost-based decision Spark's CBO makes from ANALYZE TABLE
    statistics, here made explicitly from each table's persisted
    ``column_stats()``:

    - if either side's ``estimated_size_bytes()`` is known, fresh
      (not stale) and under the threshold (default: the session's
      ``spark.sql.autoBroadcastJoinThreshold``), that side is wrapped
      in ``broadcast()`` — the 100 TB fact-to-dimension shape becomes
      a map-side hash join, zero shuffle of the big side;
    - otherwise no hint is added and AQE picks the strategy from
      runtime sizes (sort-merge for big-big).

    Stale stats (DML after the last ANALYZE) are ignored rather than
    trusted — a table that grew 100x since ANALYZE must not be
    broadcast on stale numbers.
    """
    from pyspark.sql import functions as F

    ldf, rdf = left.read(), right.read()
    if broadcast_threshold is None:
        thr = ldf.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        broadcast_threshold = (
            int(thr[:-1]) * 1024 if str(thr).endswith("b") else int(thr)
        )

    def _fresh_size(t):
        st = t.column_stats()
        if st is None or st.get("stale"):
            return None
        return t.estimated_size_bytes()

    lsz, rsz = _fresh_size(left), _fresh_size(right)
    # Broadcast the provably-small side; prefer the smaller of two.
    candidates = [
        (sz, name)
        for sz, name in ((lsz, "l"), (rsz, "r"))
        if sz is not None and 0 <= sz <= broadcast_threshold
    ]
    if candidates:
        _, side = min(candidates)
        if side == "l":
            ldf = F.broadcast(ldf)
        else:
            rdf = F.broadcast(rdf)
    return ldf.join(rdf, on=on, how=how)
