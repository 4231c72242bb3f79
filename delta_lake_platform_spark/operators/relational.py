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


_SIZE_SUFFIXES = {
    "b": 1, "k": 1024, "kb": 1024, "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3, "t": 1024**4, "tb": 1024**4,
}


def _parse_size_bytes(s) -> int:
    """Spark size-conf parser (the `10MB` / `1g` / `10485760b` forms
    spark.sql.autoBroadcastJoinThreshold actually takes): bare numbers
    are bytes; a 'b' suffix is bytes too (NOT KiB); k/m/g/t multiply
    by 1024 powers. -1 (broadcast disabled) passes through."""
    import re as _re

    s = str(s).strip().lower()
    m = _re.fullmatch(r"(-?\d+)\s*([kmgt]?b?)", s)
    if not m:
        raise ValueError(f"cannot parse size {s!r}")
    n, suffix = int(m.group(1)), m.group(2)
    return n * _SIZE_SUFFIXES.get(suffix, 1)


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
        broadcast_threshold = _parse_size_bytes(thr)

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


def dynamic_pruned_join(
    fact,
    dim: "DataFrame",
    fact_key: str,
    dim_key: str | None = None,
    how: str = "inner",
    max_probe_values: int = 10_000,
) -> "DataFrame":
    """Dynamic file pruning (the Databricks DFP / Delta
    findTouchedFiles shape, applied to READ-side joins): before
    joining a big managed ``fact`` table to a selective ``dim`` frame,
    aggregate the dim's join-key domain — min/max always, the exact
    distinct set when it is small — and skip every fact FILE the
    commit-log stats prove cannot match:

    - the [min,max] range prunes on footer stats;
    - when the dim has <= ``max_probe_values`` distinct keys and the
      table carries a bloom index for the key, each surviving file's
      bloom is probed with the exact key set (files whose range
      straddles the dim domain but provably contain none of its keys
      drop too).

    One tiny aggregation job on the DIM side (driver-collected: 3
    scalars + at most max_probe_values keys); ZERO reads of fact data
    for the decision. At 100 TB with a selective dimension this is
    the difference between scanning the fact table and scanning the
    handful of files that can join. Inner/semi joins only — an outer
    join must keep unmatched fact rows, so pruning would be unsound
    and raises.

    The exact join still runs on the survivors (stats and blooms are
    superset bounds). The dim side is broadcast: a frame small enough
    to drive pruning is small enough to hash-join map-side.
    """
    from pyspark.sql import functions as F

    if how not in ("inner", "semi", "left_semi", "leftsemi"):
        raise ValueError(
            f"dynamic_pruned_join: how={how!r} would need unmatched fact "
            "rows, which file pruning removes; use inner/semi"
        )
    dim_key = dim_key or fact_key
    agg = dim.agg(
        F.min(dim_key).alias("lo"),
        F.max(dim_key).alias("hi"),
        F.count_distinct(dim_key).alias("ndv"),
    ).first()
    if agg["lo"] is None:
        # Empty/all-NULL dim: the inner/semi join is empty, but the
        # OUTPUT SCHEMA must be identical to the non-empty path — build
        # it through the very same join below on a provably-empty
        # pruned frame (a literal-false filter, no files read).
        pruned = fact.read().filter(F.lit(False))
    else:
        eq_values = None
        if agg["ndv"] <= max_probe_values:
            eq_values = {
                fact_key: [
                    r[0] for r in dim.select(dim_key).distinct().collect()
                ]
            }
        pruned = fact.read_pruned_multi(
            {fact_key: (agg["lo"], agg["hi"])},
            eq_values=eq_values,
        )
    if fact_key == dim_key:
        # name-join form: one output key column, never ambiguous
        return pruned.join(F.broadcast(dim), on=fact_key, how=how)
    return pruned.join(
        F.broadcast(dim), pruned[fact_key] == dim[dim_key], how
    )
