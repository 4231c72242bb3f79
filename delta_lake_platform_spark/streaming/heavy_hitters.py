"""Streaming maintenance of a Misra-Gries heavy-hitters summary.

Completes the streaming-maintenance family (SCD2, materialized views,
decayed aggregates, quarantine): "which keys dominate the stream,
always current" with BOUNDED state, never a recompute over history.

The fold rides the MG summary's mergeability (Agarwal et al. 2012 —
see operators/sketches.py::mg_truncate): each micro-batch's exact
per-key counts are summed into the persisted state and the result is
truncated back to ``m`` counters. Across any number of folds the
estimate for every key satisfies

    true - N/(m+1)  <=  est  <=  true        (N = rows seen so far)

and any key with true count > N/(m+1) is guaranteed present. With
``m`` at or above the key cardinality nothing is ever truncated and
the maintained counts are EXACT — the provable construction the
oracled registry query uses; the bound regime is test-pinned
separately.

Exactly-once across micro-batch replays uses the same
commitInfo.userMetadata watermark contract as streaming/decayed.py —
including its r11 concurrent-writer guard (``_fold_with_guard``): the
batch id rides the commit that publishes the folded state, a replayed
id at-or-below the watermark is a no-op, and a peer committing
between the watermark check and the publish is detected via the
snapshot-anchored overwrite and resolved by re-reading the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import mg_truncate
from ..sources.managed_table import ManagedTable
from .decayed import _fold_with_guard  # shared watermark + race guard


def heavy_hitters_maintain_stream(
    stream_df: DataFrame,
    state: ManagedTable,
    checkpoint_dir: str,
    key_col: str = "user_id",
    m: int = 64,
    stream_id: str = "hh_stream",
) -> int:
    """Drain ``stream_df`` (availableNow), folding each micro-batch's
    key counts into the ``state`` summary table (columns: ``key_col``,
    ``mg_count``). Returns the number of batches folded (replays are
    skipped, not counted)."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded

        def _build(rv: int | None) -> DataFrame:
            bc = batch.groupBy(key_col).agg(
                F.count(F.lit(1)).alias("mg_count")
            )
            merged = (
                state.read(rv)
                .select(key_col, "mg_count")
                .unionByName(bc)
                .groupBy(key_col)
                .agg(F.sum("mg_count").alias("mg_count"))
                if rv is not None
                else bc
            )
            # the PINNED snapshot read keeps the lazy frame stable; the
            # threshold probe inside mg_truncate and the commit's
            # staged write are its only evaluations (a union-agg over
            # state + batch — cheaper re-run than a fold-time
            # checkpoint job + per-fold block hygiene)
            return mg_truncate(merged, m, key_col)

        if _fold_with_guard(state, stream_id, batch_id, "hh", _build):
            n_folded += 1

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
