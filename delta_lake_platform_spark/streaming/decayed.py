"""Streaming maintenance of exponentially time-decayed aggregates.

``temporal.decayed_agg_update`` is associative and commutative (decay
re-anchors by one multiply), so a foreachBatch sink can FOLD each
micro-batch into a persisted state table in O(batch + state keys) —
the feature-store "decayed engagement, always current" loop, never a
recompute over history.

Exactly-once across micro-batch replays rides commitInfo.userMetadata:
the batch id is attached to the SAME commit that publishes the folded
state (``set_commit_metadata`` — atomic, survives retry), and a
replayed batch id at-or-below the recorded watermark is a no-op. This
is the overwrite-shaped sibling of the append-path txnAppId/txnVersion
contract (appends carry the watermark in ``txn`` actions; an overwrite
replaces the whole state, so the watermark travels in the commit's own
audit field).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.temporal import decayed_agg_update, decayed_agg_with_anchor
from ..sources.managed_table import ManagedTable

_STATE_COLS = (
    "n_events", "decayed_sum", "decayed_count", "anchor_ts", "decayed_avg"
)


def _batch_watermark(
    state: ManagedTable, stream_id: str, family: str = "decayed"
) -> int | None:
    """Highest batch id recorded in the state's commit metadata.
    ``family`` namespaces the audit tag per maintenance kind (decayed
    folds and heavy-hitter folds share this watermark contract)."""
    if not state.exists():
        return None
    tag = f"{family}:{stream_id}:batch="
    # newest-first scan exits at the first fold commit — normally entry
    # 0 or 1 (an OPTIMIZE/VACUUM may interleave); a pathological run of
    # foreign commits degrades to a full log listing, the same cost
    # class as the state read the fold performs anyway
    for entry in state.history():
        meta = entry.get("userMetadata") or ""
        if meta.startswith(tag):
            return int(meta[len(tag):])
    return None


def decayed_maintain_stream(
    stream_df: DataFrame,
    state: ManagedTable,
    checkpoint_dir: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_seconds: float = 7 * 86400.0,
    stream_id: str = "decayed_stream",
) -> int:
    """Drain ``stream_df`` (availableNow), folding each micro-batch
    into ``state``. Returns the number of micro-batches folded
    (replayed batches are skipped, not counted).

    Same contract as Delta's foreachBatch txnAppId guidance:
    ``stream_id`` names the LOGICAL stream, and batch ids are only
    meaningful within one checkpoint lineage — discarding the
    checkpoint while keeping the stream_id makes restarted ids look
    like replays (intended for reprocessing the same source; pick a
    new stream_id to fold genuinely new data under a fresh
    checkpoint).

    SINGLE WRITER PER STATE TABLE: the watermark is read (history
    scan) and committed in a separate overwrite, so two queries
    folding the SAME state table concurrently could both pass the
    check and double-fold or lose an update. That matches the
    deployment shape (one maintenance stream owns one state table —
    Structured Streaming itself enforces one active query per
    checkpoint), but it is a contract, not a guard: run at most one
    folder per state table; replay-idempotence (the thing the
    watermark provides) is only exactly-once under that contract."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        last = _batch_watermark(state, stream_id)
        if last is not None and batch_id <= last:
            return
        if state.exists():
            new = decayed_agg_update(
                state.read(), batch,
                key_col=key_col, ts_col=ts_col, value_col=value_col,
                half_life_seconds=half_life_seconds,
            )
        else:
            new = decayed_agg_with_anchor(
                batch,
                key_col=key_col, ts_col=ts_col, value_col=value_col,
                half_life_seconds=half_life_seconds,
            )
        # the fold reads the CURRENT state lazily; publish from a
        # materialized copy so the overwrite never reads its own target
        new = new.select(key_col, *_STATE_COLS).localCheckpoint()
        state.set_commit_metadata(f"decayed:{stream_id}:batch={batch_id}")
        if state.exists():
            state.overwrite(new)
        else:
            state.create(new)
        n_folded += 1

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
