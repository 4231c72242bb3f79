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

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.temporal import decayed_agg_update, decayed_agg_with_anchor
from ..sources.managed_table import ConcurrentWriteError, ManagedTable

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
    # newest-first LAZY scan exits at the first fold commit — normally
    # entry 0 or 1 (an OPTIMIZE/VACUUM may interleave); a pathological
    # run of foreign commits degrades to a full log listing, the same
    # cost class as the state read the fold performs anyway
    for entry in state.iter_history():
        meta = entry.get("userMetadata") or ""
        if meta.startswith(tag):
            return int(meta[len(tag):])
    return None


def _state_anchor_us(state: ManagedTable, rv: int) -> int | None:
    """Epoch-microsecond anchor of a decayed state snapshot. Every
    state row carries the same ``anchor_ts`` by construction (each
    fold writes the whole state at one anchor), so the snapshot max IS
    the anchor — read from the log's footer stats (no Spark job, no
    data read; temporal stats are recorded as naive-UTC ISO strings),
    with a 1-row aggregate as the stats-less fallback."""
    iso = state.column_max("anchor_ts", rv)
    if isinstance(iso, str):
        import calendar
        from datetime import datetime, timezone

        try:
            dt = datetime.fromisoformat(iso)
        except ValueError:
            dt = None
        if dt is not None:
            if dt.tzinfo is not None:  # pyarrow stats: instant in UTC
                dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
            return (
                calendar.timegm(dt.timetuple()) * 1_000_000
                + dt.microsecond
            )
    return (
        state.read(rv).agg(F.unix_micros(F.max("anchor_ts"))).first()[0]
    )


def _fold_with_guard(
    state: ManagedTable,
    stream_id: str,
    batch_id: int,
    family: str,
    build: Callable[[int | None], DataFrame],
    retries: int = 5,
) -> bool:
    """Optimistic-concurrency wrapper for the overwrite-shaped folds —
    upgrades the documented single-writer contract to a GUARD.

    One attempt = pin the state head, check the watermark against it,
    compute the folded state FROM that pinned snapshot
    (``build(read_version)`` — it must read ``state.read(rv)``, never
    the moving head; the pinned version makes a lazy frame safe, and
    the commit's staged write is its single evaluation — no
    fold-time localCheckpoint, no per-fold block hygiene), and publish
    anchored to the same snapshot (``overwrite(read_version=rv)``).
    Any commit landing between pin and publish — a concurrent replica
    folding the same batch, or any foreign write — surfaces as
    ConcurrentWriteError at the entry create instead of silently
    erasing the intervening writer. The guard then RE-READS the
    watermark: if a peer already folded this batch the fold no-ops;
    otherwise it recomputes from the new head and retries. Two
    replicas folding the same stream therefore apply each batch
    exactly once, deterministically, whichever interleaving occurs.

    Returns True iff THIS writer's commit published the batch.
    """
    for _ in range(retries + 1):
        exists = state.exists()
        rv = state.latest_version() if exists else None
        last = _batch_watermark(state, stream_id, family=family)
        if last is not None and batch_id <= last:
            return False
        new = build(rv)
        state.set_commit_metadata(f"{family}:{stream_id}:batch={batch_id}")
        try:
            if exists:
                state.overwrite(new, read_version=rv)
            else:
                state.create(new)
            return True
        except ConcurrentWriteError:
            continue  # re-read watermark + head, then retry or no-op
    raise ConcurrentWriteError(
        f"{family}:{stream_id} batch {batch_id}: state table kept "
        f"moving through {retries + 1} fold attempts"
    )


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

    CONCURRENT WRITERS ARE GUARDED (r11): the watermark check and the
    publish are anchored to one pinned snapshot version inside
    ``_fold_with_guard`` — a peer committing in between surfaces as
    ConcurrentWriteError, after which the watermark is re-read and the
    fold either no-ops (peer already folded this batch) or recomputes
    from the new head. Two replicas folding the same state table
    apply each batch exactly once under any interleaving; the normal
    deployment shape is still one folder per state table (Structured
    Streaming enforces one active query per checkpoint)."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded

        def _build(rv: int | None) -> DataFrame:
            # Anchors are resolved DRIVER-SIDE so the fold plan carries
            # literals instead of two 1-row aggregate subtrees joined
            # in (8 jobs/fold -> 2): the batch max is one tiny collect,
            # the state anchor comes from the log's footer stats (every
            # state row carries the same anchor_ts by construction —
            # zero jobs), falling back to a 1-row aggregate only for a
            # stats-less state file. Same unix_timestamp/pow arithmetic
            # over the same values — results are bit-equal (oracle- and
            # test-pinned).
            ba = batch.agg(F.unix_micros(F.max(ts_col))).first()[0]
            if rv is not None:
                sa = _state_anchor_us(state, rv)
                known = [x for x in (ba, sa) if x is not None]
                anchor = max(known) if known else None
                new = decayed_agg_update(
                    state.read(rv), batch,
                    key_col=key_col, ts_col=ts_col, value_col=value_col,
                    half_life_seconds=half_life_seconds,
                    anchor_us=anchor,
                )
            else:
                new = decayed_agg_with_anchor(
                    batch,
                    key_col=key_col, ts_col=ts_col, value_col=value_col,
                    half_life_seconds=half_life_seconds,
                    anchor_us=ba,
                )
            # the PINNED snapshot read keeps the lazy frame stable; the
            # commit's staged write is its single evaluation
            return new.select(key_col, *_STATE_COLS)

        if _fold_with_guard(state, stream_id, batch_id, "decayed", _build):
            n_folded += 1

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
