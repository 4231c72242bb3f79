"""Streaming change-data-feed source over ManagedTable.

Delta's streaming source (``spark.readStream.format("delta")
.option("readChangeFeed", "true")``) is a log tailer: each micro-batch
serves the commits between the checkpointed offset and the current head,
and the offset advances only after the batch is durably processed. This
module re-creates that mechanism over the ManagedTable commit log —
the reference repo (scd_handler.py) has no streaming at all; its
"incremental" story is re-running apply_scd per day. A CDF tail turns
those day-batches into a push pipeline.

Scale: each micro-batch diffs exactly the snapshot pair it covers —
cost is O(delta + matched partitions), never a re-read of history.
Offsets are one tiny JSON file (Delta stores the same in the stream
checkpoint), atomically replaced, so a crashed consumer resumes at the
last committed offset: at-least-once delivery, exactly-once effect when
the sink is idempotent (e.g. keyed MERGE), which is the same contract
Structured Streaming gives foreachBatch.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_lake_platform_spark.sources.managed_table import ManagedTable


class ChangeFeedStream:
    """Tail a ManagedTable's change feed with a durable offset.

    ``process_available(sink)`` delivers one micro-batch covering all
    commits since the stored offset; ``max_versions_per_batch`` bounds
    a batch (Delta's ``maxFilesPerTrigger`` analogue) so a consumer
    that fell far behind catches up in bounded-memory steps.
    """

    def __init__(
        self,
        table: ManagedTable,
        checkpoint_dir: str,
        key_cols: list[str] | None = None,
        max_versions_per_batch: int | None = None,
        per_commit: bool = False,
    ):
        """``per_commit=True`` is Delta's actual readChangeFeed row
        shape: each batch carries one row per change per COMMIT
        (served from recorded cdc files / add actions — see
        ``ManagedTable.table_changes_per_commit``) with real
        ``_commit_version``/``_commit_timestamp`` values, so intra-
        batch churn stays visible to the consumer. The default serves
        the NET batch diff — cheaper when the sink only needs the
        batch's cumulative effect (the MV-refresh contract)."""
        self.table = table
        self.key_cols = key_cols
        self.max_versions = max_versions_per_batch
        self.per_commit = per_commit
        self._offset_path = os.path.join(checkpoint_dir, "cdf_offset.json")
        os.makedirs(checkpoint_dir, exist_ok=True)

    def offset(self) -> int | None:
        """Last fully processed version, or None before the first batch
        (the first batch then snapshots version 0 as pure inserts —
        Delta's startingVersion=0 initial load)."""
        if not os.path.isfile(self._offset_path):
            return None
        with open(self._offset_path) as f:
            return json.load(f)["version"]

    def _advance(self, version: int) -> None:
        tmp = self._offset_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self._offset_path)  # atomic on POSIX

    def process_available(
        self, sink: Callable[[DataFrame, int, int], None]
    ) -> int:
        """Run micro-batches until the head of the log is reached.
        ``sink(batch_df, from_version, to_version)`` sees rows tagged
        with ``_change_type`` and ``_commit_version``. Returns the
        number of batches delivered."""
        batches = 0
        while True:
            head = self.table.latest_version()
            cur = self.offset()
            if cur is not None and cur >= head:
                return batches
            if cur is None:
                # initial load: the base snapshot is one insert batch
                to_v = 0 if self.max_versions else head
                if self.per_commit:
                    batch = self.table.table_changes_per_commit(
                        0, to_v, key_cols=self.key_cols
                    )
                else:
                    batch = (
                        self.table.read(to_v)
                        .withColumn("_change_type", F.lit("insert"))
                    )
            else:
                to_v = (
                    min(cur + self.max_versions, head)
                    if self.max_versions
                    else head
                )
                if self.per_commit:
                    batch = self.table.table_changes_per_commit(
                        cur + 1, to_v, key_cols=self.key_cols
                    )
                else:
                    batch = self.table.change_feed(
                        cur, to_version=to_v, key_cols=self.key_cols
                    )
            if not self.per_commit:
                # Net batches carry the batch-end version; per-commit
                # rows already carry their REAL commit version.
                batch = batch.withColumn("_commit_version", F.lit(to_v))
            sink(batch, cur if cur is not None else -1, to_v)
            self._advance(to_v)  # commit the offset AFTER the sink ran
            batches += 1


def cdc_replicate(
    upstream: ManagedTable,
    replica: ManagedTable,
    checkpoint_dir: str,
    key_cols: list[str],
    max_versions_per_batch: int | None = None,
) -> int:
    """Replicate a table by applying its change feed to a downstream
    copy — the lakehouse CDC pattern (Delta CDF -> MERGE into replica).

    Each micro-batch is the NET effect of the covered commits (a
    two-snapshot diff): inserts/update-postimages upsert into the
    replica, deletes remove their keys — both as merge-on-read commits,
    so replication cost is O(changed rows), never a replica rewrite.
    Replays are idempotent (keyed MERGE), which upgrades the offset
    protocol's at-least-once delivery to exactly-once effect; a fresh
    checkpoint against an existing replica simply re-upserts identical
    rows. Returns the number of micro-batches applied."""
    stream = ChangeFeedStream(
        upstream,
        checkpoint_dir,
        key_cols=key_cols,
        max_versions_per_batch=max_versions_per_batch,
    )
    from delta_lake_platform_spark.sources.managed_table import MergeClauses

    pk_eq = " AND ".join(f"target.{c} = updates.{c}" for c in key_cols)

    def sink(batch: DataFrame, from_v: int, to_v: int) -> None:
        from ..blocks import snapshot_persisted, unpersist_new_since

        cols = [
            c
            for c in batch.columns
            if c not in ("_change_type", "_commit_version")
        ]
        pre_blocks = snapshot_persisted(batch.sparkSession)
        batch = batch.localCheckpoint(eager=False)  # two filters reuse it
        ups = batch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(*cols)
        dels = (
            batch.filter(F.col("_change_type") == "delete")
            .select(*key_cols)
            .distinct()
        )
        if not replica.exists():
            replica.create(ups)
        elif not ups.isEmpty():
            replica.merge(
                ups,
                MergeClauses(
                    condition=pk_eq,
                    matched_update={c: f"updates.{c}" for c in cols},
                    not_matched_insert={c: f"updates.{c}" for c in cols},
                ),
                rewrite=False,
            )
        if replica.exists() and not dels.isEmpty():
            replica.merge(
                dels,
                MergeClauses(
                    condition=pk_eq, matched_delete_condition="true"
                ),
                rewrite=False,
            )
        # fold-scoped checkpoint blocks are dead once the merges landed
        unpersist_new_since(batch.sparkSession, pre_blocks)

    return stream.process_available(sink)


def mv_maintain_stream(
    view,
    checkpoint_dir: str,
    max_versions_per_batch: int | None = 1,
) -> int:
    """Maintain a materialized view from its base's PER-COMMIT change
    feed — Delta's streaming-CDF-into-foreachBatch MV pattern: a
    continuously-mutating base keeps its view current one commit
    window at a time, instead of on-demand net refreshes.

    Wiring: a ``ChangeFeedStream(per_commit=True)`` tails the base log
    (offset checkpointed in ``checkpoint_dir``), and each micro-batch
    folds into the view via ``refresh_from_changes``. Exactly-once per
    commit window comes from BOTH ends: the stream delivers each window
    at-least-once (offset advances only after the sink), and the view
    skips any window at or behind its recorded baseVersion — so a crash
    between fold and offset-advance replays a batch that is then
    ignored. The stream's offset is seeded at the view's baseVersion on
    first run, so a view created mid-history never re-folds its own
    initial snapshot.

    ``view`` is a MaterializedAggView (or anything exposing
    ``base`` / ``_base_version()`` / ``refresh_from_changes``).
    Returns the number of micro-batches applied."""
    stream = ChangeFeedStream(
        view.base,
        checkpoint_dir,
        per_commit=True,
        max_versions_per_batch=max_versions_per_batch,
    )
    if stream.offset() is None:
        stream._advance(view._base_version())

    def sink(batch: DataFrame, from_v: int, to_v: int) -> None:
        view.refresh_from_changes(batch, to_v, from_version=from_v)

    return stream.process_available(sink)


def scd_maintain_stream(
    upstream: ManagedTable,
    dimension: ManagedTable,
    cfg,
    checkpoint_dir: str,
    max_versions_per_batch: int | None = None,
) -> int:
    """Maintain an SCD2 dimension from an upstream table's change feed
    — the reference's day-batch re-runs of apply_scd turned into a push
    pipeline (its scd_handler has no streaming at all): each
    micro-batch's net upserts flow through ``apply_scd`` (new entities
    insert, changed SCD columns version, changed non-SCD columns update
    in place) and its deletes SOFT-CLOSE the active rows
    (``scd_soft_close`` — history is retained, record_status 'D').

    Exactly-once effect over the offset protocol's at-least-once
    delivery comes from both appliers being idempotent: re-applying an
    identical batch finds no value drift (apply_scd's scd/upd key
    comparison) and no ACTIVE row left to close. Returns the number of
    micro-batches applied."""
    from delta_lake_platform_spark.scd.engine import (
        apply_scd,
        scd_soft_close,
    )

    stream = ChangeFeedStream(
        upstream,
        checkpoint_dir,
        key_cols=cfg.pk_cols,
        max_versions_per_batch=max_versions_per_batch,
    )
    meta = ["_change_type", "_commit_version"]

    def sink(batch: DataFrame, from_v: int, to_v: int) -> None:
        from ..blocks import snapshot_persisted, unpersist_new_since

        pre_blocks = snapshot_persisted(batch.sparkSession)
        batch = batch.localCheckpoint(eager=False)  # two filters reuse
        # ONE pass answers both routing questions (and materializes the
        # checkpoint): the per-type counts replace an ups.isEmpty()
        # probe here plus a keys.isEmpty() probe inside scd_soft_close —
        # three jobs' worth of emptiness checks for one tiny aggregate.
        n_by_type = dict(
            batch.groupBy("_change_type").count().collect()
        )
        ups = batch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop(*meta)
        dels = batch.filter(F.col("_change_type") == "delete").drop(*meta)
        if n_by_type.get("insert") or n_by_type.get("update_postimage"):
            apply_scd(ups, dimension, cfg)
        if n_by_type.get("delete"):
            scd_soft_close(dels, dimension, cfg, assume_nonempty=True)
        # fold-scoped checkpoint blocks are dead once the commits landed
        unpersist_new_since(batch.sparkSession, pre_blocks)

    return stream.process_available(sink)
