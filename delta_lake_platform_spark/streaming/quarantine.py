"""Streaming data-quality quarantine: expectations as a foreachBatch
sink routing every micro-batch into a KEPT table and a QUARANTINE
table (the DLT expect_or_drop + quarantine-table pattern, on real
Structured Streaming).

Exactly-once across micro-batch retries and driver restarts comes
from ManagedTable's idempotent-writer contract (``txnAppId`` /
``txnVersion``): each destination records (stream id, batch id) in
its own commit log, so a replayed batch is a no-op append — the state
lives in the table, not the writer.

Scale shape: routing inside the batch is the expectations operator's
single codegen'd filter (no shuffle); each destination append is
O(batch). The quarantine rows carry ``failed_rules`` so downstream
triage can group by rule without re-evaluating predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.expectations import apply_expectations
from ..sources.managed_table import ManagedTable


def expectations_stream(
    stream_df: DataFrame,
    rules: dict[str, str],
    kept: ManagedTable,
    quarantine: ManagedTable,
    checkpoint_dir: str,
    stream_id: str = "expectations_stream",
) -> int:
    """Drain ``stream_df`` (availableNow) through the expectations
    gate into ``kept`` / ``quarantine``. Destination tables are
    created from the first batch's shape when absent. Returns the
    number of micro-batches processed."""
    n_batches = 0

    def _route(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        ok, bad = apply_expectations(batch, rules, mode="drop")
        for tbl, frame, tag in (
            (kept, ok, "kept"),
            (quarantine, bad, "quarantine"),
        ):
            if not tbl.exists():
                # mode="ignore": a batch replayed after a crash BETWEEN
                # create and append must not fail on the existing table
                # (a concurrent creator racing us is equally fine — the
                # schema is identical either way)
                tbl.create(frame.limit(0), mode="ignore")
            tbl.append(
                frame,
                txn_app=f"{stream_id}/{tag}",
                txn_version=int(batch_id),
            )

    q = (
        stream_df.writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches
