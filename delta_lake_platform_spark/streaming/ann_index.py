"""Streaming maintenance of a persisted IVF ANN index.

The serving shape for embeddings that never stop arriving: a
foreachBatch sink assigns each micro-batch to its centroid cell and
fast-appends it into the centroid-partitioned index table
(operators/similarity.py::build_ivf_index's layout), so probes stay
partition-pruned while the index tracks the stream — no rebuild, no
recompute, O(batch) per fold.

Bootstrap: the FIRST batch builds the index (centroid count defaults
to ceil(sqrt(first batch)) unless pinned via ``n_centroids``); every
later batch is assigned against the sidecar's frozen centroid matrix —
assignment is row-local, so a streamed index holds exactly the rows a
batch build over the same data would GIVEN the same centroid matrix
(pin ``n_centroids`` to compare against a batch build, whose sqrt(N)
default sees the full corpus where the bootstrap saw one batch; the
equality is test-pinned under a pinned count). Freezing centroids is
what keeps
appends O(batch); the cost is drift: when the stream moves away from
the build-time distribution, probe recall decays. ``refit_on_drift``
runs the sidecar drift check after the drain
(similarity.ivf_index_drift — corpus growth or assignment-cosine drop)
and retrains/overwrites in one commit when it trips, exactly the
build-time refit contract.

Exactly-once rides the shared commit-metadata batch watermark
(streaming/decayed.py::_batch_watermark, family "ivf"): the batch id
is attached to the SAME commit that publishes the fold (create or
fast-append), so a replayed micro-batch is a no-op. Concurrent
duplicate writers are guarded (r11): appends carry txnAppId/
txnVersion (a peer's same-batch commit turns ours into an atomic
no-op inside the commit retry) and a losing bootstrap create retries
off the peer's watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import (
    build_ivf_index, ivf_assign, ivf_index_drift, refit_ivf_index,
)
from ..sources.managed_table import ConcurrentWriteError, ManagedTable
from .decayed import _batch_watermark


def ivf_maintain_stream(
    stream_df: DataFrame,
    index: ManagedTable,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_centroids: int | None = None,
    stream_id: str = "ivf_stream",
    refit_on_drift: bool = False,
) -> int:
    """Drain ``stream_df`` (availableNow) into ``index``. Returns the
    number of micro-batches folded (replays are skipped, not
    counted)."""
    import json
    import os

    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # concurrent-writer guard (r11): the bootstrap create races are
        # resolved by ConcurrentWriteError + watermark re-read; the
        # steady-state appends carry txnAppId/txnVersion, so a peer's
        # duplicate fold no-ops ATOMICALLY inside the commit retry
        # (Delta's ConcurrentTransaction rule) — not just on replay.
        for _ in range(6):
            last = _batch_watermark(index, stream_id, family="ivf")
            if last is not None and batch_id <= last:
                return
            index.set_commit_metadata(f"ivf:{stream_id}:batch={batch_id}")
            if not index.exists():
                try:
                    build_ivf_index(
                        batch, index, vec_col=vec_col, id_col=id_col,
                        dim=dim, n_centroids=n_centroids,
                    )
                except ConcurrentWriteError:
                    continue  # a peer bootstrapped; re-read + retry
                n_folded += 1
                return
            import numpy as np

            with open(os.path.join(index.path, "_ivf", "index.json")) as fh:
                meta = json.load(fh)
            cn = np.asarray(meta["centroids"], dtype="float64")
            assigned = ivf_assign(
                batch.select(id_col, vec_col), vec_col,
                dim=int(meta["dim"]), n_centroids=int(meta["n_centroids"]),
                centroids=cn,
            )
            # fast append: O(batch) commit; the hive layout keeps new
            # rows inside their centroid partitions so probes stay
            # file-pruned over the whole (old + streamed) index
            index.append(
                assigned.repartition("centroid_id"), fast=True,
                txn_app=f"ivf:{stream_id}", txn_version=batch_id,
            )
            if not index.last_append_was_noop:
                n_folded += 1
            return
        raise ConcurrentWriteError(
            f"ivf:{stream_id} batch {batch_id}: index kept moving "
            "through 6 fold attempts"
        )

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if refit_on_drift and index.exists():
        if ivf_index_drift(index.read(), index)["needs_refit"]:
            refit_ivf_index(
                index.read().select(id_col, vec_col), index
            )
    return n_folded
