"""Streaming maintenance of a persisted BM25 index.

Third member of the streamed-index family (IVF: streaming/ann_index.py;
MVs: streaming/cdf.py): documents that never stop arriving fold into
the term-range-clustered posting index as O(batch) fast-appends, and
because BM25 is stateless given (postings, corpus stats), a probe over
the maintained index stays VALUE-EXACT with a fresh build over
everything seen so far — test-pinned, no decay of ranking quality as
the index ages (unlike frozen-centroid IVF, BM25's "model" IS the
stats, and those fold exactly).

Exactly-once rides the shared commit-metadata batch watermark
(family "bm25") plus the r11 concurrent-writer guard: extends carry
txnAppId/txnVersion (a peer's duplicate fold no-ops atomically,
postings and stats together) and a losing bootstrap create retries
off the peer's watermark. The
stats sidecar write is NOT atomic with the posting append
(operators/search.py::extend_bm25_index documents the crash window);
after an unclean stop, run ``repair_bm25_stats(index)`` before serving
probes — it recomputes both stats from the postings in one
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.search import build_bm25_index, extend_bm25_index
from ..sources.managed_table import ConcurrentWriteError, ManagedTable
from .decayed import _batch_watermark


def bm25_maintain_stream(
    stream_df: DataFrame,
    index: ManagedTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    stream_id: str = "bm25_stream",
) -> int:
    """Drain ``stream_df`` (availableNow) into ``index``: the first
    batch builds it, every later batch extends it. Returns the number
    of batches folded (replays are skipped, not counted)."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # concurrent-writer guard (r11), same shape as the IVF fold:
        # bootstrap create races resolve via ConcurrentWriteError +
        # watermark re-read; steady-state extends carry txnAppId/
        # txnVersion so a peer's duplicate fold no-ops atomically —
        # postings AND stats (extend skips its stats fold when the
        # append reports the batch already applied).
        for _ in range(6):
            last = _batch_watermark(index, stream_id, family="bm25")
            if last is not None and batch_id <= last:
                return
            index.set_commit_metadata(f"bm25:{stream_id}:batch={batch_id}")
            if not index.exists():
                try:
                    build_bm25_index(
                        batch, index, id_col=id_col, text_col=text_col
                    )
                except ConcurrentWriteError:
                    continue  # a peer bootstrapped; re-read + retry
                n_folded += 1
                return
            if extend_bm25_index(
                batch, index, text_col=text_col,
                txn_app=f"bm25:{stream_id}", txn_version=batch_id,
            ):
                n_folded += 1
            return
        raise ConcurrentWriteError(
            f"bm25:{stream_id} batch {batch_id}: index kept moving "
            "through 6 fold attempts"
        )

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
