"""Streaming near-duplicate ingest gate.

The online form of MinHash-LSH dedup (operators/dedup.py): documents
that never stop arriving are admitted only if nothing near-identical
was admitted BEFORE them — the ingest-time dedup gate every crawl
pipeline runs, instead of periodic full-corpus dedup sweeps.

Per micro-batch:
1. candidates vs HISTORY: the batch's banded MinHash buckets equi-join
   the admitted corpus's bucket table; only bucket-mates pay the exact
   shingle-Jaccard verification (recomputed from the admitted doc's
   stored text — a candidate sliver, never the corpus).
2. candidates WITHIN the batch: ``minhash_lsh_pairs`` (hot-bucket star
   guard included); a doc is rejected if a verified near-dup with a
   SMALLER id shares its batch (deterministic one-survivor rule).
3. survivors append to the admitted table; their bucket rows and text
   append to the two state tables.

State stays lean BY CONSTRUCTION: only admitted (near-dup-free) docs
enter the bucket table, so a bucket holds at most one member of each
near-dup class — identical-document spam cannot grow a hot history
bucket (within-batch spam is the star guard's job). State size is
O(admitted x bands) bucket rows + O(admitted) text rows: the same
asymptotics as any dedup index over the deduped corpus.

For clique-shaped near-dup classes (exact and lightly-mutated copies —
the shape real corpora are dominated by), the ADMITTED COUNT is
arrival-order invariant: exactly one member per class survives no
matter how the stream batches them. Transitive chains (a~b~c, a!~c)
can admit more than one member depending on arrival order — inherent
to ANY online gate that never revisits past admissions; the offline
cluster resolution (dedup.connected_components) is the sweep that
collapses those.

Exactly-once: all three appends carry txnAppId/txnVersion
(= stream_id, batch id), so a replayed batch no-ops PER TABLE — a
crash between the three appends heals on replay instead of
double-applying (this is why the fold uses txn actions, not the
single-commit userMetadata watermark the overwrite-shaped folds use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _minhash_banded, char_shingles, jaccard, minhash_lsh_pairs,
)
from ..sources.managed_table import ManagedTable


def neardup_gate_stream(
    stream_df: DataFrame,
    admitted: ManagedTable,
    state_bands: ManagedTable,
    state_docs: ManagedTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    stream_id: str = "neardup_gate",
) -> int:
    """Drain ``stream_df`` (availableNow) through the gate. Returns
    the number of batches folded (replays are skipped, not counted)."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # early-exit keys on the LAST table of the append chain: its
        # txn proves the whole fold completed. A partially-applied
        # batch (crash mid-chain) re-runs and heals — each append
        # no-ops individually off its own txn record.
        if (
            state_docs.exists()
            and (state_docs.last_txn_version(stream_id) or -1) >= batch_id
        ):
            return
        batch = batch.select(id_col, text_col).localCheckpoint()
        sh = batch.select(
            F.col(id_col), char_shingles(text_col, k).alias("shingles")
        )
        banded = _minhash_banded(sh, id_col, [], num_hashes, bands)

        rejected = None
        # verification needs BOTH the bucket rows and the admitted
        # texts; after a mid-chain crash the bands table can exist
        # while the docs table does not (only this replayed batch's
        # own rows are in it — unverifiable and self-filtered anyway),
        # so the history check is skipped until both exist.
        if state_bands.exists() and state_docs.exists():
            cand = (
                banded.join(
                    state_bands.read().select(
                        F.col(id_col).alias("__hist_id"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .select(id_col, "__hist_id")
                # a replayed batch (crash between the three appends)
                # finds its OWN bands already in state: drop self-pairs
                # so the recompute reproduces the original keep set and
                # the remaining appends heal as txn no-ops. Admitted
                # batch-mates can't reject a replayed doc either — both
                # were admitted, so they verified as NOT near-dups.
                .filter(F.col("__hist_id") != F.col(id_col))
                .distinct()
            )
            hist_sh = state_docs.read().select(
                F.col(id_col).alias("__hist_id"),
                char_shingles(text_col, k).alias("__hist_shingles"),
            )
            rejected = (
                cand.join(sh, id_col)
                .join(hist_sh, "__hist_id")
                .filter(
                    jaccard(F.col("shingles"), F.col("__hist_shingles"))
                    >= threshold
                )
                .select(id_col)
                .distinct()
            )
        # within-batch: verified pairs, reject the larger id of each
        self_rej = (
            minhash_lsh_pairs(
                batch, id_col=id_col, text_col=text_col, k=k,
                num_hashes=num_hashes, bands=bands, threshold=threshold,
            )
            .select(F.col("id_b").alias(id_col))
            .distinct()
        )
        rejected = (
            self_rej if rejected is None
            else rejected.unionByName(self_rej).distinct()
        )
        keep = batch.join(rejected, id_col, "left_anti").localCheckpoint()

        def _append(table: ManagedTable, df: DataFrame) -> None:
            if not table.exists():
                table.create(df.limit(0))
            table.append(
                df, fast=True, txn_app=stream_id, txn_version=batch_id
            )

        _append(admitted, keep)
        keep_sh = keep.select(
            F.col(id_col), char_shingles(text_col, k).alias("shingles")
        )
        _append(
            state_bands,
            _minhash_banded(keep_sh, id_col, [], num_hashes, bands),
        )
        _append(state_docs, keep)
        n_folded += 1

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
