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
2. candidates WITHIN the batch: the same banded frame feeds the
   bucketed pair generator (hot-bucket star guard included); a doc is
   rejected if a verified near-dup with a SMALLER id shares its batch
   (deterministic one-survivor rule). The batch is shingled and
   MinHash-banded exactly ONCE per fold — the history probe, the
   within-batch pairs, and the state-bands append all reuse the one
   lazily-checkpointed banded frame.
3. survivors append to the admitted table (which doubles as the doc
   store the verifier reads texts from); their bucket rows append to
   the bands state table. TWO commits per fold, and the survivor rows
   are written once, not twice.

State stays lean BY CONSTRUCTION: only admitted (near-dup-free) docs
enter the bucket table, so a bucket holds at most one member of each
near-dup class — identical-document spam cannot grow a hot history
bucket (within-batch spam is the star guard's job). State size is
O(admitted x bands) bucket rows: the same asymptotics as any dedup
index over the deduped corpus.

For clique-shaped near-dup classes (exact and lightly-mutated copies —
the shape real corpora are dominated by), the ADMITTED COUNT is
arrival-order invariant: exactly one member per class survives no
matter how the stream batches them. Transitive chains (a~b~c, a!~c)
can admit more than one member depending on arrival order — inherent
to ANY online gate that never revisits past admissions; the offline
cluster resolution (dedup.connected_components) is the sweep that
collapses those.

Exactly-once: both appends carry txnAppId/txnVersion (= stream_id,
batch id), so a replayed batch no-ops PER TABLE. The early exit keys
on the LAST table of the chain (bands) — its txn proves the whole
fold completed. A crash between the two appends (admitted committed,
bands not) heals on replay: the batch's own bucket rows never reached
the bands table, so the history probe sees exactly the pre-crash
state, the keep set recomputes identically, the admitted append
no-ops off its txn record, and the bands append lands (this is why
the fold uses txn actions, not the single-commit userMetadata
watermark the overwrite-shaped folds use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _bucketed_candidate_pairs, _minhash_banded, char_shingles, jaccard,
)
from ..sources.managed_table import ManagedTable


def neardup_gate_stream(
    stream_df: DataFrame,
    admitted: ManagedTable,
    state_bands: ManagedTable,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    hot_bucket_cap: int = 1024,
    stream_id: str = "neardup_gate",
) -> int:
    """Drain ``stream_df`` (availableNow) through the gate. Returns
    the number of batches folded (replays are skipped, not counted)."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # early-exit keys on the LAST table of the append chain (see
        # module doc). Explicit None check: a recorded txn version of
        # 0 is a REAL commit (batch 0), and `or -1` would treat it as
        # never-seen — replays of batch 0 would then recompute the
        # whole gate instead of exiting here.
        last = (
            state_bands.last_txn_version(stream_id)
            if state_bands.exists()
            else None
        )
        if last is not None and last >= batch_id:
            return
        batch = batch.select(id_col, text_col).localCheckpoint()
        sh = batch.select(
            F.col(id_col), char_shingles(text_col, k).alias("shingles")
        )
        # ONE banding pass per fold; the shingles ride along as
        # payload so within-batch verification never re-shingles. Lazy
        # checkpoint: three consumers (history probe, within-batch
        # pairs, state append) share the materialization.
        banded = _minhash_banded(
            sh, id_col, ["shingles"], num_hashes, bands
        ).localCheckpoint(eager=False)

        rejected = None
        # verification needs BOTH the bucket rows and the admitted
        # texts; on the very first batch neither exists yet.
        if state_bands.exists() and admitted.exists():
            cand = (
                banded.select(id_col, "band", "bucket")
                .join(
                    state_bands.read().select(
                        F.col(id_col).alias("__hist_id"), "band", "bucket"
                    ),
                    ["band", "bucket"],
                )
                .select(id_col, "__hist_id")
                # defense in depth: with the exit keyed on the bands
                # table a batch whose own bands landed always exits
                # above, so self-pairs cannot occur — the filter keeps
                # the invariant local instead of relying on the chain
                # order at a distance.
                .filter(F.col("__hist_id") != F.col(id_col))
                .distinct()
            )
            hist_sh = admitted.read().select(
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
        # within-batch: verified bucket-mate pairs off the SAME banded
        # frame, reject the larger id of each (id_a < id_b contract)
        self_rej = (
            _bucketed_candidate_pairs(
                banded, ["band", "bucket"], id_col, ["shingles"],
                hot_bucket_cap,
            )
            .filter(
                jaccard(F.col("shingles_a"), F.col("shingles_b"))
                >= threshold
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
        _append(
            state_bands,
            banded.join(keep.select(id_col), id_col, "left_semi").select(
                id_col, "band", "bucket"
            ),
        )
        n_folded += 1

    q = (
        stream_df.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_folded
