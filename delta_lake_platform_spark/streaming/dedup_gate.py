"""Streaming near-duplicate ingest gate.

The online form of MinHash-LSH dedup (operators/dedup.py): documents
that never stop arriving are admitted only if nothing near-identical
was admitted BEFORE them — the ingest-time dedup gate every crawl
pipeline runs, instead of periodic full-corpus dedup sweeps.

ONE table, ONE commit per fold. The admitted table carries each
survivor's banded MinHash buckets as a nested ``minhash_bands``
array<struct<band,bucket>> column, so the doc store and the bucket
index land in the same transactional append — a fold is atomic by
construction. There is no mid-chain crash state to heal: a crash
before the commit leaves no trace and the replay recomputes the
identical keep set; a crash after it is a completed fold whose replay
no-ops off the txn record (txnAppId/txnVersion = stream_id, batch id).

Per micro-batch:
1. candidates vs HISTORY: the batch's banded buckets — bounded at
   O(batch x bands) — are BROADCAST against the exploded history
   bucket column; the admitted corpus is scanned (columns pruned to
   id + minhash_bands) but never shuffled, at any history size. Explicit
   broadcast hints because AQE is off inside a streaming query.
2. verification: only bucket-mates pay the exact shingle-Jaccard
   check, and the history side shingles ONLY the matched docs — the
   candidate ids broadcast into the admitted scan first, then the
   survivors' texts are shingled (O(candidates), not O(corpus)).
3. candidates WITHIN the batch: the same banded frame feeds the
   bucketed pair generator (hot-bucket star guard included); a doc is
   rejected if a verified near-dup with a SMALLER id shares its batch
   (deterministic one-survivor rule). The batch is shingled and
   MinHash-banded exactly ONCE per fold.
4. survivors append (id, text, minhash_bands) to the admitted table — the
   single commit of the fold.

State stays lean BY CONSTRUCTION: only admitted (near-dup-free) docs
enter the bucket index, so a bucket holds at most one member of each
near-dup class — identical-document spam cannot grow a hot history
bucket (within-batch spam is the star guard's job). State size is
O(admitted x bands) bucket entries: the same asymptotics as any dedup
index over the deduped corpus.

For clique-shaped near-dup classes (exact and lightly-mutated copies —
the shape real corpora are dominated by), the ADMITTED COUNT is
arrival-order invariant: exactly one member per class survives no
matter how the stream batches them. Transitive chains (a~b~c, a!~c)
can admit more than one member depending on arrival order — inherent
to ANY online gate that never revisits past admissions; the offline
cluster resolution (dedup.connected_components) is the sweep that
collapses those.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..blocks import snapshot_persisted, unpersist_new_since
from ..operators.dedup import (
    _bucketed_candidate_pairs, _minhash_bucket_array, char_shingles,
    jaccard,
)
from ..sources.managed_table import ManagedTable

BANDS_COL = "minhash_bands"


def neardup_gate_stream(
    stream_df: DataFrame,
    admitted: ManagedTable,
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
    the number of batches folded (replays are skipped, not counted).

    ``admitted`` doubles as doc store and bucket index: survivors'
    rows carry their band->bucket map in the ``minhash_bands`` column."""
    n_folded = 0

    def _fold(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # Explicit None check: a recorded txn version of 0 is a REAL
        # commit (batch 0), and `or -1` would treat it as never-seen —
        # replays of batch 0 would then recompute the whole gate
        # instead of exiting here.
        last = (
            admitted.last_txn_version(stream_id)
            if admitted.exists()
            else None
        )
        if last is not None and last >= batch_id:
            return
        pre_blocks = snapshot_persisted(batch.sparkSession)
        try:
            _fold_body(batch, batch_id)
        finally:
            # the fold's checkpoint blocks are dead once the commit
            # landed (survivors are on disk) — and equally dead if any
            # step after the checkpoint raised; an unbounded stream
            # must not retain one block set per fold either way
            # (guide §5: unpersist when done)
            unpersist_new_since(batch.sparkSession, pre_blocks)

    def _fold_body(batch: DataFrame, batch_id: int) -> None:
        nonlocal n_folded
        # no checkpoint on the batch: a foreachBatch micro-batch is
        # already pinned source files — re-scanning it is cheaper than
        # materializing a copy.
        batch = batch.select(id_col, text_col)
        # A 1-file micro-batch is ONE partition, so the fold's most
        # expensive stage — shingling + 64-hash MinHash banding into
        # the eager checkpoint — ran on one core regardless of cluster
        # width (measured: 300-380ms single-task jobs per fold). Widen
        # narrow batches before the banding (guide §2.6) — but only
        # modestly: the checkpoint's partition count is inherited by
        # every downstream broadcast-build job (~5 per fold), so full
        # cluster width multiplies task launches across all of them
        # (measured: width 32 turned five 1-task jobs into five
        # 32-task jobs and LOST time). A no-op for healthy multi-split
        # batches; the exchange moves only (id, text).
        width = min(4, batch.sparkSession.sparkContext.defaultParallelism)
        banding_input = batch
        if batch.rdd.getNumPartitions() < width:
            banding_input = batch.repartition(width)
        sh = banding_input.select(
            F.col(id_col), char_shingles(text_col, k).alias("shingles")
        )
        # ONE banding pass per fold; the shingles ride along as
        # payload so within-batch verification never re-shingles.
        # EAGER checkpoint: the banded frame feeds ~5 concurrent
        # broadcast builds; a lazy checkpoint is not yet materialized
        # when they launch, so each broadcast thread re-evaluated the
        # full banding (measured: five ~330ms single-task jobs per
        # fold). One eager job computes it once; the broadcasts then
        # read cached partitions.
        banded_arr = _minhash_bucket_array(
            sh, id_col, ["shingles"], num_hashes, bands,
            out_col=BANDS_COL,
        ).localCheckpoint(eager=True)
        banded = banded_arr.select(
            id_col, "shingles", F.explode(BANDS_COL).alias("bb")
        ).select(id_col, "shingles", "bb.band", "bb.bucket")

        rejected = None
        if admitted.exists():
            # broadcast the BATCH side everywhere: a micro-batch is
            # bounded while the admitted corpus grows without bound —
            # these joins scan history (columns pruned) but never
            # shuffle it. Hints are load-bearing: AQE is disabled
            # inside streaming queries, so without them every join
            # here is a shuffle join of the history side per fold.
            # ONE read() for both history consumers: each read builds
            # a fresh log-backed relation (driver JSON + analysis);
            # column pruning splits the scan per subtree anyway.
            hist = admitted.read()
            hist_buckets = hist.select(
                F.col(id_col).alias("__hist_id"),
                F.explode(BANDS_COL).alias("bb"),
            ).select("__hist_id", "bb.band", "bb.bucket")
            cand = (
                hist_buckets.join(
                    F.broadcast(banded.select(id_col, "band", "bucket")),
                    ["band", "bucket"],
                )
                .select(id_col, "__hist_id")
                .filter(F.col("__hist_id") != F.col(id_col))
                # this distinct gates the expensive Jaccard verify (a
                # pair sharing b buckets would otherwise verify b
                # times); output sets below skip theirs — they only
                # feed anti-joins, where duplicates are harmless.
                .distinct()
            )
            # shingle ONLY the matched history docs: candidate ids
            # broadcast into the admitted scan first, THEN the
            # survivors' texts are shingled — O(candidates) shingle
            # work, not O(corpus) per fold. The BATCH side's shingles
            # come from the checkpointed band array (payload column),
            # not a re-scan + re-shingle of the batch.
            rejected = (
                hist
                .select(F.col(id_col).alias("__hist_id"), F.col(text_col))
                .join(
                    F.broadcast(
                        cand.join(
                            F.broadcast(
                                banded_arr.select(id_col, "shingles")
                            ),
                            id_col,
                        )
                    ),
                    "__hist_id",
                )
                .filter(
                    jaccard(
                        F.col("shingles"), char_shingles(text_col, k)
                    )
                    >= threshold
                )
                .select(id_col)
            )
        # within-batch: verified bucket-mate pairs off the SAME banded
        # frame, reject the larger id of each (id_a < id_b contract).
        # pin=False: banded explodes off the checkpointed band array —
        # re-pinning would buy nothing and cost a fold-time analysis +
        # materialization.
        self_rej = (
            _bucketed_candidate_pairs(
                banded, ["band", "bucket"], id_col, ["shingles"],
                hot_bucket_cap, pin=False,
            )
            .filter(
                jaccard(F.col("shingles_a"), F.col("shingles_b"))
                >= threshold
            )
            .select(F.col("id_b").alias(id_col))
        )
        rejected = (
            self_rej if rejected is None
            else rejected.unionByName(self_rej)
        )
        # survivors carry text AND bucket map into the ONE commit
        keep = (
            batch.join(F.broadcast(rejected), id_col, "left_anti")
            .join(F.broadcast(banded_arr.select(id_col, BANDS_COL)), id_col)
        )
        if not admitted.exists():
            admitted.create(keep.limit(0))
        admitted.append(
            keep, fast=True, txn_app=stream_id, txn_version=batch_id
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
