"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (the whole point of these):
- Exact dedup is a hash-groupBy — one shuffle on a 64-hex-char key.
- Near-dup NEVER does an O(n^2) cross join. MinHash-LSH banding and
  SimHash band-bucketing both reduce candidate generation to an
  equi-join on bucket keys (shuffle on band hash), then exact
  verification runs only within buckets. At 100 TB this is the
  difference between feasible and impossible.
- Everything is built-in expressions (xxhash64, higher-order array
  functions) — zero Python in the row path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import normalized_fingerprint


# --- exact -----------------------------------------------------------------

def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per distinct (normalized) content: canonical = min id.
    Output: fingerprint, canonical id, n_copies."""
    return (
        df.select(
            F.col(id_col), normalized_fingerprint(text_col).alias("fingerprint")
        )
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- shingling -------------------------------------------------------------

def char_shingles(text_col: str, k: int = 5) -> Column:
    """Distinct character k-grams of the normalized text (JVM-side:
    transform over an index sequence + substring)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
            lambda i: F.substring(norm, i, k),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


# --- n-gram Jaccard (exact pairwise within a bounded set) ------------------

def ngram_jaccard_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> DataFrame:
    """All-pairs exact k-gram Jaccard. O(n^2) by construction — use only
    on bounded candidate sets (LSH buckets or explicit samples); the
    scalable entry point is ``minhash_lsh_pairs``.

    The pair scan's parallelism equals the LEFT side's partition count,
    and bounded candidate frames typically arrive as 1-4 partitions (a
    single-split scan or a checkpointed slice) — leaving the cluster
    idle during the quadratic verify, its entire cost. One round-robin
    repartition of the left side spreads the pair work across the
    cluster; the right side broadcasts either way (measured at sf0.1:
    the 160-doc curation-v3 verify job 3.3s -> 0.5s on local[32])."""
    s = df.select(F.col(id_col), char_shingles(text_col, k).alias("shingles"))
    a = s.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).alias("a")
    b = s.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jaccard(F.col("a.shingles"), F.col("b.shingles")).alias("jaccard"),
        )
    )


# --- bucketed candidate generation with a hot-bucket guard ------------------

def _bucketed_candidate_pairs(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str,
    payload_cols: list[str],
    hot_bucket_cap: int,
    pin: bool = True,
) -> DataFrame:
    """Within-bucket candidate pairs, quadratic-proof.

    Cold buckets (<= hot_bucket_cap members) emit every ordered pair —
    the exact LSH contract. A hot bucket of B members would emit B^2/2
    pairs (a corpus with thousands of identical documents goes
    quadratic inside one bucket), so hot buckets switch to a star:
    only (leader = min id, member) candidates, O(B) per bucket. For
    identical/near-identical content — the only realistic way a bucket
    goes hot — the star loses nothing downstream: verification still
    scores every emitted pair, and connected components reaches the
    same clusters through the leader. The documented trade: two
    non-leader members of a hot bucket are never compared directly, so
    a *sub*-threshold-diverse mega-bucket can under-report pairs.

    Output columns: id_a, id_b, <payload>_a, <payload>_b.
    """
    from functools import reduce as _reduce

    # Pin the banded frame: its lineage (shingling + signature hashing
    # for MinHash) is the expensive part and feeds several consumers.
    # ``pin=False`` is for callers whose frame ALREADY rides a
    # checkpoint (the streaming gate's banded array) — re-pinning there
    # only adds an analysis pass and a second materialization per fold.
    if pin:
        banded = banded.localCheckpoint(eager=False)

    # Hot-bucket detection is a NARROW aggregation (bucket key + id
    # only, no payload arrays through the shuffle). The hot set is tiny
    # by construction — at most n/cap buckets, usually zero — so both
    # joins against it broadcast and the cold path costs nothing extra.
    hot_keys = (
        banded.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("__bsize"),
            F.min(id_col).alias("__leader"),
        )
        .filter(F.col("__bsize") > hot_bucket_cap)
    )

    def within_bucket(extra):
        return _reduce(
            lambda x, y: x & y,
            [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols] + [extra],
        )

    pair_cols = [
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[F.col(f"a.{p}").alias(f"{p}_a") for p in payload_cols],
        *[F.col(f"b.{p}").alias(f"{p}_b") for p in payload_cols],
    ]

    cold = banded.join(
        F.broadcast(hot_keys.select(*key_cols)), on=key_cols, how="left_anti"
    )
    cold_pairs = (
        cold.alias("a")
        .join(
            cold.alias("b"),
            within_bucket(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(*pair_cols)
    )

    hot = banded.join(F.broadcast(hot_keys), on=key_cols, how="inner")
    leaders = hot.filter(F.col(id_col) == F.col("__leader"))
    members = hot.filter(F.col(id_col) != F.col("__leader"))
    hot_pairs = (
        leaders.alias("a")
        .join(
            members.alias("b"),
            within_bucket(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(*pair_cols)
    )
    return cold_pairs.unionByName(hot_pairs).dropDuplicates(["id_a", "id_b"])


# --- MinHash + LSH ----------------------------------------------------------

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes-wide MinHash signature. Permutation h_i is simulated
    by xxhash64 seeded per-i (hash of i-prefixed shingle); the min over
    the shingle set approximates the permuted minimum."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.concat(i.cast("string"), s)))
        ),
    )


def _minhash_banded(
    df: DataFrame,
    id_col: str,
    payload_cols: list[str],
    num_hashes: int,
    bands: int,
    shingles_col: str = "shingles",
) -> DataFrame:
    """One row per (band index, band-hash bucket) for each document,
    carrying ``payload_cols`` through for downstream verification.
    Shared by the Jaccard and the edit-distance verifiers — the
    banding is the scalable part.

    Buckets are built DIRECTLY from the shingle set: band b hashes
    only ITS OWN ``num_hashes/bands`` minima, so the full signature
    costs exactly ``num_hashes`` array-min passes per row. The
    previous form sliced a precomputed signature column — Catalyst's
    CollapseProject inlined the whole 64-min expression into every
    band's slice, recomputing the signature per band (32x the work;
    measured 15.6s -> 0.7s on a 134-doc frame). Bucket VALUES are
    unchanged (same minima, same concat, same hash), so candidate
    sets and every downstream result are identical.

    The explode MUST stay inline in the same select that builds the
    band array (NOT a select over ``_minhash_bucket_array``): with the
    array built in its own projection, ``InferFiltersFromGenerate``
    adds ``size(bands) > 0`` above the Generate and filter pushdown
    then substitutes the WHOLE banding expression (shingling + all
    ``num_hashes`` hash minima) into a Filter at the scan — every
    input row pays the full MinHash twice, once of it interpreted.
    Measured on the 150-doc neardup corpus: banding 5.4s -> 40.1s,
    docs_minhash_neardup 3.7s -> 26.7s (r11 regression, reverted
    here; plans/r11/docs_minhash_neardup_{before,after}.txt). With
    the generator input inline, the rule has no named column to infer
    a filter from and the plan keeps the single clean Generate. The
    nested form lives on in ``_minhash_bucket_array`` for callers
    that PERSIST bucket state (the streaming gate), where a
    checkpoint boundary blocks that pushdown."""
    rows_per_band = num_hashes // bands
    shingles = F.col(shingles_col)

    def _bucket(b: Column) -> Column:
        minima = F.transform(
            F.sequence(
                b * rows_per_band, b * rows_per_band + (rows_per_band - 1)
            ),
            lambda i: F.array_min(
                F.transform(
                    shingles,
                    lambda s: F.xxhash64(F.concat(i.cast("string"), s)),
                )
            ).cast("string"),
        )
        return F.xxhash64(F.concat_ws(",", minima))

    return df.select(
        id_col,
        *payload_cols,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), _bucket(b).alias("bucket")
                ),
            )
        ).alias("bb"),
    ).select(id_col, *payload_cols, "bb.band", "bb.bucket")


def _minhash_bucket_array(
    df: DataFrame,
    id_col: str,
    payload_cols: list[str],
    num_hashes: int,
    bands: int,
    shingles_col: str = "shingles",
    out_col: str = "__bands",
) -> DataFrame:
    """The un-exploded form of ``_minhash_banded``: one row per
    document carrying its full band->bucket map as an
    ``array<struct<band,bucket>>`` column. Same minima, same concat,
    same hash — ``explode(out_col)`` reproduces ``_minhash_banded``
    row for row. Callers that PERSIST bucket state (the streaming
    ingest gate) store this nested form so the bucket index rides in
    the same table — and the same commit — as the documents it
    indexes."""
    rows_per_band = num_hashes // bands
    shingles = F.col(shingles_col)

    def _bucket(b: Column) -> Column:
        minima = F.transform(
            F.sequence(b * rows_per_band, b * rows_per_band + (rows_per_band - 1)),
            lambda i: F.array_min(
                F.transform(
                    shingles,
                    lambda s: F.xxhash64(F.concat(i.cast("string"), s)),
                )
            ).cast("string"),
        )
        return F.xxhash64(F.concat_ws(",", minima))

    return df.select(
        id_col,
        *payload_cols,
        F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(b.alias("band"), _bucket(b).alias("bucket")),
        ).alias(out_col),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    hot_bucket_cap: int = 1024,
) -> DataFrame:
    """Near-duplicate pairs with exact-verified Jaccard >= threshold.

    Candidate generation: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows, hash each band, explode, and equi-join on
    (band index, band hash). Only bucket-mates are verified with exact
    shingle Jaccard — the O(n^2) never happens globally. Buckets larger
    than ``hot_bucket_cap`` (identical-document spam) fall back to
    star-shaped candidates so no single degenerate bucket goes
    quadratic either (see ``_bucketed_candidate_pairs``).

    At threshold 0.8 with 16 bands x 4 rows the miss probability for a
    true 0.9-Jaccard pair is ~(1-0.9^4)^16 ~= 0.3%; for exact copies 0.
    """
    sig = df.select(
        F.col(id_col),
        char_shingles(text_col, k).alias("shingles"),
    )

    banded = _minhash_banded(sig, id_col, ["shingles"], num_hashes, bands)

    candidates = _bucketed_candidate_pairs(
        banded, ["band", "bucket"], id_col, ["shingles"], hot_bucket_cap
    )
    return (
        candidates.withColumn(
            "jaccard", jaccard(F.col("shingles_a"), F.col("shingles_b"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def fuzzy_edit_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rel_edit: float = 0.1,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    hot_bucket_cap: int = 1024,
) -> DataFrame:
    """Fuzzy near-duplicate pairs under a RELATIVE edit-distance bound:
    ``levenshtein(a, b) / max(len(a), len(b)) <= max_rel_edit`` on the
    whitespace-normalized lowercased text.

    The classic similarity-join shape (Ed-Join / PassJoin family)
    re-expressed Spark-first: candidate generation is the same
    MinHash-LSH banding the Jaccard verifier uses — an equi-join on
    (band, bucket), never an all-pairs — and only bucket-mates pay the
    exact Levenshtein (JVM built-in, O(len^2) per PAIR but the pair
    set is bucket-bounded). A pair within a small relative edit
    distance necessarily shares most of its character shingles (each
    edit destroys at most k shingles), so at max_rel_edit 0.1 and
    k=5 a true pair's Jaccard is >= ~(1-rel*k)/(1+rel*k) ~= 0.67 and
    the 16x4 banding miss probability <= (1-0.67^4)^16 ~= 3%, falling
    to ~1e-7 at the exact-copy end that dominates real corpora. The
    hot-bucket star guard applies unchanged.

    Output: id_a < id_b, edit_distance, rel_edit (rounded 6).
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    sig = df.select(F.col(id_col), norm.alias("__norm")).withColumn(
        "shingles", char_shingles("__norm", k)
    )
    banded = _minhash_banded(sig, id_col, ["__norm"], num_hashes, bands)
    candidates = _bucketed_candidate_pairs(
        banded, ["band", "bucket"], id_col, ["__norm"], hot_bucket_cap
    )
    dist = F.levenshtein(F.col("__norm_a"), F.col("__norm_b"))
    maxlen = F.greatest(F.length("__norm_a"), F.length("__norm_b"))
    return (
        candidates.withColumn("edit_distance", dist.cast("long"))
        .withColumn(
            "rel_edit",
            F.col("edit_distance") / F.nullif(maxlen.cast("double"), F.lit(0.0)),
        )
        .filter(F.col("rel_edit") <= max_rel_edit)
        .select(
            "id_a", "id_b", "edit_distance", F.round("rel_edit", 6).alias("rel_edit")
        )
    )


# --- SimHash ----------------------------------------------------------------

def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit majority vote of
    token hashes. Pure array expressions — one projection, no shuffle."""
    toks = F.split(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(F.call_function("shiftright", h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sim = F.aggregate(
        F.zip_with(
            bits,
            F.sequence(F.lit(0), F.lit(63)),
            lambda bit, i: F.call_function("shiftleft", bit.cast("long"), i),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseXOR(x),
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 0,
    verify_multiset: bool = False,
    hot_bucket_cap: int = 1024,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Candidates come from
    band-bucketing the 64-bit signature into 4 x 16-bit chunks (a pair
    within Hamming<=3 must agree on at least one chunk — pigeonhole), so
    candidate generation is an equi-join, not a cross join.

    SimHash is token-order-invariant, and with a small vocabulary even
    distinct token multisets can collide on all 64 bits. Set
    ``verify_multiset=True`` to exactly verify candidates by sorted
    token-multiset equality (sketch-for-candidates, exact-verify —
    the same shape as minhash_lsh_pairs; only bucket-mates pay the
    verification cost)."""
    sig = simhash(df, id_col, text_col)
    if verify_multiset:
        toks = F.sort_array(
            F.split(
                F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), " "
            )
        )
        sig = sig.join(
            df.select(F.col(id_col), toks.alias("__toks")), on=id_col
        )
    chunked = sig.select(
        id_col,
        "simhash",
        *(["__toks"] if verify_multiset else []),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.call_function("shiftright", F.col("simhash"), c * 16)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias("val"),
                ),
            )
        ).alias("cc"),
    ).select(
        id_col,
        "simhash",
        "cc.chunk",
        "cc.val",
        *(["__toks"] if verify_multiset else []),
    )
    payload = ["simhash"] + (["__toks"] if verify_multiset else [])
    cand = _bucketed_candidate_pairs(
        chunked, ["chunk", "val"], id_col, payload, hot_bucket_cap
    )
    hamming = F.bit_count(F.col("simhash_a").bitwiseXOR(F.col("simhash_b")))
    out = cand.select(
        "id_a",
        "id_b",
        hamming.cast("long").alias("hamming"),
        *(
            [(F.col("__toks_a") == F.col("__toks_b")).alias("__same")]
            if verify_multiset
            else []
        ),
    ).filter(F.col("hamming") <= max_hamming)
    if verify_multiset:
        out = out.filter(F.col("__same")).drop("__same")
    return out


# --- pair -> cluster resolution ---------------------------------------------

def connected_components(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    small_graph_edges: int = 2_000_000,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: each vertex gets
    ``cluster_id`` = the minimum id reachable through the pair graph
    (transitive closure — a pair list alone under-merges A~B, B~C).

    Two physical paths on one semantic:

    - **Small graph** (|edges| <= ``small_graph_edges``, the realistic
      case — the LSH edge list is tiny relative to the corpus even at
      100 TB): collect the edges, union-find on the driver, broadcast
      the vertex->component map back as ONE join. Replaces O(diameter)
      Spark jobs with one collect + one broadcast join; 2M edges is
      ~32 MB on the driver.
    - **Large graph**: alternating large-star/small-star rounds
      (Kiveris et al., "Connected Components in MapReduce and Beyond",
      2014) — converges in O(log n) rounds regardless of component
      DIAMETER, so a 100 TB near-dup graph with million-long duplicate
      chains needs ~30 rounds, not a million. ``max_iter`` bounds the
      rounds; exhausting it raises instead of silently emitting split
      clusters.
    """
    edges = (
        pairs.selectExpr(f"id_a as src", f"id_b as dst")
        .unionByName(pairs.selectExpr("id_b as src", "id_a as dst"))
        .distinct()
        # Materialize once: the pair lineage (LSH: shingles -> 64-hash
        # signatures -> band explode -> bucket self-join) would otherwise
        # be recomputed by every iteration's join.
        .localCheckpoint(eager=False)
    )
    n_edges = edges.count()
    if n_edges <= small_graph_edges:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for row in edges.toLocalIterator():
            ra, rb = find(row.src), find(row.dst)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        mapping = [(v, find(v)) for v in list(parent)]
        if not mapping:
            return vertices.select(
                F.col(id_col), F.col(id_col).alias("cluster_id")
            )
        spark = vertices.sparkSession
        map_df = spark.createDataFrame(mapping, schema=["vid", "__root"])
        return (
            vertices.select(id_col)
            .join(
                F.broadcast(map_df),
                vertices[id_col] == map_df.vid,
                "left_outer",
            )
            .select(
                F.col(id_col),
                F.coalesce(F.col("__root"), F.col(id_col)).alias("cluster_id"),
            )
        )
    # Alternating-star rounds. Invariant entering each round: `cur` is
    # a DIRECTED edge list pointing larger -> smaller (src > dst),
    # deduped; at the fixed point every non-root points straight at its
    # component's minimum id.
    cur = (
        edges.filter(F.col("src") > F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        # -- large-star: symmetrize, then for each center u link every
        #    LARGER neighbor to min(N(u) ∪ {u}).
        sym = cur.unionByName(
            cur.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mn = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("__nm"))
            .select("src", F.least("__nm", F.col("src")).alias("__m"))
        )
        ls = (
            sym.join(mn, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("__m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # -- small-star: neighbors are all smaller now; re-hang each
        #    center u and its neighbors off min(N(u) ∪ {u}).
        mn2 = ls.groupBy("src").agg(F.min("dst").alias("__m"))
        ss = (
            ls.join(mn2, "src")
            .select(
                F.col("dst").alias("src"), F.col("__m").alias("dst")
            )
            .unionByName(
                mn2.select(F.col("src"), F.col("__m").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
            .select(
                F.greatest("src", "dst").alias("src"),
                F.least("src", "dst").alias("dst"),
            )
            .distinct()
            .localCheckpoint()  # truncate the iterative lineage
        )
        # Fixed point: the round changed nothing (set equality — counts
        # alone can alias two different edge sets of the same size).
        if (
            ss.count() == cur.count()
            and ss.exceptAll(cur).isEmpty()
        ):
            converged = True
            cur = ss
            break
        cur = ss
    if not converged:
        # Exhausting the round budget would silently come back as
        # SPLIT clusters — an unflagged under-merge corrupts the dedup
        # downstream. The alternating-star rounds needed are
        # O(log n), so max_iter=20 covers ~10^6-node components;
        # fail loudly rather than emit a wrong answer.
        raise RuntimeError(
            f"connected_components: alternating-star contraction did "
            f"not converge within max_iter={max_iter} rounds "
            f"({n_edges} edges). Raise max_iter (rounds needed grow "
            f"with log of the largest component) or raise "
            f"small_graph_edges to take the union-find path."
        )
    labels = cur.groupBy("src").agg(F.min("dst").alias("__root"))
    return (
        vertices.select(id_col)
        .join(labels, vertices[id_col] == labels.src, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(F.col("__root"), F.col(id_col)).alias("cluster_id"),
        )
    )


# --- embedding cosine near-dup ----------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    planes: int = 16,
    dim: int | None = None,
    hot_bucket_cap: int = 4096,
) -> DataFrame:
    """Near-identical-vector pairs via random-hyperplane LSH + exact
    cosine verification.

    Bucket key: the sign bits of ``planes`` deterministic pseudo-random
    hyperplanes (hash-derived coefficients, no RNG state needed on
    executors). Near-identical vectors agree on every sign bit with
    overwhelming probability, so candidates reduce to an equi-join on
    the 16-bit bucket; exact cosine then filters. Buckets above
    ``hot_bucket_cap`` (identical-vector spam) switch to star-shaped
    candidates — see ``_bucketed_candidate_pairs``.

    Pass ``dim`` when known (it usually is — it's part of the embedding
    contract); otherwise one tiny probe job reads it from the data.
    """
    from pyspark.sql.functions import pandas_udf

    from ..functions.vectors import cosine_similarity
    from .similarity import deterministic_planes

    # Hyperplane coefficients are row-independent: computed once on the
    # driver. The sign-bit bucket is an Arrow-batched matmul (a pure
    # expression tree fell out of codegen and dominated bench time).
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    plane_mat = deterministic_planes(planes, dim, seed=42)

    @pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        import numpy as np

        pm = np.asarray(plane_mat)
        m = np.stack(vecs.to_numpy()).astype("float64")
        signs = (m @ pm.T) >= 0
        weights = (1 << np.arange(signs.shape[1])).astype("int64")
        return pd.Series((signs @ weights).astype("int64"))

    bucketed = df.select(
        F.col(id_col), F.col(vec_col), bucket_of(F.col(vec_col)).alias("bucket")
    )
    cand = _bucketed_candidate_pairs(
        bucketed, ["bucket"], id_col, [vec_col], hot_bucket_cap
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            cosine_similarity(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b")), 6
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


# --- semantic dedup (SemDeDup) -----------------------------------------------

def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.97,
    n_clusters: int = 16,
    centroids=None,
) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): semantic near-dup
    pruning over an embedding column — the training-data curation step
    that removes *semantically* redundant documents exact/minhash
    dedup cannot see.

    Algorithm, exactly the paper's shape: assign every vector to a
    spherical k-means cluster (fitted on a deterministic sample via
    the IVF machinery), then WITHIN each cluster greedily keep docs in
    ascending-id order, dropping a doc when its cosine to an already-
    KEPT doc in the cluster reaches ``threshold``. Ascending-id greedy
    makes the kept set deterministic across partitionings and file
    layouts. Cross-cluster near-dups are deliberately not compared —
    the SemDeDup approximation that makes the cost model work.

    Scale shape: one Arrow-batched BLAS pass for assignment, ONE
    shuffle on ``centroid_id``, then a per-cluster gram-matrix greedy
    inside ``applyInPandas`` — O(|c|^2) flops per cluster, bounded by
    choosing ``n_clusters ~ n / target_cluster_size`` (the paper runs
    ~100k clusters at LAION scale for the same reason). No global
    pairwise pass exists anywhere.

    Returns the KEPT rows (``id_col`` only — join back for payloads).
    """
    import numpy as np  # noqa: F401  (executor-side import in the UDF)

    from .similarity import ivf_assign, train_ivf_centroids

    if centroids is None:
        centroids = train_ivf_centroids(
            df, vec_col=vec_col, n_centroids=n_clusters
        )
    assigned = ivf_assign(
        df.select(id_col, vec_col), vec_col=vec_col, centroids=centroids
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        x = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        kept_idx: list[int] = []
        kept = np.empty((0, x.shape[1]))
        for i in range(len(pdf)):
            if kept.shape[0] == 0 or float((kept @ x[i]).max()) < threshold:
                kept = np.vstack([kept, x[i]])
                kept_idx.append(i)
        return pdf.iloc[kept_idx][[id_col]]

    id_type = dict(df.dtypes)[id_col]
    return assigned.groupBy("centroid_id").applyInPandas(
        prune, schema=f"{id_col} {id_type}"
    )
