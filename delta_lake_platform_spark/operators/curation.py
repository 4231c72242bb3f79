"""Corpus-curation operators for training-data pipelines: deterministic
splits, sequence packing, benchmark-contamination checks, and domain
mixture resampling.

All four are pure ``pyspark.sql.functions`` compositions (JVM-side,
whole-stage codegen) — no Python UDFs — so they scan a 100 TB corpus at
parquet speed. None of these exist in the reference (its surface is the
SCD engine, scd_handler.py:58-163); they are the north-star LLM-pipeline
additions the project brief calls for, alongside operators/dedup.py and
operators/text.py.

Scale notes per operator:
- ``hash_bucket`` / ``train_val_test_split``: stateless per-row hash —
  no shuffle at all; the split is stable under reruns, repartitioning,
  and corpus growth (a doc's bucket never changes when other docs are
  added, unlike ``randomSplit``).
- ``pack_sequences``: one shuffle on the shard column; the running sum
  is a window inside each shard, so shards pack independently and in
  parallel (exactly how a 1000-executor packing job is laid out).
- ``ngram_contamination``: the benchmark n-gram set is tiny relative to
  the corpus — Catalyst broadcasts it; the corpus side stays a single
  projection + explode with no pre-shuffle.
- ``domain_mixture``: per-row repeat factor + explode; fractional parts
  resolved by hash (deterministic), so the output mixture converges to
  the target weights without a global count or a second pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, n_buckets: int = 100, pos: int = 1) -> Column:
    """Deterministic bucket in [0, n_buckets) from sha-256 of the id.

    ``pos`` selects which 4 hex chars of the digest feed the bucket, so
    independent decisions (split vs. sampling) decorrelate by using
    different positions of the same digest.
    """
    hex4 = F.substring(F.sha2(id_col.cast("string"), 256), pos, 4)
    return (F.conv(hex4, 16, 10).cast("long") % n_buckets).cast("int")


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Adds ``bucket`` and ``split`` ('train'/'val'/'test') columns.
    Hash-based, so membership is a property of the row alone."""
    b = hash_bucket(F.col(id_col))
    return df.withColumns(
        {
            "bucket": b,
            "split": F.when(b < train_pct, F.lit("train"))
            .when(b < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test")),
        }
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    token_count_col: str = "token_count",
) -> DataFrame:
    """Concat-and-chunk sequence packing (GPT-style): within each shard,
    documents are laid end to end in a deterministic order and cut into
    ``seq_len``-token windows; a document belongs to the chunk holding
    its first token. Returns per-chunk stats.

    Output: shard_col, chunk_id, n_docs, chunk_tokens, first_doc,
    last_doc.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    return (
        df.withColumn("chunk_id", F.floor(cum_before / seq_len))
        .groupBy(shard_col, "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count_col).alias("chunk_tokens"),
            F.min(order_col).alias("first_doc"),
            F.max(order_col).alias("last_doc"),
        )
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """All word n-grams of a token array as space-joined strings
    (empty array when the document is shorter than n)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(tokens, i, n), " "),
    )
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    docs: DataFrame,
    bench_predicate: Column,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: for every non-benchmark document,
    the fraction of its distinct word n-grams that also appear in the
    benchmark subset (``bench_predicate``). Documents shorter than n
    tokens have no n-grams and are excluded.

    Output: id_col, n_ngrams, n_overlap, overlap_ratio, contaminated.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    # Per-doc dedup happens INSIDE the row (array_distinct before any
    # explode): doc_id is unique, so this equals a global distinct on
    # (id, ngram) — minus the full-corpus exchange distinct() costs.
    # Each side filters BEFORE tokenizing, so the bench predicate
    # pushes down to the scan and only the benchmark sliver is
    # tokenized on that branch.
    bench_grams = (
        docs.filter(bench_predicate)
        .select(F.explode(F.array_distinct(word_ngrams(toks, n))).alias("ngram"))
        .distinct()
    )
    # Corpus side: one narrow exchange of the RAW text rows spreads the
    # tokenize+explode across cores even when the input has few splits
    # (shuffling text once is far cheaper than shuffling the n=8
    # blown-up (id, ngram) pairs). The tokenized frame is pinned —
    # both consumers (hit counting, final join) reuse one pass instead
    # of re-running the regex tokenizer.
    base = (
        docs.filter(~bench_predicate)
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col),
            F.array_distinct(word_ngrams(toks, n)).alias("__grams"),
        )
        .select(id_col, F.size("__grams").alias("n_ngrams"), "__grams")
        .localCheckpoint(eager=False)
    )
    # n_ngrams is row-local (array size). The corpus explode feeds an
    # INNER broadcast join, so only contaminated (id, ngram) pairs —
    # a sliver — reach the count aggregation; the clean bulk of the
    # corpus is dropped map-side and never shuffles. The tiny hit
    # table then broadcasts back onto the one-row-per-doc base.
    hits = (
        base.select(id_col, F.explode("__grams").alias("ngram"))
        .join(F.broadcast(bench_grams), on="ngram", how="inner")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_ngrams")
    return (
        base.drop("__grams")
        .filter(F.col("n_ngrams") > 0)
        .join(F.broadcast(hits), on=id_col, how="left")
        .withColumn("n_overlap", F.coalesce(F.col("n_overlap"), F.lit(0)))
        .select(
            id_col,
            "n_ngrams",
            "n_overlap",
            F.round(ratio, 6).alias("overlap_ratio"),
            (ratio >= 0.1).alias("contaminated"),
        )
    )


def domain_mixture(
    df: DataFrame,
    weight: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resample rows to a target domain mixture. ``weight`` is the
    per-row sampling rate: 2.5 means every row appears twice and half
    of them (chosen by hash, deterministically) a third time; 0.5 keeps
    a deterministic half. Adds ``copy_idx`` (1-based).

    This is importance resampling for training mixtures without a
    global pass: no count, no shuffle — repeat factors are row-local.
    """
    frac_pct = ((weight - F.floor(weight)) * 100).cast("int")
    rep = (
        F.floor(weight).cast("int")
        + (hash_bucket(F.col(id_col), pos=5) < frac_pct).cast("int")
    )
    out_cols = [F.col(c) for c in df.columns]
    return (
        df.withColumn("__rep", rep)
        .select(*out_cols, F.posexplode(F.array_repeat(F.lit(1), F.col("__rep"))))
        .select(*out_cols, (F.col("pos") + 1).cast("long").alias("copy_idx"))
    )


def temperature_weights(
    df: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled sampling weights over a domain/language
    column — the multilingual-LM balancing rule (mBERT/XLM-R/mT5):
    sample domain i with probability proportional to ``p_i^alpha``
    where ``p_i`` is its raw share. ``alpha < 1`` up-samples the tail
    (alpha=1 keeps the raw mixture, alpha=0 is uniform).

    Output: one row per domain — ``n_docs``, ``p_raw`` (raw share),
    ``weight`` (the temperature-scaled target share), and ``boost``
    (weight / p_raw — the per-row repeat factor to feed straight into
    ``domain_mixture``).

    Scale shape: ONE exchange (the domain groupBy, map-side combined);
    everything after operates on the |domains|-row frame via 1-row
    broadcasts. Values round to 6 dp for cross-engine parity.
    """
    if alpha < 0:
        raise ValueError("temperature_weights requires alpha >= 0")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").cast("double").alias("__N"))
    scored = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("__p", F.col("n_docs") / F.col("__N"))
        .withColumn("__pa", F.pow("__p", F.lit(float(alpha))))
    )
    z = scored.agg(F.sum("__pa").alias("__z"))
    w = F.col("__pa") / F.col("__z")
    return (
        scored.crossJoin(F.broadcast(z))
        .select(
            domain_col,
            "n_docs",
            F.round("__p", 6).alias("p_raw"),
            F.round(w, 6).alias("weight"),
            F.round(w / F.col("__p"), 6).alias("boost"),
        )
    )


def dsir_log_weights(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR — Xie et al.
    2023, arXiv:2302.03169), the bag-of-words form: score every raw
    document by how much more likely it is under a TARGET unigram LM
    (trained on the rows where ``target_pred`` holds) than under the
    RAW unigram LM (trained on the whole corpus):

        log w(x) = sum_{tok in x} [ ln p_target(tok) - ln p_raw(tok) ]

    Selecting the top rows by weight (or Gumbel-resampling on it)
    yields raw data distributed like the target — the standard recipe
    for steering a crawl toward a high-quality or in-domain seed set.

    Both LMs share the RAW vocabulary with add-``smoothing`` Laplace
    mass, so target-unseen tokens contribute a finite negative ratio
    instead of -inf. Output: one row per input document —
    ``(id_col, n_tokens, log_weight, avg_log_ratio)`` (sum and
    length-normalized mean, both rounded to 6dp for cross-engine
    reproducibility).

    Scale shape: one token explode feeds BOTH count passes (shuffles
    8-byte-ish token keys with map-side combine); the two vocab maps
    broadcast back onto the token stream (at 100 TB: truncate to top-K
    + OOV bucket, dataflow unchanged); scalars (totals, vocab size)
    ride a broadcast single-row frame — zero driver round-trips, no
    stage quadratic in anything."""
    toks = df.select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("__tok"),
    )
    vocab = toks.groupBy("__tok").agg(
        F.count("*").alias("__cnt_raw"),
        F.sum(F.col("__is_target").cast("long")).alias("__cnt_tgt"),
    )
    scalars = vocab.agg(
        F.sum("__cnt_raw").cast("double").alias("__tot_raw"),
        F.sum("__cnt_tgt").cast("double").alias("__tot_tgt"),
        F.count("*").cast("double").alias("__v"),
    )
    s = F.lit(float(smoothing))
    log_ratio = F.log(
        (F.col("__cnt_tgt") + s) / (F.col("__tot_tgt") + s * F.col("__v"))
    ) - F.log(
        (F.col("__cnt_raw") + s) / (F.col("__tot_raw") + s * F.col("__v"))
    )
    agg = (
        toks.join(F.broadcast(vocab), on="__tok")
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.sum(log_ratio), 6).alias("log_weight"),
            F.round(F.avg(log_ratio), 6).alias("avg_log_ratio"),
        )
    )
    # One row per input document includes NULL/empty/whitespace-only
    # text: the token explode drops such rows, so restore them with an
    # empty-sum weight of 0.0 (avg over zero tokens stays NULL) — the
    # same contract-preserving join-back as dedup_corpus_lines/spans.
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            F.col("avg_log_ratio"),
        )
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
    mode: str = "suppress",
) -> DataFrame:
    """k-anonymity enforcement (Sweeney 2002) over a quasi-identifier
    combination: a row whose quasi-identifier group holds fewer than
    ``k`` rows is re-identifiable and must not ship in a released /
    training dataset.

    - mode="suppress": drop rows in rare groups (record suppression)
    - mode="mask": keep the row, NULL out the quasi-identifier columns
      (attribute suppression — the row still contributes its other
      columns)
    - mode="flag": keep everything, add ``is_k_anonymous`` (0/1)

    One window count over the quasi-identifier partition — a single
    hash shuffle on the group key, no joins, no second pass. NULLs in
    quasi columns group together (SQL window partitioning), which is
    the conservative choice: an all-NULL group releases nothing.
    """
    if mode not in ("suppress", "mask", "flag"):
        raise ValueError(f"unknown k_anonymity mode: {mode!r}")
    if not quasi_cols:
        raise ValueError("k_anonymity requires quasi-identifier columns")
    from pyspark.sql import Window

    w = Window.partitionBy(*quasi_cols)
    n = F.count(F.lit(1)).over(w)
    flagged = df.withColumn("__gn", n)
    ok = F.col("__gn") >= k
    if mode == "flag":
        return flagged.withColumn(
            "is_k_anonymous", ok.cast("long")
        ).drop("__gn")
    if mode == "suppress":
        return flagged.filter(ok).drop("__gn")
    masked = flagged.select(
        *[
            F.when(ok, F.col(c)).alias(c) if c in quasi_cols else F.col(c)
            for c in df.columns
        ]
    )
    return masked


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Release-risk profile for a quasi-identifier combination: one
    row per group SIZE with the number of groups and rows at that
    size and whether it clears ``k`` — the table a privacy review
    reads before choosing k / generalizing columns. Two aggregates
    (group -> size, size -> counts), both map-side combinable."""
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__gn"))
    return (
        sizes.groupBy("__gn")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            F.col("__gn").alias("group_size"),
            "n_groups",
            (F.col("__gn") * F.col("n_groups")).cast("long").alias(
                "n_rows"
            ),
            (F.col("__gn") >= k).cast("long").alias("is_k_anonymous"),
        )
    )
