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
    grams = (
        docs.select(
            F.col(id_col), bench_predicate.alias("__bench"),
            F.explode(word_ngrams(toks, n)).alias("ngram"),
        )
        .distinct()
    )
    # The bench branch re-derives from `grams`, but its __bench filter
    # pushes down to the scan, so it only reads the benchmark sliver.
    # The (large) train side is scanned ONCE: a broadcast left join
    # tags each n-gram, and one aggregation yields total + overlap.
    bench_grams = (
        grams.filter("__bench").select("ngram").distinct()
        .withColumn("__hit", F.lit(1))
    )
    ratio = F.col("n_overlap") / F.col("n_ngrams")
    return (
        grams.filter(~F.col("__bench"))
        .join(F.broadcast(bench_grams), on="ngram", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("__hit").alias("n_overlap"),
        )
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
