"""Corpus-curation queries over ``documents`` (operators/curation.py),
each value-checked against a DuckDB oracle.

Hash determinism contract shared by both sides: bucket = first (or
5th-) 4 hex chars of sha256(cast(doc_id as string)) parsed base-16,
mod 100 — Spark ``conv(substring(sha2(...),p,4),16,10)`` and DuckDB
``('0x' || substr(sha256(...),p,4))::INT`` produce identical values
because both digests are lowercase hex of the same bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation
from ..operators.text import with_token_stats
from ..sources.catalog import load_table
from .registry import register

_BUCKET1 = "CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100"
_BUCKET5 = "CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 5, 4)) AS INTEGER) % 100"

# --- deterministic train/val/test split ------------------------------------

SPLIT_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, {_BUCKET1} AS bucket FROM documents
)
SELECT doc_id, source, bucket,
  CASE WHEN bucket < 80 THEN 'train'
       WHEN bucket < 90 THEN 'val'
       ELSE 'test' END AS split
FROM t
ORDER BY doc_id
"""


@register("docs_train_split", SPLIT_ORACLE)
def docs_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based train/val/test assignment: stable under reruns and
    corpus growth (unlike randomSplit), shuffle-free at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        curation.train_val_test_split(docs)
        .select("doc_id", "source", "bucket", "split")
        .orderBy("doc_id")
    )


# --- sequence packing (concat-and-chunk) -----------------------------------

_SEQ_LEN = 512

PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
    LEN(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS token_count
  FROM documents
),
c AS (
  SELECT source, doc_id, token_count,
    COALESCE(SUM(token_count) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT source,
  CAST(FLOOR(cum_before / {_SEQ_LEN}) AS BIGINT) AS chunk_id,
  COUNT(*)::BIGINT AS n_docs,
  SUM(token_count)::BIGINT AS chunk_tokens,
  MIN(doc_id) AS first_doc,
  MAX(doc_id) AS last_doc
FROM c
GROUP BY source, chunk_id
ORDER BY source, chunk_id
"""


@register("docs_pack_sequences", PACK_ORACLE)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into {_SEQ_LEN}-token training windows,
    independent per source shard (one shuffle; shards pack in
    parallel across executors)."""
    docs = with_token_stats(load_table(spark, sf_dir, "documents"))
    return curation.pack_sequences(docs, seq_len=_SEQ_LEN).orderBy(
        "source", "chunk_id"
    )


# --- benchmark n-gram contamination ----------------------------------------

_NGRAM = 8

CONTAM_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
    unnest([array_to_string(toks[i:i+{_NGRAM - 1}], ' ')
            for i in range(1, len(toks) - {_NGRAM - 2})]) AS ngram
  FROM t WHERE len(toks) >= {_NGRAM}
),
d AS (SELECT DISTINCT doc_id, ngram FROM g),
bench AS (SELECT DISTINCT ngram FROM d WHERE doc_id % 97 = 0),
train AS (SELECT * FROM d WHERE doc_id % 97 <> 0),
tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_ngrams FROM train GROUP BY doc_id),
ov AS (
  SELECT t.doc_id, COUNT(*)::BIGINT AS n_overlap
  FROM train t JOIN bench b USING (ngram) GROUP BY t.doc_id
)
SELECT tot.doc_id, n_ngrams,
  COALESCE(n_overlap, 0) AS n_overlap,
  ROUND(COALESCE(n_overlap, 0) * 1.0 / n_ngrams, 6) AS overlap_ratio,
  COALESCE(n_overlap, 0) * 1.0 / n_ngrams >= 0.1 AS contaminated
FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
ORDER BY tot.doc_id
"""


@register("docs_benchmark_contamination", CONTAM_ORACLE)
def docs_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination scan: docs with doc_id % 97 == 0 stand in for a
    held-out benchmark; every training doc reports what fraction of its
    distinct word 8-grams leak from that set. The benchmark n-gram side
    is broadcast — the corpus scan is shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.ngram_contamination(
        docs, bench_predicate=F.col("doc_id") % 97 == 0, n=_NGRAM
    ).orderBy("doc_id")


# --- domain mixture resampling ---------------------------------------------

# Target mixture by source number: srcnum % 3 == 0 -> 0.5x (downsample),
# == 1 -> 1.0x (keep), == 2 -> 2.5x (upsample with fractional part).
_WEIGHT_SQL = """CASE CAST(substr(source, 4) AS INTEGER) % 3
       WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 ELSE 2.5 END"""

MIXTURE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
    {_WEIGHT_SQL} AS w,
    {_BUCKET5} AS b
  FROM documents
),
r AS (
  SELECT doc_id, source,
    CAST(FLOOR(w) AS INTEGER)
      + CASE WHEN b < CAST((w - FLOOR(w)) * 100 AS INTEGER) THEN 1 ELSE 0 END AS rep
  FROM t
)
SELECT doc_id, source, u.copy_idx
FROM r, UNNEST(range(1, rep + 1)) AS u(copy_idx)
ORDER BY doc_id, copy_idx
"""


@register("docs_domain_mixture", MIXTURE_ORACLE)
def docs_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance resampling to a target per-domain mixture: repeat
    factors are row-local (integer part + hash-resolved fraction), so
    the resample needs no global counts and no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    srcnum = F.substring("source", 4, 10).cast("int")
    weight = (
        F.when(srcnum % 3 == 0, F.lit(0.5))
        .when(srcnum % 3 == 1, F.lit(1.0))
        .otherwise(F.lit(2.5))
    )
    return curation.domain_mixture(docs, weight).orderBy("doc_id", "copy_idx")


def _unigram_avg_logprob(docs: DataFrame) -> DataFrame:
    """Shared unigram-LM scorer: per-doc ``(doc_id, n_tokens,
    avg_logprob)`` under the corpus-trained unigram model — the single
    source of truth for docs_unigram_logprob and
    docs_perplexity_buckets (tokenization: lower + single-space split,
    matching both oracles). At 100 TB the vocab would be truncated to
    top-K + an OOV bucket; the dataflow is unchanged."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda x: F.length(x) > 0
            )
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    return (
        toks.join(F.broadcast(vocab), on="tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("cnt") / F.col("total"))), 6).alias(
                "avg_logprob"
            ),
        )
    )


UNIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(AVG(ln(cnt / total)), 6) AS avg_logprob
FROM toks JOIN vocab USING (tok), tot
GROUP BY doc_id
ORDER BY doc_id
"""


@register("docs_unigram_logprob", UNIGRAM_ORACLE)
def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring: a unigram LM trained on the
    corpus itself scores each document by mean token log-probability —
    the classic cheap LM filter (low avg logprob = gibberish or
    boilerplate-heavy). Two aggregations: token counts (one shuffle on
    token), then a broadcast join of the vocab back onto the token
    stream and a per-doc aggregate. The corpus total is a broadcast
    scalar. At 100 TB the vocab would be truncated to top-K + an OOV
    bucket; the dataflow is unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    return _unigram_avg_logprob(docs).orderBy("doc_id")


LENGTH_HIST_ORACLE = """
WITH b AS (
  SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket, COUNT(*) AS n_docs
  FROM documents GROUP BY 1
), t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM b)
SELECT bucket, n_docs, ROUND(n_docs / total, 6) AS share,
       CAST(SUM(n_docs) OVER (ORDER BY bucket) AS BIGINT) AS cum_docs
FROM b, t
ORDER BY bucket
"""


@register("docs_length_histogram", LENGTH_HIST_ORACLE)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profile: 100-char histogram buckets with share and
    cumulative counts — the first diagnostic anyone runs on a new crawl
    dump. One partial-agg shuffle; the cumulative window runs over
    |buckets| rows (driver-sized)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    b = docs.groupBy(
        F.floor(F.col("n_chars") / 100).cast("long").alias("bucket")
    ).agg(F.count("*").alias("n_docs"))
    t = b.agg(F.sum("n_docs").cast("double").alias("total"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "bucket",
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
            F.sum("n_docs").over(w).alias("cum_docs"),
        )
        .orderBy("bucket")
    )


# --- BPE pair statistics (tokenizer-training step 1) -------------------------

BPE_PAIR_ORACLE = """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
  FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS wc FROM words WHERE LENGTH(w) >= 2 GROUP BY w
),
pairs AS (
  SELECT unnest(list_transform(range(1, LENGTH(w)), i -> substring(w, i, 2))) AS pair,
         wc
  FROM wf
)
SELECT pair, SUM(wc)::BIGINT AS pair_count
FROM pairs
GROUP BY pair
ORDER BY pair_count DESC, pair
LIMIT 20
"""


@register("docs_bpe_pair_stats", BPE_PAIR_ORACLE)
def docs_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent character pairs over the word-frequency table — the
    argmax table BPE tokenizer training merges from (operators/text.py
    ::bpe_pair_counts)."""
    from ..operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents")
    return text_ops.bpe_pair_counts(docs, top_k=20)


DSIR_ORACLE = """
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                            x -> len(x) > 0)) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, COUNT(*) AS cnt_raw,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS cnt_tgt
  FROM toks GROUP BY tok
),
sc AS (
  SELECT CAST(SUM(cnt_raw) AS DOUBLE) AS tot_raw,
         CAST(SUM(cnt_tgt) AS DOUBLE) AS tot_tgt,
         CAST(COUNT(*) AS DOUBLE) AS v
  FROM vocab
)
, agg AS (
  SELECT doc_id,
         COUNT(*)::BIGINT AS n_tokens,
         ROUND(SUM(ln((cnt_tgt + 1.0) / (tot_tgt + v))
                 - ln((cnt_raw + 1.0) / (tot_raw + v))), 6) AS log_weight,
         ROUND(AVG(ln((cnt_tgt + 1.0) / (tot_tgt + v))
                 - ln((cnt_raw + 1.0) / (tot_raw + v))), 6) AS avg_log_ratio
  FROM toks JOIN vocab USING (tok), sc
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(agg.n_tokens, 0)::BIGINT AS n_tokens,
       COALESCE(agg.log_weight, 0.0) AS log_weight,
       agg.avg_log_ratio
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""


@register("docs_dsir_weights", DSIR_ORACLE)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (r9, curation.py::dsir_log_weights —
    Xie et al. 2023, arXiv:2302.03169): every document scored by
    ln p_target / p_raw under shared-vocab Laplace-smoothed unigram
    LMs, target = the English slice. Top-weight selection steers the
    raw corpus toward the target distribution; the oracle recomputes
    both LMs and both the summed and length-normalized ratios."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    return curation.dsir_log_weights(
        docs, F.col("lang") == "en"
    ).orderBy("doc_id")


PPL_BUCKET_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(lower(text), ' '), x -> len(x) > 0)) AS tok
  FROM documents
),
vocab AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM vocab),
lp AS (
  SELECT doc_id, ROUND(AVG(ln(cnt / total)), 6) AS avg_logprob
  FROM toks JOIN vocab USING (tok), tot
  GROUP BY doc_id
),
ranked AS (
  SELECT d.doc_id, d.lang, lp.avg_logprob,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY lp.avg_logprob DESC, d.doc_id) AS b
  FROM documents d JOIN lp USING (doc_id)
)
SELECT doc_id, lang, avg_logprob,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
FROM ranked
ORDER BY doc_id
"""


@register("docs_perplexity_buckets", PPL_BUCKET_ORACLE)
def docs_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): documents split per language into head/middle/
    tail thirds by LM score — the standard crawl-quality
    stratification (head = most fluent, tail = candidate discard).
    The LM is the corpus unigram model (docs_unigram_logprob's
    machinery); the tertile is an NTILE window per language over the
    ROUNDED score with doc_id as the deterministic tiebreak, so the
    bucketing is reproducible across engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    lp = _unigram_avg_logprob(docs).select("doc_id", "avg_logprob")
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .join(lp, "doc_id")
        .withColumn("__b", F.ntile(3).over(w))
        .select(
            "doc_id",
            "lang",
            "avg_logprob",
            F.when(F.col("__b") == 1, "head")
            .when(F.col("__b") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --- k-anonymity release profile (r9) -----------------------------------------

K_ANON_ORACLE = """
WITH g AS (
  SELECT c_mktsegment, c_nationkey, COUNT(*) AS gn
  FROM customer GROUP BY c_mktsegment, c_nationkey
)
SELECT gn AS group_size,
  COUNT(*)::BIGINT AS n_groups,
  (gn * COUNT(*))::BIGINT AS n_rows,
  (gn >= 10)::BIGINT AS is_k_anonymous
FROM g
GROUP BY gn
ORDER BY group_size
"""


@register("customers_k_anonymity", K_ANON_ORACLE)
def customers_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release profile (Sweeney 2002) for the
    (mktsegment, nationkey) quasi-identifier pair at k=10: group-size
    histogram with row counts and the k verdict per size — the table
    a privacy review reads before releasing a dataset. Two map-side-
    combinable aggregates; enforcement modes (suppress / mask / flag)
    are pinned by tests/test_k_anonymity.py."""
    from ..operators.curation import k_anonymity_profile

    c = load_table(spark, sf_dir, "customer")
    return k_anonymity_profile(
        c, ["c_mktsegment", "c_nationkey"], k=10
    ).orderBy("group_size")


# --- weighted sampling without replacement (A-ES, r9) --------------------------

WEIGHTED_SAMPLE_ORACLE = """
WITH t AS (
  SELECT doc_id, n_chars,
    (CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 9, 8)) AS BIGINT)
     + 1.0) / 4294967296.0 AS u
  FROM documents WHERE n_chars > 0
),
s AS (
  SELECT doc_id, n_chars,
    ROUND(POWER(u, 1.0 / n_chars), 6) AS sample_key
  FROM t
)
SELECT doc_id, n_chars, sample_key,
  ROW_NUMBER() OVER (ORDER BY sample_key DESC, doc_id) AS rank
FROM s
QUALIFY rank <= 50
ORDER BY rank
"""


@register("docs_weighted_sample", WEIGHTED_SAMPLE_ORACLE)
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sampling without replacement
    (sampling.weighted_sample, Efraimidis-Spirakis A-ES): 50 docs
    drawn proportional to n_chars via u^(1/w) keys on sha-256 ids —
    deterministic under any partitioning, one projection + distributed
    TakeOrdered, keys rounded before ranking for engine-reproducible
    membership."""
    from ..operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return (
        weighted_sample(docs, k=50, weight_col="n_chars")
        .select("doc_id", "n_chars", "sample_key", "rank")
        .orderBy("rank")
    )


# --- temperature-scaled mixture weights (r10) --------------------------------

TEMPERATURE_ORACLE = """
WITH c AS (
  SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
),
t AS (SELECT SUM(n_docs)::DOUBLE AS N FROM c),
s AS (
  SELECT lang, n_docs, n_docs / t.N AS p, POW(n_docs / t.N, 0.3) AS pa
  FROM c CROSS JOIN t
),
z AS (SELECT SUM(pa) AS z FROM s)
SELECT lang, n_docs,
  ROUND(p, 6) AS p_raw,
  ROUND(pa / z.z, 6) AS weight,
  ROUND((pa / z.z) / p, 6) AS boost
FROM s CROSS JOIN z
ORDER BY lang
"""


@register("docs_temperature_mixture", TEMPERATURE_ORACLE)
def docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixture (alpha=0.3, the mBERT/XLM-R
    balancing rule): one domain groupBy, then |domains|-row math; the
    boost column feeds domain_mixture as its per-row repeat factor."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.temperature_weights(docs, "lang", alpha=0.3).orderBy(
        "lang"
    )


# --- duplication down-weighting (r10) ----------------------------------------

DEDUP_WEIGHTS_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0
),
keyed AS (
  SELECT doc_id,
    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS fp
  FROM corpus
),
sized AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY fp)::BIGINT AS n_copies
  FROM keyed
)
SELECT doc_id, n_copies, ROUND(1.0 / n_copies, 6) AS dedup_weight
FROM sized
ORDER BY doc_id
"""


@register("docs_dedup_weights", DEDUP_WEIGHTS_ORACLE)
def docs_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup: instead of dropping exact duplicates, DOWN-WEIGHT
    them by 1/n_copies (the loss-weighting alternative used when
    provenance must be kept). One window count over the normalized
    content fingerprint — a single exchange, no join-back."""
    from pyspark.sql import Window

    from ..operators.text import normalized_fingerprint

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(planted)
    n = F.count("*").over(
        Window.partitionBy(normalized_fingerprint("text"))
    )
    return (
        corpus.select(
            "doc_id",
            n.cast("long").alias("n_copies"),
        )
        .withColumn("dedup_weight", F.round(1.0 / F.col("n_copies"), 6))
        .orderBy("doc_id")
    )
