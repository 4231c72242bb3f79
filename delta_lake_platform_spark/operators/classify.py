"""Bag-of-words document classification for curation pipelines.

Production curation stacks gate documents with a lightweight text
classifier — CCNet and DCLM use fastText models trained to recognize
"looks like the target corpus" (Wenzek et al. 2019; Li et al. 2024).
The SQL-expressible member of that family is multinomial Naive Bayes
with Laplace smoothing: fit = ONE token-count aggregation, predict =
ONE sparse broadcast join — no gradient loop, no UDF, every step a
DataFrame aggregation that an oracle engine can replay value-for-value
(the same reason operators/curation.py uses unigram LMs for DSIR and
perplexity bucketing).

The scoring identity that keeps the predict join SPARSE: with
add-``s`` smoothing over the training vocabulary V,

    lp(t,c)        = ln( (cnt(t,c) + s) / (total_c + s*|V|) )
    default_lp(c)  = ln(        s       / (total_c + s*|V|) )
    lp(t,c) - default_lp(c) = ln( (cnt(t,c) + s) / s )

so  score(d,c) = ln prior(c) + N_d * default_lp(c)
               + sum_{t in d, cnt(t,c)>0} ln((cnt(t,c)+s)/s).

Every token the class never saw (including tokens outside the training
vocabulary entirely) is absorbed by the ``N_d * default_lp(c)`` term,
and the join only carries observed (token, class) pairs — the sparse
sliver, not |V| x |classes|.

Scale shape: fit is one explode + groupBy(token, label) with map-side
combine (token keys, the same exchange DSIR pays); the per-class
scalars are a |classes|-row broadcast; predict is one explode + one
broadcast join + one (id, label) aggregation. At 100 TB the count
table is truncated to top-K tokens + the default term absorbs the
tail — dataflow unchanged.

Determinism: scores round to 6 dp before the argmax and ties break on
the label string ascending, so predictions are engine-reproducible
(log-sum accumulation-order noise is ~1e-13, far under the rounding).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tok_stream(df: DataFrame, id_col: str, text_col: str, extra: list):
    return df.select(
        F.col(id_col),
        *extra,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("__tok"),
    )


def nb_classify(
    df: DataFrame,
    label_col: str,
    train_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Fit multinomial Naive Bayes on the rows where ``train_pred``
    holds (labels from ``label_col``) and score every OTHER row,
    returning its argmax class.

    Output: one row per scored (non-training) document —
    ``(id_col, n_tokens, predicted, score)`` with ``score`` the winning
    rounded log-posterior (up to the shared evidence constant).
    Documents with NULL/empty text score on the prior alone.

    Raises ``ValueError`` when the training slice is empty or has no
    tokens (there is no vocabulary to fit).
    """
    s = float(smoothing)
    if s <= 0:
        raise ValueError("nb_classify requires smoothing > 0")
    train = df.filter(train_pred)
    train_toks = _tok_stream(train, id_col, text_col, [F.col(label_col)])

    # sparse (token, label) counts — the only O(vocab) state
    counts = train_toks.groupBy("__tok", label_col).agg(
        F.count("*").alias("__cnt")
    )
    # Emptiness guard on the TOKEN STREAM, not the count table: counts
    # is empty iff train_toks is empty, and limit(1) over the stream
    # early-exits at the first token, where limit(1) over counts must
    # first run the full tokenize + groupBy (a whole extra pass).
    if train_toks.limit(1).count() == 0:
        raise ValueError(
            "nb_classify: empty training slice or no tokens to fit on"
        )
    # |V| = distinct training tokens across ALL classes (shared
    # smoothing denominator) — a 1-row broadcast, no driver round-trip
    vsize = counts.select(
        F.count_distinct("__tok").cast("double").alias("__v")
    )
    class_tok = counts.groupBy(label_col).agg(
        F.sum("__cnt").cast("double").alias("__tot")
    )
    class_docs = train.groupBy(label_col).agg(
        F.count("*").cast("double").alias("__ndocs")
    )
    n_train = train.select(F.count("*").cast("double").alias("__n"))
    classes = (
        class_docs.join(class_tok, label_col, "left")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(n_train))
        .select(
            F.col(label_col).alias("__label"),
            F.log(F.col("__ndocs") / F.col("__n")).alias("__log_prior"),
            F.log(
                F.lit(s)
                / (F.coalesce("__tot", F.lit(0.0)) + F.lit(s) * F.col("__v"))
            ).alias("__default_lp"),
        )
    )
    # per observed (token, class): the sparse correction ln((cnt+s)/s)
    deltas = counts.select(
        "__tok",
        F.col(label_col).alias("__label"),
        F.log((F.col("__cnt") + F.lit(s)) / F.lit(s)).alias("__delta"),
    )

    score_rows = df.filter(~train_pred)
    test_toks = _tok_stream(score_rows, id_col, text_col, [])
    n_tok = test_toks.groupBy(id_col).agg(F.count("*").alias("n_tokens"))
    hits = (
        test_toks.join(F.broadcast(deltas), on="__tok")
        .groupBy(id_col, "__label")
        .agg(F.sum("__delta").alias("__dsum"))
    )
    base = (
        score_rows.select(id_col)
        .join(n_tok, id_col, "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)).cast("long"))
        .crossJoin(F.broadcast(classes))
    )
    # hits is O(scored docs x classes) — same key domain as base, so
    # this is a plain shuffle join on (id, label), never a broadcast
    scored = (
        base.join(hits, [id_col, "__label"], "left")
        .withColumn(
            "__score",
            F.round(
                F.col("__log_prior")
                + F.col("n_tokens") * F.col("__default_lp")
                + F.coalesce("__dsum", F.lit(0.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("__score"), F.asc("__label")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            "n_tokens",
            F.col("__label").alias("predicted"),
            F.col("__score").alias("score"),
        )
    )


__all__ = ["nb_classify"]
