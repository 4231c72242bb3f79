"""Full-text ranked retrieval: BM25 scoring over a document corpus.

The classic search primitive (Robertson & Zaragoza 2009; Lucene's
default similarity since 6.0): for query terms q and document d,

    score(d) = sum_q idf(q) * tf * (k1 + 1)
                        / (tf + k1 * (1 - b + b * |d| / avgdl))
    idf(q)   = ln(1 + (N - df + 0.5) / (df + 0.5))

Physical shape at 100 TB: postings are ONE explode + groupBy on
(doc, term); the query-term filter is applied to the posting stream
BEFORE the aggregate (selective IN-list); document frequency is a
window count over the term partition of the SAME posting rows (one
pass — a separate dfreq aggregate would re-scan the corpus); corpus
stats are a broadcast 1-row frame; the final top-k is a distributed
TakeOrdered (orderBy + limit), never a global sort. No UDFs anywhere.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokenize_py(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int = 6,
) -> DataFrame:
    """Top-``k`` documents for ``query`` by BM25.

    Returns (id_col, score, rank): score rounded to
    ``round_decimals`` BEFORE ranking so the (score desc, id asc)
    order is reproducible across engines; rank is 1-based and dense
    in document order within equal rounded scores.
    """
    qterms = sorted(set(_tokenize_py(query)))
    if not qterms:
        raise ValueError("BM25 query has no terms")
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    # corpus stats: doc count and average length — exact integer sums,
    # one tiny broadcast row
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        (
            F.sum(F.size("__toks")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    # doc length rides the posting rows (F.first in the same agg), so
    # no separate lens frame and no doc-keyed join shuffle
    postings = (
        base.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.explode("__toks").alias("__term"),
        )
        .filter(F.col("__term").isin(qterms))
        .groupBy(id_col, "__term")
        .agg(
            F.count(F.lit(1)).alias("__tf"),
            F.first("__dl").alias("__dl"),
        )
    )
    # postings rows are unique per (doc, term), so document frequency
    # is a plain window count over the term — ONE pass over the
    # corpus (a separate dfreq aggregate would re-scan the postings
    # subtree), shuffling only the already-aggregated posting rows.
    dfreq_w = Window.partitionBy("__term")
    idf = F.log(
        1.0
        + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf = F.col("__tf").cast("double")
    norm = tf + k1 * (
        1.0 - b + b * F.col("__dl").cast("double") / F.col("__avgdl")
    )
    contrib = idf * tf * (k1 + 1.0) / norm
    scored = (
        postings.withColumn(
            "__df", F.count(F.lit(1)).over(dfreq_w)
        )
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), round_decimals).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )
