"""Full-text ranked retrieval: BM25 scoring over a document corpus.

The classic search primitive (Robertson & Zaragoza 2009; Lucene's
default similarity since 6.0): for query terms q and document d,

    score(d) = sum_q idf(q) * tf * (k1 + 1)
                        / (tf + k1 * (1 - b + b * |d| / avgdl))
    idf(q)   = ln(1 + (N - df + 0.5) / (df + 0.5))

Physical shape at 100 TB: postings are ONE explode + groupBy on
(doc, term); the query-term filter is applied to the posting stream
BEFORE the aggregate (selective IN-list); document frequency is a
window count over the term partition of the SAME posting rows (a
separate dfreq aggregate would re-scan the corpus); corpus stats are
a broadcast 1-row frame; the final top-k is a distributed TakeOrdered
(orderBy + limit), never a global sort. No UDFs anywhere.

For serving MANY queries, ``build_bm25_index`` persists the full
posting list once as a term-range-clustered ManagedTable (corpus
stats in table properties); ``bm25_probe_index`` answers a query by
file-pruned term lookups — the commit log's footer stats skip every
file whose term range excludes the probe, so a query touches
O(query terms) files of a 100 TB index, exactly like the IVF probe
path skips non-probed centroid partitions.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokenize_py(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _tokens_arr(text_col: str) -> Column:
    # coalesce NULL text like every other text operator: with ANSI off
    # (legacy sizeOfNull) F.size(NULL array) is -1, which would corrupt
    # __dl/avgdl — don't let correctness depend on Spark 4's default.
    return F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"
        ),
        lambda x: F.length(x) > 0,
    )


def _build_postings(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str] | None,
    observation=None,
) -> DataFrame:
    """(id, __term, __tf, __dl) — doc length rides the posting rows
    (F.first in the same agg), so no separate lens frame and no
    doc-keyed join shuffle. ``terms`` filters BEFORE the aggregate;
    None keeps the full vocabulary (index build).

    Tokenize ONCE: the token array is bound to a column in its own
    projection and size()/explode() reference the column. Putting both
    directly over ``_tokens_arr`` would land the regex split in two
    operators (the size Project and the explode Generate), where
    whole-stage codegen's subexpression elimination cannot reach
    across — the corpus would be tokenized twice per pass.

    ``observation`` (optional ``pyspark.sql.Observation``): attached
    to the one-row-per-doc node, so (doc count, token total) ride
    whatever action executes the postings — the caller gets exact
    corpus stats with ZERO extra jobs and zero extra scans.
    """
    base = docs.select(
        F.col(id_col), _tokens_arr(text_col).alias("__toks")
    )
    if observation is not None:
        base = base.observe(
            observation,
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum(F.size("__toks")), F.lit(0)).alias("total_dl"),
        )
    exploded = base.select(
        F.col(id_col),
        F.size("__toks").alias("__dl"),
        F.explode("__toks").alias("__term"),
    )
    if terms is not None:
        exploded = exploded.filter(F.col("__term").isin(terms))
    return exploded.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).alias("__tf"),
        F.first("__dl").alias("__dl"),
    )


def _score_topk(
    postings: DataFrame,
    id_col: str,
    k: int,
    k1: float,
    b: float,
    round_decimals: int,
    n_docs: Column,
    avgdl: Column,
) -> DataFrame:
    """Shared scoring tail: window document frequency over the posting
    rows, per-doc sum, round BEFORE ranking, distributed TakeOrdered."""
    # postings rows are unique per (doc, term), so document frequency
    # is a plain window count over the term partition — shuffling only
    # the already-aggregated posting rows.
    dfreq_w = Window.partitionBy("__term")
    idf = F.log(1.0 + (n_docs - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    tf = F.col("__tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
    contrib = idf * tf * (k1 + 1.0) / norm
    scored = (
        postings.withColumn("__df", F.count(F.lit(1)).over(dfreq_w))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), round_decimals).alias("score"))
    )
    topk = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.col(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "score", "rank"
    )


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
    """Top-``k`` documents for ``query`` by BM25, computed directly
    from the corpus (one scoring pass + a 1-row stats aggregate).

    Returns (id_col, score, rank): score rounded to
    ``round_decimals`` BEFORE ranking so the (score desc, id asc)
    order is reproducible across engines; rank is 1-based
    (row_number) with ties broken by document id.
    """
    qterms = sorted(set(_tokenize_py(query)))
    if not qterms:
        raise ValueError("BM25 query has no terms")
    base = docs.select(F.col(id_col), _tokens_arr(text_col).alias("__toks"))
    # corpus stats: doc count and average length — exact integer sums,
    # one tiny broadcast row
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        (
            F.sum(F.size("__toks")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    postings = _build_postings(docs, id_col, text_col, qterms).join(
        F.broadcast(stats)
    )
    return _score_topk(
        postings, id_col, k, k1, b, round_decimals,
        n_docs=F.col("__N"), avgdl=F.col("__avgdl"),
    )


def build_bm25_index(
    docs: DataFrame,
    table,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 8,
) -> None:
    """Materialize the FULL posting list into ``table`` (a
    ManagedTable): rows ``(id_col, term, tf, dl)`` range-clustered by
    term (repartitionByRange + sortWithinPartitions), so each file's
    footer [min,max] for ``term`` is a tight range and a term probe
    prunes to O(1) files from the commit log alone. Corpus stats land
    in table properties (exact round-trip via repr) — derived data,
    like the IVF sidecar: losing the index means rebuild, never wrong
    results."""
    from pyspark.sql import Observation

    if docs.isEmpty():  # cheap limit-1 probe, keeps the no-table contract
        raise ValueError("cannot build a BM25 index over an empty corpus")
    obs = Observation()
    postings = _build_postings(
        docs, id_col, text_col, None, observation=obs
    ).select(
        F.col(id_col),
        F.col("__term").alias("term"),
        F.col("__tf").alias("tf"),
        F.col("__dl").alias("dl"),
    )
    table.create(
        postings.repartitionByRange(n_files, "term").sortWithinPartitions(
            "term"
        )
    )
    # exact stats observed ON the create's write action (CollectMetrics
    # over the one-row-per-doc node) — no separate corpus pass. The sum
    # over all-NULL texts coalesces to 0, so such a corpus still builds
    # (empty postings, zero token total) instead of failing on NULL.
    got = obs.get
    n, total = int(got["n_docs"]), int(got["total_dl"])
    table.set_property("bm25.n_docs", str(int(n)))
    table.set_property("bm25.avgdl", repr(float(total) / float(n)))
    # exact integer token total: extend_bm25_index folds THIS, not the
    # float-reconstructed avgdl*n (which drifts over many folds)
    table.set_property("bm25.total_dl", str(int(total)))
    table.set_property("bm25.id_col", id_col)


def extend_bm25_index(
    docs_batch: DataFrame,
    table,
    text_col: str = "text",
    n_files: int = 2,
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> bool:
    """Fold a NEW batch of documents into a persisted BM25 index: the
    batch's postings fast-append as their own term-range-clustered
    files and the corpus stats (exact doc count + token total) fold
    into the table properties. Because BM25 is stateless given
    (postings, stats), a probe over the extended index is VALUE-EXACT
    with a fresh build over the union corpus — no rescoring, no
    rebuild.

    Layout note (the LSM trade): each batch adds up to ``n_files``
    files per term range, so a term probe opens O(#batches) files
    instead of O(1) until the next OPTIMIZE compacts the index back to
    one clustered generation. That is the standard ingest/compact
    cycle — the probe stays file-pruned WITHIN each generation
    throughout.

    ``txn_app``/``txn_version`` (optional) ride the postings append as
    Delta's idempotent-writer txn action: a replay — or a CONCURRENT
    duplicate writer — turns the append into an atomic no-op, and the
    stats fold is skipped with it. Returns True iff THIS call extended
    the index (False: no rows, or a peer already applied the batch).
    """
    from pyspark.sql import Observation

    props = table.properties()
    id_col = props.get("bm25.id_col", "doc_id")
    if docs_batch.isEmpty():  # limit-1 probe; no commit on empty batches
        return False
    obs = Observation()
    postings = _build_postings(
        docs_batch, id_col, text_col, None, observation=obs
    ).select(
        F.col(id_col),
        F.col("__term").alias("term"),
        F.col("__tf").alias("tf"),
        F.col("__dl").alias("dl"),
    )
    table.append(
        postings.repartitionByRange(n_files, "term").sortWithinPartitions(
            "term"
        ),
        fast=True,
        txn_app=txn_app,
        txn_version=txn_version,
    )
    if txn_app is not None and table.last_append_was_noop:
        # a peer (or an earlier attempt) already applied this batch —
        # its postings AND stats are in; folding stats again would
        # double-count the batch. Checked BEFORE touching the
        # observation: a no-op never executed the plan, so the
        # observation holds nothing to read.
        return False
    # exact batch stats observed ON the append's write action — the
    # fold pays no separate stats job and no second tokenize pass. The
    # all-NULL-text batch coalesces its token sum to 0 (n_new > 0, no
    # postings) instead of raising AFTER the postings committed.
    got = obs.get
    n_new, total_new = int(got["n_docs"]), int(got["total_dl"])
    n_old = int(props["bm25.n_docs"])
    # integer-exact fold (legacy indexes without total_dl reconstruct
    # it once from avgdl*n, then carry the exact total forward)
    total_old = int(
        props.get("bm25.total_dl")
        or round(float(props["bm25.avgdl"]) * n_old)
    )
    n = n_old + int(n_new)
    total = total_old + int(total_new)
    # CRASH WINDOW: the stats fold is a sidecar write, not part of the
    # append commit — a crash between the two leaves stats one batch
    # behind the postings. repair_bm25_stats() recomputes both from the
    # postings themselves; streaming/search_index.py documents when to
    # run it.
    table.set_property("bm25.n_docs", str(n))
    table.set_property("bm25.total_dl", str(total))
    table.set_property("bm25.avgdl", repr(float(total) / float(n)))
    return True


def repair_bm25_stats(table) -> dict:
    """Recompute the BM25 corpus stats FROM the persisted postings and
    rewrite the properties: ``dl`` repeats per (doc, term) row, so
    per-doc length is ``max(dl)`` per id and the corpus totals are one
    aggregation over the index — the recovery path for a crash between
    an extend's append commit and its stats fold (postings are then
    ahead of the stats). Documents with zero tokens produce no
    postings and are not recoverable from the index; they only shift
    n_docs, and only until the next successful extend, which is the
    accepted repair bound. Returns the rewritten stats."""
    props = table.properties()
    id_col = props.get("bm25.id_col", "doc_id")
    per_doc = table.read().groupBy(id_col).agg(F.max("dl").alias("__dl"))
    n, total = per_doc.agg(F.count(F.lit(1)), F.sum("__dl")).first()
    if not n:
        raise ValueError("cannot repair stats of an empty BM25 index")
    table.set_property("bm25.n_docs", str(int(n)))
    table.set_property("bm25.total_dl", str(int(total)))
    table.set_property("bm25.avgdl", repr(float(total) / float(n)))
    return {"n_docs": int(n), "avgdl": float(total) / float(n)}


def bm25_probe_index(
    table,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int = 6,
) -> DataFrame:
    """Answer ``query`` from a persisted BM25 index: one file-pruned
    lookup per query term (``read_pruned`` — the commit log's footer
    stats skip every file whose term range excludes the probe), then
    the same scoring tail as ``bm25_topk``. Zero corpus scans at
    query time; cost is O(matching postings)."""
    qterms = sorted(set(_tokenize_py(query)))
    if not qterms:
        raise ValueError("BM25 query has no terms")
    props = table.properties()
    n_docs = int(props["bm25.n_docs"])
    avgdl = float(props["bm25.avgdl"])
    id_col = props.get("bm25.id_col", "doc_id")
    parts = [table.read_pruned("term", t, t) for t in qterms]
    postings = reduce(lambda a, c: a.unionByName(c), parts).select(
        F.col(id_col),
        F.col("term").alias("__term"),
        F.col("tf").alias("__tf"),
        F.col("dl").alias("__dl"),
    )
    return _score_topk(
        postings, id_col, k, k1, b, round_decimals,
        n_docs=F.lit(n_docs), avgdl=F.lit(avgdl),
    )


def _query_terms_df(
    queries: DataFrame, query_id_col: str, query_col: str
) -> DataFrame:
    """(query_id, __term) pairs, distinct per query — the broadcastable
    representation of a query WORKLOAD. One row per (query, term)."""
    return queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(_tokens_arr(query_col))).alias("__term"),
    )


def _score_topk_batch(
    postings: DataFrame,
    qterms: DataFrame,
    query_id_col: str,
    id_col: str,
    k: int,
    k1: float,
    b: float,
    round_decimals: int,
    n_docs: Column,
    avgdl: Column,
) -> DataFrame:
    """Batch scoring tail: document frequency is a window count over
    the term partition (a property of the CORPUS, so computed once,
    before any per-query fan-out), then ONE broadcast join against the
    (query, term) pairs fans each posting out to the queries that use
    its term, one grouped sum per (query, doc), and a per-query
    row_number window capped at k — Spark rewrites that filter into
    WindowGroupLimit, a per-partition top-k, never a global sort."""
    dfreq_w = Window.partitionBy("__term")
    idf = F.log(1.0 + (n_docs - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    tf = F.col("__tf").cast("double")
    norm = tf + k1 * (1.0 - b + b * F.col("__dl").cast("double") / avgdl)
    contrib = idf * tf * (k1 + 1.0) / norm
    scored = (
        postings.withColumn("__df", F.count(F.lit(1)).over(dfreq_w))
        .join(F.broadcast(qterms), "__term")
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(contrib), round_decimals).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-query BM25 top-``k`` for a DataFrame of queries — the shape
    a retrieval pipeline actually runs (thousands of queries against
    one corpus), answered in ONE corpus pass instead of one pass per
    query.

    The union of query terms is collected to the driver (a query
    workload is driver-bounded by construction — kilobytes of terms,
    never data-scale) so the posting build filters the exploded corpus
    with a selective IN-list BEFORE aggregating, exactly like the
    single-query form. Everything per-query then rides one broadcast
    join of the (query, term) pairs: corpus cost is paid once for the
    whole workload.

    Returns (query_id_col, id_col, score, rank), rank 1-based per
    query, ties broken by document id."""
    qterms = _query_terms_df(queries, query_id_col, query_col)
    all_terms = sorted(
        r["__term"] for r in qterms.select("__term").distinct().collect()
    )
    if not all_terms:
        raise ValueError("BM25 batch: no query has any terms")
    base = docs.select(F.size(_tokens_arr(text_col)).alias("__dl"))
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        (
            F.sum("__dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("__avgdl"),
    )
    postings = _build_postings(docs, id_col, text_col, all_terms).join(
        F.broadcast(stats)
    )
    return _score_topk_batch(
        postings, qterms, query_id_col, id_col, k, k1, b, round_decimals,
        n_docs=F.col("__N"), avgdl=F.col("__avgdl"),
    )


def bm25_probe_index_batch(
    table,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    round_decimals: int = 6,
) -> DataFrame:
    """Batch form of ``bm25_probe_index``: answer a DataFrame of
    queries from the persisted posting index with ONE file-pruned
    lookup per distinct term across the whole workload (shared terms
    are fetched once), then the batch scoring tail. Zero corpus
    scans; cost is O(postings of the workload's distinct terms) —
    the per-query marginal cost is one broadcast-join fan-out."""
    qterms = _query_terms_df(queries, query_id_col, query_col)
    all_terms = sorted(
        r["__term"] for r in qterms.select("__term").distinct().collect()
    )
    if not all_terms:
        raise ValueError("BM25 batch: no query has any terms")
    props = table.properties()
    n_docs = int(props["bm25.n_docs"])
    avgdl = float(props["bm25.avgdl"])
    id_col = props.get("bm25.id_col", "doc_id")
    parts = [table.read_pruned("term", t, t) for t in all_terms]
    postings = reduce(lambda a, c: a.unionByName(c), parts).select(
        F.col(id_col),
        F.col("term").alias("__term"),
        F.col("tf").alias("__tf"),
        F.col("dl").alias("__dl"),
    )
    return _score_topk_batch(
        postings, qterms, query_id_col, id_col, k, k1, b, round_decimals,
        n_docs=F.lit(n_docs), avgdl=F.lit(avgdl),
    )
