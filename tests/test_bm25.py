"""operators/search.py — BM25 ranked retrieval."""

from __future__ import annotations

import math

import pytest

from delta_lake_platform_spark.operators.search import bm25_topk


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark"),          # tf=3 for 'spark', dl=3
            (2, "spark flink trino beam"),     # tf=1, dl=4
            (3, "flink only here"),            # no query terms
            (4, "rare unique token row"),
        ],
        "doc_id long, text string",
    )


def test_only_matching_docs_scored(spark, corpus):
    out = bm25_topk(corpus, "spark", k=10).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].rank == 1 and out[1].rank == 2


def test_closed_form_score(spark, corpus):
    # N=4, df('spark')=2, avgdl=(3+4+3+4)/4=3.5
    out = {r.doc_id: r.score for r in bm25_topk(corpus, "spark", k=10).collect()}
    idf = math.log(1 + (4 - 2 + 0.5) / (2 + 0.5))
    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.5))
    assert out[1] == pytest.approx(round(s(3, 3), 6), abs=1e-6)
    assert out[2] == pytest.approx(round(s(1, 4), 6), abs=1e-6)


def test_rare_term_outscores_common_on_equal_tf(spark, corpus):
    # 'rare' appears in 1 doc, 'spark' in 2 -> higher idf wins at tf=1
    rare = bm25_topk(corpus, "rare", k=1).collect()[0]
    common = bm25_topk(corpus, "spark", k=2).collect()[1]  # doc 2, tf=1, dl=4
    assert rare.score > common.score


def test_multi_term_sums_and_k_truncates(spark, corpus):
    out = bm25_topk(corpus, "spark flink", k=2).collect()
    assert len(out) == 2
    # doc 2 matches both terms; doc 1 only 'spark' but with tf=3
    assert {r.doc_id for r in out} <= {1, 2, 3}


def test_empty_query_raises(spark, corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, "   ", k=5)


# --- persisted index ----------------------------------------------------------

def test_persisted_index_matches_direct_scoring(spark, corpus):
    import shutil
    import tempfile

    from delta_lake_platform_spark.operators.search import (
        bm25_probe_index,
        build_bm25_index,
    )
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    d = tempfile.mkdtemp(prefix="dlp_bm25_test_")
    idx = ManagedTable(spark, f"{d}/idx")
    build_bm25_index(corpus, idx, n_files=4)
    for q in ("spark", "spark flink", "rare unique"):
        direct = [(r.doc_id, r.score, r.rank)
                  for r in bm25_topk(corpus, q, k=10).collect()]
        probed = [(r.doc_id, r.score, r.rank)
                  for r in bm25_probe_index(idx, q, k=10).collect()]
        assert probed == direct, q
    shutil.rmtree(d, ignore_errors=True)


def test_probe_prunes_files(spark):
    import shutil
    import tempfile

    from delta_lake_platform_spark.operators.search import build_bm25_index
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    # many docs with disjoint vocabularies so term ranges separate
    rows = [(i, " ".join(f"w{i:03d}x{j}" for j in range(6)))
            for i in range(200)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    d = tempfile.mkdtemp(prefix="dlp_bm25_prune_")
    idx = ManagedTable(spark, f"{d}/idx")
    build_bm25_index(corpus, idx, n_files=8)
    kept, total = idx.prune_files("term", "w000x0", "w000x0")
    assert total >= 8
    assert len(kept) < total, "term probe did not prune any files"
    shutil.rmtree(d, ignore_errors=True)


def test_build_index_refuses_empty_corpus(spark):
    import tempfile

    from delta_lake_platform_spark.operators.search import build_bm25_index
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = ManagedTable(spark, tempfile.mkdtemp(prefix="dlp_bm25_e_") + "/i")
    with pytest.raises(ValueError):
        build_bm25_index(empty, idx)


def test_bm25_batch_equals_per_query_singles(spark, sf_dir):
    """Batch scoring must be VALUE-IDENTICAL to running the single-query
    operator once per query — same scores, same ranks, both from the
    corpus form and from the persisted-index form."""
    import shutil
    import tempfile

    from delta_lake_platform_spark.operators.search import (
        bm25_probe_index_batch,
        bm25_topk,
        bm25_topk_batch,
        build_bm25_index,
    )
    from delta_lake_platform_spark.sources.catalog import load_table
    from delta_lake_platform_spark.sources.managed_table import ManagedTable

    docs = load_table(spark, sf_dir, "documents")
    qs = [(1, "spark stream window merge"), (2, "hash join filter"),
          (3, "vector scan batch")]
    qdf = spark.createDataFrame(qs, "query_id long, query string")
    batch = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk_batch(docs, qdf, k=7).collect()
    }
    for qid, qtext in qs:
        singles = bm25_topk(docs, qtext, k=7).collect()
        assert len(singles) == 7
        for r in singles:
            assert batch[(qid, r["rank"])] == (r["doc_id"], r["score"]), (
                qid, r["rank"])
    d = tempfile.mkdtemp(prefix="bm25_batch_idx_")
    try:
        idx = ManagedTable(spark, f"{d}/idx")
        build_bm25_index(docs, idx)
        probed = {
            (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
            for r in bm25_probe_index_batch(idx, qdf, k=7).collect()
        }
        assert probed == batch
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bm25_batch_empty_and_null_queries(spark):
    """A workload whose every query is empty raises; NULL/empty text
    rows contribute nothing (coalesce guard in _tokens_arr)."""
    import pytest

    from delta_lake_platform_spark.operators.search import bm25_topk_batch

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "alpha")], "query_id long, query string"
    )
    rows = bm25_topk_batch(docs, qdf, k=5).collect()
    assert [r["doc_id"] for r in rows] == [1]
    empty = spark.createDataFrame(
        [(1, "   ")], "query_id long, query string"
    )
    with pytest.raises(ValueError):
        bm25_topk_batch(docs, empty, k=5)
