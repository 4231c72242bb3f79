"""Corpus duplicate-span removal (operators/text.py::dedup_corpus_spans)
— fixed-k token-window form of Lee et al. 2022 substring dedup."""

from __future__ import annotations

from delta_lake_platform_spark.operators.text import dedup_corpus_spans


def _run(spark, rows, **kw):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.text_spandeduped, r.n_tokens_kept, r.n_tokens_removed)
        for r in dedup_corpus_spans(docs, **kw).collect()
    }


def test_shared_prefix_removed_unique_tail_kept(spark):
    out = _run(
        spark,
        [
            (1, "alpha beta gamma delta eps zeta eta theta unique one"),
            (2, "alpha beta gamma delta eps zeta eta theta unique two"),
            (3, "totally different words here nothing repeats at all ok"),
        ],
        k=8,
    )
    # Hot windows start at 0 and 1 (both 8-token windows agree across
    # docs 1/2), covering positions 0..8; only the final token differs.
    assert out[1] == ("one", 1, 9)
    assert out[2] == ("two", 2 - 1, 9)
    assert out[3] == (
        "totally different words here nothing repeats at all ok", 9, 0)


def test_one_row_per_doc_including_short_empty_and_all_dup(spark):
    """Contract: every input document returns, even when shorter than
    k tokens, empty, or entirely covered by duplicate spans."""
    dup = " ".join(f"w{i}" for i in range(8))
    out = _run(
        spark,
        [(1, dup), (2, dup), (3, "tiny"), (4, ""), (5, None)],
        k=8,
    )
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1] == ("", 0, 8)      # pure duplicate span: all removed
    assert out[2] == ("", 0, 8)
    assert out[3] == ("tiny", 1, 0)  # shorter than k: untouched
    assert out[4] == ("", 0, 0)
    assert out[5] == ("", 0, 0)


def test_max_docs_threshold(spark):
    """max_docs=2 tolerates a span in two documents; three trips it."""
    dup = " ".join(f"w{i}" for i in range(8))
    rows = [(i, f"{dup} tail{i}") for i in (1, 2, 3)]
    lenient = _run(spark, rows, k=8, max_docs=2)
    assert all(v[2] == 8 for v in lenient.values()), lenient
    two_only = _run(spark, rows[:2], k=8, max_docs=2)
    assert all(v[2] == 0 for v in two_only.values()), two_only


def test_within_document_repeat_not_removed(spark):
    """The duplicate count is DISTINCT documents: a span repeated
    inside one document does not mark itself hot."""
    dup = " ".join(f"w{i}" for i in range(8))
    out = _run(spark, [(1, f"{dup} {dup}")], k=8)
    assert out[1][2] == 0


def test_plan_has_no_cartesian(spark, sf_dir):
    from delta_lake_platform_spark.plans import explain_str
    from delta_lake_platform_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = explain_str(dedup_corpus_spans(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_shuffle_budget(spark, sf_dir):
    """The documented scale shape: exactly three narrow data shuffles
    (window-hash frequency, covered-start collect, id join) — a fourth
    exchange means a regression toward re-shuffling token rows."""
    from delta_lake_platform_spark.plans.introspect import count_exchanges
    from delta_lake_platform_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = count_exchanges(dedup_corpus_spans(docs))
    assert n <= 3, n
