"""C4 cleaning pipeline (Raffel et al. 2020 §2.2) — with_c4_flags.

The registry query (docs_c4_clean) runs corpus-calibrated parameters
over the single-line synthetic corpus; these tests pin the PAPER
semantics on crafted multi-line documents: line-level filtering
(word floor, terminal punctuation, javascript lines) and the
document-level placeholder / brace / sentence gates.
"""

from __future__ import annotations

from delta_lake_platform_spark.operators import text as T

_GOOD = (
    "This is a perfectly reasonable first sentence for a test page.\n"
    "Here is another complete sentence that carries enough words too.\n"
    "Finally a third full sentence so the page clears the gate."
)


def _rows(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in T.with_c4_flags(df, **kw).collect()}


def test_good_page_passes_with_paper_defaults(spark):
    r = _rows(spark, [(1, _GOOD)])[1]
    assert r.n_lines_total == 3
    assert r.n_lines_kept == 3
    assert r.n_sentences == 3
    assert r.c4_text == _GOOD
    assert (
        r.flag_min_sentences,
        r.flag_no_placeholder,
        r.flag_no_brace,
        r.c4_pass,
    ) == (1, 1, 1, 1)


def test_line_rules_drop_short_unpunctuated_and_javascript(spark):
    txt = (
        "This is a perfectly reasonable first sentence for a test page.\n"
        "too short.\n"  # < 5 words
        "this line has plenty of words but no terminal punctuation\n"
        "Please enable JavaScript to view the comments powered by Disqus.\n"
        "Here is another complete sentence that carries enough words too.\n"
        "Finally a third full sentence so the page clears the gate."
    )
    r = _rows(spark, [(1, txt)])[1]
    assert r.n_lines_total == 6
    assert r.n_lines_kept == 3
    assert "JavaScript" not in r.c4_text
    assert "too short" not in r.c4_text
    assert "no terminal punctuation" not in r.c4_text
    assert r.c4_pass == 1


def test_terminal_punct_accepts_closing_quote_and_can_be_disabled(spark):
    quoted = 'He said the words "this is a quoted closing sentence."'
    bare = "this line has plenty of words but no terminal punctuation"
    r = _rows(spark, [(1, quoted + "\n" + bare)])[1]
    assert r.n_lines_kept == 1
    r = _rows(
        spark,
        [(1, quoted + "\n" + bare)],
        require_terminal_punct=False,
    )[1]
    assert r.n_lines_kept == 2


def test_placeholder_and_brace_gates_drop_document(spark):
    lorem = _GOOD + "\nWe begin with Lorem Ipsum filler text for this layout."
    brace = _GOOD + "\nThe config block is simply function() { return 42; }."
    rows = _rows(spark, [(1, lorem), (2, brace)])
    assert rows[1].flag_no_placeholder == 0 and rows[1].c4_pass == 0
    assert rows[2].flag_no_brace == 0 and rows[2].c4_pass == 0
    # line cleaning still happened — the gate is doc-level, text remains
    assert rows[1].n_lines_kept >= 3


def test_min_sentences_gate(spark):
    two = (
        "This is a perfectly reasonable first sentence for a test page.\n"
        "Here is another complete sentence that carries enough words too."
    )
    r = _rows(spark, [(1, two)])[1]
    assert r.n_sentences == 2
    assert r.flag_min_sentences == 0 and r.c4_pass == 0
    r = _rows(spark, [(1, two)], min_sentences=2)[1]
    assert r.c4_pass == 1


def test_null_text_is_empty_document(spark):
    r = _rows(spark, [(1, None)])[1]
    assert (r.n_lines_kept, r.n_sentences, r.c4_pass) == (0, 0, 0)
    assert r.c4_text == ""


def test_sentence_count_uses_cleaned_text(spark):
    # the dropped short line carries punctuation that must NOT count
    txt = _GOOD + "\nNo. Way. Ha."
    r = _rows(spark, [(1, txt)])[1]
    assert r.n_lines_kept == 3
    assert r.n_sentences == 3
