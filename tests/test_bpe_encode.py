"""text.bpe_apply_merges — BPE encoding via ordered literal merges."""

from __future__ import annotations

from delta_lake_platform_spark.operators import text as T


def _rows(spark, docs, merges=T.BPE_DEFAULT_MERGES):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in T.bpe_apply_merges(df, merges).collect()}


def test_known_encoding_the(spark):
    # merges: t+h -> th, th+e -> the  =>  "the" is ONE piece
    r = _rows(spark, [(1, "the")], merges=[("t", "h"), ("th", "e")])[1]
    assert (r.n_words, r.n_chars, r.n_pieces) == (1, 3, 1)
    assert r.pieces_per_word == 1.0


def test_merge_order_matters(spark):
    # without the (th,e) merge, "the" stays "th|e" = 2 pieces
    r = _rows(spark, [(1, "the")], merges=[("t", "h")])[1]
    assert r.n_pieces == 2
    # (th,e) alone can never fire: "t h e" has no "th" symbol yet
    r = _rows(spark, [(1, "the")], merges=[("th", "e")])[1]
    assert r.n_pieces == 3


def test_consecutive_merge_sites_all_fire(spark):
    # "ababab" with (a,b): every adjacent pair merges -> 3 pieces
    r = _rows(spark, [(1, "ababab")], merges=[("a", "b")])[1]
    assert r.n_pieces == 3


def test_no_partial_token_merges(spark):
    # (a,b) must not fire inside "xab" across the 'xa' boundary after
    # (x,a) merged first: "xab" -> xa|b = 2 pieces, not xab
    r = _rows(spark, [(1, "xab")], merges=[("x", "a"), ("a", "b")])[1]
    assert r.n_pieces == 2


def test_greedy_left_to_right_within_one_merge(spark):
    # "aaa" with (a,a): leftmost pair merges, leaving aa|a = 2 pieces
    r = _rows(spark, [(1, "aaa")], merges=[("a", "a")])[1]
    assert r.n_pieces == 2


def test_multiple_words_and_null_text(spark):
    rows = _rows(
        spark,
        [(1, "the other"), (2, None), (3, "")],
        merges=[("t", "h"), ("th", "e")],
    )
    # "the"=1 piece; "other": o|th|e|r (t+h fires, th+e needs 'the')
    # -> (th,e) fires on "other"? symbols: o t h e r -> o th e r ->
    # th+e present -> o the r = 3 pieces. total 4
    assert rows[1].n_words == 2
    assert rows[1].n_pieces == 1 + 3
    assert (rows[2].n_words, rows[2].n_pieces, rows[2].pieces_per_word) == (
        0, 0, 0.0,
    )
    assert rows[3].n_pieces == 0
