"""Unit tests for operators/curation.py (the oracle queries cover the
full-corpus paths; these pin edge semantics on hand-built inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import curation


def test_split_is_deterministic_and_row_local(spark):
    base = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    s1 = curation.train_val_test_split(base).select("doc_id", "split")
    # Same ids through a different-sized frame: identical assignment
    # (randomSplit would reshuffle membership here).
    bigger = spark.range(0, 400).withColumnRenamed("id", "doc_id")
    s2 = (
        curation.train_val_test_split(bigger)
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "split")
    )
    assert s1.exceptAll(s2).isEmpty() and s2.exceptAll(s1).isEmpty()
    frac = {
        r["split"]: r["n"]
        for r in s1.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert frac["train"] > frac.get("val", 0) + frac.get("test", 0)


def test_pack_sequences_exact_boundaries(spark):
    rows = [("s", i, tc) for i, tc in enumerate([60, 60, 60, 60])]
    df = spark.createDataFrame(rows, ["source", "doc_id", "token_count"])
    out = {
        r["chunk_id"]: (r["n_docs"], r["chunk_tokens"])
        for r in curation.pack_sequences(df, seq_len=100).collect()
    }
    # cum_before: 0,60,120,180 -> chunks 0,0,1,1
    assert out == {0: (2, 120), 1: (2, 120)}


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    toks = F.split(F.col("text"), " ")
    row = df.select(
        curation.word_ngrams(toks, 2).alias("g2"),
        curation.word_ngrams(toks, 4).alias("g4"),
    ).first()
    assert row["g2"] == ["a b", "b c"]
    assert row["g4"] == []


def test_contamination_flags_planted_copy(spark):
    bench_text = "one two three four five six seven eight nine ten"
    rows = [
        (0, bench_text),  # benchmark doc (id % 2 == 0 predicate below)
        (1, bench_text),  # exact copy -> ratio 1.0
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in curation.ngram_contamination(
            docs, bench_predicate=F.col("doc_id") % 2 == 0, n=8
        ).collect()
    }
    assert out[1]["contaminated"] and out[1]["overlap_ratio"] == 1.0
    assert not out[3]["contaminated"] and out[3]["n_overlap"] == 0


def test_domain_mixture_repeat_bounds(spark):
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = curation.domain_mixture(df, weight=F.lit(2.5))
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n"))
    bad = per_doc.filter(~F.col("n").isin(2, 3))
    assert bad.isEmpty()
    total = out.count()
    assert 2 * 300 < total < 3 * 300  # fraction resolved by hash, ~2.5x

    kept = curation.domain_mixture(df, weight=F.lit(0.5)).count()
    assert 0 < kept < 300


def test_chunk_documents_boundaries_and_plan(spark):
    """RAG chunking: windows are byte-exact ([i*stride, i*stride+size)),
    every doc yields >= 1 chunk (empty/short included), consecutive
    chunks overlap by exactly `overlap` chars, and the plan contains NO
    exchange — chunking is a narrow map at any corpus size."""
    from delta_lake_platform_spark.operators.text import chunk_documents

    rows = [
        (1, "abcdefghij"),          # 10 chars -> 3 chunks at size 4/stride 3
        (2, "xy"),                  # shorter than one window -> 1 chunk
        (3, ""),                    # empty -> 1 empty chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk_size=4, overlap=1)
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_text, r.n_chunks)
        for r in out.collect()
    }
    assert got == {
        (1, 0): ("abcd", 3),
        (1, 1): ("defg", 3),
        (1, 2): ("ghij", 3),
        (2, 0): ("xy", 1),
        (3, 0): ("", 1),
    }
    # Overlap invariant: chunk i's tail == chunk i+1's head.
    assert got[(1, 0)][0][-1] == got[(1, 1)][0][0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overlap must be smaller"):
        chunk_documents(df, chunk_size=4, overlap=4)


# --- DSIR importance weights ---------------------------------------------------

def test_dsir_log_weights_rank_target_like_docs_higher(spark):
    """Documents made of target-heavy tokens must out-weigh raw-heavy
    ones; a doc mixing both lands in between; every input row returns."""
    rows = [
        (1, "alpha alpha beta", True),     # target rows define p_target
        (2, "alpha beta beta", True),
        (3, "gamma gamma delta", False),   # raw-only tokens
        (4, "alpha gamma", False),         # mixed
        (5, "alpha alpha alpha", False),   # raw doc that LOOKS target-like
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r.doc_id: (r.n_tokens, r.log_weight, r.avg_log_ratio)
        for r in curation.dsir_log_weights(df, F.col("tgt")).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # gamma/delta never occur in the target: strongly negative.
    assert out[3][1] < out[4][1] < out[5][1]
    # Target rows themselves weigh positive (their tokens are
    # target-favored); beta is the most target-favored token.
    assert out[1][1] > 0 and out[2][1] > 0
    # avg is sum / n_tokens (up to rounding).
    n, s, a = out[4]
    assert abs(s / n - a) < 1e-5


def test_dsir_weights_are_finite_under_smoothing(spark):
    """Shared-vocab Laplace smoothing: tokens absent from the target
    produce finite ratios, never NULL/inf."""
    df = spark.createDataFrame(
        [(1, "only target words", True), (2, "completely disjoint raw", False)],
        "doc_id long, text string, tgt boolean",
    )
    rows = curation.dsir_log_weights(df, F.col("tgt")).collect()
    import math

    for r in rows:
        assert r.log_weight is not None and math.isfinite(r.log_weight)


def test_dsir_returns_one_row_per_doc_including_empty(spark):
    """NULL/empty/whitespace-only text must still return a row —
    weight 0.0 over zero tokens, avg NULL — never disappear from a
    downstream doc_id join."""
    df = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "", False), (3, None, False),
         (4, "   ", False)],
        "doc_id long, text string, tgt boolean",
    )
    out = {
        r.doc_id: (r.n_tokens, r.log_weight, r.avg_log_ratio)
        for r in curation.dsir_log_weights(df, F.col("tgt")).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    for empty_id in (2, 3, 4):
        assert out[empty_id] == (0, 0.0, None), out[empty_id]
    assert out[1][0] == 2


# --- Gopher quality rules ----------------------------------------------------

_GOOD_TEXT = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "to the barn with a bone that it found near the fence of the old "
    "farm where the farmer and his dog have lived for many years now "
    "and they both enjoy long walks in the quiet evening air together"
)


def _gopher_rows(spark, rows, **kw):
    from delta_lake_platform_spark.operators import text as T

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in T.with_gopher_flags(df, **kw).collect()}


def test_gopher_good_doc_passes_canonical(spark):
    out = _gopher_rows(spark, [(1, _GOOD_TEXT)])
    r = out[1]
    assert r.gopher_pass == 1, r
    assert r.word_count >= 50 and r.flag_word_count == 1
    assert r.stopword_hits >= 2 and r.flag_stopwords == 1


def test_gopher_each_rule_fires(spark):
    bullets = "\n".join(f"- item {i} listed here" for i in range(40))
    ellipses = "\n".join(f"line {i} trails off..." for i in range(40))
    symbols = " ".join(f"#tag{i}" for i in range(80))
    digits = " ".join(str(i) for i in range(100, 200))
    longwords = " ".join(["supercalifragilistic"] * 60)
    out = _gopher_rows(
        spark,
        [
            (1, "too short"),
            (2, bullets),
            (3, ellipses),
            (4, symbols),
            (5, digits),
            (6, longwords),
        ],
    )
    assert out[1].flag_word_count == 0
    assert out[2].flag_bullet_lines == 0 and out[2].bullet_line_ratio == 1.0
    assert out[3].flag_ellipsis_lines == 0
    assert out[4].flag_symbol_ratio == 0
    assert out[5].flag_alpha_words == 0
    assert out[6].flag_mean_word_len == 0
    assert all(out[i].gopher_pass == 0 for i in out)


def test_gopher_null_and_empty_text_keep_rows(spark):
    """NULL/empty text: one row per input, zero ratios, gate fails on
    the word-count floor — never a divide-by-zero or a dropped row."""
    out = _gopher_rows(spark, [(1, None), (2, ""), (3, "   \n  ")])
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r.word_count == 0 and r.gopher_pass == 0
        assert r.mean_word_len == 0.0 and r.bullet_line_ratio == 0.0


def test_gopher_thresholds_parametrize(spark):
    """The registered query's corpus calibration: the same doc flips
    from reject to keep when the floor and stopword minimum relax."""
    doc = "the " + " ".join(f"word{i} nice" for i in range(20))  # 41 words, 1 hit
    strict = _gopher_rows(spark, [(1, doc)])
    relaxed = _gopher_rows(spark, [(1, doc)], min_words=30, min_stopword_hits=1)
    assert strict[1].gopher_pass == 0
    assert relaxed[1].gopher_pass == 1


def test_gopher_repetition_counts_and_caps(spark):
    """Known-answer checks for the run-length fold: top-2-gram chars =
    count x gram length; a 3x-repeated document saturates the dup
    fraction at the 1.0 cap; a no-repeat doc has dup fractions 0."""
    from delta_lake_platform_spark.operators import text as T

    rows = [
        (1, "a b a b a b c d"),  # norm len 15; top 2-gram 'a b' x3 -> 9/15
        (2, "x y z w v u t s"),  # no repeated grams at any n
        (3, " ".join(["one two three four five"] * 3)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in T.with_gopher_repetition(df).collect()}
    assert out[1].top_2gram_frac == 0.6          # 3 * len('a b') / 15
    assert out[1].dup_5gram_frac == 0.0
    assert out[2].dup_5gram_frac == 0.0 and out[2].flag_dup_5gram == 1
    assert out[3].dup_5gram_frac == 1.0          # capped
    assert out[3].flag_dup_5gram == 0 and out[3].rep_pass == 0


def test_gopher_repetition_empty_docs_pass_with_zero_fracs(spark):
    """NULL/empty text: every fraction 0.0 (never NULL-poisoned to 1.0
    by least()), all flags pass, one row per input."""
    from delta_lake_platform_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  \n ")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in T.with_gopher_repetition(df).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert r.top_2gram_frac == 0.0 and r.dup_10gram_frac == 0.0
        assert r.rep_pass == 1


def test_gopher_repetition_tiebreak_matches_oracle_rule(spark):
    """Two 2-grams tie on count; the longer (then lexicographically
    larger) gram wins — the same ORDER BY the oracle uses."""
    from delta_lake_platform_spark.operators import text as T

    # 2-grams each occur once; longest is 'ccc dddd' (len 8).
    df = spark.createDataFrame(
        [(1, "a bb ccc dddd")], "doc_id long, text string"
    )
    r = T.with_gopher_repetition(df).collect()[0]
    # norm len 13, winner chars = 1 * len('ccc dddd') = 8
    assert r.top_2gram_frac == round(8 / 13, 6)


def test_gopher_repetition_pandas_equals_expression_form(spark):
    from delta_lake_platform_spark.operators import text as T

    # the registry query runs the Arrow-batched form (600x faster,
    # measured); the expression form is its semantic reference — any
    # drift between the two fails here before it can reach the oracle
    rows = [
        (1, "the cat sat on the mat the cat sat on the mat"),
        (2, "a b " * 40),
        (3, None),
        (4, ""),
        (5, "unique words only appear once in this document here"),
        (6, "x " * 3),  # shorter than the larger n values
        (7, "Tab\tand  double  spaces\nnewline mix the cat the cat"),
        # non-ASCII whitespace: Java \s does NOT match \xa0/\x85/\x1c,
        # but Python str.split() does — pins the ASCII-\s mirroring in
        # the pandas form (ADVICE r9)
        (8, "the\xa0cat the\xa0cat sat\x85here\x1cnow the\xa0cat"),
        (9, "\tleading tab the cat the cat the cat"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = ["doc_id"]
    for n, (kind, _) in T.GOPHER_REP_THRESHOLDS.items():
        cols += [f"{kind}_{n}gram_frac", f"flag_{kind}_{n}gram"]
    cols.append("rep_pass")
    a = [tuple(r) for r in
         T.with_gopher_repetition(df).select(*cols).orderBy("doc_id").collect()]
    b = [tuple(r) for r in
         T.with_gopher_repetition_pandas(df).select(*cols).orderBy("doc_id").collect()]
    assert a == b


def test_temperature_weights_upsample_tail(spark):
    import pytest as _pytest

    # 90/10 split at alpha=0.5: weights (0.9^.5, 0.1^.5)/Z -> minority
    # boosted above 1, majority below; alpha=1 returns the raw mixture.
    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "doc_id long, domain string",
    )
    w = {
        r["domain"]: r
        for r in curation.temperature_weights(df, "domain", alpha=0.5).collect()
    }
    import math

    z = math.sqrt(0.9) + math.sqrt(0.1)
    assert w["big"]["p_raw"] == 0.9 and w["small"]["p_raw"] == 0.1
    assert w["small"]["weight"] == _pytest.approx(
        round(math.sqrt(0.1) / z, 6), abs=1e-6
    )
    assert w["small"]["boost"] > 1.0 > w["big"]["boost"]
    raw = curation.temperature_weights(df, "domain", alpha=1.0).collect()
    for r in raw:
        assert r["weight"] == _pytest.approx(r["p_raw"], abs=1e-6)
        assert r["boost"] == _pytest.approx(1.0, abs=1e-6)
    with _pytest.raises(ValueError):
        curation.temperature_weights(df, "domain", alpha=-0.1)
