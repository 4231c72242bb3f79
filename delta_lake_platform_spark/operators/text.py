"""Text-analysis operators for large-scale training-data pipelines.

All transforms are pure ``pyspark.sql.functions`` column expressions
(JVM-side, whole-stage-codegen) — no Python UDFs, so a 100 TB document
scan stays vectorized end to end. Each helper returns added columns on
the input DataFrame so they compose into one projection.

Operators: token counting (whitespace + BPE-ish word-piece regex),
quality scoring (length/punct/stopword ratios), language ID (marker
n-gram heuristic), document fingerprinting (normalized content hash).
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # module-scope so pandas_udf type hints resolve under
    import pandas as pd  # `from __future__ import annotations`
except ImportError:  # pragma: no cover — pandas ships with pyspark
    pd = None

# Marker words per language for the heuristic language-ID scorer.
LANG_MARKERS: dict[str, str] = {
    "en": "the|and|of|to|is|in|that|for|with|as",
    "de": "der|die|das|und|ist|nicht|mit|ein|zu|den",
    "es": "el|la|los|de|que|y|en|un|una|es",
    "fr": "le|la|les|de|et|un|une|est|pour|que",
    "zh": "de|le|shi|bu|wo|zai|you|he|ren|ta",
}

STOPWORDS_RE = "the|a|an|and|or|of|to|in|is|it|that|for|on|with|as"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token_count: whitespace tokens; wordpiece_count: BPE-ish segments
    (runs of letters, digits, or single punctuation — a proxy for
    subword token counts)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "char_count": F.length(t).cast("long"),
            "token_count": F.size(_tokens(t)).cast("long"),
            "wordpiece_count": F.size(
                F.regexp_extract_all(F.lower(t), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1)
            ).cast("long"),
        }
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality heuristics.

    quality_score in [0,1]: long-enough documents with a natural
    stopword rate and low punctuation noise score high.
    """
    t = F.col(text_col)
    toks = _tokens(t)
    n_tok = F.size(toks)
    punct_ratio = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")) / F.length(t)
    stop_ratio = (
        F.size(F.filter(toks, lambda x: x.rlike(f"^({STOPWORDS_RE})$"))) / n_tok
    )
    avg_token_len = F.length(F.regexp_replace(t, r"\s+", "")) / n_tok
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))) * 0.3
    )
    return df.withColumns(
        {
            "punct_ratio": F.round(punct_ratio, 6),
            "stopword_ratio": F.round(stop_ratio, 6),
            "avg_token_len": F.round(avg_token_len, 6),
            "quality_score": F.round(score, 6),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score each language by marker-token
    hits, pick the argmax (ties broken by language code order)."""
    toks = _tokens(F.col(text_col))
    scores = [
        F.size(F.filter(toks, lambda x, m=markers: x.rlike(f"^({m})$"))).alias(
            f"score_{lang}"
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = df.select("*", *scores)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit(None).cast("string")
    for lang in reversed(langs):  # earlier langs win ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return scored.withColumn("predicted_lang", pred).drop(
        *[f"score_{lang}" for lang in langs]
    )


# Patterns kept to the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically — no backreferences, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
URL_RE = r"https?://[^\s]+"


def with_pii_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count PII-shaped spans (emails / phone-ish numbers / URLs) —
    the filter signal a curation pipeline gates on before training.
    Pure JVM regex, no UDF."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_emails": F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long"),
            "n_phones": F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long"),
            "n_urls": F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).cast("long"),
        }
    )


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Replace PII spans with typed placeholder tokens (the standard
    pre-training scrub). Order matters: URLs first so their
    query-string '@'s aren't re-matched as emails."""
    t = F.col(text_col)
    red = F.regexp_replace(t, URL_RE, "<URL>")
    red = F.regexp_replace(red, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return df.withColumn(out_col, red)


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition signals (Gopher-style quality rules): the share of
    distinct tokens and of distinct sentences. Boilerplate and
    template spam score low on both; all JVM array functions."""
    toks = _tokens(F.col(text_col))
    sents = F.filter(
        F.split(F.col(text_col), r"\.\s+"), lambda s: F.length(F.trim(s)) > 0
    )
    return df.withColumns(
        {
            "distinct_token_ratio": F.round(
                F.size(F.array_distinct(toks)) / F.size(toks), 6
            ),
            "distinct_sentence_ratio": F.round(
                F.size(F.array_distinct(sents)) / F.size(sents), 6
            ),
        }
    )


# The Gopher rule-set stopwords (Rae et al. 2021, arXiv:2112.11446,
# Appendix A1.1: "contains at least two of the following English
# words: the, be, to, of, and, that, have, with").
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def with_gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A1.1)
    as per-document boolean flags plus the conjunctive ``gopher_pass``.

    ``min_words`` / ``min_stopword_hits`` default to the paper's
    thresholds (50 words, 2 stopwords); callers gating a corpus with a
    different length profile tune them — the rule STRUCTURE, not the
    constants, is the operator.

    Rules (thresholds from the paper, word-count floor kept at the
    paper's 50):
      1. word count in [min_words, 100_000]
      2. mean word length in [3, 10]
      3. symbol-to-word ratio ('#' chars + '...' runs) <= 0.1
      4. <= 90% of non-blank lines start with a bullet (-, *, or the
         bullet glyph)
      5. <= 30% of non-blank lines end with an ellipsis
      6. >= 80% of words contain at least one alphabetic character
      7. at least ``min_stopword_hits`` distinct GOPHER_STOPWORDS
         present

    Pure JVM column expressions — the classic pre-training gate stays
    inside whole-stage codegen at 100 TB. NULL text is treated as the
    empty document (fails the word-count floor, never divides by
    zero), the same one-row-per-input contract as the dedup family.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(_tokens(t), lambda x: F.length(x) > 0)
    n_tok = F.size(toks)
    safe_tok = F.nullif(n_tok.cast("double"), F.lit(0.0))
    lines = F.filter(
        F.split(t, "\n"), lambda line: F.length(F.trim(line)) > 0
    )
    n_lines = F.size(lines)
    safe_lines = F.nullif(n_lines.cast("double"), F.lit(0.0))
    mean_word_len = F.coalesce(
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        )
        / safe_tok,
        F.lit(0.0),
    )
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\."), 0))
    symbol_ratio = F.coalesce((n_hash + n_ellipsis) / safe_tok, F.lit(0.0))
    bullet_ratio = F.coalesce(
        F.size(
            F.filter(lines, lambda line: F.trim(line).rlike(r"^[-*•]"))
        )
        / safe_lines,
        F.lit(0.0),
    )
    ellipsis_line_ratio = F.coalesce(
        F.size(
            F.filter(lines, lambda line: F.trim(line).rlike(r"\.\.\.$"))
        )
        / safe_lines,
        F.lit(0.0),
    )
    alpha_word_ratio = F.coalesce(
        F.size(F.filter(toks, lambda x: x.rlike(r"[a-z]"))) / safe_tok,
        F.lit(0.0),
    )
    stopword_hits = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS
    ).cast("long")
    flags = {
        "flag_word_count": (n_tok >= min_words) & (n_tok <= 100_000),
        "flag_mean_word_len": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "flag_symbol_ratio": symbol_ratio <= 0.1,
        "flag_bullet_lines": bullet_ratio <= 0.9,
        "flag_ellipsis_lines": ellipsis_line_ratio <= 0.3,
        "flag_alpha_words": alpha_word_ratio >= 0.8,
        "flag_stopwords": stopword_hits >= min_stopword_hits,
    }
    out = df.withColumns(
        {
            "word_count": n_tok.cast("long"),
            "mean_word_len": F.round(mean_word_len, 6),
            "symbol_ratio": F.round(symbol_ratio, 6),
            "bullet_line_ratio": F.round(bullet_ratio, 6),
            "ellipsis_line_ratio": F.round(ellipsis_line_ratio, 6),
            "alpha_word_ratio": F.round(alpha_word_ratio, 6),
            "stopword_hits": stopword_hits,
            **{k: v.cast("long") for k, v in flags.items()},
        }
    )
    gopher_pass = None
    for name in flags:
        c = F.col(name) == 1
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    return out.withColumn("gopher_pass", gopher_pass.cast("long"))


# (threshold, kind) per n — the Gopher repetition battery
# (Rae et al. 2021, Table A1): top-n-gram character fraction for
# n=2..4, duplicate-n-gram character fraction for n=5..10.
GOPHER_REP_THRESHOLDS: dict[int, tuple[str, float]] = {
    2: ("top", 0.20), 3: ("top", 0.18), 4: ("top", 0.16),
    5: ("dup", 0.15), 6: ("dup", 0.14), 7: ("dup", 0.13),
    8: ("dup", 0.12), 9: ("dup", 0.11), 10: ("dup", 0.10),
}


def _ngram_rep_chars(grams: Column) -> Column:
    """Fold a SORTED n-gram occurrence array into
    struct(top_chars, dup_chars) in ONE pass — no explode, no shuffle:

    - top_chars: count x char-length of the most frequent gram (ties
      broken by count, then char length, then lexicographically
      larger gram — mirrored exactly in the SQL oracles);
    - dup_chars: sum of count x char-length over grams occurring >= 2.

    Run-length encoding over the sorted array: the accumulator carries
    the open run (prev, run) and finalizes it at each value boundary
    and once more in the finish lambda.
    """
    sorted_g = F.array_sort(grams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best_cnt"),
        F.lit(0).cast("long").alias("best_len"),
        F.lit("").alias("best_key"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def better(cnt, ln, key, acc):
        bc, bl, bk = acc["best_cnt"], acc["best_len"], acc["best_key"]
        return (
            (cnt > bc)
            | ((cnt == bc) & (ln > bl))
            | ((cnt == bc) & (ln == bl) & (key > bk))
        )

    def close_run(acc):
        """Best/dup values after finalizing the open run."""
        cnt, key = acc["run"], acc["prev"]
        ln = F.length(key).cast("long")
        promoted = (cnt > 0) & better(cnt, ln, key, acc)
        return (
            F.when(promoted, cnt).otherwise(acc["best_cnt"]),
            F.when(promoted, ln).otherwise(acc["best_len"]),
            F.when(promoted, key).otherwise(acc["best_key"]),
            F.when(cnt >= 2, acc["dup_chars"] + cnt * ln).otherwise(
                acc["dup_chars"]
            ),
        )

    def step(acc, x):
        cont = (acc["run"] > 0) & (x == acc["prev"])
        nb_cnt, nb_len, nb_key, nd = close_run(acc)
        return F.struct(
            F.when(cont, acc["prev"]).otherwise(x).alias("prev"),
            F.when(cont, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(cont, acc["best_cnt"]).otherwise(nb_cnt).alias("best_cnt"),
            F.when(cont, acc["best_len"]).otherwise(nb_len).alias("best_len"),
            F.when(cont, acc["best_key"]).otherwise(nb_key).alias("best_key"),
            F.when(cont, acc["dup_chars"]).otherwise(nd).alias("dup_chars"),
        )

    def finish(acc):
        nb_cnt, nb_len, _nb_key, nd = close_run(acc)
        return F.struct(
            (nb_cnt * nb_len).alias("top_chars"), nd.alias("dup_chars")
        )

    return F.aggregate(sorted_g, zero, step, finish)


def with_gopher_repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher REPETITION battery (Rae et al. 2021, Table A1): the
    character fraction of the most frequent word n-gram (n=2..4) and
    of duplicated word n-grams (n=5..10), with the paper's per-n
    thresholds as flags and their conjunction as ``rep_pass``.

    Character fractions count every occurrence (count x gram length
    over normalized-text length, capped at 1.0) — a deliberate
    simplification of the paper's de-overlapped position counting,
    applied identically in the SQL oracle. Each n folds the
    document's sorted n-gram array with run-length encoding
    (``_ngram_rep_chars``) — no explode, no groupBy, zero exchanges
    at any corpus size.

    Throughput note (MEASURED, round 9, sf0.1 = 5000 docs,
    local[32]): this expression form runs ~80s — higher-order array
    lambdas are CodegenFallback (interpreted), and splitting the fold
    into its own projection does not help (the fold itself dominates,
    not reference duplication). ``with_gopher_repetition_pandas`` is
    value-identical (equality test-pinned) and runs the same sweep in
    ~0.1s; the registry query uses it, with THIS form and the shared
    SQL oracle as its correctness anchors. Keep this form for
    engines/contexts where Python workers are unavailable.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    norm = F.regexp_replace(F.trim(F.lower(t)), r"\s+", " ")
    toks = F.filter(F.split(norm, " "), lambda x: F.length(x) > 0)
    denom = F.nullif(F.length(norm).cast("double"), F.lit(0.0))
    cols: dict[str, Column] = {}
    pass_expr = None
    from .curation import word_ngrams  # no circular import: curation is leaf

    for n, (kind, thr) in GOPHER_REP_THRESHOLDS.items():
        st = _ngram_rep_chars(word_ngrams(toks, n))
        chars = st["top_chars"] if kind == "top" else st["dup_chars"]
        # coalesce BEFORE least: Spark's least() skips NULLs, so an
        # empty doc (NULL denominator) would otherwise read as 1.0.
        frac = F.least(F.coalesce(chars / denom, F.lit(0.0)), F.lit(1.0))
        fname = f"{kind}_{n}gram_frac"
        flag = f"flag_{kind}_{n}gram"
        cols[fname] = F.round(frac, 6)
        cols[flag] = (frac <= thr).cast("long")
        c = frac <= thr
        pass_expr = c if pass_expr is None else (pass_expr & c)
    cols["rep_pass"] = pass_expr.cast("long")
    return df.withColumns(cols)


def with_gopher_repetition_pandas(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """``with_gopher_repetition`` as ONE Arrow-batched pandas UDF —
    value-identical (equivalence is test-pinned; the expression form
    and the shared SQL oracle are its correctness anchors), ~10x
    faster: the 9-fold battery is exactly the shape the NOTES gotcha
    describes (interpreted higher-order lambdas, no codegen), where
    a tight Python loop over Arrow batches wins. Still zero
    exchanges — the UDF is a projection."""
    from pyspark.sql.functions import pandas_udf

    spec = list(GOPHER_REP_THRESHOLDS.items())

    @pandas_udf(
        "struct<"
        + ",".join(f"f{n}:double" for n, _ in spec)
        + ">"
    )
    def _battery(texts: pd.Series) -> pd.DataFrame:
        out = {f"f{n}": [] for n, _ in spec}
        for raw in texts:
            # Mirror the expression form EXACTLY: Spark trim() strips
            # spaces only, and Java \s is ASCII [ \t\n\x0b\f\r] — NOT
            # Python str.split()'s Unicode whitespace (\xa0, \x85,
            # \x1c-\x1f would diverge both forms and the SQL oracle).
            norm = re.sub(
                r"[ \t\n\x0b\f\r]+", " ", (raw or "").lower().strip(" ")
            )
            toks = [t for t in norm.split(" ") if t]
            denom = float(len(norm)) if norm else None
            for n, (kind, _thr) in spec:
                if denom is None or len(toks) < n:
                    out[f"f{n}"].append(0.0)
                    continue
                counts: dict[str, int] = {}
                for i in range(len(toks) - n + 1):
                    g = " ".join(toks[i : i + n])
                    counts[g] = counts.get(g, 0) + 1
                if kind == "top":
                    # tie-break: count, then char length, then
                    # lexicographically larger gram — _ngram_rep_chars
                    best = max(
                        counts.items(),
                        key=lambda kv: (kv[1], len(kv[0]), kv[0]),
                    )
                    chars = best[1] * len(best[0])
                else:
                    chars = sum(
                        c * len(g) for g, c in counts.items() if c >= 2
                    )
                out[f"f{n}"].append(min(chars / denom, 1.0))
        return pd.DataFrame(out)

    stage1 = df.withColumn("__gr", _battery(F.col(text_col)))
    cols: dict[str, Column] = {}
    pass_expr = None
    for n, (kind, thr) in GOPHER_REP_THRESHOLDS.items():
        frac = F.col("__gr")[f"f{n}"]
        cols[f"{kind}_{n}gram_frac"] = F.round(frac, 6)
        cols[f"flag_{kind}_{n}gram"] = (frac <= thr).cast("long")
        c = frac <= thr
        pass_expr = c if pass_expr is None else (pass_expr & c)
    cols["rep_pass"] = pass_expr.cast("long")
    return stage1.withColumns(cols).drop("__gr")


def with_c4_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    min_sentences: int = 3,
) -> DataFrame:
    """The C4 cleaning pipeline (Raffel et al. 2020, §2.2) as one JVM
    projection: line-level filtering followed by document-level gates.
    Complements ``with_gopher_flags`` — C4 cleans INSIDE the document
    (dropping boilerplate lines) where Gopher only accepts/rejects it.

    Line rules (a line survives only if it passes ALL that apply):
      - at least ``min_words_per_line`` whitespace words (paper: 5)
      - ends in terminal punctuation — ``. ! ?`` optionally followed
        by a closing quote (paper rule; ``require_terminal_punct``
        turns it off for corpora without sentence structure)
      - does not contain the word "javascript" (case-insensitive)

    Document rules, evaluated on the ORIGINAL page text (the paper
    drops the whole page regardless of which line offends):
      - does not contain the placeholder "lorem ipsum"
      - does not contain a curly brace ``{`` (code marker)
      - the CLEANED text has at least ``min_sentences`` sentences
        (terminal-punctuation marks; paper: 3)
    The paper's bad-words list is deliberately omitted (no public
    canonical list; the rule structure is the operator).

    Returns every input row (one row per document, NULL text = empty
    document) with ``c4_text`` (surviving lines rejoined),
    ``n_lines_total`` / ``n_lines_kept``, ``n_sentences``, one flag
    per document rule, and the conjunctive ``c4_pass`` (all document
    flags AND at least one surviving line). Pure built-in column
    expressions — the whole pipeline stays inside whole-stage codegen
    with zero exchanges at any corpus size.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")

    def _keep(line: Column) -> Column:
        trimmed = F.trim(line)
        n_words = F.size(
            F.filter(
                F.split(F.lower(trimmed), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        )
        cond = n_words >= min_words_per_line
        if require_terminal_punct:
            cond = cond & trimmed.rlike(r"[.!?][\"”’']?$")
        return cond & ~F.lower(line).contains("javascript")

    kept = F.filter(lines, _keep)
    c4_text = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(c4_text, F.lit(r"[.!?]"), 0))
    flag_sentences = (n_sentences >= min_sentences).cast("long")
    flag_placeholder = (~F.lower(t).contains("lorem ipsum")).cast("long")
    flag_brace = (~t.contains("{")).cast("long")
    return df.withColumns(
        {
            "c4_text": c4_text,
            "n_lines_total": F.size(lines).cast("long"),
            "n_lines_kept": F.size(kept).cast("long"),
            "n_sentences": n_sentences.cast("long"),
            "flag_min_sentences": flag_sentences,
            "flag_no_placeholder": flag_placeholder,
            "flag_no_brace": flag_brace,
            "c4_pass": (
                (flag_sentences == 1)
                & (flag_placeholder == 1)
                & (flag_brace == 1)
                & (F.size(kept) >= 1)
            ).cast("long"),
        }
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k keywords per document by tf-idf.

    tf = in-document term count (row-local: explode of the token
    array); idf = ln(N / df) over the corpus. Physical shape: one
    groupBy (doc, term) for tf, one groupBy (term) for df — both
    map-side-combinable — a join on term (AQE broadcasts the doc-freq
    side when the vocabulary is small), and a WindowGroupLimit top-k
    per doc. The corpus size N rides in as a broadcast single-row
    aggregate, never a driver round-trip.

    Output: id_col, term, tf, df, score (rounded), rank.
    """
    from pyspark.sql.window import Window

    n_docs = df.select(F.count("*").alias("__n"))
    tf = (
        df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # Rank on the ROUNDED score: raw ln() can differ by an ulp across
    # engines/libms, and the rank must be reproducible — at 6 decimals
    # the ordering is stable, with the term as a deterministic tiebreak.
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        tf.join(docfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def normalized_fingerprint(text_col: str = "text") -> Column:
    """Content fingerprint: sha2-256 of case- and whitespace-normalized
    text. The canonical key for exact dedup."""
    return F.sha2(
        F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "), 256
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("fingerprint", normalized_fingerprint(text_col))


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Step 1 of BPE tokenizer training: corpus-wide adjacent
    character-pair frequencies, weighted by word frequency.

    The classical recipe (Sennrich et al. 2016) counts symbol pairs
    over the word-frequency table, then merges the argmax pair —
    this operator produces that argmax table. Two shuffles, both with
    map-side partial aggregation: words -> frequencies (the vocabulary
    is tiny relative to the corpus, so the second stage's input is
    |vocab|, not |corpus|), then exploded pairs -> weighted counts.
    All JVM expressions; at 100 TB the word-frequency table is the
    standard first reduction (billions of tokens -> millions of words).
    """
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
        ).alias("w")
    )
    wf = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = wf.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "pair")
        .limit(top_k)
    )


BPE_SEP = "\x1f"  # unit separator: never appears in [a-z0-9]+ words

# A fixed high-frequency English merge table for demonstration /
# oracle queries; real deployments pass the merges learned by
# iterating bpe_pair_counts (argmax pair -> merge -> recount).
BPE_DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("s", "t"), ("a", "t"), ("o", "r"),
    ("an", "d"), ("in", "g"),
)


def bpe_apply_merges(
    df: DataFrame,
    merges: Sequence[tuple[str, str]] = BPE_DEFAULT_MERGES,
    text_col: str = "text",
) -> DataFrame:
    """Step 2 of the BPE tokenizer (Sennrich et al. 2016): ENCODE text
    by applying an ordered merge table — the counterpart of
    ``bpe_pair_counts`` (which produces the merge candidates).

    Each word is rendered as separator-wrapped symbols
    (``␟t␟␟h␟␟e␟``) and each merge ``(a, b)`` is ONE literal
    string replace ``␟a␟␟b␟ -> ␟ab␟`` applied in table order: the
    wrapping makes partial-token matches impossible and keeps
    consecutive merge sites non-overlapping, so plain left-to-right
    replace() — identical semantics in every engine, no regex, no
    lookaround — implements the greedy merge pass exactly FOR
    CONSISTENCY-ORDERED tables: each merge's operand symbols must be
    produced by earlier merges (the order BPE learning emits, and
    what ``bpe_pair_counts``-derived tables satisfy). An arbitrary
    table where a LATER merge creates a site for an EARLIER one
    (e.g. [('a','bc'), ('b','c')] on 'abc') would need iterative
    re-application, which a single ordered pass deliberately does
    not do. N merges
    compile to N chained replaces inside ONE projection: zero
    exchanges, zero UDFs, cost O(text bytes x merges) at any corpus
    size. The expression-tree form suits merge tables up to the
    low thousands (analysis passes, fertility studies, small domain
    tokenizers); a full 32k-merge production vocabulary belongs in an
    Arrow-batched pandas UDF wrapping a real tokenizer, which this
    operator's output is the oracle for.

    Returns every input row plus ``n_words``, ``n_chars`` (word chars
    only), ``n_pieces`` (BPE symbols after merging), and
    ``pieces_per_word`` (rounded 6; 0.0 for empty/NULL text).
    """
    words = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))),
        F.lit("[a-z0-9]+"),
        0,
    )

    def _encode(w: Column) -> Column:
        s = F.concat(
            F.lit(BPE_SEP),
            F.array_join(F.split(w, ""), BPE_SEP + BPE_SEP),
            F.lit(BPE_SEP),
        )
        for a, b in merges:
            s = F.replace(
                s,
                F.lit(f"{BPE_SEP}{a}{BPE_SEP}{BPE_SEP}{b}{BPE_SEP}"),
                F.lit(f"{BPE_SEP}{a}{b}{BPE_SEP}"),
            )
        # piece count: every piece is wrapped by exactly two separators
        return (
            (F.length(s) - F.length(F.replace(s, F.lit(BPE_SEP))))
            / F.lit(2)
        ).cast("long")

    pieces = F.aggregate(
        F.transform(words, _encode),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_chars = F.aggregate(
        F.transform(words, F.length),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumns(
        {
            "n_words": F.size(words).cast("long"),
            "n_chars": n_chars,
            "n_pieces": pieces,
            "pieces_per_word": F.round(
                F.coalesce(
                    pieces
                    / F.nullif(F.size(words).cast("double"), F.lit(0.0)),
                    F.lit(0.0),
                ),
                6,
            ),
        }
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into overlapping character-window chunks (the
    RAG-indexing shape: embed each chunk, retrieve by chunk, join back
    by ``id_col``). Chunk ``i`` covers ``[i*stride, i*stride +
    chunk_size)`` with ``stride = chunk_size - overlap``; every
    document yields at least one chunk (empty/short docs produce one).

    Pure JVM expression tree — ``sequence`` + ``explode`` +
    ``substring``, whole-stage-codegen friendly, no UDF, no shuffle:
    one narrow stage regardless of corpus size, so at 100 TB the cost
    is exactly the scan plus the (chunked) write."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil(
            (F.length(text_col).cast("double") - F.lit(overlap))
            / F.lit(stride)
        ),
    )
    return df.select(
        F.col(id_col),
        n_chunks.cast("long").alias("n_chunks"),
        F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias(
            "chunk_id"
        ),
        F.col(text_col),
    ).select(
        id_col,
        "chunk_id",
        "n_chunks",
        F.col(text_col)
        .substr(
            F.col("chunk_id").cast("int") * F.lit(stride) + F.lit(1),
            F.lit(chunk_size),
        )
        .alias("chunk_text"),
    )


def dedup_corpus_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-level LINE deduplication (CCNet / RefinedWeb boilerplate
    removal): a line whose normalized form appears in more than
    ``max_docs`` DISTINCT documents is removed from every document —
    navigation bars, cookie banners, and copyright footers repeat
    across millions of pages and would otherwise dominate the training
    mix. Blank lines are exempt (they carry structure, not content).

    Returns one row per input document: ``(id_col, text_deduped,
    n_lines_kept)`` with surviving lines rejoined in original order.

    Scale shape: posexplode -> one groupBy on the 64-bit line hash
    (NOT the line text — the frequency shuffle ships 8-byte keys) ->
    broadcast-eligible anti-join of hot lines -> one groupBy(doc) to
    reassemble. Everything is built-in JVM expressions; cost is
    O(total lines) with no all-pairs stage, so 100 TB is three
    shuffles of narrow rows. 64-bit hashing can in principle collide
    two distinct lines (CCNet accepts the same risk); collisions only
    ever REMOVE a line, never corrupt one.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias(
            "__pos", "__line"
        ),
    ).withColumn("__h", F.xxhash64(F.trim(F.col("__line"))))
    hot = (
        lines.filter(F.trim(F.col("__line")) != "")
        .groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("__h")
    )
    kept = lines.join(hot, "__h", "left_anti")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("__pos"), F.col("__line")))
    )
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(ordered, lambda x: x["__line"]), "\n"
        ).alias("text_deduped"),
        F.count(F.lit(1)).alias("n_lines_kept"),
    )
    # "One row per input document" includes a document whose EVERY
    # non-blank line is hot (a pure-boilerplate page — common in real
    # web corpora): it has no kept lines, so the groupBy above loses
    # it. Left-join back to the id set and coalesce to ('', 0) so
    # downstream joins on id_col keep the row. The agg output is
    # already hash-partitioned by id_col, so only the narrow id
    # projection shuffles.
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_deduped"), F.lit("")).alias(
                "text_deduped"
            ),
            F.coalesce(
                F.col("n_lines_kept"), F.lit(0).cast("long")
            ).alias("n_lines_kept"),
        )
    )


def dedup_corpus_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-level DUPLICATE-SPAN removal at fixed k-token
    granularity — the Spark-first form of suffix-array substring
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", arXiv:2107.06499): any k-token window
    whose content appears in more than ``max_docs`` DISTINCT documents
    marks every token position it covers for removal, so verbatim
    spans repeated across pages (license blocks, quoted passages,
    templated paragraphs) are cut out of every document while the
    surrounding unique prose survives. Complements
    ``dedup_corpus_lines`` (line granularity, needs exact line
    boundaries) and document-level dedup (all-or-nothing).

    Returns one row per input document — ``(id_col, text_spandeduped,
    n_tokens_kept, n_tokens_removed)`` — with kept tokens rejoined by
    single spaces in original order (all whitespace normalizes to one
    space, both here and in the oracle).

    Scale shape: one projection builds each document's window-hash
    array as a pure JVM expression (transform over sequence + slice +
    xxhash64 — zero extra scans); posexplode ships (hash, doc, start)
    rows; ONE groupBy on the 64-bit hash finds cross-document
    duplicates (8-byte shuffle keys, like dedup_corpus_lines); a
    semi-join keeps duplicate occurrences; one groupBy(doc) collects
    covered starts; a final join back to the docs rebuilds the text
    with an index-aware filter. Cost is O(total tokens x 1) rows
    through three narrow shuffles — no all-pairs stage, no
    suffix-array global sort, so the 100 TB plan is the same plan.
    Within-document repeats are NOT removed (the count is distinct
    docs); 64-bit hashing can in principle collide (same tolerance as
    dedup_corpus_lines — a collision only ever REMOVES a span).
    """
    base = df.select(
        F.col(id_col),
        F.filter(
            # NULL text behaves as empty (the row still comes back).
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
            ),
            lambda t: t != "",
        ).alias("__toks"),
    )
    n = F.size(F.col("__toks"))
    # Window-hash array: hash of the k-token window starting at i
    # (0-based), for i in [0, n-k]. Empty array when n < k.
    windows = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.xxhash64(
                F.array_join(F.slice(F.col("__toks"), i + 1, k), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = base.select(
        F.col(id_col),
        F.posexplode(windows).alias("__start", "__h"),
    )
    hot = (
        occ.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") > max_docs)
        .select("__h")
    )
    covered = (
        occ.join(hot, "__h", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("__start").alias("__starts"))
    )
    joined = base.join(covered, id_col, "left")
    # Positions covered by any duplicate window: union of
    # [start, start+k-1] ranges, as a distinct array.
    removed = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce("__starts", F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (k - 1)),
            )
        )
    )
    # Kept tokens via POSITION set difference + sorted gather: one
    # array_except instead of an array_contains probe per token (the
    # per-token probe is O(tokens x removed) on boilerplate-heavy
    # docs — measured ~40% of the operator's time at sf0.1).
    kept_pos = F.array_sort(
        F.array_except(
            F.sequence(F.lit(0), F.size("__toks") - 1), F.col("__removed")
        )
    )
    kept = F.when(F.size("__toks") > 0, F.transform(
        kept_pos, lambda p: F.element_at(F.col("__toks"), p + 1)
    )).otherwise(F.array().cast("array<string>"))
    return (
        joined.withColumn("__removed", removed)
        .select(
            F.col(id_col),
            F.array_join(kept, " ").alias("text_spandeduped"),
            F.size(kept).cast("long").alias("n_tokens_kept"),
            (F.size("__toks") - F.size(kept))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )
