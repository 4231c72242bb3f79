"""Naive Bayes classifier gate (operators/classify.py): separable
vocabulary classifies perfectly, empty docs fall back to the prior,
smoothing handles class-unseen tokens, and the fit refuses an empty
training slice."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from delta_lake_platform_spark.operators import classify


def _corpus(spark):
    rows = []
    # class A speaks alpha/beta, class B speaks gamma/delta; even ids
    # train, odd ids score.
    for i in range(20):
        label = "A" if i % 4 < 2 else "B"
        text = "alpha beta alpha" if label == "A" else "gamma delta gamma"
        rows.append((i, label, text))
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_separable_vocab_classifies_perfectly(spark):
    df = _corpus(spark)
    pred = classify.nb_classify(df, "label", F.col("doc_id") % 2 == 0)
    got = pred.join(df.select("doc_id", "label"), "doc_id").collect()
    assert len(got) == 10  # only the odd (scored) half comes back
    for r in got:
        assert r["predicted"] == r["label"], r
        assert r["n_tokens"] == 3


def test_empty_doc_predicts_prior_argmax(spark):
    df = _corpus(spark).unionByName(
        spark.createDataFrame(
            [(101, "B", None), (103, "B", "   ")],
            "doc_id long, label string, text string",
        )
    )
    # training priors are balanced A/B -> tie broken by label asc = 'A'
    pred = {
        r["doc_id"]: r
        for r in classify.nb_classify(
            df, "label", F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert pred[101]["n_tokens"] == 0 and pred[101]["predicted"] == "A"
    assert pred[103]["n_tokens"] == 0 and pred[103]["predicted"] == "A"


def test_class_unseen_token_uses_smoothed_default(spark):
    # 'zeta' never appears in training: both classes absorb it via the
    # default term, so the seen tokens still decide the class.
    df = _corpus(spark).unionByName(
        spark.createDataFrame(
            [(201, "A", "alpha zeta zeta")],
            "doc_id long, label string, text string",
        )
    )
    pred = {
        r["doc_id"]: r["predicted"]
        for r in classify.nb_classify(
            df, "label", F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert pred[201] == "A"


def test_score_matches_hand_computation(spark):
    # 2 training docs, 1 scored doc — small enough to compute by hand.
    df = spark.createDataFrame(
        [
            (0, "A", "x x y"),
            (2, "B", "z z"),
            (1, None, "x z q"),
        ],
        "doc_id long, label string, text string",
    )
    row = classify.nb_classify(df, "label", F.col("doc_id") % 2 == 0).collect()
    assert len(row) == 1
    r = row[0]
    # vocab V = {x, y, z} -> |V| = 3, priors 1/2 each, smoothing 1
    # class A: tot=3, default = ln(1/6); deltas: x->ln(3), y->ln(2)
    # class B: tot=2, default = ln(1/5); deltas: z->ln(3)
    # doc "x z q": N=3
    score_a = math.log(0.5) + 3 * math.log(1 / 6) + math.log(3)
    score_b = math.log(0.5) + 3 * math.log(1 / 5) + math.log(3)
    assert r["predicted"] == "B"
    assert r["score"] == pytest.approx(round(score_b, 6), abs=1e-6)
    assert score_b > score_a  # sanity on the hand math itself


def test_empty_training_slice_raises(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        classify.nb_classify(df, "label", F.col("doc_id") < 0)
    with pytest.raises(ValueError):
        classify.nb_classify(df, "label", F.col("doc_id") >= 0, smoothing=0.0)
