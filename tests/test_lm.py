"""Bigram LM perplexity scorer (functions/lm.py): hand-computed
probabilities on a tiny corpus, smoothed fallbacks for unseen grams, and
degenerate-document handling."""

import math

import pytest
from pyspark.sql import functions as F

from hiero_spark.functions import lm


@pytest.fixture(scope="module")
def model(spark):
    """Train corpus: one doc 'a b a b a'.  Unigrams: a x3, b x2 (V=2).
    Bigrams: (a,b) x2, (b,a) x2."""
    train = spark.createDataFrame(
        [(0, "a b a b a")], "doc_id long, text string"
    )
    return lm.train_bigram_lm(train, "text", "doc_id")


def test_seen_bigram_probability(spark, model):
    c1, c2, v = model
    assert v == 2
    test = spark.createDataFrame([(10, "a b")], "doc_id long, text string")
    row = lm.lm_score(test, "text", "doc_id", c1, c2, v).collect()[0]
    # p(b|a) = (c2(a,b)+1)/(c1(a)+V) = (2+1)/(3+2)
    assert row["n_bigrams"] == 1
    assert row["avg_logp"] == pytest.approx(math.log(3 / 5), abs=1e-9)


def test_unseen_bigram_smoothing(spark, model):
    c1, c2, v = model
    # (b,b) unseen, b seen: p = (0+1)/(2+2); (z,z) fully unseen: p = 1/V
    test = spark.createDataFrame(
        [(11, "b b"), (12, "z z")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in lm.lm_score(test, "text", "doc_id", c1, c2, v).collect()
    }
    assert rows[11]["avg_logp"] == pytest.approx(math.log(1 / 4), abs=1e-9)
    assert rows[12]["avg_logp"] == pytest.approx(math.log(1 / 2), abs=1e-9)


def test_short_docs_score_null(spark, model):
    c1, c2, v = model
    test = spark.createDataFrame(
        [(13, "solo"), (14, "")], "doc_id long, text string"
    )
    rows = lm.lm_score(test, "text", "doc_id", c1, c2, v).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_bigrams"] == 0
        assert r["avg_logp"] is None


def test_fluent_scores_higher_than_gibberish(spark):
    """The CCNet property: text matching the training distribution
    outscores never-seen-token gibberish.  (The sf testdata corpus is
    deliberately NOT used here — its vocabulary is uniform-random 31
    tokens, so every bigram sits at the smoothing floor and 'fluency'
    is undefined; a structured corpus makes the property real.)"""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(50)],
        "doc_id long, text string",
    )
    c1, c2, v = lm.train_bigram_lm(train, "text", "doc_id")
    probe = spark.createDataFrame(
        [(100_000, "the cat sat"), (100_001, "qqq zzz xxx")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["avg_logp"]
        for r in lm.lm_score(probe, "text", "doc_id", c1, c2, v).collect()
    }
    assert rows[100_000] > rows[100_001]
