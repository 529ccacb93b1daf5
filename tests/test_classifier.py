"""In-engine trained hashed-BoW logistic classifier
(functions/classifier.py): perfect separation on a planted vocabulary,
loss monotone evidence, score bounds, and empty-doc handling."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.functions import classifier as clf


@pytest.fixture(scope="module")
def planted(spark):
    """Docs whose label is carried by a single planted token — linearly
    separable, so the trainer must hit 100% train accuracy."""
    rows = []
    for i in range(40):
        marker = "excellent" if i % 2 == 0 else "terrible"
        filler = f"common words shared by every document row {i % 5}"
        rows.append((i, f"{filler} {marker} {filler}", i % 2 == 0 and 1 or 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def test_perfect_separation(spark, planted):
    model = clf.train_text_classifier(
        planted, "text", "y", "doc_id", dim=64, iters=10, lr=3.0
    )
    scored = clf.score_text(planted, "text", "doc_id", model)
    acc = (
        scored.join(planted.select("doc_id", "y"), "doc_id")
        .agg(F.mean(((F.col("score") >= 0.5).cast("int") == F.col("y")).cast("double")))
        .collect()[0][0]
    )
    assert acc == 1.0


def test_loss_decreases(spark, planted):
    model = clf.train_text_classifier(
        planted, "text", "y", "doc_id", dim=64, iters=6, lr=3.0
    )
    h = model["loss_history"]
    assert len(h) == 7
    assert h[-1] < h[0] * 0.7


def test_scores_bounded_and_total(spark, planted):
    model = clf.train_text_classifier(
        planted, "text", "y", "doc_id", dim=64, iters=3, lr=3.0
    )
    scored = clf.score_text(planted, "text", "doc_id", model)
    assert scored.count() == planted.count()
    bad = scored.filter((F.col("score") < 0) | (F.col("score") > 1)).count()
    assert bad == 0


def test_empty_doc_scores_at_bias(spark):
    df = spark.createDataFrame(
        [(0, "excellent stuff", 1), (1, "terrible stuff", 0), (2, "", 0)],
        "doc_id long, text string, y int",
    )
    model = clf.train_text_classifier(df, "text", "y", "doc_id", dim=32, iters=4)
    scored = clf.score_text(df, "text", "doc_id", model)
    assert scored.count() == 3
    row = scored.filter(F.col("doc_id") == 2).collect()[0]
    assert row["score"] == pytest.approx(clf.sigmoid(model["bias"]), abs=1e-6)
