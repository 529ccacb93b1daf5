"""SemDeDup semantic dedup (functions/similarity.py:semantic_dedup):
one representative survives per planted tight cluster, isolated vectors
all survive, and the max_cluster skew guard keeps (never drops) members
of oversized cells."""

import random

import pytest
from pyspark.sql import functions as F

from hiero_spark.functions import similarity as sim


DIM = 16


def _noisy(base, rng, eps):
    return [x + rng.uniform(-eps, eps) for x in base]


@pytest.fixture(scope="module")
def corpus(spark):
    """3 tight clusters x 5 near-identical members + 20 well-separated
    singletons.  eps=0.001 keeps within-cluster cosine > 0.9999."""
    rng = random.Random(11)
    rows = []
    vid = 0
    for _ in range(3):
        base = [rng.gauss(0, 1) for _ in range(DIM)]
        for _ in range(5):
            rows.append((vid, _noisy(base, rng, 0.001)))
            vid += 1
    for _ in range(20):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(DIM)]))
        vid += 1
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_one_survivor_per_tight_cluster(spark, corpus):
    cents = sim.kmeans_fit(corpus, k=4, max_iter=5)
    marked = sim.semantic_dedup(corpus, cents, threshold=0.95)
    kept = {r["vec_id"] for r in marked.filter("kept").collect()}
    # each planted cluster (ids 0-4, 5-9, 10-14) keeps exactly its min id
    for lo in (0, 5, 10):
        members = kept & set(range(lo, lo + 5))
        assert members == {lo}, f"cluster at {lo}: kept {members}"


def test_random_singletons_survive(spark, corpus):
    cents = sim.kmeans_fit(corpus, k=4, max_iter=5)
    marked = sim.semantic_dedup(corpus, cents, threshold=0.95)
    kept = {r["vec_id"] for r in marked.filter("kept").collect()}
    assert set(range(15, 35)) <= kept


def test_output_partitions_input(spark, corpus):
    cents = sim.kmeans_fit(corpus, k=4, max_iter=5)
    marked = sim.semantic_dedup(corpus, cents, threshold=0.95)
    assert marked.count() == corpus.count()
    assert marked.select("vec_id").distinct().count() == corpus.count()


def test_max_cluster_guard_keeps_everything(spark, corpus):
    """A cell above max_cluster skips pair generation — conservative
    keep-all, never a silent drop."""
    cents = sim.kmeans_fit(corpus, k=4, max_iter=5)
    marked = sim.semantic_dedup(corpus, cents, threshold=0.95, max_cluster=2)
    assert marked.filter("NOT kept").count() == 0
