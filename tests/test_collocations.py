"""PMI collocations: planted-phrase detection, margin math, and the
integer cross-ratio ranking."""

from pyspark.sql import functions as F

from hiero_spark.functions.collocations import (
    SCALE,
    bigram_counts,
    pmi_collocations,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bigram_counts_adjacent_only(spark):
    docs = _docs(spark, ["a b c", "a b"])
    got = {
        (r.w1, r.w2): r.c_xy for r in bigram_counts(docs).collect()
    }
    assert got == {("a", "b"): 2, ("b", "c"): 1}


def test_single_token_doc_yields_no_bigrams(spark):
    docs = _docs(spark, ["alone", "x y"])
    assert bigram_counts(docs).count() == 1


def test_planted_collocation_outranks_frequent_pair(spark):
    # "san francisco" appears 6x and ONLY together (PMI high);
    # "the cat" appears 8x but both words are everywhere (PMI low).
    texts = (
        ["san francisco"] * 6
        + ["the cat sat on the mat the cat"] * 4
        + ["the dog", "cat the", "the the"] * 3
    )
    top = pmi_collocations(_docs(spark, texts), min_count=3, k=8).collect()
    ranks = {(r.w1, r.w2): i for i, r in enumerate(top)}
    assert ranks[("san", "francisco")] < ranks.get(("the", "cat"), 99)
    # perfect pairs (words that ONLY occur together) dominate the top
    assert {top[0].w1, top[1].w1} <= {"san", "sat", "on"}


def test_score_is_exact_cross_ratio(spark):
    # hand-computable corpus:
    #   doc1 [a a a b] -> (a,a) x2, (a,b) x1
    #   doc2 [b a b b] -> (b,a), (a,b), (b,b)
    # bigram table: (a,a):2 (a,b):2 (b,a):1 (b,b):1, N=6
    # left margins  c_x: a=4, b=2;  right margins c_y: a=3, b=3
    docs = _docs(spark, ["a a a b", "b a b b"])
    rows = pmi_collocations(docs, min_count=1, k=10).collect()
    got = {(r.w1, r.w2): (r.c_xy, r.pmi_scaled) for r in rows}
    assert got[("a", "a")] == (2, 2 * 6 * SCALE // (4 * 3))
    assert got[("a", "b")] == (2, 2 * 6 * SCALE // (4 * 3))
    assert got[("b", "a")] == (1, 1 * 6 * SCALE // (2 * 3))
    assert got[("b", "b")] == (1, 1 * 6 * SCALE // (2 * 3))


def test_min_count_gate(spark):
    docs = _docs(spark, ["p q", "p q", "x y"])
    rows = pmi_collocations(docs, min_count=2, k=10).collect()
    assert {(r.w1, r.w2) for r in rows} == {("p", "q")}
