"""In-engine BPE training (functions/bpe.py): the classic fixture learns
the expected merges, training is deterministic, encoding is lossless
(concatenation rebuilds the text) and compresses the symbol count."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.functions import bpe


@pytest.fixture(scope="module")
def paper_corpus(spark):
    """Word frequencies echo the Sennrich et al. running example shape:
    'aaab' x8, 'aab' x4, 'ab' x2 — pair (a,a) dominates, then (aa,b)."""
    text = " ".join(["aaab"] * 8 + ["aab"] * 4 + ["ab"] * 2)
    return spark.createDataFrame([(0, text)], "doc_id long, text string")


def test_expected_merges(spark, paper_corpus):
    words = bpe.word_dict(paper_corpus, "text")
    merges = bpe.train_bpe(words, n_merges=3)
    # (a,a): 8*2 + 4*1 = 20 beats (a,b): 8+4+2 = 14 -> merge 1 = ('a','a')
    # after: aaab->[aa,a,b] aab->[aa,b] ab->[a,b]
    # pairs: (aa,a)=8, (a,b)=8+2=10, (aa,b)=4 -> merge 2 = ('a','b')
    assert merges[0] == ("a", "a")
    assert merges[1] == ("a", "b")


def test_training_is_deterministic(spark, paper_corpus):
    words = bpe.word_dict(paper_corpus, "text")
    m1 = bpe.train_bpe(words, n_merges=4)
    m2 = bpe.train_bpe(words.repartition(7), n_merges=4)
    assert m1 == m2


def test_early_stop_when_fully_merged(spark):
    df = spark.createDataFrame(
        [(0, "ab ab ab")], "doc_id long, text string"
    )
    merges = bpe.train_bpe(bpe.word_dict(df, "text"), n_merges=5)
    assert merges == [("a", "b")]


def test_encode_round_trip_and_compression(spark, paper_corpus):
    words = bpe.word_dict(paper_corpus, "text")
    merges = bpe.train_bpe(words, n_merges=3)
    enc = bpe.bpe_encode(paper_corpus, "text", merges)
    row = enc.collect()[0]
    original = paper_corpus.collect()[0]["text"].replace(" ", "")
    assert "".join(row["bpe_tokens"]) == original
    assert row["n_bpe_tokens"] < len(original)


def test_encode_on_real_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    words = bpe.word_dict(docs, "text")
    merges = bpe.train_bpe(words, n_merges=6)
    enc = bpe.bpe_encode(docs, "text", merges)
    assert enc.count() == 50
    joined = enc.withColumn(
        "glue", F.concat_ws("", F.col("bpe_tokens"))
    ).collect()
    for r in joined:
        assert " " not in r["glue"]
