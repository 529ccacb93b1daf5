"""Unit/property tests for the round-6 curation operators: salted
per-group top-k equivalence, keep-first line dedup invariants, entropy
bounds, overlap bounds, and mixture-weight arithmetic."""

import math

from pyspark.sql import Window, functions as F

from hiero_spark.functions.entropy import alphabet_size, char_entropy
from hiero_spark.functions.overlap import contamination_overlap
from hiero_spark.functions.paragraphs import dedup_lines_keep_first
from hiero_spark.functions.weights import mixture_weights
from hiero_spark.operators.grouptopk import grouped_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestGroupedTopk:
    def test_matches_plain_window(self, spark):
        # 200 rows, 3 groups, scores engineered with heavy ties so the
        # doc_id tiebreak is load-bearing; every n_salt fan-out must give
        # exactly the plain-window answer.
        rows = [(i, "g%d" % (i % 3), float(i % 7)) for i in range(200)]
        df = spark.createDataFrame(rows, ["id", "g", "score"])
        order = [F.col("score").desc(), F.col("id").asc()]
        w = Window.partitionBy("g").orderBy(*order)
        expected = (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 4)
            .select("g", "id", "rank")
        )
        exp = sorted(map(tuple, expected.collect()))
        for n_salt in (1, 2, 32):
            got = grouped_topk(df, "g", order, salt_col="id", k=4, n_salt=n_salt)
            assert sorted(map(tuple, got.select("g", "id", "rank").collect())) == exp

    def test_groups_smaller_than_k(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "g"])
        got = grouped_topk(
            df, "g", [F.col("id").asc()], salt_col="id", k=10
        ).collect()
        assert len(got) == 3  # nothing dropped, nothing duplicated


class TestLineDedupKeepFirst:
    def test_keep_first_occurrence(self, spark):
        df = _docs(
            spark,
            [
                (1, "alpha\nshared\nbeta"),
                (2, "shared\ngamma"),
                (3, "shared"),
            ],
        )
        out = {
            r["doc_id"]: (r["new_text"], r["n_kept"])
            for r in dedup_lines_keep_first(df, "text", "doc_id").collect()
        }
        assert out[1] == ("alpha\nshared\nbeta", 3)  # first occurrence kept in place
        assert out[2] == ("gamma", 1)  # later copy dropped
        assert 3 not in out  # doc reduced to nothing vanishes

    def test_each_line_survives_exactly_once(self, spark):
        df = _docs(spark, [(i, "x\ny%d\nx" % (i % 4)) for i in range(20)])
        out = dedup_lines_keep_first(df, "text", "doc_id")
        lines = out.select(
            F.explode(F.split("new_text", "\n")).alias("line")
        ).groupBy("line").count().collect()
        assert all(r["count"] == 1 for r in lines)
        # corpus line mass: 4 distinct y's + 1 x
        assert sum(r["count"] for r in lines) == 5

    def test_intra_doc_duplicates_also_collapse(self, spark):
        df = _docs(spark, [(7, "same\nsame\nsame")])
        [r] = dedup_lines_keep_first(df, "text", "doc_id").collect()
        assert (r["new_text"], r["n_kept"]) == ("same", 1)


class TestCharEntropy:
    def _one(self, spark, text):
        df = _docs(spark, [(0, text)])
        [r] = df.select(
            char_entropy(F.col("text")).alias("h"),
            alphabet_size(F.col("text")).alias("a"),
        ).collect()
        return r["h"], r["a"]

    def test_known_values(self, spark):
        assert self._one(spark, "") == (0.0, 0)
        assert self._one(spark, "aaaa") == (0.0, 1)  # one symbol: zero bits
        assert self._one(spark, "ab") == (1.0, 2)  # fair coin: one bit
        h, a = self._one(spark, "abca")
        assert a == 3 and h == 1.5  # {2,1,1}/4 -> 1.5 bits exactly

    def test_bounds(self, spark):
        # 0 <= H <= log2(alphabet) for a batch of varied docs
        texts = ["hello world", "aAbBcC", "the the the", "x" * 50 + "y"]
        df = _docs(spark, list(enumerate(texts)))
        for r in df.select(
            char_entropy(F.col("text")).alias("h"),
            alphabet_size(F.col("text")).alias("a"),
        ).collect():
            # engine rounds to 6 decimals, which can overshoot the exact
            # bound by up to 5e-7 (aAbBcC: H == log2(6) exactly)
            assert 0.0 <= r["h"] <= math.log2(r["a"]) + 1e-6


class TestContaminationOverlap:
    def test_bounds_and_extremes(self, spark):
        train = _docs(spark, [(100, "one two three four five")])
        ev = _docs(
            spark,
            [
                (1, "one two three four five"),  # fully contained
                (2, "totally novel text here now"),  # disjoint
                (3, "one two three unseen words"),  # partial
            ],
        )
        out = {
            r["doc_id"]: r
            for r in contamination_overlap(ev, train, "text", "doc_id", k=3).collect()
        }
        assert out[1]["overlap"] == 1.0
        assert out[2]["overlap"] == 0.0
        assert 0.0 < out[3]["overlap"] < 1.0
        for r in out.values():
            assert r["n_hit"] <= r["n_shingles"]


class TestMixtureWeights:
    def test_tempering_compresses_shares(self, spark):
        rows = [(i, "big") for i in range(90)] + [(i + 90, "small") for i in range(10)]
        df = spark.createDataFrame(rows, ["id", "source"])
        out = {r["source"]: r for r in mixture_weights(df, "source").collect()}
        assert out["big"]["raw_share"] == 0.9
        # sqrt tempering: small domains gain, big domains shed
        assert out["small"]["weight"] > out["small"]["raw_share"]
        assert out["big"]["weight"] < out["big"]["raw_share"]
        assert out["small"]["boost"] > 1.0 > out["big"]["boost"]
        total = sum(r["weight"] for r in out.values())
        assert abs(total - 1.0) < 1e-5


class TestStopwordFraction:
    def test_prose_vs_gibberish(self, spark):
        from hiero_spark.functions.text import stopword_fraction

        rows = [
            (0, "the cat sat in the garden and it was warm"),
            (1, "asdf qwer zxcv tyui"),
            (2, "buy cheap widgets best widgets cheap deals"),
            (3, "The quick fox."),  # capitalized 'The' counts (lowercased)
        ]
        df = spark.createDataFrame(rows, ["i", "t"])
        out = {r["i"]: r["f"] for r in df.select("i", stopword_fraction(F.col("t")).alias("f")).collect()}
        assert out[0] == 0.5  # the, in, the, and, it = 5 of 10
        assert out[1] == 0.0
        assert out[2] == 0.0
        assert abs(out[3] - 1 / 3) < 1e-6


def test_rejection_reasons_partition_the_corpus(spark, sf_dir):
    """Every doc lands in exactly one reason bucket: counts sum to the
    corpus, and 'kept' equals the funnel's final pre-dedup survivor
    stage (stage 6, all gates passed)."""
    from hiero_spark.registry import all_queries

    qs = all_queries()
    reasons = {r["reason"]: (r["n_docs"], r["n_tokens"])
               for r in qs["n5_rejection_reasons"].fn(spark, sf_dir).collect()}
    funnel = {r["gate"]: (r["n_docs"], r["n_tokens"])
              for r in qs["n5_curation_funnel"].fn(spark, sf_dir).collect()}
    assert sum(n for n, _ in reasons.values()) == funnel["total"][0]
    assert sum(tk for _, tk in reasons.values()) == funnel["total"][1]
    assert reasons["kept"] == funnel["stopword"]  # stage-6 survivors


def test_grouped_topk_rank_fn_keeps_sql_ties(spark):
    """rank_fn=F.rank (round 10): boundary ties are ALL kept, matching
    the single-window rank()<=k form — including ties that span salt
    buckets (the phase-1 soundness edge)."""
    from pyspark.sql import Window, functions as F

    from hiero_spark.operators.grouptopk import grouped_topk

    # group 'a': scores 9,9,9,9,5 -> rank()<=2 keeps the four 9s;
    # group 'b': distinct scores -> plain top-2
    rows = [("a", i, 9 if i < 4 else 5) for i in range(5)]
    rows += [("b", 10 + i, i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, id long, score long")
    got = sorted(
        (r["g"], r["id"], r["rank"])
        for r in grouped_topk(
            df, "g", [F.desc("score")], salt_col="id", k=2,
            n_salt=3, rank_fn=F.rank,
        ).collect()
    )
    w = Window.partitionBy("g").orderBy(F.desc("score"))
    exp = sorted(
        (r["g"], r["id"], r["rank"])
        for r in df.withColumn("rank", F.rank().over(w))
        .filter("rank <= 2").collect()
    )
    assert got == exp
    assert sum(1 for g, _i, _r in got if g == "a") == 4  # ties kept
