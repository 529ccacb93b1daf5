"""Incremental (snapshot-delta) dedup: admit/update semantics plus the
scale claim — a bucketed fingerprint index joins without shuffling the
index side."""

from pyspark.sql import functions as F

from hiero_spark import plans as P
from hiero_spark.functions.incremental import (
    admit_batch,
    fingerprint_index,
    updated_index,
)
from hiero_spark.sources.readers import save_bucketed


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_admit_semantics(spark):
    corpus = _df(spark, [(1, "old news"), (2, "evergreen text")])
    batch = _df(
        spark,
        [
            (10, "old news"),          # exact dup of corpus -> rejected
            (11, "fresh take"),        # new -> admitted
            (12, "fresh take"),        # batch-internal dup -> folded into 11
            (13, "another new one"),   # new -> admitted
        ],
    )
    idx = fingerprint_index(corpus, "text")
    out = {r["doc_id"]: r for r in admit_batch(batch, idx, "text", "doc_id").collect()}
    assert set(out) == {11, 13}
    assert out[11]["batch_dups"] == 2
    assert out[13]["batch_dups"] == 1


def test_updated_index_admits_no_repeat(spark):
    corpus = _df(spark, [(1, "a")])
    batch1 = _df(spark, [(10, "b")])
    idx = fingerprint_index(corpus, "text")
    admitted = admit_batch(batch1, idx, "text", "doc_id")
    idx2 = updated_index(idx, admitted, "text")
    assert idx2.count() == 2
    # day 2: the same content must now be rejected
    batch2 = _df(spark, [(20, "b"), (21, "c")])
    day2 = admit_batch(batch2, idx2, "text", "doc_id")
    assert [r["doc_id"] for r in day2.collect()] == [21]


def test_bucketed_index_join_skips_index_shuffle(spark):
    """Persist the index bucketed by fp: the anti-join plan must contain
    exactly ONE exchange (the batch side) — the index side reads
    pre-bucketed files. This is the recurring-daily-job cost model."""
    corpus = _df(spark, [(i, f"doc number {i}") for i in range(100)])
    idx = fingerprint_index(corpus, "text")
    save_bucketed(idx, "t_inc_fp_index", "fp", buckets=4)
    bucketed_idx = spark.table("t_inc_fp_index")
    batch = _df(spark, [(1000 + i, f"doc number {i * 3}") for i in range(50)])
    out = admit_batch(batch, bucketed_idx, "text", "doc_id")
    plan = P.plan_str(out)
    # one exchange for the batch fp shuffle, one for the final groupBy —
    # none attributable to the index scan side of the anti-join
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    # semantics unchanged by the bucketed layout: batch texts are
    # "doc number {3i}" for i<50 — multiples of 3 above 99 (102..147) are
    # the 16 genuinely-new ones
    assert out.count() == 16
    spark.sql("DROP TABLE IF EXISTS t_inc_fp_index")


def test_lsh_index_day2_probe_from_disk(spark, tmp_path):
    """The near-dup index round-trips through parquet: build once, probe a
    later batch from the saved files — the corpus is never re-shingled."""
    from hiero_spark.functions.incremental import incremental_near_dups, lsh_index

    # 30-token docs: a ONE-token interior edit changes 3 of 28 shingles
    # (jaccard ~0.81, above the 0.7 threshold); an 11-token doc would
    # land at 0.5 and be correctly filtered out
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
        "one two three four five"
    )
    corpus = _df(spark, [(i, f"{base} mark{i}") for i in range(40)])
    bidx, bsh = lsh_index(corpus, "text", "doc_id")
    bidx.write.parquet(str(tmp_path / "buckets"))
    bsh.write.parquet(str(tmp_path / "shingles"))

    # day 2: one exact copy, one near copy (one interior token changed),
    # one novel doc
    batch = _df(
        spark,
        [
            (100, f"{base} mark7"),
            (101, (f"{base} mark8").replace(" sigma ", " sigmoid ")),
            (102, "completely unrelated content about parquet footers"),
        ],
    )
    pairs = incremental_near_dups(
        batch,
        spark.read.parquet(str(tmp_path / "buckets")),
        spark.read.parquet(str(tmp_path / "shingles")),
        "text",
        "doc_id",
    )
    got = {(r["batch_doc"], r["corpus_doc"]): r["jaccard"] for r in pairs.collect()}
    assert got[(100, 7)] == 1.0          # exact copy found at jaccard 1
    assert (101, 8) in got and got[(101, 8)] < 1.0  # near copy found
    assert not any(b == 102 for b, _ in got)        # novel doc clean


def test_agg_state_merge_equals_full_recompute(spark):
    """Incremental maintenance invariant: fold(batches) == recompute(all),
    including keys present in only one side and a three-way chain."""
    from hiero_spark.functions.incremental import agg_state, merge_agg_state

    rows = [(i % 7, (i * 13) % 101) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "v"])
    full = {tuple(r) for r in agg_state(df, "k", "v").collect()}
    b1 = df.filter("v < 30")          # key sets overlap partially
    b2 = df.filter("v >= 30 and v < 70")
    b3 = df.filter("v >= 70")
    merged = merge_agg_state(
        merge_agg_state(agg_state(b1, "k", "v"), agg_state(b2, "k", "v")),
        agg_state(b3, "k", "v"),
    )
    assert {tuple(r) for r in merged.collect()} == full


def test_agg_state_merge_new_and_absent_keys(spark):
    from hiero_spark.functions.incremental import agg_state, merge_agg_state

    a = spark.createDataFrame([(1, 10), (1, 20)], ["k", "v"])
    b = spark.createDataFrame([(2, 5)], ["k", "v"])
    got = {r["key"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
           for r in merge_agg_state(agg_state(a, "k", "v"), agg_state(b, "k", "v")).collect()}
    assert got == {1: (2, 30, 10, 20), 2: (1, 5, 5, 5)}
