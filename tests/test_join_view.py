"""Incremental join-view maintenance: exact fold == recompute, the
once-per-pair guarantee, and the broadcast-the-delta plan shape."""

from pyspark.sql import functions as F

from hiero_spark import plans as P
from hiero_spark.functions.incremental import (
    join_view,
    join_view_delta,
    merge_join_view,
)


def _sides(spark):
    a = spark.createDataFrame(
        [(k, f"a{i}") for i, k in enumerate([1, 1, 2, 3, 5, 5, 5])],
        "key long, a_val string",
    )
    b = spark.createDataFrame(
        [(k, f"b{i}") for i, k in enumerate([1, 2, 2, 4, 5])],
        "key long, b_val string",
    )
    return a, b


def _split(df, col, mod):
    return df.filter(F.col(col) % mod != 0), df.filter(F.col(col) % mod == 0)


def test_fold_equals_recompute_exactly(spark):
    a, b = _sides(spark)
    # split BOTH sides: delta rows share keys with old rows (the case
    # where the cross term dA|x|dB must appear exactly once)
    a_old = a.filter(~F.col("a_val").isin("a1", "a5"))
    da = a.filter(F.col("a_val").isin("a1", "a5"))
    b_old = b.filter(~F.col("b_val").isin("b2", "b4"))
    db = b.filter(F.col("b_val").isin("b2", "b4"))

    merged = merge_join_view(
        join_view(a_old, b_old, "key"),
        join_view_delta(a_old, b_old, da, db, "key"),
    )
    want = a.join(b, "key")
    got = sorted(map(tuple, merged.collect()))
    exp = sorted(map(tuple, want.collect()))
    assert got == exp  # row-level multiset equality, not just aggregates


def test_no_history_times_history_join(spark):
    # the delta plan joins old sides only against BROADCAST deltas:
    # every join in the delta is a BroadcastHashJoin (deltas small),
    # and the stored sides appear exactly once each.
    a, b = _sides(spark)
    a_old, da = _split(a, "key", 5)
    b_old, db = _split(b, "key", 2)
    p = P.plan_str(join_view_delta(a_old, b_old, da, db, "key"))
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    tree = p.split("\n\n")[0]  # formatted explain repeats nodes in details
    assert tree.count("BroadcastHashJoin") == 2


def test_empty_deltas_yield_empty_delta(spark):
    a, b = _sides(spark)
    empty_a = a.limit(0)
    empty_b = b.limit(0)
    assert join_view_delta(a, b, empty_a, empty_b, "key").count() == 0


def test_one_sided_append(spark):
    a, b = _sides(spark)
    a_old, da = _split(a, "key", 3)
    delta = join_view_delta(a_old, b, da, b.limit(0), "key")
    merged = merge_join_view(join_view(a_old, b, "key"), delta)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, a.join(b, "key").collect())
    )
