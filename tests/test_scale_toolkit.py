"""Unit tests for the scale toolkit: PCA (sketch-fed), salted joins,
mergeable HLL sketches."""

import pytest
from pyspark.sql import functions as F

from hiero_spark import plans as P
from hiero_spark.catalog import load_table
from hiero_spark.functions import pca
from hiero_spark.operators import skew, sketches as sk


def test_pca_projects_orthogonal_max_variance(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    out = pca.pca_project(li, cols, k=2)
    stats = out.agg(
        F.var_pop("pc1").alias("v1"),
        F.var_pop("pc2").alias("v2"),
        F.corr("pc1", "pc2").alias("c"),
    ).collect()[0]
    # pc1 carries the most variance; components are uncorrelated
    assert stats["v1"] >= stats["v2"] > 0
    assert abs(stats["c"]) < 1e-6
    # projected variances equal the eigenvalues reported by the fit
    _, _, eigvals = pca.pca_fit(li, cols, k=2)
    assert stats["v1"] == pytest.approx(eigvals[0], rel=1e-6)
    assert stats["v2"] == pytest.approx(eigvals[1], rel=1e-6)


def test_pca_variance_is_preserved_at_full_rank(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    out = pca.pca_project(li, cols, k=3)
    got = out.agg(
        sum(F.var_pop(f"pc{i}") for i in (1, 2, 3)).alias("pc_var"),
        sum(F.var_pop(c) for c in cols).alias("raw_var"),
    ).collect()[0]
    assert got["pc_var"] == pytest.approx(got["raw_var"], rel=1e-9)


def _skewed_pair(spark):
    # 90% of big rows share key 0 — the hot-key regime
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return big, small


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(spark, how):
    big, small = _skewed_pair(spark)
    plain = big.join(small, ["k"], how).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = skew.salted_join(big, small, ["k"], how).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_top_keys_finds_hot_key(spark):
    big, _ = _skewed_pair(spark)
    top = skew.top_keys(big, ["k"], k=1).collect()[0]
    assert top["k"] == 0 and top["n"] == 9_000


def test_hll_sketches_merge_to_global_estimate(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    per_group = sk.distinct_sketch(orders, ["o_orderstatus"], "o_custkey")
    merged = sk.merge_distinct_sketches(per_group).collect()[0]["distinct_est"]
    # merging per-group sketches must equal sketching the whole column...
    whole = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).cast("long").alias("e")
    ).collect()[0]["e"]
    assert merged == whole
    # ...and land within HLL error of the exact count
    exact = orders.select("o_custkey").distinct().count()
    assert abs(merged - exact) / exact < 0.05


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    from hiero_spark import plans as P
    from hiero_spark.catalog import load_table
    from hiero_spark.sources import readers as rd

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    rd.save_bucketed(li, "li_bkt", "l_orderkey", buckets=4)
    rd.save_bucketed(orders, "ord_bkt", "o_orderkey", buckets=4)
    # hint MERGE: at real fact-fact scale neither side broadcasts; the local
    # tables are tiny, so pin the sort-merge strategy under test
    j = spark.table("li_bkt").hint("merge").join(
        spark.table("ord_bkt"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = P.plan_str(j)
    # co-located: a sort-merge join with NO shuffle exchange on either side
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # and it computes the same result as the shuffled join
    assert j.count() == li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    """save_view(partition_by=...) must give downstream readers real
    directory-level pruning: the filtered scan shows PartitionFilters and
    reads only the matching partition's rows."""
    from hiero_spark.catalog import load_table
    from hiero_spark.sources.readers import save_view

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "li_part")
    save_view(li, out, partition_by=("l_returnflag",))

    rd = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    assert P.partition_filters(rd), "filter did not reach PartitionFilters"
    assert rd.count() == li.filter(F.col("l_returnflag") == "R").count()


def test_as_of_join_matches_bruteforce(spark):
    from hiero_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 5), (2, 8), (2, 9), (3, 100)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 9, "c"), (2, 9, "d")], "k long, rts long, v string"
    )
    got = {
        (r["k"], r["lts"]): r["v"]
        for r in as_of_join(left, right, "k", "lts", "rts", ["v"]).collect()
    }
    # brute force: latest rts <= lts; dup (k, ts) versions resolve to max
    assert got == {
        (1, 5): None, (1, 10): "a", (1, 25): "b",
        (2, 8): None, (2, 9): "d", (3, 100): None,
    }


def test_as_of_join_versions_are_atomic(spark):
    """A matched version must be ONE right row: a NULL in the latest
    version's payload stays NULL (no resurrection of the older value), and
    duplicate-timestamp versions resolve to a single row, never a
    column-wise mix."""
    from hiero_spark.operators.temporal import as_of_join

    left = spark.createDataFrame([(1, 30), (2, 30)], "k long, lts long")
    right = spark.createDataFrame(
        [
            # k=1: latest version (ts=20) has v2=NULL — must NOT pick up 'old2'
            (1, 10, "old1", "old2"),
            (1, 20, "new1", None),
            # k=2: duplicate-ts versions; winner must be one row ('b', 'bb'),
            # not the per-column max mix ('b', 'aa'... actually max would give
            # ('b','bb') here, so make the mix detectable: ('b','aa'))
            (2, 10, "a", "zz"),
            (2, 10, "b", "aa"),
        ],
        "k long, rts long, v1 string, v2 string",
    )
    got = {
        r["k"]: (r["v1"], r["v2"])
        for r in as_of_join(left, right, "k", "lts", "rts", ["v1", "v2"]).collect()
    }
    assert got[1] == ("new1", None)
    # struct-max picks the row ('b', 'aa') atomically; a per-column max
    # would have produced the frankenversion ('b', 'zz')
    assert got[2] == ("b", "aa")


def test_range_join_boundaries_and_spans(spark):
    import datetime as dt

    from hiero_spark.operators.temporal import range_join

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return base + dt.timedelta(minutes=minutes)

    intervals = spark.createDataFrame(
        [(1, ts(0), ts(90))],  # spans two 1h buckets
        "iv_id long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [(10, ts(0)), (11, ts(89)), (12, ts(90)), (13, ts(-1)), (14, ts(70))],
        "pt_id long, p_ts timestamp",
    )
    got = {
        r["pt_id"]
        for r in range_join(points, intervals, "p_ts", "lo", "hi").collect()
    }
    # [lo, hi): lo inclusive (10), hi exclusive (12 out), pre-lo out (13),
    # and points in the interval's second bucket still match (11, 14)
    assert got == {10, 11, 14}


def test_temporal_joins_reject_column_clashes(spark):
    from hiero_spark.operators.temporal import as_of_join, range_join

    l = spark.createDataFrame([(1, 10, "x")], "k long, lts long, v string")
    r = spark.createDataFrame([(1, 5, "a")], "k long, rts long, v string")
    with pytest.raises(ValueError, match="payload"):
        as_of_join(l, r, "k", "lts", "rts", ["v"])
    with pytest.raises(ValueError, match="disjoint"):
        range_join(l, r, "lts", "rts", "rts")
