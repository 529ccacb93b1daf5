"""Per-sketch unit tests (the reference's JUnit-per-sketch style,
SURVEY.md §5.1): property checks on small fixtures + accuracy bounds for
the approximate variants."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.catalog import load_table
from hiero_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_histogram_bucket_sum_equals_rowcount(li):
    hist = sk.histogram1d(li, "l_quantity", 1.0, 50.0, 10)
    total = hist.agg(F.sum("bucket_count")).collect()[0][0]
    assert total == li.filter(F.col("l_quantity").isNotNull()).count()


def test_histogram_two_phase_matches_explicit(li):
    # two-phase (range sketch first) must agree with explicit bounds
    auto = sk.histogram1d(li, "l_quantity", n=10)
    lo, hi = 1.0, 50.0
    explicit = sk.histogram1d(li, "l_quantity", lo, hi, 10)
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, explicit.collect()))


def test_histogram_clamps_edges(spark):
    df = spark.range(0, 100).select((F.col("id") * 1.0).alias("x"))
    hist = sk.histogram1d(df, "x", 0.0, 99.0, 10)
    buckets = {r["bucket"] for r in hist.collect()}
    assert buckets == set(range(10))  # max value lands in last bucket, not n


def test_cdf_monotone_and_total(li):
    rows = sk.cdf(li, "l_extendedprice", 900.0, 105000.0, 20).orderBy("bucket").collect()
    counts = [r["cum_count"] for r in rows]
    assert counts == sorted(counts)
    assert counts[-1] == li.count()


def test_heatmap_marginal_matches_1d(li):
    hm = sk.heatmap(li, "l_quantity", 1.0, 50.0, 10, "l_discount", 0.0, 0.1, 5)
    marginal = hm.groupBy("bucket_x").agg(F.sum("cell_count").alias("c"))
    h1 = sk.histogram1d(li, "l_quantity", 1.0, 50.0, 10)
    m = {r["bucket_x"]: r["c"] for r in marginal.collect()}
    h = {r["bucket"]: r["bucket_count"] for r in h1.collect()}
    assert m == h


def test_heavy_hitters_match_exact_counts(li):
    top = sk.heavy_hitters(li, ["l_returnflag"], 2).collect()
    exact = dict(
        li.groupBy("l_returnflag").count().collect()
    )
    # every returned row's count equals the exact count
    for r in top:
        assert r["cnt"] == exact[r["l_returnflag"]]
    # and they're the top-2 by count
    expected = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["l_returnflag"], r["cnt"]) for r in top] == expected


def test_freq_items_superset_of_exact_heavy_hitters(li):
    """Misra–Gries-family guarantee: items above the support threshold must
    appear in the approx result."""
    n = li.count()
    support = 0.2
    approx = sk.heavy_hitters_approx(li, ["l_returnflag"], support).collect()[0][0]
    exact = li.groupBy("l_returnflag").count().collect()
    for row in exact:
        if row["count"] > n * support:
            assert row["l_returnflag"] in approx


def test_hll_accuracy_bound(li):
    exact = li.agg(F.count_distinct("l_partkey")).collect()[0][0]
    approx = sk.distinct_count(li, "l_partkey", exact=False, rsd=0.05).collect()[0][0]
    assert abs(approx - exact) / exact < 0.15  # 3x the configured rsd


def test_approx_quantiles_within_rank_error(li):
    probs = [0.25, 0.5, 0.75]
    approx = li.approxQuantile("l_extendedprice", probs, 0.01)
    vals = sorted(r[0] for r in li.select("l_extendedprice").collect())
    n = len(vals)
    for p, a in zip(probs, approx):
        # value at rank within ±2% of target rank must bracket the estimate
        lo = vals[max(0, int((p - 0.02) * n))]
        hi = vals[min(n - 1, int((p + 0.02) * n))]
        assert lo <= a <= hi


def test_sample_fraction(li):
    n = li.count()
    s = sk.random_sample(li, 0.1, seed=1).count()
    assert 0.05 * n < s < 0.15 * n


def test_correlation_bounds_and_known_sign(li):
    row = sk.correlation_pairs(li, ["l_quantity", "l_extendedprice"]).collect()[0]
    c = row["corr_l_quantity_l_extendedprice"]
    assert -1.0 <= c <= 1.0


def test_summary_and_stats_consistency(li):
    n = sk.summary(li).collect()[0]["row_count"]
    st = sk.basic_col_stats(li, "l_quantity").collect()[0]
    assert st["present_count"] + st["missing_count"] == n
    assert st["min_val"] <= st["mean_val"] <= st["max_val"]


def test_stratified_sample_respects_fractions(spark, sf_dir):
    from hiero_spark.catalog import load_table
    from hiero_spark.operators import sketches as sk
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    fr = {"A": 0.5, "N": 0.1, "R": 0.0}
    got = {
        r["l_returnflag"]: r["n"]
        for r in sk.stratified_sample(li, "l_returnflag", fr)
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "R" not in got                       # zero-fraction stratum dropped
    assert 0.35 < got["A"] / base["A"] < 0.65   # ~50%
    assert 0.05 < got["N"] / base["N"] < 0.20   # ~10%


def test_profile_table_one_job_and_nulls(spark):
    """A16: profile covers every column, counts nulls exactly, and the
    whole profile is ONE aggregation job (single scan), not a job per
    column."""
    from hiero_spark.operators.sketches import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, 3.5), (3, "c", 4.5), (3, "c", None)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert prof["id"]["n_nulls"] == 0 and prof["id"]["n_distinct"] == 3
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["v"]["n_nulls"] == 2
    assert prof["v"]["min_str"] == "3.5" and prof["v"]["max_str"] == "4.5"
    # single scan: exactly one parquet/LocalTableScan leaf in the plan
    from hiero_spark import plans as P
    scans = [n for n in P.node_names(profile_table(df)) if "Scan" in n]
    assert len(scans) == 1, scans


def test_mad_outliers_flags_planted(spark):
    """A17: a planted extreme value is flagged; a tight cluster is not;
    groups are isolated."""
    from hiero_spark.operators.sketches import mad_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", float(v)) for v in [5, 6, 7]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in mad_outliers(df, "g", "v", k=3.0).collect()}
    assert out["a"]["n"] == 6 and out["a"]["n_outliers"] == 1
    assert out["b"]["n"] == 3 and out["b"]["n_outliers"] == 0
    assert out["a"]["median_val"] == 12.5


def test_equidepth_histogram_balances_skew(spark):
    """Equi-depth adapts where equal-width collapses: on a lognormal-ish
    skewed column every quantile bucket holds ~n/k rows."""
    from hiero_spark.operators.sketches import histogram1d, histogram_equidepth
    import math, random

    rng = random.Random(5)
    rows = [(i, math.exp(rng.gauss(0, 2))) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v double")
    eq = histogram_equidepth(df, "v", k=8).collect()
    counts = sorted(r["bucket_count"] for r in eq)
    assert len(counts) == 8
    assert counts[-1] <= 1.2 * 4000 / 8
    # equal-width on the same data: nearly everything in one bucket
    ew = histogram1d(df, "v", n=8).collect()
    assert max(r["bucket_count"] for r in ew) > 0.9 * 4000


# --- count-min sketch (round-8 continuation) ----------------------------


def test_count_min_overestimates_and_is_tight_on_heavy_keys(spark):
    from hiero_spark.operators import sketches as sk

    rows = [(k,) for k in ["a"] * 500 + ["b"] * 100 + [f"t{i}" for i in range(50)]]
    df = spark.createDataFrame(rows, "k string")
    cms = sk.count_min_build(df, "k", depth=4, width=64)
    keys = spark.createDataFrame([("a",), ("b",), ("t0",)], "k string")
    est = {r.k: r.cm_estimate for r in sk.count_min_estimate(cms, keys, "k", 4, 64).collect()}
    assert est["a"] >= 500 and est["b"] >= 100 and est["t0"] >= 1
    # collision overhead is bounded by the light tail: 50 singletons over
    # 64 buckets can add at most 50 to any cell
    assert est["a"] <= 650


def test_count_min_merge_is_exactly_linear(spark):
    """Three shards merged == monolithic rebuild, cell-for-cell."""
    from hiero_spark.operators import sketches as sk

    df = spark.range(3000).selectExpr("id", "CAST(id % 97 AS STRING) AS k")
    whole = sk.count_min_build(df, "k")
    shards = [
        sk.count_min_build(df.filter(F.col("id") % 3 == i), "k")
        for i in range(3)
    ]
    merged = sk.count_min_merge(*shards)
    diff = (
        whole.withColumnRenamed("cnt", "w")
        .join(merged.withColumnRenamed("cnt", "m"), ["row_j", "bucket"], "full")
        .filter("coalesce(w, -1) != coalesce(m, -1)")
    )
    assert diff.count() == 0


def test_count_min_single_shuffle_plan(spark):
    """The build must be partial+final hash aggregation around ONE
    exchange — the sketch-monoid shape every other sketch here pins."""
    from hiero_spark import plans as P
    from hiero_spark.operators import sketches as sk

    df = spark.range(100).selectExpr("CAST(id AS STRING) AS k")
    names = P.node_names(sk.count_min_build(df, "k"))
    assert sum("Exchange" in n for n in names) == 1, names
    assert sum("HashAggregate" in n for n in names) >= 2, names


def test_skew_audit_hand_computed(spark):
    from hiero_spark.operators.sketches import skew_audit

    # keys: a x 8, b x 1, c x 1 -> counts {8,1,1}; K=3
    # p50: ceil(150/100)=2 -> cm(1)=2 >= 2 -> p50=1; p99: ceil(297/100)=3 -> 8
    rows = [("a",)] * 8 + [("b",), ("c",)]
    df = spark.createDataFrame(rows, ["k"])
    got = skew_audit(df, "k").collect()[0]
    assert (got["n_rows"], got["n_keys"], got["max_key_rows"]) == (10, 3, 8)
    assert (got["p50_key_rows"], got["p99_key_rows"]) == (1, 8)
    assert got["top_key_share"] == 0.8
    assert got["skew_ratio"] == 8.0


def test_skew_audit_uniform_keys(spark):
    from hiero_spark.operators.sketches import skew_audit

    df = spark.createDataFrame([(i % 5,) for i in range(50)], ["k"])
    got = skew_audit(df, "k").collect()[0]
    assert got["max_key_rows"] == got["p50_key_rows"] == 10
    assert got["skew_ratio"] == 1.0


def test_heavy_hitter_filter_null_combo(spark):
    """Round-11 null sweep: a frequent NULL key combo must filter like
    any other frequent value.  groupBy counts NULL as a group, so the
    top-k set can contain it; the filter join is null-safe so keep=True
    retains those rows and keep=False excludes them (a plain equi
    semi-join silently did the opposite)."""
    from hiero_spark.operators.sketches import heavy_hitter_filter

    rows = (
        [(None, i) for i in range(6)]
        + [("x", i) for i in range(3)]
        + [("y", 0), ("z", 0)]
    )
    df = spark.createDataFrame(rows, "k string, v int")
    kept = heavy_hitter_filter(df, ["k"], k=2, keep=True).collect()
    assert {r["k"] for r in kept} == {None, "x"} and len(kept) == 9
    excluded = heavy_hitter_filter(df, ["k"], k=2, keep=False).collect()
    assert {r["k"] for r in excluded} == {"y", "z"} and len(excluded) == 2
