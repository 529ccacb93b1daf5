"""Sketch-suite demo queries (SURVEY.md §2.4 A1–A15) with DuckDB oracles.

Bucket constants come from the known data ranges at the tested scale
factors (l_quantity ∈ [1,50], l_extendedprice ∈ [900, 105000],
l_discount ∈ [0, 0.1]); the two-phase (range-sketch first) variant is
exercised in unit tests where the extra job is fine.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.operators import sketches as sk
from hiero_spark.registry import query
from hiero_spark.queries._util import t
from hiero_spark.views import RecordOrder


@query(
    "a1_summary_count",
    group="A1",
    doc="SummarySketch: total row count.",
    oracle="SELECT COUNT(*) AS row_count FROM lineitem",
)
def a1_summary_count(spark, sf_dir):
    return sk.summary(t(spark, sf_dir, "lineitem"))


@query(
    "a2_basic_col_stats",
    group="A2",
    doc="BasicColStatSketch: count/missing/min/max/mean/variance of l_quantity.",
    oracle="""
        SELECT
          COUNT(l_quantity) AS present_count,
          CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count,
          MIN(l_quantity) AS min_val,
          MAX(l_quantity) AS max_val,
          ROUND(AVG(l_quantity), 6) AS mean_val,
          ROUND(VAR_SAMP(l_quantity), 6) AS variance_val
        FROM lineitem
    """,
)
def a2_basic_col_stats(spark, sf_dir):
    c = F.col("l_quantity")
    return t(spark, sf_dir, "lineitem").agg(
        F.count(c).alias("present_count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("missing_count"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
        F.round(F.avg(c), 6).alias("mean_val"),
        F.round(F.var_samp(c), 6).alias("variance_val"),
    )


@query(
    "a3_data_range",
    group="A3",
    doc="DoubleDataRangeSketch: min/max of l_extendedprice (histogram phase 1).",
    oracle="SELECT MIN(l_extendedprice) AS min_val, MAX(l_extendedprice) AS max_val FROM lineitem",
)
def a3_data_range(spark, sf_dir):
    return sk.data_range(t(spark, sf_dir, "lineitem"), "l_extendedprice")


@query(
    "a4_histogram_numeric",
    group="A4",
    doc="HistogramSketch: 10 fixed buckets over l_quantity ∈ [1, 50].",
    oracle=f"""
        SELECT {sk.bucket_sql('l_quantity', 1.0, 50.0, 10)} AS bucket,
               COUNT(*) AS bucket_count
        FROM lineitem WHERE l_quantity IS NOT NULL
        GROUP BY 1
    """,
)
def a4_histogram_numeric(spark, sf_dir):
    return sk.histogram1d(t(spark, sf_dir, "lineitem"), "l_quantity", 1.0, 50.0, 10)


@query(
    "a4_histogram_categorical",
    group="A4",
    doc="HistogramSketch over a category column: one bucket per l_returnflag.",
    oracle="SELECT l_returnflag, COUNT(*) AS bucket_count FROM lineitem GROUP BY 1",
)
def a4_histogram_categorical(spark, sf_dir):
    return sk.histogram_categorical(t(spark, sf_dir, "lineitem"), "l_returnflag")


@query(
    "a5_cdf",
    group="A5",
    doc="CDF: 50-bucket histogram of l_extendedprice accumulated cumulatively.",
    oracle=f"""
        WITH h AS (
          SELECT {sk.bucket_sql('l_extendedprice', 900.0, 105000.0, 50)} AS bucket,
                 COUNT(*) AS bucket_count
          FROM lineitem WHERE l_extendedprice IS NOT NULL
          GROUP BY 1
        )
        SELECT bucket,
               CAST(SUM(bucket_count) OVER (ORDER BY bucket) AS BIGINT) AS cum_count
        FROM h
    """,
)
def a5_cdf(spark, sf_dir):
    return sk.cdf(t(spark, sf_dir, "lineitem"), "l_extendedprice", 900.0, 105000.0, 50)


@query(
    "a6_heatmap",
    group="A6",
    doc="HeatMapSketch: 2D counts over (l_quantity, l_discount) buckets.",
    oracle=f"""
        SELECT {sk.bucket_sql('l_quantity', 1.0, 50.0, 10)} AS bucket_x,
               {sk.bucket_sql('l_discount', 0.0, 0.1, 5)} AS bucket_y,
               COUNT(*) AS cell_count
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        GROUP BY 1, 2
    """,
)
def a6_heatmap(spark, sf_dir):
    return sk.heatmap(
        t(spark, sf_dir, "lineitem"),
        "l_quantity", 1.0, 50.0, 10,
        "l_discount", 0.0, 0.1, 5,
    )


@query(
    "a7_trellis",
    group="A7",
    doc="HeatMap3DSketch: heatmap array grouped by l_returnflag.",
    oracle=f"""
        SELECT l_returnflag AS trellis_key,
               {sk.bucket_sql('l_quantity', 1.0, 50.0, 10)} AS bucket_x,
               {sk.bucket_sql('l_discount', 0.0, 0.1, 5)} AS bucket_y,
               COUNT(*) AS cell_count
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        GROUP BY 1, 2, 3
    """,
)
def a7_trellis(spark, sf_dir):
    return sk.trellis(
        t(spark, sf_dir, "lineitem"),
        "l_quantity", 1.0, 50.0, 10,
        "l_discount", 0.0, 0.1, 5,
        "l_returnflag",
    )


@query(
    "a8_heavy_hitters",
    group="A8",
    doc="FreqKSketch+ExactFreqSketch collapsed: exact top-5 p_brand values.",
    oracle="""
        SELECT p_brand, COUNT(*) AS cnt
        FROM part GROUP BY p_brand
        ORDER BY cnt DESC, p_brand ASC
        LIMIT 5
    """,
)
def a8_heavy_hitters(spark, sf_dir):
    return sk.heavy_hitters(t(spark, sf_dir, "part"), ["p_brand"], 5)


@query(
    "a9_exact_freq_pairs",
    group="A9",
    doc="ExactFreqSketch: exact frequencies of all (l_returnflag, l_linestatus) combos.",
    oracle="""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2
    """,
)
def a9_exact_freq_pairs(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "a10_distinct_exact",
    group="A10",
    doc="Exact distinct count of l_partkey (HLogLogSketch's exact twin).",
    oracle="SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_count FROM lineitem",
)
def a10_distinct_exact(spark, sf_dir):
    return sk.distinct_count(t(spark, sf_dir, "lineitem"), "l_partkey", exact=True)


@query(
    "a10_distinct_approx",
    group="A10",
    doc="HLogLogSketch: HLL++ approximate distinct count, reported as a "
        "property verdict the driver can hash — the exact count plus a "
        "boolean asserting the estimate landed within 3x the requested "
        "relative standard deviation (the approx value itself is not "
        "SQL-reproducible; the bound is).",
    oracle="""
        SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_count,
               TRUE AS within_bound
        FROM lineitem
    """,
)
def a10_distinct_approx(spark, sf_dir):
    rsd = 0.05
    agg = t(spark, sf_dir, "lineitem").agg(
        F.count_distinct(F.col("l_partkey")).cast("long").alias("exact_count"),
        F.approx_count_distinct(F.col("l_partkey"), rsd).cast("double").alias("_approx"),
    )
    err = F.abs(F.col("_approx") - F.col("exact_count")) / F.col("exact_count")
    return agg.select("exact_count", (err <= 3 * rsd).alias("within_bound"))


@query(
    "a11_quantiles_exact",
    group="A11",
    doc="SampleQuantileSketch's exact twin: interpolated quantiles of l_extendedprice.",
    oracle="""
        SELECT
          ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS q25,
          ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS q50,
          ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS q75,
          ROUND(quantile_cont(l_extendedprice, 0.90), 4) AS q90
        FROM lineitem
    """,
)
def a11_quantiles_exact(spark, sf_dir):
    df = t(spark, sf_dir, "lineitem")
    aggs = [
        F.round(F.expr(f"percentile(l_extendedprice, {p})"), 4).alias(f"q{int(p * 100)}")
        for p in (0.25, 0.50, 0.75, 0.90)
    ]
    return df.agg(*aggs)


@query(
    "a11_quantiles_approx",
    group="A11",
    doc="SampleQuantileSketch: Greenwald–Khanna approximate quantiles as a "
        "property verdict — the exact median anchors the oracle to the "
        "data; each boolean asserts the GK estimate sits between the exact "
        "quantiles at p +/- 2/accuracy (GK guarantees rank error "
        "<= 1/accuracy; the factor 2 absorbs interpolation).",
    oracle="""
        SELECT ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
               TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok, TRUE AS q90_ok
        FROM lineitem
    """,
)
def a11_quantiles_approx(spark, sf_dir):
    probs, acc = (0.25, 0.50, 0.75, 0.90), 1000
    eps = 2.0 / acc
    aggs = [F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50_exact")]
    for p in probs:
        q = int(p * 100)
        aggs += [
            F.expr(f"percentile_approx(l_extendedprice, {p}, {acc})").alias(f"_a{q}"),
            F.expr(f"percentile(l_extendedprice, {max(p - eps, 0.0)})").alias(f"_lo{q}"),
            F.expr(f"percentile(l_extendedprice, {min(p + eps, 1.0)})").alias(f"_hi{q}"),
        ]
    agg = t(spark, sf_dir, "lineitem").agg(*aggs)
    checks = [
        ((F.col(f"_a{int(p*100)}") >= F.col(f"_lo{int(p*100)}"))
         & (F.col(f"_a{int(p*100)}") <= F.col(f"_hi{int(p*100)}"))).alias(f"q{int(p*100)}_ok")
        for p in probs
    ]
    return agg.select("p50_exact", *checks)


@query(
    "a12_correlation",
    group="A12",
    doc="FullCorrelationSketch: pairwise Pearson correlations (single pass).",
    oracle="""
        SELECT
          ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_l_quantity_l_extendedprice,
          ROUND(CORR(l_quantity, l_discount), 6) AS corr_l_quantity_l_discount,
          ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_l_extendedprice_l_discount
        FROM lineitem
    """,
)
def a12_correlation(spark, sf_dir):
    df = t(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.round(F.corr(F.col(a), F.col(b)), 6).alias(f"corr_{a}_{b}"))
    return df.agg(*aggs)


@query(
    "a13_next_k",
    group="A13/O1",
    doc="NextKSketch: 20 distinct (l_shipdate, l_orderkey) positions at/after a "
        "start snapshot, with row multiplicity — hiero's table-view pagination.",
    oracle="""
        WITH g AS (
          SELECT l_shipdate, l_orderkey, COUNT(*) AS row_multiplicity
          FROM lineitem
          WHERE (l_shipdate > TIMESTAMP '1997-01-01 00:00:00')
             OR (l_shipdate = TIMESTAMP '1997-01-01 00:00:00' AND l_orderkey >= 0)
          GROUP BY 1, 2
          ORDER BY l_shipdate ASC NULLS FIRST, l_orderkey ASC NULLS FIRST
          LIMIT 20
        )
        SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_day, l_orderkey, row_multiplicity
        FROM g
    """,
)
def a13_next_k(spark, sf_dir):
    from hiero_spark.operators.pagination import next_k

    order = RecordOrder((("l_shipdate", True), ("l_orderkey", True)))
    import datetime

    start = {
        "l_shipdate": datetime.datetime(1997, 1, 1),
        "l_orderkey": 0,
    }
    page = next_k(t(spark, sf_dir, "lineitem"), order, 20, start)
    return page.select(
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        "l_orderkey",
        "row_multiplicity",
    )


@query(
    "o2_quantile_scroll",
    group="O2",
    doc="Quantile-based scroll (A11 + O1 composed): map scrollbar position "
        "0.9 to a start key via exact percentile, then serve that page — 20 "
        "distinct values with multiplicities. The 1-row percentile result is "
        "broadcast, so the page scan stays a single pass.",
    oracle="""
        WITH q AS (SELECT quantile_cont(l_extendedprice, 0.9) AS q0 FROM lineitem)
        SELECT l_extendedprice, COUNT(*) AS row_multiplicity
        FROM lineitem, q
        WHERE l_extendedprice >= q0
        GROUP BY 1
        ORDER BY l_extendedprice ASC NULLS FIRST
        LIMIT 20
    """,
)
def o2_quantile_scroll(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    q0 = li.agg(F.percentile("l_extendedprice", 0.9).alias("q0"))
    return (
        li.join(F.broadcast(q0))
        .filter(F.col("l_extendedprice") >= F.col("q0"))
        .groupBy("l_extendedprice")
        .agg(F.count(F.lit(1)).alias("row_multiplicity"))
        .orderBy(F.asc_nulls_first("l_extendedprice"))
        .limit(20)
    )


@query(
    "a14_random_sample",
    group="A14/P8",
    doc="RandomSamplingSketch / sampling filter: Bernoulli sample (rows-only; "
        "statistical properties asserted in unit tests).",
    oracle=None,
)
def a14_random_sample(spark, sf_dir):
    return sk.random_sample(t(spark, sf_dir, "lineitem"), 0.01).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@query(
    "a14_random_sample_verdict",
    group="A14/P8",
    doc="Bernoulli sampling as a hashable property verdict: anchor = exact "
        "corpus count; booleans assert the sample size sits within 6 sigma "
        "of n*p (binomial bound — a seed/partitioning change moves the "
        "draw, not the distribution) and that the sample is a multiset "
        "subset of the base (per (orderkey, linenumber) key, never more "
        "copies than the base holds — without-replacement; the synthetic "
        "lineitem has duplicate keys, so plain distinctness would be wrong).",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS size_ok, TRUE AS subset_ok
        FROM lineitem
    """,
)
def a14_random_sample_verdict(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = 0.01
    keys = ["l_orderkey", "l_linenumber"]
    s = sk.random_sample(li, p).select(*keys)
    sc = s.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cs"))
    bc = li.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cb"))
    viol = (
        sc.join(bc, keys, "left")
        .filter(F.col("_cs") > F.coalesce(F.col("_cb"), F.lit(0)))
        .agg(F.count(F.lit(1)).alias("_n_viol"))
    )
    exp = F.col("n_total") * p
    sigma = F.sqrt(F.col("n_total") * p * (1 - p))
    return (
        li.agg(F.count(F.lit(1)).alias("n_total"))
        .join(F.broadcast(s.agg(F.count(F.lit(1)).alias("_n_s"))))
        .join(F.broadcast(viol))
        .select(
            "n_total",
            (F.abs(F.col("_n_s") - exp) <= 6 * sigma).alias("size_ok"),
            (F.col("_n_viol") == 0).alias("subset_ok"),
        )
    )


@query(
    "a15_find",
    group="A15",
    doc="FindSketch: first 5 parts whose name contains 'green', in key order.",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE contains(p_name, 'green')
        ORDER BY p_partkey ASC NULLS FIRST
        LIMIT 5
    """,
)
def a15_find(spark, sf_dir):
    order = RecordOrder((("p_partkey", True),))
    return sk.find_rows(
        t(spark, sf_dir, "part"), F.col("p_name").contains("green"), order, limit=5
    ).select("p_partkey", "p_name")


@query(
    "a10_distinct_sketch_merge",
    group="A10",
    doc="Mergeable HLL sketch columns (DataSketches): per-group sketches "
        "merged to a global estimate without rescanning — the ISketch "
        "persist-and-remerge model, reported as a property verdict: the "
        "exact distinct count, a boolean asserting the merged-per-group "
        "estimate lands within 2% of the whole-scan sketch (union promotes "
        "the register representation, so bit-equality is not guaranteed), "
        "and a boolean bounding the estimate's error at 5% (3x the rsd of "
        "the default lgK=12 sketch).",
    oracle="""
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_count,
               TRUE AS merge_consistent,
               TRUE AS within_bound
        FROM orders
    """,
)
def a10_distinct_sketch_merge(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    merged = sk.merge_distinct_sketches(
        sk.distinct_sketch(orders, ["o_orderstatus"], "o_custkey")
    )
    whole = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("o_custkey")))
        .cast("long")
        .alias("_whole_est"),
        F.count_distinct(F.col("o_custkey")).cast("long").alias("exact_count"),
    )
    err = F.abs(F.col("distinct_est") - F.col("exact_count")) / F.col("exact_count")
    merge_drift = (
        F.abs(F.col("distinct_est") - F.col("_whole_est")) / F.col("_whole_est")
    )
    # Empty/degenerate input: both denominators are 0 and the ratios go
    # NULL, which would hash-diverge from the oracle's constant TRUE in a
    # way that reads as a sketch-accuracy failure. A 0-distinct table is
    # trivially within any bound.
    return (
        merged.join(F.broadcast(whole))
        .select(
            "exact_count",
            F.when(F.col("_whole_est") == 0, F.lit(True))
            .otherwise(merge_drift <= 0.02)
            .alias("merge_consistent"),
            F.when(F.col("exact_count") == 0, F.lit(True))
            .otherwise(err <= 0.05)
            .alias("within_bound"),
        )
    )


@query(
    "a8_heavy_hitters_approx",
    group="A8",
    doc="FreqKSketch proper: single-pass approximate frequent items "
        "(freqItems, Karp et al. — the same family as Misra-Gries), as a "
        "property verdict: the exact count of items above the support "
        "threshold, and a boolean asserting the freqItems candidate set "
        "covers every one of them (the algorithm's recall guarantee).",
    oracle="""
        WITH n AS (SELECT COUNT(*) AS total FROM part),
             h AS (
               SELECT p_brand FROM part, n
               GROUP BY p_brand, total
               HAVING COUNT(*) > total * 0.05
             )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_items,
               TRUE AS all_covered
        FROM h
    """,
)
def a8_heavy_hitters_approx(spark, sf_dir):
    part = t(spark, sf_dir, "part")
    support = 0.05
    freq = sk.heavy_hitters_approx(part, ["p_brand"], support).select(
        F.col("p_brand_freqItems").alias("_cand")
    )
    total = part.agg(F.count(F.lit(1)).alias("_n"))
    exact = (
        part.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(F.broadcast(total))
        .filter(F.col("_cnt") > F.col("_n") * support)
        .agg(
            F.count(F.lit(1)).alias("n_exact_items"),
            F.array_sort(F.collect_list("p_brand")).alias("_exact_set"),
        )
    )
    return exact.join(F.broadcast(freq)).select(
        "n_exact_items",
        (F.size(F.array_except(F.col("_exact_set"), F.col("_cand"))) == 0).alias(
            "all_covered"
        ),
    )


@query(
    "a4_histogram_auto",
    group="A4",
    doc="Two-phase histogram, the real hiero flow: phase 1 sketches the data "
        "range (A3), phase 2 buckets against it — the 1-row range is "
        "broadcast so phase 2 stays a single scan.",
    oracle="""
        WITH r AS (
          SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
          FROM lineitem
        )
        SELECT CAST(LEAST(GREATEST(FLOOR(((l_extendedprice - lo) / (hi - lo)) * 10), 0), 9) AS BIGINT) AS bucket,
               COUNT(*) AS bucket_count
        FROM lineitem, r
        WHERE l_extendedprice IS NOT NULL
        GROUP BY 1
    """,
)
def a4_histogram_auto(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    rng = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    x, lo, hi = F.col("l_extendedprice"), F.col("lo"), F.col("hi")
    idx = F.floor(((x - lo) / (hi - lo)) * 10)
    b = F.least(F.greatest(idx, F.lit(0)), F.lit(9)).cast("long")
    return (
        li.join(F.broadcast(rng))
        .filter(x.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


@query(
    "a11_quantiles_grouped",
    group="A11",
    doc="Per-group exact quantiles: median and p90 of extended price per "
        "return flag (grouped percentile aggregation, partial+final).",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_quantiles_grouped(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        )
    )


def _profile_oracle_col(col: str, dtype: str) -> str:
    return f"""
        SELECT '{col}' AS "column", '{dtype}' AS dtype,
               CAST(SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nulls,
               CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(MIN({col}) AS VARCHAR) AS min_str,
               CAST(MAX({col}) AS VARCHAR) AS max_str
        FROM orders"""


_PROFILE_COLS = [
    ("o_orderkey", "bigint"), ("o_custkey", "bigint"),
    ("o_orderstatus", "string"), ("o_totalprice", "double"),
    ("o_orderdate", "timestamp_ntz"), ("o_orderpriority", "string"),
]


@query(
    "a16_profile_table",
    group="A16",
    doc="Whole-table profile in ONE job (operators/sketches.py:"
        "profile_table): per column null count, exact distinct, min/max "
        "as strings — the dataset-card / initial-view summary (hiero "
        "shows per-column presence when a table opens). One wide "
        "aggregation + one explode to long form; the oracle rebuilds it "
        "as a UNION ALL per column.",
    oracle=" UNION ALL ".join(
        _profile_oracle_col(c, t_) for c, t_ in _PROFILE_COLS
    ),
)
def a16_profile_table(spark, sf_dir):
    from hiero_spark.operators.sketches import profile_table

    return profile_table(t(spark, sf_dir, "orders"))


@query(
    "a17_mad_outliers",
    group="A17",
    doc="Robust outlier audit (operators/sketches.py:mad_outliers): per "
        "event type, values beyond 3 * 1.4826 * MAD of the median are "
        "counted as outliers — the 50%-breakdown-point alternative to "
        "z-scores. Exact percentiles in both engines; output rounds the "
        "robust stats to 6 decimals.",
    oracle="""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS m
          FROM events GROUP BY 1
        ), mad AS (
          SELECT e.event_type, quantile_cont(ABS(e.value - med.m), 0.5) AS d
          FROM events e JOIN med USING (event_type) GROUP BY 1
        )
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ABS(e.value - med.m) > 3 * 1.4826 * mad.d
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               ROUND(ANY_VALUE(med.m), 6) AS median_val,
               ROUND(ANY_VALUE(mad.d), 6) AS mad_val
        FROM events e JOIN med USING (event_type) JOIN mad USING (event_type)
        GROUP BY e.event_type
    """,
)
def a17_mad_outliers(spark, sf_dir):
    from hiero_spark.operators.sketches import mad_outliers

    out = mad_outliers(t(spark, sf_dir, "events"), "event_type", "value", k=3.0)
    return out.select(
        "event_type", "n", "n_outliers",
        F.round("median_val", 6).alias("median_val"),
        F.round("mad_val", 6).alias("mad_val"),
    )


@query(
    "a18_constraint_checks",
    group="A18",
    doc="Declarative data-quality constraints (functions/checks.py, the "
        "Deequ/dbt-test shape): five expectations on orders compiled "
        "into ONE aggregation job (every constraint is a mergeable "
        "aggregate, so N checks share a single scan). Long-form report "
        "(check, column, n_violations, passed); the oracle recomputes "
        "each constraint as a UNION ALL branch.",
    oracle="""
        SELECT 'not_null' AS "check", 'o_orderkey' AS "column",
               CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0
                 AS passed
        FROM orders
        UNION ALL
        SELECT 'unique', 'o_orderkey',
               CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'in_range', 'o_totalprice',
               CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                             AND o_totalprice NOT BETWEEN 0 AND 1000000
                        THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_totalprice IS NOT NULL
                        AND o_totalprice NOT BETWEEN 0 AND 1000000
                   THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'accepted_values', 'o_orderstatus',
               CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                             AND o_orderstatus NOT IN ('F', 'O', 'P')
                        THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('F', 'O', 'P')
                   THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'matches', 'o_orderpriority',
               CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                             AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                        THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_orderpriority IS NOT NULL
                        AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                   THEN 1 ELSE 0 END) = 0
        FROM orders
    """,
)
def a18_constraint_checks(spark, sf_dir):
    from hiero_spark.functions.checks import Checks

    return (
        Checks()
        .not_null("o_orderkey")
        .unique("o_orderkey")
        .in_range("o_totalprice", 0, 1_000_000)
        .accepted_values("o_orderstatus", ["F", "O", "P"])
        .matches("o_orderpriority", "^[1-5]-")
        .report(t(spark, sf_dir, "orders"))
    )


@query(
    "a4_histogram_equidepth",
    group="A4",
    doc="Equi-depth histogram (operators/sketches.py:histogram_equidepth) "
        "as a hashable property verdict: 10 quantile buckets over "
        "l_extendedprice. Exact-percentile boundaries aren't bit-stable "
        "across engines at bucket edges, so the oracle anchors the row "
        "count and asserts the property that DEFINES equi-depth: every "
        "bucket holds n/k rows within a 25% band (and exactly k buckets "
        "exist). Equal-width A4 remains the value-hashed twin.",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS k_buckets, TRUE AS balanced
        FROM lineitem
    """,
)
def a4_histogram_equidepth(spark, sf_dir):
    from hiero_spark.operators.sketches import histogram_equidepth

    li = t(spark, sf_dir, "lineitem")
    k = 10
    hist = histogram_equidepth(li, "l_extendedprice", k=k)
    agg = hist.agg(
        F.count(F.lit(1)).alias("_k"),
        F.max("bucket_count").alias("_mx"),
        F.min("bucket_count").alias("_mn"),
        F.sum("bucket_count").alias("n_rows"),
    )
    return agg.select(
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("_k") == k).alias("k_buckets"),
        (
            (F.col("_mx") <= 1.25 * F.col("n_rows") / k)
            & (F.col("_mn") >= 0.75 * F.col("n_rows") / k)
        ).alias("balanced"),
    )


@query(
    "a8_count_min_verdict",
    group="A8",
    doc="Count-min sketch (operators/sketches.py:count_min_build) as a "
        "property verdict over the 10 heaviest o_custkey values: the "
        "exact counts are the SQL anchor; est_ge_exact pins the "
        "never-undercount guarantee (each of the 4x256 cells holds true "
        "count + nonnegative collisions); merge_eq_rebuild pins "
        "LINEARITY exactly — the cell-wise sum of sketches built on the "
        "odd/even o_orderkey halves estimates identically to the "
        "monolithic sketch, the property that makes shard-and-merge "
        "maintenance free at 100 TB.",
    oracle="""
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
               TRUE AS est_ge_exact, TRUE AS merge_eq_rebuild
        FROM orders GROUP BY o_custkey
        ORDER BY exact_cnt DESC, o_custkey LIMIT 10
    """,
)
def a8_count_min_verdict(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("o_custkey"))
        .limit(10)
    )
    whole = sk.count_min_build(orders, "o_custkey")
    halves = sk.count_min_merge(
        sk.count_min_build(orders.filter(F.col("o_orderkey") % 2 == 0), "o_custkey"),
        sk.count_min_build(orders.filter(F.col("o_orderkey") % 2 == 1), "o_custkey"),
    )
    est_w = sk.count_min_estimate(whole, top, "o_custkey")
    est_m = sk.count_min_estimate(halves, top, "o_custkey").withColumnRenamed(
        "cm_estimate", "cm_merged"
    )
    return (
        top.join(est_w, "o_custkey")
        .join(est_m, "o_custkey")
        .select(
            "o_custkey",
            "exact_cnt",
            (F.col("cm_estimate") >= F.col("exact_cnt")).alias("est_ge_exact"),
            (F.col("cm_merged") == F.col("cm_estimate")).alias("merge_eq_rebuild"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("o_custkey"))
    )


@query(
    "a10_hll_intersection_verdict",
    group="A10",
    doc="Sketch set-algebra: |A intersect B| estimated by "
        "inclusion-exclusion over mergeable HLL sketches (est_A + est_B "
        "- est_union, the union estimated by hll_union_agg over the two "
        "PERSISTED per-set sketches — no rescan of either set). A/B are "
        "the distinct customer sets before/after 1995-01-01; they "
        "overlap heavily, which is the regime where inclusion-exclusion "
        "is tight. Anchors are the three exact counts; the boolean "
        "bounds the estimated intersection within 15% of exact (lgK=12 "
        "rsd ~1.6%, amplified ~3x by the subtraction).",
    oracle="""
        SELECT
          CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders
                WHERE o_orderdate < DATE '1995-01-01') AS BIGINT) AS n_a,
          CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders
                WHERE o_orderdate >= DATE '1995-01-01') AS BIGINT) AS n_b,
          CAST((SELECT COUNT(*) FROM (
                SELECT o_custkey FROM orders WHERE o_orderdate < DATE '1995-01-01'
                INTERSECT
                SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '1995-01-01'
          )) AS BIGINT) AS n_inter,
          TRUE AS inter_within_15pct
    """,
)
def a10_hll_intersection_verdict(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    split = F.col("o_orderdate") < F.lit("1995-01-01").cast("date")
    a, b = orders.filter(split), orders.filter(~split)
    sk_a = a.agg(F.hll_sketch_agg("o_custkey").alias("hll"),
                 F.count_distinct("o_custkey").cast("long").alias("n"))
    sk_b = b.agg(F.hll_sketch_agg("o_custkey").alias("hll"),
                 F.count_distinct("o_custkey").cast("long").alias("n"))
    merged = sk_a.unionByName(sk_b).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("est_u"),
        F.sum(F.hll_sketch_estimate("hll")).alias("est_ab"),
        F.sum("n").alias("_"),
    )
    exact_inter = (
        a.select("o_custkey").intersect(b.select("o_custkey"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    counts = (
        sk_a.select(F.col("n").alias("n_a"))
        .crossJoin(sk_b.select(F.col("n").alias("n_b")))
        .crossJoin(exact_inter)
        .crossJoin(merged.select("est_u", "est_ab"))
    )
    est_inter = F.col("est_ab") - F.col("est_u")
    return counts.select(
        "n_a", "n_b", "n_inter",
        (F.abs(est_inter - F.col("n_inter"))
         <= 0.15 * F.col("n_inter")).alias("inter_within_15pct"),
    )


@query(
    "a17_join_cardinality",
    group="A17",
    doc="CBO join-cardinality estimation "
        "(operators/sketches.py:join_cardinality): the textbook "
        "n_a*n_b/max(ndv) uniform+containment estimate next to the "
        "ACTUAL count and basis-point error, for two joins with "
        "opposite regimes — orders|x|customer (FK->PK, containment "
        "holds, estimate near-exact) and lineitem|x|orders (FK->PK on "
        "the bigger fact). All exact longs (exact ndv here; HLL is the "
        "at-scale drop-in, collected at ingest), so the verdict table "
        "hash-checks with no tolerance.",
    oracle="""
        WITH oc AS (
          SELECT 'orders_customer' AS join_name,
                 (SELECT COUNT(*) FROM orders) AS n_left,
                 (SELECT COUNT(*) FROM customer) AS n_right,
                 (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS ndv_left,
                 (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS ndv_right,
                 (SELECT COUNT(*) FROM orders JOIN customer
                    ON o_custkey = c_custkey) AS actual_rows
        ), lo AS (
          SELECT 'lineitem_orders' AS join_name,
                 (SELECT COUNT(*) FROM lineitem) AS n_left,
                 (SELECT COUNT(*) FROM orders) AS n_right,
                 (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS ndv_left,
                 (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS ndv_right,
                 (SELECT COUNT(*) FROM lineitem JOIN orders
                    ON l_orderkey = o_orderkey) AS actual_rows
        ), u AS (SELECT * FROM oc UNION ALL SELECT * FROM lo)
        SELECT join_name,
               CAST(n_left AS BIGINT) AS n_left,
               CAST(n_right AS BIGINT) AS n_right,
               CAST(ndv_left AS BIGINT) AS ndv_left,
               CAST(ndv_right AS BIGINT) AS ndv_right,
               CAST(n_left * n_right // GREATEST(ndv_left, ndv_right)
                    AS BIGINT) AS est_rows,
               CAST(actual_rows AS BIGINT) AS actual_rows,
               CAST(ABS(n_left * n_right // GREATEST(ndv_left, ndv_right)
                        - actual_rows) * 10000 // actual_rows
                    AS BIGINT) AS err_bp
        FROM u
    """,
)
def a17_join_cardinality(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    li = t(spark, sf_dir, "lineitem")
    r1 = sk.join_cardinality(
        orders, cust, "o_custkey", "c_custkey", "orders_customer"
    )
    r2 = sk.join_cardinality(
        li, orders, "l_orderkey", "o_orderkey", "lineitem_orders"
    )
    return r1.unionByName(r2)


@query(
    "a18_skew_audit",
    group="A18",
    doc="Join-key skew audit (operators/sketches.py:skew_audit) over "
        "events.user_id: rows, distinct keys, heaviest key's rows and "
        "share, exact rank-based p50/p99 of the per-key count "
        "distribution, and the max/p50 skew ratio — the pre-flight "
        "number that picks plain shuffle vs broadcast vs AQE skew "
        "handling vs salting. One corpus pass (per-key counts); every "
        "statistic then computes over the count DISTRIBUTION collapsed "
        "to (count, n_keys) pairs — a handful of rows by Zipf even at "
        "billions of keys, so the single-partition cumulative window "
        "is bounded by construction. Exact longs; ROUND display-only.",
    oracle="""
        WITH pk AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY user_id
        ), d AS (
          SELECT c, CAST(COUNT(*) AS BIGINT) AS nk FROM pk GROUP BY c
        ), cum AS (
          SELECT c, nk, SUM(nk) OVER (ORDER BY c) AS cm FROM d
        ), t AS (
          SELECT CAST(SUM(c * nk) AS BIGINT) AS n_rows,
                 CAST(SUM(nk) AS BIGINT) AS n_keys,
                 CAST(MAX(c) AS BIGINT) AS max_key_rows
          FROM d
        ), p AS (
          SELECT
            CAST(MIN(CASE WHEN cm >= (t.n_keys * 50 + 99) // 100
                          THEN c END) AS BIGINT) AS p50_key_rows,
            CAST(MIN(CASE WHEN cm >= (t.n_keys * 99 + 99) // 100
                          THEN c END) AS BIGINT) AS p99_key_rows
          FROM cum, t
        )
        SELECT n_rows, n_keys, max_key_rows, p50_key_rows, p99_key_rows,
               ROUND(max_key_rows * 1.0 / n_rows, 6) AS top_key_share,
               ROUND(max_key_rows * 1.0 / p50_key_rows, 6) AS skew_ratio
        FROM t, p
    """,
)
def a18_skew_audit(spark, sf_dir):
    from hiero_spark.operators.sketches import skew_audit

    return skew_audit(t(spark, sf_dir, "events"), "user_id")
