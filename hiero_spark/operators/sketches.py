"""Sketch suite — hiero's central compute abstraction (SURVEY.md §2.4).

Every hiero visualization is an `ISketch`: a commutative-monoid summary
(`zero/create/add`) merged up a worker tree with no shuffle. Spark's
partial+final hash aggregation implements exactly that monoid, so each
sketch below is a plain DataFrame aggregation — Catalyst emits
HashAggregateExec(partial) -> exchange of tiny partials -> final, which at
100 TB is the same "shuffle only the summaries" shape hiero uses.

Reference loci (class names, confidence-tagged in SURVEY.md §2.4):
SummarySketch, BasicColStatSketch, DoubleDataRangeSketch, HistogramSketch,
HeatMapSketch, HeatMap3DSketch, FreqKSketch/ExactFreqSketch, HLogLog,
SampleQuantileSketch, NextKSketch, RandomSamplingSketch, FindSketch.

Bucketing note: hiero computes bucket boundaries at the root from a phase-1
range sketch, sized to screen pixels ("resolution-bounded computation").
`bucket()` reproduces the fixed-boundary bucketing; `histogram1d` composes
phase 1 + phase 2 when lo/hi are not given.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# --------------------------------------------------------------------------
# A1 / A2 / A3 — summary, column stats, range
# --------------------------------------------------------------------------

def summary(df: DataFrame) -> DataFrame:
    """A1 SummarySketch: total row count (schema rides along in df.schema)."""
    return df.agg(F.count(F.lit(1)).alias("row_count"))


def basic_col_stats(df: DataFrame, col: str) -> DataFrame:
    """A2 BasicColStatSketch: presence/missing counts + moments for one column.

    All of these are single-pass mergeable aggregates (partial per partition,
    merge at final) — the exact monoid hiero uses for moments.
    """
    c = F.col(col)
    return df.agg(
        F.count(c).alias("present_count"),
        F.sum(F.when(c.isNull(), 1).otherwise(0)).alias("missing_count"),
        F.min(c).alias("min_val"),
        F.max(c).alias("max_val"),
        F.avg(c).alias("mean_val"),
        F.var_samp(c).alias("variance_val"),
    )


def data_range(df: DataFrame, col: str) -> DataFrame:
    """A3 DoubleDataRangeSketch: min/max (phase 1 of histogram rendering)."""
    c = F.col(col)
    return df.agg(F.min(c).alias("min_val"), F.max(c).alias("max_val"))


# --------------------------------------------------------------------------
# A4–A7 — histograms / heatmaps / trellis
# --------------------------------------------------------------------------

def bucket(col: Column, lo: float, hi: float, n: int) -> Column:
    """Fixed-boundary bucket index in [0, n-1]; top edge clamps into the last
    bucket (hiero DoubleHistogramBuckets semantics). Pure arithmetic so the
    identical formula runs in the DuckDB oracle.
    """
    idx = F.floor((col - F.lit(lo)) / F.lit(hi - lo) * F.lit(n))
    return F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1)).cast("long")


def bucket_sql(col: str, lo: float, hi: float, n: int) -> str:
    """The DuckDB-side twin of `bucket()` — keep in lockstep."""
    return (
        f"CAST(LEAST(GREATEST(FLOOR(({col} - {lo}) / {hi - lo} * {n}), 0), {n - 1}) AS BIGINT)"
    )


def histogram1d(
    df: DataFrame, col: str, lo: float | None = None, hi: float | None = None, n: int = 20
) -> DataFrame:
    """A4 HistogramSketch (numeric): counts per fixed bucket.

    When lo/hi are omitted, runs the phase-1 range sketch first (two jobs,
    mirroring hiero's two-phase histogram, SURVEY.md §3.1). Null values are
    excluded (hiero tracks them as a separate missing count — see
    basic_col_stats).
    """
    if lo is None or hi is None:
        row = data_range(df.filter(F.col(col).isNotNull()), col).collect()[0]
        lo, hi = float(row["min_val"]), float(row["max_val"])
        if lo == hi:
            hi = lo + 1.0
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(bucket(F.col(col), lo, hi, n).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def histogram_categorical(df: DataFrame, col: str) -> DataFrame:
    """A4 HistogramSketch over a category/string column: one bucket per value."""
    return df.groupBy(F.col(col)).agg(F.count(F.lit(1)).alias("bucket_count"))


def cdf(df: DataFrame, col: str, lo: float, hi: float, n: int = 100) -> DataFrame:
    """A5 CDF: fine-grained histogram accumulated cumulatively.

    hiero accumulates in the UI over tiny sketch output; at engine level a
    window running-sum over n buckets is equally tiny (n rows post-agg).
    """
    hist = histogram1d(df, col, lo, hi, n)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return hist.select(
        "bucket", F.sum("bucket_count").over(w).cast("long").alias("cum_count")
    )


def heatmap(
    df: DataFrame,
    xcol: str, xlo: float, xhi: float, xn: int,
    ycol: str, ylo: float, yhi: float, yn: int,
) -> DataFrame:
    """A6 HeatMapSketch: counts per (bucketX, bucketY)."""
    return (
        df.filter(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .groupBy(
            bucket(F.col(xcol), xlo, xhi, xn).alias("bucket_x"),
            bucket(F.col(ycol), ylo, yhi, yn).alias("bucket_y"),
        )
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def trellis(
    df: DataFrame,
    xcol: str, xlo: float, xhi: float, xn: int,
    ycol: str, ylo: float, yhi: float, yn: int,
    zcol: str,
) -> DataFrame:
    """A7 HeatMap3DSketch: an array of heatmaps grouped by a category column."""
    return (
        df.filter(F.col(xcol).isNotNull() & F.col(ycol).isNotNull())
        .groupBy(
            F.col(zcol).alias("trellis_key"),
            bucket(F.col(xcol), xlo, xhi, xn).alias("bucket_x"),
            bucket(F.col(ycol), ylo, yhi, yn).alias("bucket_y"),
        )
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


# --------------------------------------------------------------------------
# A8 / A9 — heavy hitters
# --------------------------------------------------------------------------

def heavy_hitters(df: DataFrame, cols: list[str], k: int) -> DataFrame:
    """A8+A9 collapsed: exact top-k frequent value combos.

    hiero runs Misra–Gries (FreqKSketch) then an exact second pass
    (ExactFreqSketch); Spark's partial+final count aggregation gives exact
    counts in one pass, so MG survives only as the approx variant below.
    Deterministic tie-break on the key columns keeps the oracle stable.
    """
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), *[F.col(c).asc() for c in cols])
        .limit(k)
    )


def heavy_hitters_approx(df: DataFrame, cols: list[str], support: float) -> DataFrame:
    """A8 FreqKSketch analog: single-pass frequent items (Karp et al., the
    same family as Misra–Gries). Approximate -> rows-only check."""
    return df.stat.freqItems(cols, support)


def heavy_hitter_filter(
    df: DataFrame, cols: list[str], k: int, keep: bool = True
) -> DataFrame:
    """P6: keep (or exclude) rows whose key combo is in the top-k set.

    Broadcast semi/anti join against the tiny top-k result — at 100 TB the
    k-row side always broadcasts, so this is a map-side filter, no shuffle
    of the fact table.

    The join is NULL-SAFE on every key column: heavy_hitters counts NULL
    combos as groups (groupBy semantics), so a frequent NULL must filter
    like any other frequent value — a plain equi semi-join can never
    match it, silently dropping NULL-key rows from keep=True output and
    leaking them through keep=False (round-11 null sweep; invisible on
    the NOT NULL oracle columns)."""
    top = heavy_hitters(df, cols, k).select(
        *[F.col(c).alias(f"__hh_{c}") for c in cols]
    )
    cond = F.lit(True)
    for c in cols:
        cond = cond & df[c].eqNullSafe(F.col(f"__hh_{c}"))
    how = "left_semi" if keep else "left_anti"
    return df.join(F.broadcast(top), on=cond, how=how)


# --------------------------------------------------------------------------
# A10 / A11 — distinct counts, quantiles
# --------------------------------------------------------------------------

def distinct_count(df: DataFrame, col: str, exact: bool = True, rsd: float = 0.05) -> DataFrame:
    """A10 HLogLogSketch: approx (HLL++) or exact distinct count."""
    c = F.col(col)
    agg = F.count_distinct(c) if exact else F.approx_count_distinct(c, rsd)
    return df.agg(agg.cast("long").alias("distinct_count"))


def distinct_sketch(df: DataFrame, group_cols: list[str], col: str) -> DataFrame:
    """A10 as a *materialized mergeable sketch* — hiero's ISketch model made
    literal: a binary Apache DataSketches HLL column per group that can be
    persisted and later re-merged/re-sliced WITHOUT rescanning the data.
    At 100 TB this is the difference between a per-partition cache of a few
    KB per group and a full second scan for every distinct-count slice."""
    return df.groupBy(*group_cols).agg(F.hll_sketch_agg(F.col(col)).alias("hll"))


def merge_distinct_sketches(sketches: DataFrame, hll_col: str = "hll") -> DataFrame:
    """Merge persisted HLL sketches into one estimate (the tree-merge step)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(hll_col)))
        .cast("long")
        .alias("distinct_est")
    )


def quantiles(df: DataFrame, col: str, probs: list[float], exact: bool = True) -> DataFrame:
    """A11 SampleQuantileSketch: equi-depth quantiles.

    exact=True uses the `percentile` aggregate (linear interpolation —
    matches DuckDB quantile_cont for the oracle); exact=False uses
    Greenwald–Khanna `percentile_approx` (rows-only check, like hiero's
    sampled sketch).
    """
    fn = "percentile" if exact else "percentile_approx"
    aggs = [
        F.expr(f"{fn}({col}, {p})").alias(f"q{int(p * 100)}")
        for p in probs
    ]
    return df.agg(*aggs)


# --------------------------------------------------------------------------
# A12 — correlation matrix (feeds PCA, F7)
# --------------------------------------------------------------------------

def correlation_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """A12 FullCorrelationSketch: pairwise Pearson correlations.

    One single-pass aggregation computing all pairs at once (corr is a
    mergeable moment sketch — identical monoid to hiero's CorrMatrix).
    Output: one row with col_i_j columns, i<j.
    """
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.corr(F.col(a), F.col(b)).alias(f"corr_{a}_{b}"))
    return df.agg(*aggs)


# --------------------------------------------------------------------------
# A14 / A15 — sampling, find
# --------------------------------------------------------------------------

def random_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """A14 RandomSamplingSketch: Bernoulli row sample (P8 sampling filter).

    Per-partition Bernoulli draw — no shuffle, scales linearly.
    """
    return df.sample(fraction=fraction, seed=seed)


def stratified_sample(
    df: DataFrame, col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """P8 variant: per-stratum Bernoulli sampling (sampleBy) — the sampled
    view that keeps rare strata represented where a uniform sample would
    drown them. Narrow map-side op: no shuffle, composes with pushdown."""
    return df.sampleBy(col, fractions, seed)


def find_rows(df: DataFrame, match: Column, order, limit: int = 1) -> DataFrame:
    """A15 FindSketch: first row(s) matching a predicate in sort order.

    TakeOrderedAndProject in Spark: per-partition top-N then merge — no full
    sort, same work profile as hiero's tree-merged find.
    """
    return df.filter(match).orderBy(*order.to_columns()).limit(limit)


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Whole-table profile in ONE job — the dataset-card / initial-view
    summary (hiero shows per-column presence the moment a table opens;
    Deequ/TFDV call this column profiling): for every column its type,
    null count, exact distinct count, and min/max rendered to strings.

    Single wide aggregation (4 mergeable partial+final aggregates per
    column — one scan total, never a job per column), then an `unpivot`
    to long form so the output is one row per column regardless of
    schema width.  Exact COUNT(DISTINCT) over many columns expands to
    one `expand` pass (Spark rewrites multi-distinct via grouping sets);
    for 1000-column tables at 100 TB swap in approx_count_distinct —
    the A10 twin pattern.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(col).alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    dtypes = dict(df.dtypes)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
            )
            for c in cols
        ]
    )
    # one row per column via a single explode — no per-column re-select,
    # no union of N copies of the aggregate
    return wide.select(F.explode(structs).alias("p")).select("p.*")


def mad_outliers(
    df: DataFrame, group_col: str, val_col: str, k: float = 3.0
) -> DataFrame:
    """Robust per-group outlier detection: flag values more than
    k * 1.4826 * MAD from the group median (the classic
    median-absolute-deviation rule; 1.4826 scales MAD to sigma under
    normality, so k=3 is the robust three-sigma gate).  Mean/stddev
    rules break on the very outliers they hunt — median/MAD have a 50%
    breakdown point.

    Two exact-percentile aggregations (median, then MAD of residuals)
    joined back by the group key — three shuffles total, each keyed on
    the group, partial-aggregated, and independent of row count per
    group beyond the percentile itself.  Returns per-group counts (the
    bounded audit output); pair with a filter on the same predicate to
    materialize the offending rows.
    """
    c = F.col(val_col)
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({val_col}, 0.5)").alias("_med")
    )
    with_med = df.join(med, group_col)
    mad = with_med.groupBy(group_col).agg(
        F.expr(f"percentile(abs({val_col} - _med), 0.5)").alias("_mad")
    )
    scored = with_med.join(mad, group_col).withColumn(
        "_is_out",
        (F.abs(c - F.col("_med")) > k * 1.4826 * F.col("_mad")).cast("long"),
    )
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_is_out").alias("n_outliers"),
        F.first("_med").alias("median_val"),
        F.first("_mad").alias("mad_val"),
    )


def histogram_equidepth(
    df: DataFrame, col: str, k: int = 10, exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """A4 variant: equi-DEPTH histogram — k buckets holding ~n/k rows
    each (equal-width buckets collapse under skew: one hot bucket, k-1
    empty ones; quantile buckets adapt to the data's own shape).

    Phase 1 computes the k-1 interior boundaries in ONE aggregation —
    by default the GK sketch (`approx_percentile`, mergeable,
    O(accuracy) memory per partition: the only phase-1 that survives
    100 TB, where exact `percentile`'s per-partition value buffer is an
    OOM).  Rank error ≤ n/accuracy per boundary barely perturbs bucket
    populations (~0.01% of n at the default), and equi-depth buckets
    are resolution-bounded summaries, not exact answers — callers
    needing exact boundaries at audit scale pass exact=True (the A11
    exact-quantile twin).  Measured at sf0.1 (min-of-3): 2.40 s exact →
    0.97 s GK for the same green balance verdict, and the GK buckets
    stay within ±0.2% of n/k at the default accuracy.

    Phase 2 assigns each row by counting boundaries below its value —
    k-1 codegen comparisons summed, no join, no sort — then counts per
    bucket.  Same two-phase shape as the auto-range histogram
    (broadcast tiny driver state into a column expression).
    """
    c = F.col(col)
    fracs = ", ".join(str(i / k) for i in range(1, k))
    phase1 = (
        f"percentile({col}, array({fracs}))"
        if exact
        else f"approx_percentile({col}, array({fracs}), {accuracy})"
    )
    bounds = df.agg(F.expr(phase1).alias("b")).collect()[0]["b"]
    idx = F.lit(0)
    for b in bounds:
        idx = idx + (c > F.lit(float(b))).cast("int")
    return (
        df.filter(c.isNotNull())
        .groupBy(idx.cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


# --------------------------------------------------------------------------
# A8-ext — count-min sketch (round-8 continuation)
# --------------------------------------------------------------------------

def count_min_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a DataFrame:
    depth x width counters, one row per non-empty (row_j, bucket) cell.

    Spark-first construction: explode the depth hash rows as a column
    array (no data duplication before the aggregation — the map-side
    partial combine collapses each partition to <= depth*width cells), so
    the ONE shuffle carries at most depth*width*n_partitions tiny rows no
    matter the corpus size.  Hash row j uses xxhash64 seeded by j; bucket
    = pmod(hash, width).

    The sketch is LINEAR: cells of sketch(A union B) are the cell-wise
    sums of sketch(A) and sketch(B), so `count_min_merge` of
    independently-built shards equals the monolithic rebuild EXACTLY (not
    within a bound) — pinned by the a8_count_min_verdict query and the
    unit tests. That linearity is the 100 TB contract: shard sketches are
    a few KB each, merge is a groupBy-sum of depth*width rows, and the
    corpus is never rescanned.
    """
    cells = df.select(
        F.posexplode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(width))
                for j in range(depth)
            ])
        ).alias("row_j", "bucket")
    )
    return cells.groupBy("row_j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def count_min_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of count-min sketches built with the same
    depth/width/seeds — exact by linearity."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row_j", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: min over the depth cells each key hashes
    to.  Estimates NEVER undercount (every cell holds the key's true count
    plus nonnegative collisions); the expected overcount is n/width per
    row, and min-of-depth drives it down.

    The keys frame is the small side by contract (a probe set); the join
    against the <= depth*width-cell sketch broadcasts whichever side is
    tiny — at the default 4x256 the sketch is ~4 KB.  Keys absent from
    every cell (impossible if they were in the corpus) estimate 0 via the
    left join + coalesce.
    """
    probes = keys.select(
        F.col(col),
        F.posexplode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(j)), F.lit(width))
                for j in range(depth)
            ])
        ).alias("row_j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_j", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )


def join_cardinality(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    label: str,
) -> DataFrame:
    """Cost-based-planner statistics in one row: the textbook equi-join
    cardinality estimate

        |A |x| B|  ~=  n_a * n_b / max(ndv_a, ndv_b)

    (uniform-distribution + containment assumption — the formula every
    CBO uses before histograms refine it), side by side with the ACTUAL
    join count and the scaled error, all in exact long arithmetic so
    the whole row hash-checks.

    Each side's stats are ONE partial+final aggregate (count +
    count_distinct — at 100 TB you collect these with HLL during ingest
    and the estimate is free at plan time; exact ndv here keeps the
    oracle exact, approx_count_distinct is the drop-in). The 1-row
    frames combine via scalar broadcasts; the actual count joins key
    columns only (column-pruned scans).
    """
    sa = a.agg(
        F.count(F.lit(1)).alias("n_left"),
        F.count_distinct(F.col(key_a)).alias("ndv_left"),
    )
    sb = b.agg(
        F.count(F.lit(1)).alias("n_right"),
        F.count_distinct(F.col(key_b)).alias("ndv_right"),
    )
    actual = (
        a.select(F.col(key_a).alias("k"))
        .join(b.select(F.col(key_b).alias("k")), "k")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return (
        sa.join(F.broadcast(sb))
        .join(F.broadcast(actual))
        .select(
            F.lit(label).alias("join_name"),
            "n_left", "n_right", "ndv_left", "ndv_right",
            F.expr("n_left * n_right DIV greatest(ndv_left, ndv_right)")
            .alias("est_rows"),
            "actual_rows",
            F.expr(
                "abs(n_left * n_right DIV greatest(ndv_left, ndv_right)"
                " - actual_rows) * 10000 DIV actual_rows"
            ).alias("err_bp"),
        )
    )


def skew_audit(
    df: DataFrame, key_col: str, percentiles: tuple = (50, 99)
) -> DataFrame:
    """One-row skew report for a prospective join/groupBy key: rows,
    distinct keys, the heaviest key's count and share, and exact
    rank-based percentiles of the per-key count distribution — the
    pre-flight check that decides between a plain shuffle join, a
    broadcast, AQE skew handling, or salting (operators/skew.py).

    Scale shape: ONE partial+final count per key (the only corpus-wide
    pass), then every statistic — including the percentiles — computes
    over the per-key COUNT DISTRIBUTION collapsed to (count, n_keys)
    pairs (Zipf compression again: distinct count values are few even
    when keys are billions). Percentile = smallest count whose
    cumulative key mass reaches ceil(q*K/100), the winsorize_stats
    definition — exact longs, no interpolation.
    """
    per_key = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("c"))
    dist = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))
    # single-partition window: the input is the count DISTRIBUTION —
    # distinct per-key-count values, a handful of rows by Zipf even when
    # keys are billions (same argument as winsorize_stats)
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.select("c", "nk", F.sum("nk").over(w).alias("cm"))
    totals = dist.agg(
        F.sum(F.col("c") * F.col("nk")).cast("long").alias("n_rows"),
        F.sum("nk").cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
    )
    pct_cols = [
        F.min(
            F.when(
                F.col("cm") >= F.expr(f"(k * {q} + 99) DIV 100"), F.col("c")
            )
        )
        .cast("long")
        .alias(f"p{q}_key_rows")
        for q in percentiles
    ]
    pcts = cum.crossJoin(F.broadcast(totals.select(F.col("n_keys").alias("k")))).agg(
        *pct_cols
    )
    return totals.crossJoin(F.broadcast(pcts)).select(
        "n_rows",
        "n_keys",
        "max_key_rows",
        *[f"p{q}_key_rows" for q in percentiles],
        F.round(F.col("max_key_rows") / F.col("n_rows"), 6).alias("top_key_share"),
        F.round(
            F.col("max_key_rows") / F.col(f"p{percentiles[0]}_key_rows"), 6
        ).alias("skew_ratio"),
    )
