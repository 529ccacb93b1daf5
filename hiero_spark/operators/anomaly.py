"""Rolling z-score anomaly detection over bucketed time series — the
monitoring query every event pipeline runs: "is this hour's volume
abnormal against the trailing day?".

Shape: one groupBy to bucket (partial+final count — the only
corpus-wide pass), then a per-key ordered window over the BUCKETS
(cardinality = keys × time buckets, thousands of rows at 100 TB of raw
events — the window input is the aggregate, never the events). The
trailing frame EXCLUDES the current bucket, so a spike can't mask
itself by inflating its own baseline.

Cross-engine determinism: the windowed sums run over integer counts
(exact in any order); mean/variance come from the explicit sum/sumsq
formula var = (ss - n*mean²)/(n-1) rather than built-in STDDEV (engines
disagree on Welford vs naive accumulation), so the z-scores are
bit-identical and hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rolling_zscore(
    bucketed: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    trailing: int = 24,
    min_points: int = 6,
) -> DataFrame:
    """Append baseline_mean / baseline_std / zscore over a per-key
    trailing window of `trailing` buckets (current bucket excluded).
    Rows with fewer than min_points trailing buckets, or zero variance,
    get NULL zscore (no verdict, not a fake 0)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(-trailing, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    # ANSI mode: guard the n=0 / n=1 warm-up rows (empty or one-row
    # trailing frame) or the divisions raise DIVIDE_BY_ZERO
    mean = F.when(n >= 1, s / n).otherwise(F.lit(None).cast("double"))
    var = F.when(n >= 2, (ss - n * mean * mean) / (n - 1)).otherwise(
        F.lit(None).cast("double")
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        (n >= min_points) & (std > 0.0), (v - mean) / std
    ).otherwise(F.lit(None).cast("double"))
    return (
        bucketed.withColumn("n_baseline", n)
        .withColumn("baseline_mean", mean)
        .withColumn("baseline_std", std)
        .withColumn("zscore", z)
    )


def hourly_count_anomalies(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    z_threshold: float = 3.0,
    trailing: int = 24,
) -> DataFrame:
    """Hourly event-count anomalies per key: buckets, rolling baseline,
    |z| >= threshold. Output keeps the hour as epoch seconds (engines
    disagree on raw timestamp hashing)."""
    hourly = (
        events.groupBy(
            F.col(key_col),
            F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    scored = rolling_zscore(hourly, key_col, "bucket_ts", "n_events", trailing)
    return scored.filter(
        F.col("zscore").isNotNull() & (F.abs("zscore") >= z_threshold)
    ).select(
        key_col,
        "bucket_ts",
        "n_events",
        F.round("baseline_mean", 6).alias("baseline_mean"),
        F.round("zscore", 6).alias("zscore"),
    )


def ewma_levels(
    bucketed: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially-weighted level of a bucketed series — the
    smoothed "current volume" a monitoring dashboard tracks next to the
    z-score gate. EWMA is a RECURSIVE fold (s_i = a*x_i + (1-a)*s_{i-1}),
    which window frames cannot express; here each key's series collects
    into one ordered array (per-key state = bucket count, bounded — time
    series, not events) and one F.aggregate pass folds it left-to-right.
    The identical fold runs in DuckDB via list_reduce (same seed-first
    semantics, same sequential order), so the level is bit-identical and
    hash-checkable despite being order-dependent double arithmetic."""
    series = (
        bucketed.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(bucket_col, value_col))
            ).alias("_s")
        )
    )
    vals = F.transform(F.col("_s"), lambda s: s[value_col].cast("double"))
    n = F.size(vals)
    a = float(alpha)
    folded = F.aggregate(
        F.slice(vals, 2, n - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1.0 - a) + x * F.lit(a),
    )
    level = F.when(n >= 2, folded).otherwise(F.element_at(vals, 1))
    return series.select(
        key_col,
        n.cast("long").alias("n_buckets"),
        F.round(level, 6).alias("ewma_level"),
    )


def holt_levels(
    bucketed: DataFrame,
    key_col: str,
    bucket_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Per-key Holt double-exponential smoothing (level + trend) — the
    forecasting step up from ewma_levels when a series drifts: EWMA
    lags a trending series by design; Holt tracks the slope and the
    1-step forecast is level + trend.

    Same scale/exactness contract as ewma_levels: the recursion

        l_i = a*x_i + (1-a)(l_{i-1} + b_{i-1})
        b_i = B(l_i - l_{i-1}) + (1-B) b_{i-1}

    cannot ride a window frame, so each key's bucketed series collects
    into ONE ordered array (bounded: time buckets, not events) and a
    single F.aggregate fold carries a struct(l, b) accumulator.  Init
    is the classic l_1 = x_1, b_1 = x_2 - x_1, folding from i = 2.
    DuckDB runs the IDENTICAL fold via list_reduce over struct_pack, so
    the order-dependent double arithmetic is bit-identical and the
    rounded outputs hash-check."""
    series = (
        bucketed.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(bucket_col, value_col))
            ).alias("_s")
        )
    )
    vals = F.transform(F.col("_s"), lambda s: s[value_col].cast("double"))
    n = F.size(vals)
    a, b = float(alpha), float(beta)
    x1 = F.element_at(vals, 1)
    x2 = F.element_at(vals, 2)
    init = F.struct(x1.alias("l"), (x2 - x1).alias("b"))

    def step(acc, x):
        nl = x * F.lit(a) + (acc["l"] + acc["b"]) * F.lit(1.0 - a)
        nb = (nl - acc["l"]) * F.lit(b) + acc["b"] * F.lit(1.0 - b)
        return F.struct(nl.alias("l"), nb.alias("b"))

    folded = F.aggregate(F.slice(vals, 2, n - 1), init, step)
    level = F.when(n >= 2, folded["l"]).otherwise(x1)
    trend = F.when(n >= 2, folded["b"]).otherwise(F.lit(0.0))
    return series.select(
        key_col,
        n.cast("long").alias("n_buckets"),
        F.round(level, 6).alias("holt_level"),
        F.round(trend, 6).alias("holt_trend"),
        F.round(level + trend, 6).alias("forecast_next"),
    )


def ols_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key ordinary-least-squares trend over the hourly cents
    series: slope (cents/hour), intercept, and R² from the closed-form
    sufficient statistics — the "is this KPI growing and how fast"
    readout next to holt_levels' forecast.

    Scale shape: the only corpus-wide pass is the hourly groupBy
    (partial+final); the regression itself is ONE more aggregate over
    the bounded bucket series (keys × hours rows), with x re-based to
    hours-since-first-bucket per key so the sums stay small. All five
    sufficient statistics (Σx, Σy, Σxy, Σx², Σy²) are EXACT longs —
    order-free, so engine/partitioning can't move them — and only the
    final slope/intercept/R² expressions touch doubles, as identical
    op sequences on identical longs (bit-identical across engines,
    ROUND display-only). Overflow headroom is documented, not assumed:
    n·Σxy needs |hours|²·Σ|y| ≲ 2^63 — holds to ~1e5 buckets of 1e9
    cents/hour; past that, carry the sums as DECIMAL(38,0)/HUGEINT.
    Single-bucket keys (zero x-variance) are excluded — their slope is
    undefined and the engines disagree on x/0.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("hb"),
            cents.alias("c"),
        )
        .groupBy("key", "hb")
        .agg(F.sum("c").alias("y"))
    )
    based = hourly.select(
        "key",
        (F.col("hb") - F.min("hb").over(Window.partitionBy("key"))).alias("x"),
        "y",
    )
    s = based.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    n_d, sx_d, sy_d = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    syy_d = F.col("syy").cast("double")
    return (
        s.filter(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        .select(
            F.col("key").alias("event_type"),
            F.col("n").cast("long").alias("n_hours"),
            F.round(slope, 6).alias("slope_cents_per_hour"),
            F.round((sy_d - slope * sx_d) / n_d, 6).alias("intercept_cents"),
            F.round(
                num * num / (den * (n_d * syy_d - sy_d * sy_d)), 6
            ).alias("r2"),
        )
    )


def winsorize_stats(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    q_lo: int = 1,
    q_hi: int = 99,
) -> DataFrame:
    """Per-key winsorization report: exact [p_lo, p_hi] clamp bounds
    (rank-based, no interpolation), how many rows each side clamps, and
    the winsorized sum — the outlier-robust preprocessing step feature
    pipelines run before scaling, with the bounds exact enough to audit.

    Percentile definition (both engines, exactly): bound_q = the
    smallest value whose cumulative count reaches ceil(q*n/100) —
    integer arithmetic only, so there is no interpolation mode to
    disagree on. Scale shape is the rolling_distinct collapse: values
    quantize to cents and COLLAPSE TO DISTINCT (key, cents) counts
    first (Zipf compression — the cumulative window then runs over the
    bounded distinct-value series per key, never the raw rows), bounds
    come back as a keys×2 broadcast join, and the clamp statistics are
    one conditional aggregate over the compressed table. Everything is
    exact longs end to end.
    """
    c = F.round(F.col(value_col) * 100, 0).cast("long")
    d = (
        df.select(F.col(key_col).alias("key"), c.alias("c"))
        .groupBy("key", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = Window.partitionBy("key").orderBy("c")
    wall = Window.partitionBy("key")
    cum = d.select(
        "key",
        "c",
        "cnt",
        F.sum("cnt").over(wcum).alias("cm"),
        F.sum("cnt").over(wall).alias("n"),
    )
    bounds = cum.groupBy("key").agg(
        F.max("n").alias("n"),
        F.min(
            F.when(F.col("cm") >= F.expr(f"(n * {q_lo} + 99) DIV 100"), F.col("c"))
        ).alias("lo_cents"),
        F.min(
            F.when(F.col("cm") >= F.expr(f"(n * {q_hi} + 99) DIV 100"), F.col("c"))
        ).alias("hi_cents"),
    )
    clamped = (
        d.join(F.broadcast(bounds), "key")
        .groupBy("key", "n", "lo_cents", "hi_cents")
        .agg(
            F.sum(F.when(F.col("c") < F.col("lo_cents"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clamped_lo"),
            F.sum(F.when(F.col("c") > F.col("hi_cents"), F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_clamped_hi"),
            F.sum(
                F.least(F.greatest(F.col("c"), F.col("lo_cents")), F.col("hi_cents"))
                * F.col("cnt")
            )
            .cast("long")
            .alias("winsorized_sum_cents"),
        )
        .select(
            F.col("key").alias(key_col),
            F.col("n").cast("long").alias("n"),
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
            "n_clamped_lo",
            "n_clamped_hi",
            "winsorized_sum_cents",
        )
    )
    return clamped


def cusum_scaled(daily: DataFrame, day_col: str = "day",
                 n_col: str = "n") -> DataFrame:
    """Exact-integer CUSUM over a bounded daily series: S_t * days =
    days * cumsum_t(n) - t * total — all-BIGINT arithmetic (no float in
    the loop), so the statistic is cross-engine hash-checkable.  The
    windows run over the O(date domain) aggregate, never a fact table;
    the unpartitioned ordering is bounded by construction.  Returns
    (day, s_scaled); callers rank by |s_scaled| for change points."""
    ordered = Window.orderBy(day_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    everything = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    s_scaled = (
        F.count(F.lit(1)).over(everything) * F.sum(n_col).over(ordered)
        - F.row_number().over(Window.orderBy(day_col))
        * F.sum(n_col).over(everything)
    ).cast("long")
    return daily.select(F.col(day_col).alias("day"), s_scaled.alias("s_scaled"))
