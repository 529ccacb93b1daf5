"""Rolling z-score anomalies: planted spike detected, self-masking
prevented (trailing frame excludes the current bucket), warm-up rows
abstain."""

from pyspark.sql import functions as F

from hiero_spark.operators.anomaly import rolling_zscore


def _series(spark, values):
    rows = [("k", i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, ["key", "bucket", "v"])


def test_planted_spike_flagged_and_warmup_abstains(spark):
    # stable baseline of 10±1, then a 100 spike at the end
    vals = [10, 11, 9, 10, 11, 9, 10, 11, 9, 10, 100]
    out = rolling_zscore(
        _series(spark, vals), "key", "bucket", "v", trailing=24, min_points=6
    ).orderBy("bucket").collect()
    # first min_points rows have no verdict
    assert all(r["zscore"] is None for r in out[:6])
    # the spike's z-score is huge and its baseline is uncontaminated
    spike = out[-1]
    assert spike["zscore"] > 3.0
    assert spike["baseline_mean"] < 11  # current bucket excluded from baseline
    # the stable rows in between are not flagged
    assert all(abs(r["zscore"]) < 3.0 for r in out[6:-1])


def test_zero_variance_abstains(spark):
    out = rolling_zscore(
        _series(spark, [5] * 10), "key", "bucket", "v", trailing=24, min_points=3
    ).collect()
    assert all(r["zscore"] is None for r in out)  # std 0 -> no verdict


def test_scd2_runs_collapse_and_intervals_chain(spark):
    """SCD2 build: consecutive same-value events collapse; intervals
    chain exactly (valid_to == next valid_from); last run is current."""
    from datetime import datetime

    from hiero_spark.operators.temporal import scd2_from_log

    rows = [
        (1, datetime(2024, 1, 1, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 1), 2, "a"),   # no change -> collapses
        (1, datetime(2024, 1, 1, 2), 3, "b"),   # change
        (1, datetime(2024, 1, 1, 3), 4, "a"),   # change back = NEW run
        (2, datetime(2024, 1, 1, 0), 5, "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])
    out = sorted(
        scd2_from_log(df, "user_id", "ts", "event_type", "event_id").collect(),
        key=lambda r: (r["key"], r["valid_from"]),
    )
    u1 = [r for r in out if r["key"] == 1]
    assert [r["attr"] for r in u1] == ["a", "b", "a"]
    assert [r["is_current"] for r in u1] == [False, False, True]
    # intervals chain with no gaps
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None
    [u2] = [r for r in out if r["key"] == 2]
    assert u2["attr"] == "x" and u2["is_current"]


def test_ewma_hand_computed(spark):
    from hiero_spark.operators.anomaly import ewma_levels

    rows = [("k", 0, 10), ("k", 1, 20), ("k", 2, 30), ("solo", 0, 7)]
    df = spark.createDataFrame(rows, ["key", "b", "v"])
    out = {r["key"]: r for r in ewma_levels(df, "key", "b", "v", alpha=0.5).collect()}
    # fold: seed 10 -> 10*.5+20*.5=15 -> 15*.5+30*.5=22.5
    assert out["k"]["ewma_level"] == 22.5 and out["k"]["n_buckets"] == 3
    assert out["solo"]["ewma_level"] == 7.0 and out["solo"]["n_buckets"] == 1


def test_ewma_order_independent_of_input_layout(spark):
    from hiero_spark.operators.anomaly import ewma_levels

    rows = [("k", i, (i * 7) % 13) for i in range(50)]
    a = ewma_levels(spark.createDataFrame(rows, ["key", "b", "v"]), "key", "b", "v").collect()
    b = ewma_levels(
        spark.createDataFrame(list(reversed(rows)), ["key", "b", "v"]).repartition(7),
        "key", "b", "v",
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _ref_holt(xs, a=0.3, b=0.1):
    l, tr = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        nl = x * a + (l + tr) * (1.0 - a)
        tr = (nl - l) * b + tr * (1.0 - b)
        l = nl
    return round(l, 6), round(tr, 6)


def _holt_run(spark, series):
    from hiero_spark.operators.anomaly import holt_levels

    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(series)],
        "key string, bucket long, val double",
    )
    return holt_levels(df, "key", "bucket", "val").collect()[0]


def test_holt_constant_series_flat(spark):
    r = _holt_run(spark, [5.0] * 10)
    assert (r.holt_level, r.holt_trend, r.forecast_next) == (5.0, 0.0, 5.0)


def test_holt_linear_ramp_recovers_slope(spark):
    r = _holt_run(spark, [2.0 * i for i in range(12)])
    assert abs(r.holt_trend - 2.0) < 1e-6
    assert abs(r.forecast_next - 24.0) < 1e-6  # x_11 = 22, next = 24


def test_holt_matches_reference_fold(spark):
    xs = [3.0, 7.0, 4.0, 9.0, 1.0, 6.0, 6.5, 2.25]
    r = _holt_run(spark, xs)
    want_l, want_t = _ref_holt(xs)
    assert (r.holt_level, r.holt_trend) == (want_l, want_t)


def test_holt_single_point(spark):
    r = _holt_run(spark, [42.0])
    assert (r.n_buckets, r.holt_level, r.holt_trend) == (1, 42.0, 0.0)


# --- OLS trend (round-8 continuation) ------------------------------------


def _ols_events(spark, rows):
    """rows: (key, hour_index, value_dollars) -> events-shaped frame."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (k, base + dt.timedelta(hours=h), float(v)) for k, h, v in rows
    ]
    return spark.createDataFrame(data, "event_type string, ts timestamp, value double")


def test_ols_perfect_line(spark):
    from hiero_spark.operators.anomaly import ols_trend

    # y = 200 + 300x cents (hours 0..4, dollars 2,5,8,11,14)
    rows = [("a", h, 2 + 3 * h) for h in range(5)]
    got = ols_trend(_ols_events(spark, rows)).collect()[0]
    assert got["n_hours"] == 5
    assert got["slope_cents_per_hour"] == 300.0
    assert got["intercept_cents"] == 200.0
    assert got["r2"] == 1.0


def test_ols_hand_computed_scatter(spark):
    from hiero_spark.operators.anomaly import ols_trend

    # y cents = (100, 300, 200) at x = (0, 1, 2): slope = 50, b = 150
    rows = [("a", 0, 1.0), ("a", 1, 3.0), ("a", 2, 2.0)]
    got = ols_trend(_ols_events(spark, rows)).collect()[0]
    assert got["slope_cents_per_hour"] == 50.0
    assert got["intercept_cents"] == 150.0
    # num = n*sxy - sx*sy = 3*700 - 3*600 = 300; den = n*sxx - sx² = 6;
    # r2 = 300² / (6 * (3*140000 - 600²)) = 90000 / 360000
    assert got["r2"] == 0.25


def test_ols_single_bucket_key_excluded(spark):
    from hiero_spark.operators.anomaly import ols_trend

    rows = [("a", 0, 1.0), ("a", 1, 2.0), ("lonely", 3, 9.0)]
    got = {r["event_type"] for r in ols_trend(_ols_events(spark, rows)).collect()}
    assert got == {"a"}  # zero x-variance keys have no defined slope


def test_ols_x_rebase_is_per_key(spark):
    from hiero_spark.operators.anomaly import ols_trend

    # identical series shifted 1000 hours apart must fit identically
    rows = [("a", h, 1 + h) for h in range(4)] + [
        ("b", 1000 + h, 1 + h) for h in range(4)
    ]
    got = {r["event_type"]: (r["slope_cents_per_hour"], r["intercept_cents"])
           for r in ols_trend(_ols_events(spark, rows)).collect()}
    assert got["a"] == got["b"] == (100.0, 100.0)


def test_winsorize_hand_computed(spark):
    from hiero_spark.operators.anomaly import winsorize_stats

    # 100 rows 1..100 dollars: ceil(1*100/100)=1 -> lo=100 cents (rank 1),
    # ceil(99*100/100)=99 -> hi=9900 cents (rank 99); one row clamps high
    rows = [("a", float(i)) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = winsorize_stats(df).collect()[0]
    assert (got["n"], got["lo_cents"], got["hi_cents"]) == (100, 100, 9900)
    assert (got["n_clamped_lo"], got["n_clamped_hi"]) == (0, 1)
    # sum 1..99 dollars + clamped 99 = 4950+99 = 5049 dollars
    assert got["winsorized_sum_cents"] == 504900


def test_winsorize_duplicates_and_small_groups(spark):
    from hiero_spark.operators.anomaly import winsorize_stats

    # heavy duplication: the distinct-value collapse must still weight by
    # count (cum over cnt, not rows); tiny group: bounds = min/max
    rows = [("a", 5.0)] * 98 + [("a", 1.0), ("a", 100.0), ("b", 7.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    got = {r["event_type"]: r for r in winsorize_stats(df).collect()}
    a = got["a"]
    # n=100: k_lo=1 -> lo=100 (the single 1.0); k_hi=99 -> cm(500)=99 -> hi=500
    assert (a["lo_cents"], a["hi_cents"]) == (100, 500)
    assert (a["n_clamped_lo"], a["n_clamped_hi"]) == (0, 1)
    b = got["b"]
    assert (b["n"], b["lo_cents"], b["hi_cents"]) == (1, 700, 700)
    assert b["winsorized_sum_cents"] == 700
