"""Seasonal decomposition: recovery of a planted trend+seasonal signal,
edge trimming, and the exact scaled-integer identities."""

import datetime

from pyspark.sql import functions as F

from hiero_spark.operators.temporal import seasonal_decompose

BASE = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _series(spark, hours, value_fn, key="k"):
    """One event per hour with value value_fn(h) dollars."""
    rows = [
        (key, i, BASE + datetime.timedelta(hours=h), float(value_fn(h)))
        for i, h in enumerate(hours)
    ]
    return spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )


def test_constant_series_decomposes_to_zero(spark):
    df = _series(spark, range(72), lambda h: 10.0)
    out = seasonal_decompose(df).collect()
    # 72 hourly buckets, +/-12 full-window trim -> 72 - 24 rows survive
    assert len(out) == 48
    for r in out:
        assert r.trend_sum25 == 25 * 1000  # 25 buckets x 1000 cents
        assert r.detrend_x25 == 0 and r.seasonal_x25 == 0 and r.residual_x25 == 0


def test_planted_daily_seasonality_lands_in_seasonal(spark):
    # value = 100 + 50 * (hour-of-day == 6): flat trend, one daily spike
    df = _series(spark, range(24 * 10), lambda h: 100 + (50 if h % 24 == 6 else 0))
    out = {r.hour_bucket: r for r in seasonal_decompose(df).collect()}
    base = BASE.timestamp() // 3600
    spike = [r for hb, r in out.items() if (hb - base) % 24 == 6]
    flat = [r for hb, r in out.items() if (hb - base) % 24 == 12]
    assert spike and flat
    # the spike shows up in seasonal (positive, ~same every day), residual ~0
    assert all(r.seasonal_x25 > 20 * 2500 for r in spike)  # >> flat hours
    assert all(abs(r.residual_x25) <= 25 for r in spike)  # rounding only
    assert all(r.seasonal_x25 < 0 for r in flat)  # below-average hours


def test_linear_trend_lands_in_trend(spark):
    # value = h dollars: centered MA of a linear ramp is exact -> detrend 0
    df = _series(spark, range(60), lambda h: h)
    out = seasonal_decompose(df).collect()
    for r in out:
        assert r.detrend_x25 == 0  # 25*c(h) == sum_{j=-12..12} c(h+j)
        assert r.seasonal_x25 == 0 and r.residual_x25 == 0


def test_gap_trims_incomplete_windows(spark):
    # drop hour 30: every window RANGE-covering it has n_win < 25
    hours = [h for h in range(72) if h != 30]
    out = seasonal_decompose(_series(spark, hours, lambda h: 5)).collect()
    buckets = {r.hour_bucket - BASE.timestamp() // 3600 for r in out}
    # hours 18..42 (within +/-12 of the gap) are trimmed; edges too
    assert all(not (18 <= b <= 42) for b in buckets)
    assert buckets  # but the far ends still produce full windows


def test_multiple_keys_independent(spark):
    a = _series(spark, range(48), lambda h: 10, key="a")
    b = _series(spark, range(48), lambda h: 20, key="b")
    out = seasonal_decompose(a.unionByName(b)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    assert set(by_key) == {"a", "b"}
    assert all(r.cents == 1000 for r in by_key["a"])
    assert all(r.cents == 2000 for r in by_key["b"])
