"""Gap fill (operators/temporal.py:gap_fill): hand-built series pin the
LOCF semantics — every grid point emitted, gaps carry the last value,
multiple observations in one bucket average, keys don't leak."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hiero_spark.operators.temporal import gap_fill


@pytest.fixture(scope="module")
def filled(spark):
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        # key 1: observations at 10:00 (two rows -> avg) and 13:00
        (1, base, 10.0),
        (1, base + dt.timedelta(minutes=20), 30.0),
        (1, base + dt.timedelta(hours=3), 7.0),
        # key 2: single observation -> single grid point, nothing filled
        (2, base + dt.timedelta(hours=1), 5.0),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = gap_fill(df, "k", "ts", "v", step_seconds=3600)
    return {
        (r["k"], r["bucket"].hour): (r["value"], r["filled"])
        for r in out.collect()
    }


def test_grid_is_dense_per_key(filled):
    assert {(k, h) for k, h in filled} == {
        (1, 10), (1, 11), (1, 12), (1, 13), (2, 11)
    }


def test_bucket_aggregation_averages(filled):
    assert filled[(1, 10)] == (20.0, False)


def test_gaps_carry_last_value(filled):
    assert filled[(1, 11)] == (20.0, True)
    assert filled[(1, 12)] == (20.0, True)
    assert filled[(1, 13)] == (7.0, False)


def test_keys_do_not_leak(filled):
    assert filled[(2, 11)] == (5.0, False)


def test_linear_interpolation(spark):
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    df = spark.createDataFrame(
        [(1, base, 20.0), (1, base + dt.timedelta(hours=3), 8.0)],
        "k long, ts timestamp, v double",
    )
    out = gap_fill(df, "k", "ts", "v", step_seconds=3600, fill="linear")
    got = {r["bucket"].hour: (r["value"], r["filled"]) for r in out.collect()}
    assert got[10] == (20.0, False)
    assert got[11] == (pytest.approx(16.0), True)
    assert got[12] == (pytest.approx(12.0), True)
    assert got[13] == (8.0, False)


def test_unknown_fill_mode_rejected(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 3, 1), 1.0)], "k long, ts timestamp, v double"
    )
    with pytest.raises(ValueError):
        gap_fill(df, "k", "ts", "v", fill="cubic")
