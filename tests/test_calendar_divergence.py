"""Calendar edge-semantics pins between the engines (round 11).

The agreement surface oracle authors may lean on (all pinned):
month-end clamping in interval arithmetic (Jan 31 + 1 month = Feb 28;
leap Feb 29 + 1 year = Feb 28), ISO week numbering (2021-01-01 is
week 53), day-of-year, last_day, and date_trunc over
year/quarter/month/week (the fuzz family in test_fuzz_strings.py
covers that space against generated shifts).

The divergence: EXTRACT(DOW) — Spark numbers Sunday = 1 on a 1-7
scale, DuckDB numbers Sunday = 0 on a 0-6 scale, so any day-of-week
oracle must normalize (e.g. pmod(dow + offset, 7)) or compare day
NAMES.  Invalid calendar dates error in BOTH engines (different
exception types), so malformed-date behavior is a non-divergence —
neither silently NULLs a CAST(... AS DATE).
"""

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


_AGREE = (
    ("CAST(DATE '2001-01-31' + INTERVAL 1 MONTH AS DATE)", "2001-02-28"),
    ("CAST(DATE '2000-02-29' + INTERVAL 1 YEAR AS DATE)", "2001-02-28"),
    ("EXTRACT(WEEK FROM DATE '2021-01-01')", 53),
    ("EXTRACT(DOY FROM DATE '2021-12-31')", 365),
    ("last_day(DATE '2001-02-03')", "2001-02-28"),
)


def test_calendar_agreement_surface(spark, con):
    for expr, want in _AGREE:
        s = spark.sql(f"SELECT {expr}").collect()[0][0]
        d = con.execute(f"SELECT {expr}").fetchone()[0]
        assert str(s) == str(d) == str(want), (expr, s, d)


def test_dow_numbering_diverges(spark, con):
    # 2021-01-03 is a Sunday
    s = spark.sql("SELECT EXTRACT(DOW FROM DATE '2021-01-03')").collect()[0][0]
    d = con.execute("SELECT EXTRACT(DOW FROM DATE '2021-01-03')").fetchone()[0]
    assert s == 1  # Spark: Sunday = 1, range 1-7
    assert d == 0  # DuckDB: Sunday = 0, range 0-6


def test_invalid_date_errors_in_both(spark, con):
    with pytest.raises(Exception):
        spark.sql("SELECT CAST('2001-02-30' AS DATE)").collect()
    with pytest.raises(Exception):
        con.execute("SELECT CAST('2001-02-30' AS DATE)").fetchone()
