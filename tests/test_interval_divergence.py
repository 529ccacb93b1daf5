"""Duration/interval edge-semantics pins between the engines — the 8th
divergence class (round 13; SURVEY §1.2 maps the reference's Duration
type onto Spark's ANSI DayTimeIntervalType / YearMonthIntervalType).

Spark models intervals as two disjoint ANSI types — YearMonthInterval
(months, int32) and DayTimeInterval (a SINGLE int64 of microseconds) —
while DuckDB models one INTERVAL as the (months, days, micros) triple
with per-field arithmetic.  That representational split is where every
divergence below comes from.

AGREEMENT surface oracle authors may lean on (pinned below and fuzzed
by tests/test_fuzz_intervals.py):

* timestamp - timestamp differences (any sign), timestamp +/- interval,
  and month-end clamping (Jan 31 + 1 MONTH = Feb 29 in both);
* same-family interval add/sub chains and integer multiplication
  (including negative multipliers) — field-wise in DuckDB, micros in
  Spark, but days carry no remainder under * so values agree;
* day-time interval comparisons (=, <, BETWEEN) between MICROS-ONLY
  operands (days field zero: built from HOUR/MINUTE/SECOND) at any
  magnitude, and small cross-shape cases (INTERVAL '1' DAY =
  INTERVAL '24' HOUR is TRUE in both) — but see the mixed-field
  comparison divergence below for where cross-shape comparison
  BREAKS;
* EXACT division of an HOUR/MINUTE/SECOND-built interval by a nonzero
  integer (count divisible by divisor — no dropped fraction, so the
  rounding split below never engages);
* fractional SECOND literals (INTERVAL '1.5' SECOND) — sub-second
  fractions are representable in both.

DIVERGENCES (each pinned, with the oracle-authoring rule):

* **Day/month-field DIVISION is silently lossy in DuckDB**: DuckDB
  divides each field of the triple separately with integer division
  and NO spill of the remainder into smaller fields, so
  INTERVAL '1' DAY / 2 is ZERO and INTERVAL '3' DAY / 2 is 1 day;
  Spark converts the whole day-time interval to microseconds first and
  returns 12 h / 1 day 12 h.  Rule: never divide a day-bearing (or
  month-bearing) interval in an oracle pair — divide epoch seconds, or
  keep division over hour/minute/second-built intervals only.
* **Inexact micros quotients round differently**: Spark rounds the
  microsecond quotient HALF-AWAY-FROM-ZERO (1.5 us -> 2, -1.5 us ->
  -2), DuckDB truncates toward zero — a one-microsecond silent
  divergence, either sign, whenever the dropped fraction is >= 0.5
  (4999 MINUTE / 7 and 1 MINUTE / -7 both falsify; 1 HOUR / 7, whose
  fraction is .285, agrees).  Rule: only EXACT divisions in oracle
  pairs (count divisible by divisor).
* **Fractional interval literals**: INTERVAL '1.5' HOUR and
  INTERVAL '0.5' MONTH are parse ERRORS in Spark
  (INVALID_INTERVAL_FORMAT.INVALID_FRACTION) but silently TRUNCATE in
  DuckDB (1 hour; 0) — DuckDB discards the fraction of any
  non-second field without a warning.  Rule: integral counts only,
  fractions via SECOND.
* **Mixed-field comparison is not exact-micros order in DuckDB**
  (found by this round's 500-example fuzz soak): once a nonzero days
  field meets >= 24 h of micros, DuckDB's comparison departs from the
  true total — INTERVAL '29' DAY + INTERVAL '24' HOUR = INTERVAL '30'
  DAY is FALSE there (TRUE in Spark, which always compares exact total
  microseconds), the soak's minimized falsifier
  INTERVAL '329' DAY + INTERVAL '25' HOUR > INTERVAL '330' DAY is
  FALSE there (TRUE in Spark), and the flip recurs at every
  days % 30 == 29 boundary — the days field is bucketed into 30-day
  months somewhere in the comparison path.  DuckDB 1.0's ORDER BY
  comparator is not even consistent with its own '=' across shapes
  (7200 HOUR sorts AFTER 299d+25h while comparing equal to 300 DAY).
  Rule: oracle comparisons only between micros-only intervals (days
  field identically zero), where both engines compare raw micros —
  or compare epoch-second differences instead.
* **Interval / 0**: Spark raises
  INTERVAL_DIVIDED_BY_ZERO; DuckDB returns NULL — same split as the
  numeric class's x/0 and the reason the fuzz grammar keeps divisors
  positive.
* **DATE - DATE**: Spark returns INTERVAL DAY (a timedelta); DuckDB
  returns INTEGER days — a type-and-value-class divergence even though
  the magnitude agrees.  Rule: mirror via datediff(a, b) (Spark) <->
  date_diff('day', b, a) (DuckDB), both BIGINT-castable.
* **DATE + year-month interval TYPE**: Spark keeps DATE, DuckDB
  promotes to TIMESTAMP.  Rule: CAST the sum explicitly on both sides
  (same shape as the pinned date_trunc('day') type divergence).

Dialect holes (errors, not silent values — documented so nobody "fixes"
an oracle into them): mixed-family compare/add (MONTH vs DAY) is a
Spark type error while DuckDB normalizes months at 30 days and answers;
EXTRACT(HOUR FROM INTERVAL '90' MINUTE) is a Spark
INVALID_EXTRACT_FIELD while DuckDB normalizes to 1; day counts beyond
DayTimeInterval's ~106M-day micros range overflow in Spark but fit
DuckDB's int32 days field; SUM/AVG over intervals and interval *
fractional are Spark-only; and PySpark cannot COLLECT a
YearMonthInterval value at all (NOT_IMPLEMENTED in fromInternal) —
month-valued intervals may be applied to dates/timestamps inside a
query but must never be a result column.
"""

import datetime

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    return c


def _s(spark, expr):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


def _d(con, expr):
    return con.execute(f"SELECT {expr}").fetchone()[0]


def test_day_field_division_diverges_silently(spark, con):
    """DuckDB integer-divides the days field with no spill; Spark
    divides total microseconds.  The smallest falsifier: 1 day / 2."""
    expr = "INTERVAL '1' DAY / 2"
    assert _s(spark, expr) == datetime.timedelta(hours=12)
    assert _d(con, expr) == datetime.timedelta(0)
    expr = "INTERVAL '3' DAY / 2"
    assert _s(spark, expr) == datetime.timedelta(days=1, hours=12)
    assert _d(con, expr) == datetime.timedelta(days=1)
    # agreement arm: micros-field division, positive/positive — exact
    # and truncation both match
    for expr, want in (
        ("INTERVAL '90' MINUTE / 4", datetime.timedelta(minutes=22, seconds=30)),
        ("INTERVAL '1' HOUR / 7",
         datetime.timedelta(seconds=514, microseconds=285714)),
    ):
        assert _s(spark, expr) == want, expr
        assert _d(con, expr) == want, expr


def test_inexact_micros_division_rounding_diverges(spark, con):
    """Spark rounds the micros quotient half-away-from-zero, DuckDB
    truncates toward zero — one microsecond apart on either sign when
    the dropped fraction is >= 0.5.  (Found by this family's own first
    @example draw: 4999 MINUTE / 7 inside a timestamp shift.)"""
    # half-point probes: 1.5us -> 2 vs 1; 2.5us -> 3 vs 2; -1.5 -> -2 vs -1
    for expr, s_want, d_want in (
        ("INTERVAL '0.000003' SECOND / 2", 2, 1),
        ("INTERVAL '0.000005' SECOND / 2", 3, 2),
        ("INTERVAL '0.000003' SECOND / -2", -2, -1),
    ):
        assert _s(spark, expr) == datetime.timedelta(microseconds=s_want), expr
        assert _d(con, expr) == datetime.timedelta(microseconds=d_want), expr
    # the generated falsifier and its negative twin
    expr = "INTERVAL '4999' MINUTE / 7"
    assert _s(spark, expr) == datetime.timedelta(seconds=42848,
                                                microseconds=571429)
    assert _d(con, expr) == datetime.timedelta(seconds=42848,
                                               microseconds=571428)
    expr = "INTERVAL '1' MINUTE / -7"
    assert _s(spark, expr) == datetime.timedelta(microseconds=-8571429)
    assert _d(con, expr) == datetime.timedelta(microseconds=-8571428)
    # agreement arms: exact negative quotient, and fraction < 0.5
    expr = "INTERVAL '5' HOUR / -2"
    want = datetime.timedelta(hours=-2, minutes=-30)
    assert _s(spark, expr) == want
    assert _d(con, expr) == want


def test_fractional_interval_literal_error_vs_truncate(spark, con):
    """Spark rejects fractional non-second interval counts; DuckDB
    silently truncates the fraction away (1.5 HOUR -> 1 hour,
    0.5 MONTH -> zero)."""
    for lit, ddb_want in (
        ("INTERVAL '1.5' HOUR", datetime.timedelta(hours=1)),
        ("INTERVAL '0.5' MONTH", datetime.timedelta(0)),
    ):
        with pytest.raises(Exception, match="INVALID_FRACTION"):
            _s(spark, lit)
        assert _d(con, lit) == ddb_want, lit
    # agreement arm: SECOND carries fractions identically in both
    want = datetime.timedelta(seconds=1, microseconds=500000)
    assert _s(spark, "INTERVAL '1.5' SECOND") == want
    assert _d(con, "INTERVAL '1.5' SECOND") == want


def test_interval_division_by_zero_raises_vs_null(spark, con):
    expr = "INTERVAL '1' HOUR / 0"
    with pytest.raises(Exception, match="INTERVAL_DIVIDED_BY_ZERO"):
        _s(spark, expr)
    assert _d(con, expr) is None


def test_date_minus_date_interval_vs_integer(spark, con):
    """Same magnitude, different value class: timedelta vs int."""
    expr = "DATE '2000-03-01' - DATE '2000-01-31'"
    assert _s(spark, expr) == datetime.timedelta(days=30)
    assert _d(con, expr) == 30
    # the mirror pair oracles must use instead
    assert _s(spark, "datediff(DATE '2000-03-01', DATE '2000-01-31')") == 30
    assert _d(con, "date_diff('day', DATE '2000-01-31', DATE '2000-03-01')") == 30


def test_date_plus_month_interval_type_diverges(spark, con):
    """Value clamps identically (Jan 31 + 1 MONTH = Feb 29) but Spark
    keeps DATE while DuckDB promotes to TIMESTAMP; the explicit-cast
    repair lands both on the same date."""
    expr = "DATE '2000-01-31' + INTERVAL '1' MONTH"
    assert _s(spark, expr) == datetime.date(2000, 2, 29)
    assert _d(con, expr) == datetime.datetime(2000, 2, 29, 0, 0)
    cast = f"CAST(({expr}) AS DATE)"
    want = datetime.date(2000, 2, 29)
    assert _s(spark, cast) == want
    assert _d(con, cast) == want


def test_agreement_surface_chains_compare_multiply(spark, con):
    """The surface the fuzz grammar generates over: diffs, chains,
    integer multiply, 24h-normalized comparisons, BETWEEN."""
    cases = (
        ("TIMESTAMP '2000-03-01 12:00:00' - TIMESTAMP '2000-01-31 06:30:00'",
         datetime.timedelta(days=30, seconds=19800)),
        ("TIMESTAMP '2000-01-01 00:00:00' - TIMESTAMP '2000-02-01 00:00:00'",
         datetime.timedelta(days=-31)),
        ("INTERVAL '2' HOUR + INTERVAL '30' MINUTE",
         datetime.timedelta(hours=2, minutes=30)),
        ("INTERVAL '1' DAY * -3", datetime.timedelta(days=-3)),
        ("(INTERVAL '3' DAY + INTERVAL '7' HOUR - INTERVAL '90' MINUTE) * 2",
         datetime.timedelta(days=6, hours=11)),
        ("(INTERVAL '1' DAY + INTERVAL '25' HOUR) > INTERVAL '2' DAY", True),
        ("INTERVAL '1' DAY = INTERVAL '24' HOUR", True),
        ("(TIMESTAMP '2000-03-01 00:00:00' - TIMESTAMP '2000-02-27 00:00:00') "
         "BETWEEN INTERVAL '2' DAY AND INTERVAL '4' DAY", True),
    )
    for expr, want in cases:
        assert _s(spark, expr) == want, expr
        assert _d(con, expr) == want, expr


def test_mixed_field_comparison_diverges_and_is_not_total_order(spark, con):
    """Found by the round-13 interval fuzz soak (a fresh 500-example
    draw): comparing a (days, micros) mixed interval against a pure-day
    interval departs from exact-micros order in DuckDB whenever the
    micros reach 24h and the days straddle a 30-day bucket boundary;
    Spark compares exact total microseconds everywhere.  DuckDB 1.0's
    ORDER BY comparator additionally disagrees with its own '=' across
    field shapes, so there is no consistent cross-shape order to mirror
    — oracle comparisons must keep both operands micros-only."""
    for expr in (
        "INTERVAL '329' DAY + INTERVAL '25' HOUR > INTERVAL '330' DAY",
        "INTERVAL '29' DAY + INTERVAL '24' HOUR = INTERVAL '30' DAY",
    ):
        assert _s(spark, expr) is True, expr
        assert _d(con, expr) is False, expr
    # the flip recurs at every days % 30 == 29 boundary
    for n in (59, 89, 299):
        expr = f"INTERVAL '{n}' DAY + INTERVAL '24' HOUR = INTERVAL '{n+1}' DAY"
        assert _s(spark, expr) is True, expr
        assert _d(con, expr) is False, expr
    # agreement arms: one bucket lower; equal values ACROSS shapes
    # without a bucket straddle; pure-micros at any magnitude
    for expr in (
        "INTERVAL '28' DAY + INTERVAL '24' HOUR = INTERVAL '29' DAY",
        "INTERVAL '7200' HOUR = INTERVAL '300' DAY",
        "INTERVAL '700' HOUR > INTERVAL '699' HOUR",
    ):
        assert _s(spark, expr) is True, expr
        assert _d(con, expr) is True, expr
    # DuckDB's ORDER BY comparator vs its own '=': 300d sorts both
    # BEFORE and AFTER 300d1h; Spark's order is the exact-micros one
    vals_sql = ("(VALUES (INTERVAL '7200' HOUR), (INTERVAL '300' DAY), "
                "(INTERVAL '299' DAY + INTERVAL '25' HOUR)) t(iv)")
    ddb = [r[0] for r in
           con.execute(f"SELECT iv FROM {vals_sql} ORDER BY iv").fetchall()]
    d300 = datetime.timedelta(days=300)
    assert ddb == [d300, datetime.timedelta(days=300, hours=1), d300]
    got = [r[0] for r in
           spark.sql(f"SELECT iv FROM {vals_sql} ORDER BY iv").collect()]
    assert got == [d300, d300, datetime.timedelta(days=300, hours=1)]


def test_dialect_holes_error_not_silence(spark, con):
    """Each hole errors on one engine and answers on the other —
    pinned as errors so an oracle can never silently cross them."""
    # mixed-family comparison: Spark type error, DuckDB 30-day months
    expr = "INTERVAL '1' MONTH > INTERVAL '29' DAY"
    with pytest.raises(Exception, match="DATATYPE_MISMATCH"):
        _s(spark, expr)
    assert _d(con, expr) is True
    # mixed-family addition: same split
    expr = "INTERVAL '1' MONTH + INTERVAL '1' DAY"
    with pytest.raises(Exception, match="DATATYPE_MISMATCH"):
        _s(spark, expr)
    assert _d(con, expr) == datetime.timedelta(days=31)
    # extracting a field the Spark type does not carry
    expr = "EXTRACT(HOUR FROM INTERVAL '90' MINUTE)"
    with pytest.raises(Exception, match="INVALID_EXTRACT_FIELD"):
        _s(spark, expr)
    assert _d(con, expr) == 1
    # same-field extract agrees
    expr = "EXTRACT(MINUTE FROM INTERVAL '90' MINUTE)"
    assert _s(spark, expr) == 30
    assert _d(con, expr) == 30
    # beyond DayTimeInterval's micros range but inside int32 days
    expr = "INTERVAL '200000000' DAY"
    with pytest.raises(Exception, match="INTERVAL_ARITHMETIC_OVERFLOW"):
        _s(spark, expr)
    assert _d(con, expr) == datetime.timedelta(days=200000000)
    # Spark-only surfaces: interval aggregation and fractional multiply
    assert _s(
        spark,
        "(SELECT SUM(x) FROM (VALUES (INTERVAL '1' DAY), "
        "(INTERVAL '2' DAY)) AS t(x))",
    ) == datetime.timedelta(days=3)
    with pytest.raises(Exception):
        _d(con, "(SELECT SUM(x) FROM (VALUES (INTERVAL '1' DAY), "
                "(INTERVAL '2' DAY)) AS t(x))")
    assert _s(spark, "INTERVAL '1' DAY * 1.5") == datetime.timedelta(hours=36)
    with pytest.raises(Exception):
        _d(con, "INTERVAL '1' DAY * 1.5")
    # PySpark cannot collect a year-month interval VALUE at all
    with pytest.raises(Exception, match="NOT_IMPLEMENTED"):
        _s(spark, "INTERVAL '3' MONTH")
    assert _d(con, "INTERVAL '3' MONTH") == datetime.timedelta(days=90)
