"""Timestamp edge-semantics pins between the engines (round 12).

The calendar family (test_calendar_divergence.py) pins DATE ops; this
file extends the divergence-pin series to TIMESTAMPs — the surface the
events pipeline leans on via catalog.normalize_events_ts (TIMESTAMP_NTZ
-> TIMESTAMP cast, exact under the UTC session tz that
catalog._ensure_session_confs pins).

AGREEMENT surface oracle authors may lean on (all pinned below):

* offset-bearing string -> naive TIMESTAMP cast lands on the identical
  UTC instant ('...+05:00' shifts to UTC in BOTH; verified DuckDB does
  this independent of its TimeZone setting, Spark under the pinned UTC
  session tz);
* naive interval arithmetic (ts + INTERVAL n HOUR) — pure wall-clock,
  no tz consulted;
* epoch round-trips via the mirror pair unix_timestamp <-> epoch() and
  timestamp_seconds(n) <-> CAST(to_timestamp(n) AS TIMESTAMP);
* date_trunc('hour') instants;
* the DST GAP: a nonexistent local time (2021-03-14 02:30
  America/Los_Angeles) maps to the same UTC instant in both (both
  resolve the gap with the pre-transition offset);
* instant -> local wall clock (from_utc_timestamp and its timezone()
  mirror) agrees on BOTH instants of a fold — the lossy collapse is
  identical.

DIVERGENCES (each pinned, with the oracle-authoring rule):

* **DST FOLD, local -> instant**: 2021-11-07 01:30 America/Los_Angeles
  occurs twice.  Spark (java.time) resolves the ambiguity to the
  EARLIER offset (PDT, 08:30Z); DuckDB (ICU) resolves to the LATER
  offset (PST, 09:30Z) — a silent one-hour disagreement on the same
  input.  Rule: never put a local->instant conversion over
  fold-capable wall times in an oracle pair; the events pipeline stays
  naive/UTC end-to-end (normalize_events_ts) precisely so no query
  ever crosses this.
* **EXTRACT(SECOND) with fractional seconds**: the same SQL string
  returns DECIMAL 1.500000 in Spark but integer 1 in DuckDB.  Rule:
  extract seconds via date_part on the truncated value, or cast/floor
  explicitly on both sides.
* **date_trunc('day') TYPE**: Spark returns TIMESTAMP, DuckDB returns
  DATE — hash/schema divergence even when the instant agrees.  Rule:
  CAST(date_trunc(...) AS DATE) (or AS TIMESTAMP) explicitly on both
  sides; the engine's date-bucketing queries already do.

Dialect holes (errors, not value divergences — documented so nobody
"fixes" an oracle into them): CAST(ts AS BIGINT) and
unix_timestamp/from_utc_timestamp are Spark-only; EXTRACT(EPOCH),
EXTRACT(MICROSECOND), and timezone() are DuckDB-only.
"""

import datetime

import duckdb
import pytest

LA = "America/Los_Angeles"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    return c


def _s(spark, expr):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


def _d(con, expr):
    return con.execute(f"SELECT {expr}").fetchone()[0]


def test_offset_string_cast_agrees_on_utc_instant(spark, con):
    """'+05:00' input lands on the same naive UTC instant in both; the
    DuckDB side is TimeZone-setting-independent (verified against a
    non-UTC connection too)."""
    expr = "CAST('2021-01-01 00:00:00+05:00' AS TIMESTAMP)"
    want = datetime.datetime(2020, 12, 31, 19, 0)
    assert _s(spark, expr) == want
    assert _d(con, expr) == want
    c2 = duckdb.connect()
    c2.execute(f"SET TimeZone='{LA}'")
    assert c2.execute(f"SELECT {expr}").fetchone()[0] == want


def test_naive_interval_arithmetic_and_trunc_hour_agree(spark, con):
    for expr, want in (
        ("TIMESTAMP '2021-03-14 00:00:00' + INTERVAL '3' HOUR",
         datetime.datetime(2021, 3, 14, 3, 0)),
        ("date_trunc('hour', TIMESTAMP '2021-03-14 02:30:00')",
         datetime.datetime(2021, 3, 14, 2, 0)),
    ):
        assert _s(spark, expr) == want, expr
        assert _d(con, expr) == want, expr


def test_epoch_round_trip_mirror_pair_agrees(spark, con):
    """unix_timestamp <-> epoch() and timestamp_seconds <->
    to_timestamp: the dialect names differ but the values are exact
    mirrors, both directions."""
    ts = "TIMESTAMP '2021-03-14 02:30:00'"
    epoch = 1615689000
    assert _s(spark, f"unix_timestamp({ts})") == epoch
    assert _d(con, f"epoch({ts})") == epoch
    want = datetime.datetime(2021, 3, 14, 2, 30)
    assert _s(spark, f"timestamp_seconds({epoch})") == want
    assert _d(con, f"CAST(to_timestamp({epoch}) AS TIMESTAMP)") == want
    # round-trip identity
    assert _s(spark, f"timestamp_seconds(unix_timestamp({ts}))") == want
    assert _d(con, f"CAST(to_timestamp(epoch({ts})) AS TIMESTAMP)") == want


def test_dst_gap_agrees_fold_diverges(spark, con):
    """THE timestamp divergence: local->instant over a DST fold.

    Gap (2021-03-14 02:30 LA does not exist): both engines resolve with
    the pre-transition offset -> same instant 10:30Z.  AGREEMENT.

    Fold (2021-11-07 01:30 LA occurs twice): Spark/java.time picks the
    EARLIER offset (PDT -> 08:30Z), DuckDB/ICU picks the LATER (PST ->
    09:30Z).  One hour apart, no error raised by either.  If this pin
    fails after an engine upgrade the fold policy moved — re-audit any
    oracle that converts local wall time to instants."""
    gap_s = _s(spark, f"to_utc_timestamp(TIMESTAMP '2021-03-14 02:30:00', '{LA}')")
    gap_d = _d(con, f"timezone('{LA}', TIMESTAMP '2021-03-14 02:30:00')")
    want_gap = datetime.datetime(2021, 3, 14, 10, 30)
    assert gap_s == want_gap
    assert gap_d.replace(tzinfo=None) == want_gap

    fold_s = _s(spark, f"to_utc_timestamp(TIMESTAMP '2021-11-07 01:30:00', '{LA}')")
    fold_d = _d(con, f"timezone('{LA}', TIMESTAMP '2021-11-07 01:30:00')")
    assert fold_s == datetime.datetime(2021, 11, 7, 8, 30), "Spark: earlier offset"
    assert fold_d.replace(tzinfo=None) == datetime.datetime(2021, 11, 7, 9, 30), (
        "DuckDB: later offset")


def test_instant_to_local_agrees_on_both_fold_instants(spark, con):
    """The reverse direction is safe: both fold instants render to the
    same 01:30 wall clock in both engines (identical lossy collapse)."""
    for utc_hhmm in ("08:30:00", "09:30:00"):
        s = _s(spark,
               f"from_utc_timestamp(TIMESTAMP '2021-11-07 {utc_hhmm}', '{LA}')")
        d = _d(con,
               f"CAST(timezone('{LA}', TIMESTAMP '2021-11-07 {utc_hhmm}'"
               f"::TIMESTAMPTZ) AS TIMESTAMP)")
        assert s == d == datetime.datetime(2021, 11, 7, 1, 30), utc_hhmm


def test_extract_second_fraction_diverges(spark, con):
    """Same SQL string, different value: Spark keeps the fraction
    (DECIMAL 1.500000), DuckDB truncates to integer 1."""
    expr = "EXTRACT(SECOND FROM TIMESTAMP '2021-01-01 00:00:01.5')"
    assert float(_s(spark, expr)) == 1.5
    assert _d(con, expr) == 1


def test_date_trunc_day_type_diverges(spark, con):
    """Same instant, different TYPE: Spark TIMESTAMP vs DuckDB DATE —
    an oracle pair over date_trunc('day') hash-diverges unless both
    sides cast explicitly."""
    expr = "date_trunc('day', TIMESTAMP '2021-03-14 02:30:00')"
    s, d = _s(spark, expr), _d(con, expr)
    assert isinstance(s, datetime.datetime) and s == datetime.datetime(2021, 3, 14)
    assert type(d) is datetime.date and d == datetime.date(2021, 3, 14)
    # the repair both sides can share:
    cast = f"CAST({expr} AS DATE)"
    assert _s(spark, cast) == _d(con, cast) == datetime.date(2021, 3, 14)


def test_dialect_holes_error_not_silently_differ(spark, con):
    """Constructs that exist in exactly one engine must ERROR in the
    other (an oracle can't accidentally ship them), never silently
    compute something different."""
    spark_only = [
        "CAST(TIMESTAMP '2021-03-14 02:30:00' AS BIGINT)",
        "unix_timestamp(TIMESTAMP '2021-03-14 02:30:00')",
        f"from_utc_timestamp(TIMESTAMP '2021-11-07 08:30:00', '{LA}')",
    ]
    duck_only = [
        "EXTRACT(EPOCH FROM TIMESTAMP '2021-03-14 02:30:00')",
        "EXTRACT(MICROSECOND FROM TIMESTAMP '2021-01-01 00:00:00.123456')",
        f"timezone('{LA}', TIMESTAMP '2021-11-07 08:30:00')",
    ]
    for expr in spark_only:
        _s(spark, expr)  # must work
        with pytest.raises(Exception):
            _d(con, expr)
    for expr in duck_only:
        _d(con, expr)  # must work
        with pytest.raises(Exception):
            _s(spark, expr)
