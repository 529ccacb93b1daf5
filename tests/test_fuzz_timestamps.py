"""Generated timestamp-expression differential fuzz (round 12).

tests/test_timestamp_divergence.py maps where the engines disagree on
timestamps (DST fold direction, EXTRACT(SECOND) fractions, the
date_trunc('day') TYPE); this family fuzzes the complement — random
chains built ONLY from constructs both engines define identically:

* naive interval arithmetic (+/- INTERVAL 'n' MINUTE/HOUR/DAY — pure
  wall-clock on naive timestamps, no timezone consulted),
* date_trunc over hour/day/week/month/quarter/year, ALWAYS wrapped in
  CAST(... AS TIMESTAMP) (the pinned repair for the TYPE divergence:
  bare date_trunc('day') is TIMESTAMP in Spark but DATE in DuckDB),
* leaves: a column timestamp (CAST(o_orderdate AS TIMESTAMP)) and
  fixed literals including a leap day and a year boundary.

Both engines parse the SAME SQL string and return naive datetimes that
must compare EQUAL per row.  Local->instant timezone conversion stays
OUT of the grammar by design — the fold divergence is pinned, not
fuzzed.  Interval counts are generated non-negative with the sign
carried by the +/- operator: DuckDB's INTERVAL literal grammar rejects
bare negative counts (round-11 calendar-family find).
"""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from hiero_spark.catalog import table_path

SF_DIR = "/root/testdata/sf0.001"
FUZZ_EXAMPLES = int(os.environ.get("HIERO_FUZZ_EXAMPLES", "25"))

_LEAVES = (
    "CAST(o_orderdate AS TIMESTAMP)",
    "TIMESTAMP '2000-02-29 23:59:59'",   # leap day
    "TIMESTAMP '1999-12-31 23:00:00'",   # year boundary
    "TIMESTAMP '2021-03-14 02:30:00'",   # a US DST-gap wall time — naive
)

_UNITS = ("MINUTE", "HOUR", "DAY")
_TRUNCS = ("hour", "day", "week", "month", "quarter", "year")


@st.composite
def _ts_expr(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_LEAVES))
    kind = draw(st.sampled_from(["shift", "trunc"]))
    inner = draw(_ts_expr(depth=depth + 1))
    if kind == "shift":
        sign = draw(st.sampled_from(["+", "-"]))
        n = draw(st.integers(0, 5000))
        unit = draw(st.sampled_from(_UNITS))
        return f"({inner} {sign} INTERVAL '{n}' {unit})"
    unit = draw(st.sampled_from(_TRUNCS))
    return f"CAST(date_trunc('{unit}', {inner}) AS TIMESTAMP)"


@pytest.fixture(scope="module")
def tcon():
    c = duckdb.connect()
    c.execute("SET TimeZone='UTC'")
    c.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{table_path(SF_DIR, 'orders')}')"
    )
    return c


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
# week-truncation after a large shift crosses ISO-week/month boundaries
# in one expression — the shape most likely to diverge if either engine
# changes its week convention
@example(expr="CAST(date_trunc('week', (CAST(o_orderdate AS TIMESTAMP) "
              "+ INTERVAL '4999' HOUR)) AS TIMESTAMP)")
@example(expr="CAST(date_trunc('quarter', (TIMESTAMP '2000-02-29 23:59:59' "
              "- INTERVAL '1' MINUTE)) AS TIMESTAMP)")
@given(expr=_ts_expr())
def test_generated_timestamp_parity(spark, tcon, expr):
    from hiero_spark.catalog import register_views

    register_views(spark, SF_DIR)
    sql = (
        f"SELECT o_orderkey, {expr} AS v FROM orders "
        "WHERE o_orderkey < 300 ORDER BY o_orderkey"
    )
    got = [(r[0], r[1]) for r in spark.sql(sql).collect()]
    exp = tcon.execute(sql).fetchall()
    assert len(got) == len(exp)
    for (gk, gv), (ek, ev) in zip(got, exp):
        assert gk == ek
        assert gv == ev, (expr, gk, gv, ev)
