"""Differential fuzzing for the two generated-input gaps the round-10
fuzz files left open (round 11):

* **String predicates (P3)** — the curated suite pins a handful of
  hand-written substring/prefix/regex filters; this family draws
  arbitrary (column, fragment, operator, negation) combinations on
  `part` and checks the surviving key set against DuckDB LIKE/ILIKE.
  The fragment pool deliberately mixes real vocabulary pieces,
  wrong-case variants (exercising the case-insensitive arm both ways),
  LIKE metacharacters (%, _, \\) that the SQL side must escape, and
  strings absent from the corpus (both engines must agree on empty).
* **Calendar bucketing (F4/F2)** — test_generated_events_time_parity
  covers hour/day truncation; this family covers the wider calendar
  space: year/quarter/month/week truncation, field extraction
  (year/month/day), and day-interval shifts composed with truncation,
  as grouped counts on `orders`.

Same engine-vs-engine contract as tests/test_fuzz_parity.py: a
divergence (collation, LIKE-escape, three-valued NOT, week-start or
interval semantics) surfaces as a failing drawn example instead of a
silent wrong answer in a future query.
"""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from hiero_spark.catalog import load_table, table_path

SF_DIR = "/root/testdata/sf0.001"
FUZZ_EXAMPLES = int(os.environ.get("HIERO_FUZZ_EXAMPLES", "25"))


@pytest.fixture(scope="module")
def spark():
    from hiero_spark.session import get_spark

    return get_spark()


@pytest.fixture(scope="module")
def pcon():
    c = duckdb.connect()
    for tbl in ("part", "orders"):
        c.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{table_path(SF_DIR, tbl)}')"
        )
    return c


# --- P3: string predicates ---------------------------------------------------

_STR_TARGETS = ("p_name", "p_brand", "p_type")

# Real vocabulary pieces, wrong-case variants, LIKE metacharacters, and
# corpus-absent strings.  Metacharacters matter: Spark's contains() is a
# literal substring test, so the DuckDB mirror must escape %/_/\ or the
# two sides silently diverge on patterns like "100%".
_FRAGMENTS = (
    "red", "blue", "ring", "widget", "bolt", "sma", "olt",
    "ECONOMY", "economy", "SMALL", "Brand#1", "brand#1", "BLUE",
    "e", "z", "d w", "100%", "under_score", "back\\slash", "%", "_",
    "no-such-fragment",
)

_STR_OPS = ("contains", "prefix", "suffix", "eq", "ci_contains")


def _like_escape(s: str) -> str:
    """Escape a literal fragment for a DuckDB LIKE pattern (ESCAPE '!')."""
    return (
        s.replace("!", "!!").replace("%", "!%").replace("_", "!_")
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    col=st.sampled_from(_STR_TARGETS),
    frag=st.sampled_from(_FRAGMENTS),
    op=st.sampled_from(_STR_OPS),
    negate=st.booleans(),
)
def test_generated_string_predicate_parity(spark, pcon, col, frag, op, negate):
    """Generated string filters on `part` must keep exactly the same key
    set in both engines, including NOT variants (three-valued logic) and
    fragments containing LIKE metacharacters."""
    pt = load_table(spark, SF_DIR, "part")
    c = F.col(col)
    esc, lit = _like_escape(frag), _sql_quote(frag)
    if op == "contains":
        pred = c.contains(frag)
        sql = f"{col} LIKE {_sql_quote('%' + esc + '%')} ESCAPE '!'"
    elif op == "prefix":
        pred = c.startswith(frag)
        sql = f"{col} LIKE {_sql_quote(esc + '%')} ESCAPE '!'"
    elif op == "suffix":
        pred = c.endswith(frag)
        sql = f"{col} LIKE {_sql_quote('%' + esc)} ESCAPE '!'"
    elif op == "eq":
        pred = c == frag
        sql = f"{col} = {lit}"
    else:  # ci_contains — the P3 case-insensitive arm
        pred = F.lower(c).contains(frag.lower())
        sql = f"{col} ILIKE {_sql_quote('%' + esc + '%')} ESCAPE '!'"
    if negate:
        pred, sql = ~pred, f"NOT ({sql})"
    got = sorted(
        r[0] for r in pt.filter(pred).select("p_partkey").collect()
    )
    exp = sorted(
        r[0]
        for r in pcon.execute(
            f"SELECT p_partkey FROM part WHERE {sql}"
        ).fetchall()
    )
    assert got == exp, (col, frag, op, negate, sql)


# --- F4/F2: calendar bucketing, field extraction, interval shift -------------

_GRAIN = ("year", "quarter", "month", "week")
_FIELDS = ("year", "month", "day")
_O_PRED = st.one_of(
    st.none(),
    st.tuples(st.sampled_from(["<", ">="]),
              st.sampled_from([50000.0, 150000.0, 300000.0])),
)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    grain=st.sampled_from(_GRAIN),
    shift_days=st.integers(-400, 400),
    pred=_O_PRED,
)
def test_generated_calendar_trunc_parity(spark, pcon, grain, shift_days, pred):
    """date_trunc over the calendar grains the events family doesn't
    cover, composed with a day-interval shift, as grouped counts —
    week-start (Monday in both engines), quarter boundaries, and
    negative shifts must all agree."""
    od = load_table(spark, SF_DIR, "orders")
    where = "TRUE"
    if pred is not None:
        cmp_op, lit = pred
        od = od.filter(
            F.col("o_totalprice") < lit
            if cmp_op == "<"
            else F.col("o_totalprice") >= lit
        )
        where = f"o_totalprice {cmp_op} {lit}"
    shifted = F.col("o_orderdate") + F.expr(f"INTERVAL {shift_days} DAYS")
    got = sorted(
        tuple(r)
        for r in od.select(
            F.unix_seconds(F.date_trunc(grain, shifted)).alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    exp = sorted(
        pcon.execute(
            # ({n}) * INTERVAL 1 DAY: DuckDB's INTERVAL literal grammar
            # rejects a bare negative count (INTERVAL -400 DAY)
            f"SELECT CAST(epoch(date_trunc('{grain}', "
            f"o_orderdate + ({shift_days}) * INTERVAL 1 DAY)) AS BIGINT) "
            f"AS b, COUNT(*) AS n FROM orders WHERE {where} GROUP BY b"
        ).fetchall()
    )
    assert got == exp, (grain, shift_days, where)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(field=st.sampled_from(_FIELDS), pred=_O_PRED)
def test_generated_date_field_extraction_parity(spark, pcon, field, pred):
    """year()/month()/dayofmonth() grouped counts must match DuckDB
    EXTRACT — the F4 field-extraction arm the curated suite pins only
    at single hand-picked grains."""
    od = load_table(spark, SF_DIR, "orders")
    where = "TRUE"
    if pred is not None:
        cmp_op, lit = pred
        od = od.filter(
            F.col("o_totalprice") < lit
            if cmp_op == "<"
            else F.col("o_totalprice") >= lit
        )
        where = f"o_totalprice {cmp_op} {lit}"
    spark_fn = {
        "year": F.year, "month": F.month, "day": F.dayofmonth
    }[field]
    got = sorted(
        tuple(r)
        for r in od.select(spark_fn("o_orderdate").alias("f"))
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    exp = sorted(
        pcon.execute(
            f"SELECT CAST(EXTRACT({field} FROM o_orderdate) AS INT) AS f, "
            f"COUNT(*) AS n FROM orders WHERE {where} GROUP BY f"
        ).fetchall()
    )
    assert got == exp, (field, where)
