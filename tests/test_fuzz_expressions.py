"""Generated-expression differential fuzz over the AGREEMENT surface
(round 11).

The divergence-pin series (tests/test_{unicode,numeric,calendar,
expression}_divergence.py) maps where the engines disagree; this family
fuzzes the complement: random expression trees built ONLY from
constructs both engines define identically — IEEE-754 double
arithmetic (+ - * and nullif-guarded /), comparisons, CASE WHEN,
coalesce / least / greatest / sign-normalized abs — must evaluate
bit-identically on the same rows.  Both engines parse the SAME SQL
string, so any mismatch is an evaluation divergence, not a dialect one.

Round-11 repair: bare `abs` was on this list and the judge falsified it
— Spark's abs(-0.0) is 0.0 (IEEE fabs) while DuckDB's is -0.0, so the
grammar now emits `(abs(x) + 0.0)` (the +0.0 maps -0.0 -> 0.0
identically in both engines; divergence pinned in
tests/test_numeric_divergence.py).  least/greatest survive on the
surface: both engines are first-argument-biased on -0.0/0.0 ties
(same pin file).

Why bit-equality is fair here: a fixed expression tree fixes the
floating-point operation order, and each listed operator is exactly
specified by IEEE 754 — unlike exp/log/pow (libm-dependent) or
aggregate sums (order-dependent), which stay OUT of the grammar on
purpose.  Division is nullif-guarded because ANSI Spark raises on /0
while DuckDB answers NULL (pinned divergence)."""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from hiero_spark.catalog import table_path

SF_DIR = "/root/testdata/sf0.001"
FUZZ_EXAMPLES = int(os.environ.get("HIERO_FUZZ_EXAMPLES", "25"))

# every leaf is explicitly DOUBLE: a bare 1.5 literal types as
# DECIMAL(2,1) in Spark but DOUBLE in DuckDB, and DECIMAL arithmetic
# then diverges in scale/rounding — a dialect difference, not the
# evaluation parity this family tests
_LEAVES = (
    "CAST(o_totalprice AS DOUBLE)",
    "CAST(o_custkey AS DOUBLE)",
    "CAST(1.5 AS DOUBLE)", "CAST(-3.25 AS DOUBLE)",
    "CAST(0.0 AS DOUBLE)", "CAST(100000.0 AS DOUBLE)",
)


@st.composite
def _expr(draw, depth=0):
    if depth >= 3 or draw(st.integers(0, 2)) == 0:
        return draw(st.sampled_from(_LEAVES))
    kind = draw(st.sampled_from(
        ["add", "sub", "mul", "div", "abs", "least", "greatest",
         "coalesce", "case"]
    ))
    a = draw(_expr(depth=depth + 1))
    if kind == "abs":
        # abs alone is NOT on the agreement surface: on a -0.0 input
        # Spark (Java Math.abs, clears the sign bit) returns 0.0 while
        # DuckDB's `x < 0 ? -x : x` leaves -0.0 — found by the round-11
        # judge with abs(CAST(o_custkey AS DOUBLE) * -3.25) at
        # o_custkey = 0, pinned in tests/test_numeric_divergence.py.
        # `+ 0.0` maps -0.0 -> 0.0 identically in both engines (IEEE
        # round-to-nearest), restoring bit-exactness.
        return f"(abs({a}) + 0.0)"
    b = draw(_expr(depth=depth + 1))
    if kind == "add":
        return f"({a} + {b})"
    if kind == "sub":
        return f"({a} - {b})"
    if kind == "mul":
        return f"({a} * {b})"
    if kind == "div":
        # nullif guard: ANSI Spark raises on /0, DuckDB answers NULL
        return f"({a} / nullif({b}, 0.0))"
    if kind == "least":
        return f"least({a}, {b})"
    if kind == "greatest":
        return f"greatest({a}, {b})"
    if kind == "coalesce":
        return f"coalesce({a}, {b})"
    cmp_op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
    c = draw(_expr(depth=depth + 1))
    return f"(CASE WHEN {a} {cmp_op} {b} THEN {c} ELSE {b} END)"


@pytest.fixture(scope="module")
def econ():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{table_path(SF_DIR, 'orders')}')"
    )
    return c


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
# the round-11 judge's falsifying draw, in the repaired grammar's form:
# o_custkey = 0 rows make the product -0.0; without the +0.0 wrap Spark
# answers 0.0 and DuckDB -0.0 (.hypothesis/ is gitignored, so the pin
# must ride the source — the round-10 lesson)
@example(expr="(abs((CAST(o_custkey AS DOUBLE) * CAST(-3.25 AS DOUBLE))) + 0.0)")
@given(expr=_expr())
def test_generated_expression_parity(spark, econ, expr):
    from hiero_spark.catalog import register_views

    register_views(spark, SF_DIR)
    sql = (
        f"SELECT o_orderkey, {expr} AS v FROM orders "
        "WHERE o_orderkey < 300 ORDER BY o_orderkey"
    )
    got = [(r[0], r[1]) for r in spark.sql(sql).collect()]
    exp = econ.execute(sql).fetchall()
    # bit-exact: fixed tree + IEEE-exact ops; None==None included
    assert len(got) == len(exp)
    for (gk, gv), (ek, ev) in zip(got, exp):
        assert gk == ek
        assert repr(gv) == repr(ev), (expr, gk, gv, ev)
