"""Membership-set algebra on Views (hiero Combine semantics) + memoization."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.catalog import load_table
from hiero_spark.views import RecordOrder, View, ViewRegistry


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").cache()


def test_filter_stack_collapses(base):
    v = View(base).filter(F.col("l_quantity") > 10).filter(F.col("l_discount") < 0.05)
    n = v.df().count()
    expected = base.filter((F.col("l_quantity") > 10) & (F.col("l_discount") < 0.05)).count()
    assert n == expected


def test_union_intersect_exclude_consistency(base):
    v1 = View(base).filter(F.col("l_quantity") < 10)
    v2 = View(base).filter(F.col("l_discount") > 0.05)
    u = v1.union(v2).df().count()
    i = v1.intersect(v2).df().count()
    a, b = v1.df().count(), v2.df().count()
    assert u == a + b - i  # inclusion-exclusion
    e = v1.exclude(v2).df().count()
    assert e == a - i
    assert v1.set_to(v2).df().count() == b


def test_exclude_full_view_is_empty(base):
    v1 = View(base).filter(F.col("l_quantity") < 10)
    full = View(base)
    assert v1.exclude(full).df().count() == 0


def test_union_with_full_view_is_full(base):
    v1 = View(base).filter(F.col("l_quantity") < 10)
    full = View(base)
    assert v1.union(full).df().count() == base.count()


def test_combine_requires_same_base(base, spark, sf_dir):
    other = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError):
        View(base).union(View(other))


def test_derived_column_then_filter(base):
    v = (
        View(base)
        .with_column("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .filter(F.col("rev") > 50000.0)
    )
    assert v.df().count() == base.filter(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) > 50000.0
    ).count()


def test_view_is_immutable(base):
    v1 = View(base)
    v2 = v1.filter(F.col("l_quantity") > 10)
    assert v1.predicates == () and len(v2.predicates) == 1


def test_registry_memoization(base):
    reg = ViewRegistry()
    vid = reg.add(View(base).filter(F.col("l_quantity") > 10))
    calls = []

    def compute():
        calls.append(1)
        return reg.get(vid).df().count()

    r1 = reg.memoized(vid, "count", compute)
    r2 = reg.memoized(vid, "count", compute)
    assert r1 == r2 and len(calls) == 1  # second call served from cache


# ---- property-based fuzz: combine algebra vs Python set semantics ----

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

# a predicate = (column, op, literal) over a small known domain
_pred = st.tuples(
    st.sampled_from(["a", "b"]),
    st.sampled_from(["<", ">=", "=="]),
    st.integers(min_value=-2, max_value=2),
)
_preds = st.lists(_pred, min_size=0, max_size=2)

_OPS = {
    "<": lambda x, v: x < v,
    ">=": lambda x, v: x >= v,
    "==": lambda x, v: x == v,
}


def _col_pred(p):
    c, op, v = p
    col = F.col(c)
    return {"<": col < v, ">=": col >= v, "==": col == v}[op]


def _py_rows(rows, preds):
    # Membership is boolean three-valued-logic collapsed: a predicate over
    # a NULL column is UNKNOWN -> the row is NOT a member.  This is the
    # semantics View.exclude must preserve (a row not in `other` stays).
    def _member(x, op, v):
        return x is not None and _OPS[op](x, v)

    return {
        i
        for i, (a, b) in enumerate(rows)
        if all(_member({"a": a, "b": b}[c], op, v) for c, op, v in preds)
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    preds1=_preds,
    preds2=_preds,
    combine=st.sampled_from(["union", "intersect", "exclude", "set_to"]),
)
def test_combine_fuzz_matches_set_semantics(spark, preds1, preds2, combine):
    # NULLs in the domain: before the round-11 exclude fix, any exclude
    # whose `other` predicate touched a null column silently dropped the
    # row (~NULL = NULL) instead of keeping it.
    domain = [None, *range(-2, 3)]
    rows = [(a, b) for a in domain for b in domain]
    base = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(rows)], "i int, a int, b int"
    )
    v1, v2 = View(base), View(base)
    for p in preds1:
        v1 = v1.filter(_col_pred(p))
    for p in preds2:
        v2 = v2.filter(_col_pred(p))
    s1, s2 = _py_rows(rows, preds1), _py_rows(rows, preds2)
    expected = {
        "union": s1 | s2,
        "intersect": s1 & s2,
        "exclude": s1 - s2,
        "set_to": s2,
    }[combine]
    got = {r["i"] for r in getattr(v1, combine)(v2).df().collect()}
    assert got == expected
