"""NextKSketch semantics: total order with mixed asc/desc, nulls, ties,
multiplicity (SURVEY.md §7.3 names this the #1 risk)."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.operators.pagination import after_predicate, next_k
from hiero_spark.views import RecordOrder


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 10.0),
        (1, "a", 10.0),   # duplicate -> multiplicity 2
        (1, "b", 9.0),
        (2, None, 5.0),   # null in order column
        (2, "a", None),
        (3, "c", 1.0),
        (None, "z", 2.0),
    ]
    return spark.createDataFrame(rows, "k int, s string, v double")


def brute_force_order(rows, order):
    def key(row):
        ks = []
        for name, asc in order.cols:
            v = row[name]
            # nulls first on asc, last on desc (engine convention)
            if asc:
                ks.append((0 if v is None else 1, v if v is not None else 0))
            else:
                import functools
                ks.append((0 if v is not None else 1,
                           _Neg(v) if v is not None else 0))
        return tuple(ks)
    return sorted(rows, key=key)


class _Neg:
    def __init__(self, v):
        self.v = v
    def __lt__(self, o):
        return self.v > o.v
    def __eq__(self, o):
        return self.v == o.v


def test_next_k_full_scan_matches_brute_force(df):
    order = RecordOrder((("k", True), ("s", False)))
    page = next_k(df, order, 100).collect()
    # distinct (k,s) pairs in order, with multiplicity
    got = [(r["k"], r["s"], r["row_multiplicity"]) for r in page]
    rows = [r.asDict() for r in df.collect()]
    from collections import Counter
    cnt = Counter((r["k"], r["s"]) for r in rows)
    expected_keys = brute_force_order(
        [dict(k=k, s=s) for (k, s) in cnt], order
    )
    expected = [(d["k"], d["s"], cnt[(d["k"], d["s"])]) for d in expected_keys]
    assert got == expected


def test_next_k_start_position_inclusive(df):
    order = RecordOrder((("k", True), ("s", True)))
    page = next_k(df, order, 10, start={"k": 2, "s": "a"}).collect()
    keys = [(r["k"], r["s"]) for r in page]
    assert keys[0] == (2, "a")       # inclusive of start
    assert (1, "a") not in keys      # earlier positions excluded
    assert (3, "c") in keys


def test_next_k_desc_start(df):
    order = RecordOrder((("v", False),))
    page = next_k(df, order, 10, start={"v": 9.0}).collect()
    vals = [r["v"] for r in page]
    assert vals[0] == 9.0
    assert 10.0 not in vals
    assert vals[-1] is None          # nulls last on desc


def test_after_predicate_null_start_asc(df):
    order = RecordOrder((("s", True),))
    kept = df.filter(after_predicate(order, {"s": None})).count()
    assert kept == df.count()        # null sorts first on asc -> everything after


def test_next_k_pagination_chain(df):
    """Paging through with k=2 visits every distinct key exactly once."""
    order = RecordOrder((("k", True), ("s", True)))
    seen = []
    start = None
    for _ in range(10):
        page = next_k(df, order, 2, start).collect()
        if not page:
            break
        for r in page:
            key = (r["k"], r["s"])
            if key not in seen:
                seen.append(key)
        last = page[-1]
        # next page starts strictly after the last row: emulate by asking
        # for rows >= last, then dropping the first if it equals last
        start = {"k": last["k"], "s": last["s"]}
        nxt = next_k(df, order, 3, start).collect()
        if len(nxt) <= 1:
            break
    all_keys = {(r["k"], r["s"]) for r in df.collect()}
    assert set(seen) == all_keys


# ---- property-based fuzz: next_k vs a Python total-order brute force ----

from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

_vals = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_rows = st.lists(st.tuples(_vals, _vals), min_size=1, max_size=25)
_dirs = st.tuples(st.booleans(), st.booleans())


def _key_fn(dirs):
    def key(t):
        ks = []
        for v, asc in zip(t, dirs):
            if asc:
                ks.append((0, 0) if v is None else (1, v))   # nulls first
            else:
                ks.append((1, 0) if v is None else (0, -v))  # nulls last
        return tuple(ks)

    return key


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_rows, dirs=_dirs, data=st.data())
def test_next_k_fuzz_matches_total_order(spark, rows, dirs, data):
    df = spark.createDataFrame(rows, "a int, b int")
    order = RecordOrder((("a", dirs[0]), ("b", dirs[1])))
    key = _key_fn(dirs)
    cnt = Counter(rows)
    ordered = sorted(cnt, key=key)
    start_t = data.draw(st.one_of(st.none(), st.sampled_from(ordered)))
    start = None if start_t is None else {"a": start_t[0], "b": start_t[1]}
    k = data.draw(st.integers(min_value=1, max_value=5))
    expected = [
        (t[0], t[1], cnt[t])
        for t in ordered
        if start_t is None or key(t) >= key(start_t)
    ][:k]
    got = [
        (r["a"], r["b"], r["row_multiplicity"])
        for r in next_k(df, order, k, start).collect()
    ]
    assert got == expected
