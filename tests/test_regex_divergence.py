"""Regex dialect pins between the engines (round 11) — fifth file in the
divergence-pin series.

Spark compiles patterns with java.util.regex (backtracking: lookaround
and backreferences work); DuckDB compiles with RE2 (linear-time: both
are rejected as invalid input, BY DESIGN — RE2 guarantees no
exponential backtracking).  An oracle regex using lookaround or a
backreference doesn't mismatch, it kills the DuckDB arm.

The agreement surface covers what the engine's own regex paths use
(grok reader, P3 regex filters, PII scrubbing): character classes,
anchors, word boundaries, greedy and lazy quantifiers, alternation,
and Unicode property classes — all pinned identical.
"""

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_regex_agreement_surface(spark, con):
    cases = [
        ("a1b2", r"\d", True),
        ("a cat", r"\bcat\b", True),
        ("é", r"\p{L}", True),
        ("foo123", r"^[a-z]+\d+$", True),
        ("abc", r"a|z", True),
        ("aaa", r"^a{2,3}$", True),
    ]
    for text, pat, want in cases:
        s = spark.sql(
            "SELECT ? RLIKE ?", args=[text, pat]
        ).collect()[0][0]
        d = con.execute(
            "SELECT regexp_matches(?, ?)", [text, pat]
        ).fetchone()[0]
        assert s == d == want, (text, pat, s, d)
    # lazy quantifier extraction agrees too
    s = spark.sql("SELECT regexp_extract('aaa', 'a+?', 0)").collect()[0][0]
    d = con.execute("SELECT regexp_extract('aaa', 'a+?', 0)").fetchone()[0]
    assert s == d == "a"


def test_lookaround_and_backreference_diverge(spark, con):
    # Spark (java.util.regex): both evaluate
    assert spark.sql(r"SELECT 'foobar' RLIKE 'foo(?=bar)'").collect()[0][0]
    assert spark.sql(r"SELECT 'abab' RLIKE '(ab)\\1'").collect()[0][0]
    # DuckDB (RE2): both are invalid input, by design
    with pytest.raises(Exception):
        con.execute(r"SELECT regexp_matches('foobar', 'foo(?=bar)')")
    with pytest.raises(Exception):
        con.execute(r"SELECT regexp_matches('abab', '(ab)\1')")
