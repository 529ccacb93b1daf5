"""Expression edge-semantics pins between the engines (round 11).

Fourth file in the divergence-pin series (unicode, numeric, calendar —
see those modules' docstrings for the rationale: the boundary where
"oracle-verifiable" is trustworthy, kept as failing tests, not lore).

Divergences pinned here:

* ``CAST('4.9' AS INT)`` — ANSI Spark refuses a fractional string
  (NumberFormatException); DuckDB parses and ROUNDS to 5.  A string-
  typed numeric column cast to int in an oracle can silently differ.
* array sort null placement — Spark's ``sort_array`` puts NULLs FIRST,
  DuckDB's ``list_sort`` puts them LAST by default (pass 'NULLS FIRST'
  explicitly on the DuckDB side to mirror).
* ``substr(s, 0, n)`` — Spark treats position 0 like position 1 and
  returns n chars; DuckDB lets the zero position consume length and
  returns n-1.  1-indexed calls agree; never emit position 0.

Agreements pinned (safe to lean on): whitespace-trimmed integer casts,
``'a' || NULL`` is NULL, negative substr positions count from the end,
``split`` keeps the trailing empty field, greatest/least skip NULLs,
BOOLEAN->INT is 0/1, and a plain non-numeric cast errors in both.
"""

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _s(spark, expr):
    return spark.sql(f"SELECT {expr}").collect()[0][0]


def _d(con, expr):
    return con.execute(f"SELECT {expr}").fetchone()[0]


def test_fractional_string_to_int_cast_diverges(spark, con):
    with pytest.raises(Exception):
        _s(spark, "CAST('4.9' AS INT)")  # ANSI: refuses
    assert _d(con, "CAST('4.9' AS INT)") == 5  # DuckDB: parses + rounds


def test_array_sort_null_placement_diverges(spark, con):
    assert _s(spark, "sort_array(array(3, NULL, 1))") == [None, 1, 3]
    assert _d(con, "list_sort([3, NULL, 1])") == [1, 3, None]
    # the mirroring spelling for oracles:
    assert _d(con, "list_sort([3, NULL, 1], 'ASC', 'NULLS FIRST')") == [
        None, 1, 3,
    ]


def test_substr_position_zero_diverges(spark, con):
    assert _s(spark, "substr('hello', 0, 3)") == "hel"  # 0 treated as 1
    assert _d(con, "substr('hello', 0, 3)") == "he"  # 0 consumes length
    # 1-indexed agrees — the only form oracles should use
    assert _s(spark, "substr('hello', 1, 3)") == _d(
        con, "substr('hello', 1, 3)"
    ) == "hel"


def test_expression_agreement_surface(spark, con):
    for expr in (
        "CAST(' 42 ' AS INT)",
        "CAST(TRUE AS INT)",
        "'a' || NULL",
        "substr('hello', -3, 2)",
        "greatest(1, NULL, 3)",
    ):
        assert repr(_s(spark, expr)) == repr(_d(con, expr)), expr
    assert _s(spark, "split('a,b,', ',')") == _d(
        con, "string_split('a,b,', ',')"
    ) == ["a", "b", ""]
    with pytest.raises(Exception):
        _s(spark, "CAST('abc' AS INT)")
    with pytest.raises(Exception):
        _d(con, "CAST('abc' AS INT)")


def test_json_extraction_agreement_pinned(spark, con):
    """get_json_object vs json_extract_string (the F3 oracle pairing):
    full agreement pinned — scalar fields come back as bare strings,
    array indexing matches, a MISSING path and a JSON null BOTH map to
    SQL NULL (the subtle one), and object extraction serializes
    compactly and identically ('{"c":"x"}')."""
    doc = (
        '{"a": 1, "b": {"c": "x"}, "arr": [10, 20], '
        '"s": "hi", "n": null, "f": 1.5}'
    )
    for path, want in [
        ("$.a", "1"), ("$.b.c", "x"), ("$.arr[1]", "20"),
        ("$.zz", None), ("$.n", None), ("$.f", "1.5"),
        ("$.b", '{"c":"x"}'),
    ]:
        s = _s(spark, f"get_json_object('{doc}', '{path}')")
        d = _d(con, f"json_extract_string('{doc}', '{path}')")
        assert s == d == want, (path, s, d)
