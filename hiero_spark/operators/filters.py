"""Filter / predicate family (SURVEY.md §2.2, P1–P8).

hiero filters are `IMap`s producing a new membership set over unchanged
columns (`maps/FilterMap.java`, `table/filters/StringFilterDescription.java`).
Here each helper returns a `Column` predicate, composable through
`views.View.filter` — Catalyst collapses the stack and pushes it into the
parquet scan (check: `PushedFilters` in .explain("formatted")).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, cols: list[str]) -> DataFrame:
    """P1 `ITable.project`: keep a subset of the schema (column pruning —
    reaches the parquet ReadSchema for free)."""
    return df.select(*cols)


def range_filter(col: str, lo, hi, include_lo: bool = True, include_hi: bool = True) -> Column:
    """P2 RangeFilterDescription: col ∈ [lo, hi] (histogram brush selection)."""
    c = F.col(col)
    lo_p = (c >= lo) if include_lo else (c > lo)
    hi_p = (c <= hi) if include_hi else (c < hi)
    return lo_p & hi_p


def string_filter(
    col: str,
    value: str,
    mode: str = "equals",  # equals | substring | prefix | regex
    case_sensitive: bool = True,
) -> Column:
    """P3 StringFilterDescription: equality / substring / prefix / regex,
    with a case-sensitivity flag."""
    c = F.col(col)
    v = value
    if not case_sensitive and mode != "regex":
        c, v = F.lower(c), value.lower()
    if mode == "equals":
        return c == v
    if mode == "substring":
        return c.contains(v)
    if mode == "prefix":
        return c.startswith(v)
    if mode == "regex":
        pat = f"(?i){value}" if not case_sensitive else value
        return F.col(col).rlike(pat)
    raise ValueError(f"unknown string filter mode {mode!r}")


def missing_filter(col: str, keep_missing: bool = False) -> Column:
    """P4: keep or drop nulls."""
    c = F.col(col)
    return c.isNull() if keep_missing else c.isNotNull()


def row_equality_filter(row: dict) -> Column:
    """P5 RowSnapshot filter: rows equal to a clicked row on selected columns.

    Null-safe equality (<=>) so a null cell matches null rows, matching
    hiero's snapshot semantics.
    """
    pred = F.lit(True)
    for name, value in row.items():
        pred = pred & F.col(name).eqNullSafe(F.lit(value))
    return pred


def comparison_filter(col: str, op: str, value) -> Column:
    """P7: typed comparison against a literal."""
    c = F.col(col)
    ops = {
        "<": c < value, "<=": c <= value, ">": c > value,
        ">=": c >= value, "==": c == value, "!=": c != value,
    }
    if op not in ops:
        raise ValueError(f"unknown comparison {op!r}")
    return ops[op]
