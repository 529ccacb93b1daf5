"""Driver-mimicking parity check: run a registered query on Spark AND its
DuckDB oracle, compare row count, column names, and order-insensitive
values. Stricter than necessary is fine — the goal is that if this passes,
the driver's hash comparison passes."""

from __future__ import annotations

import math


def normalize_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float identity is the goal; repr keeps full precision
        return repr(v)
    if isinstance(v, bool):
        return repr(v)
    if isinstance(v, int):
        return repr(float(v)) if False else repr(v)
    return str(v)


def rows_to_multiset(col_names, rows):
    """Sort columns by name (driver behavior), stringify, return sorted list."""
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = []
    for row in rows:
        out.append(tuple(normalize_value(row[i]) for i in order))
    return sorted(out)


def compare_query(spark, duck, spec, sf_dir) -> list[str]:
    """Returns a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sdf = spec.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    if spec.oracle is None:
        if not isinstance(srows, list):
            problems.append("no result")
        return problems
    drel = duck.sql(spec.oracle)
    drows = [tuple(r) for r in drel.fetchall()]
    dcols = list(drel.columns)
    if sorted(scols) != sorted(dcols):
        problems.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        return problems
    if len(srows) != len(drows):
        problems.append(f"row count differs: spark={len(srows)} duck={len(drows)}")
    sm = rows_to_multiset(scols, srows)
    dm = rows_to_multiset(dcols, drows)
    if sm != dm:
        diff_s = [r for r in sm if r not in set(dm)][:5]
        diff_d = [r for r in dm if r not in set(sm)][:5]
        problems.append(
            f"values differ; spark-only sample={diff_s} duck-only sample={diff_d}"
        )
    return problems
