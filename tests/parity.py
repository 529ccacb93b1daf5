"""Driver-mimicking parity check: run a registered query on Spark AND its
DuckDB oracle, compare row count, column names, dtypes, and
order-insensitive values.

Strictness contract (learned from round 1): the driver hashes values AFTER
a pandas conversion, which is type-sensitive — DuckDB returns HUGEINT for
SUM(<integer>), which pandas renders as float64 (139345.0), while Spark's
BIGINT stays int64 (139345); the stringified hashes differ even though the
numbers are equal. Round 1's repr-based normalization unified the two and
masked exactly that bug (q1_pricing_summary, a2_basic_col_stats).

So this harness now goes through the same pandas path on BOTH sides
(`sdf.toPandas()` / `duck_rel.df()`), keeps int and float distinct, and
additionally reports per-column dtype mismatches — a local pass implies a
driver pass.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def normalize_value(v):
    """Stringify one cell, keeping int vs float distinct (driver-strict)."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\x00NULL"  # pandas renders SQL NULL in numeric cols as NaN
    if isinstance(v, np.bool_):
        return repr(bool(v))
    if isinstance(v, np.integer):
        return repr(int(v))
    if isinstance(v, np.floating):
        return repr(float(v))  # float stays float: 139345.0 != "139345"
    if isinstance(v, (bool, int, float)):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(normalize_value(x) for x in v) + "]"
    return str(v)


def frame_to_multiset(df: pd.DataFrame):
    """Sort columns by name (driver behavior), stringify, return sorted list."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(normalize_value(v) for v in row))
    return sorted(out)


def dtype_report(sdf_pd: pd.DataFrame, ddf_pd: pd.DataFrame) -> list[str]:
    """Per-column dtype comparison; an int64-vs-float64 split here is the
    HUGEINT mine that sank q1 in round 1."""
    problems = []
    for c in sorted(sdf_pd.columns):
        sk, dk = sdf_pd[c].dtype.kind, ddf_pd[c].dtype.kind
        # object dtype (strings, dates rendered as objects) compares by value
        if "O" in (sk, dk):
            continue
        # datetime64 units may differ (ns vs us) — same kind is fine
        if sk != dk:
            problems.append(
                f"dtype mismatch on '{c}': spark={sdf_pd[c].dtype} duck={ddf_pd[c].dtype}"
            )
    return problems


def compare_query(spark, duck, spec, sf_dir) -> list[str]:
    """Returns a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    sdf = spec.fn(spark, sf_dir)
    sdf_pd = sdf.toPandas()
    if spec.oracle is None:
        return problems  # rows-only query: materializing without error is the check
    ddf_pd = duck.sql(spec.oracle).df()
    if sorted(sdf_pd.columns) != sorted(ddf_pd.columns):
        problems.append(
            f"columns differ: spark={sorted(sdf_pd.columns)} duck={sorted(ddf_pd.columns)}"
        )
        return problems
    if len(sdf_pd) != len(ddf_pd):
        problems.append(f"row count differs: spark={len(sdf_pd)} duck={len(ddf_pd)}")
    problems.extend(dtype_report(sdf_pd, ddf_pd))
    sm = frame_to_multiset(sdf_pd)
    dm = frame_to_multiset(ddf_pd)
    if sm != dm:
        diff_s = [r for r in sm if r not in set(dm)][:5]
        diff_d = [r for r in dm if r not in set(sm)][:5]
        problems.append(
            f"values differ; spark-only sample={diff_s} duck-only sample={diff_d}"
        )
    return problems
