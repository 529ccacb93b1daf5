"""Declarative data-quality constraints (Deequ/dbt-test-shaped): declare
expectations on a table, get back a violations report — ONE aggregation
job regardless of how many checks run (the Deequ trick: every constraint
compiles to a mergeable aggregate, so N checks share one scan).

Supported constraints and their aggregate forms:
- not_null(col)              -> sum(col IS NULL)
- unique(cols...)            -> count(*) - count_distinct(cols)
- in_range(col, lo, hi)      -> sum(NOT col BETWEEN lo AND hi), nulls skip
- accepted_values(col, vals) -> sum(col NOT IN vals), nulls skip
- matches(col, regex)        -> sum(NOT col RLIKE regex), nulls skip

Null handling follows dbt: `not_null` is the ONLY null check — the other
constraints skip nulls so a nullable column doesn't double-report.  The
report is long-form (check, column, n_violations, passed), bounded by
the number of declared checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


class Checks:
    """Builder: chain constraints, then `report(df)` runs them in one job."""

    def __init__(self):
        self._checks: list[tuple[str, str, object]] = []

    def not_null(self, col: str) -> "Checks":
        self._checks.append(("not_null", col, None))
        return self

    def unique(self, *cols: str) -> "Checks":
        self._checks.append(("unique", ",".join(cols), list(cols)))
        return self

    def in_range(self, col: str, lo: float, hi: float) -> "Checks":
        self._checks.append(("in_range", col, (lo, hi)))
        return self

    def accepted_values(self, col: str, values: list) -> "Checks":
        self._checks.append(("accepted_values", col, list(values)))
        return self

    def matches(self, col: str, regex: str) -> "Checks":
        self._checks.append(("matches", col, regex))
        return self

    def _violations(self, kind: str, col: str, arg) -> Column:
        c = F.col(col.split(",")[0]) if kind != "unique" else None
        if kind == "not_null":
            return F.sum(c.isNull().cast("long"))
        if kind == "unique":
            cols = [F.col(x) for x in arg]
            # dbt semantics: null keys don't count as duplicates — compare
            # the fully-non-null row count against the distinct key count
            all_set = cols[0].isNotNull()
            for x in cols[1:]:
                all_set = all_set & x.isNotNull()
            return F.sum(all_set.cast("long")) - F.count_distinct(*cols)
        if kind == "in_range":
            lo, hi = arg
            return F.sum((~c.between(lo, hi)).cast("long"))
        if kind == "accepted_values":
            return F.sum((~c.isin(arg)).cast("long"))
        if kind == "matches":
            return F.sum((~c.rlike(arg)).cast("long"))
        raise ValueError(kind)

    def report(self, df: DataFrame) -> DataFrame:
        """(check, column, n_violations, passed) — one row per declared
        constraint, one scan total (single wide aggregation + explode,
        the same long-form shape as profile_table)."""
        if not self._checks:
            raise ValueError("no checks declared")
        aggs = [
            F.coalesce(self._violations(k, c, a), F.lit(0))
            .cast("long")
            .alias(f"_v{i}")
            for i, (k, c, a) in enumerate(self._checks)
        ]
        wide = df.agg(*aggs)
        structs = F.array(
            *[
                F.struct(
                    F.lit(k).alias("check"),
                    F.lit(c).alias("column"),
                    F.col(f"_v{i}").alias("n_violations"),
                    (F.col(f"_v{i}") == 0).alias("passed"),
                )
                for i, (k, c, a) in enumerate(self._checks)
            ]
        )
        return wide.select(F.explode(structs).alias("r")).select("r.*")
