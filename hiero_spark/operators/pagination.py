"""Next-K pagination — hiero's table view (SURVEY.md §2.6 O1, A13).

`sketches/NextKSketch.java`: given a RecordOrder and a start row snapshot,
return the next K *distinct* rows at-or-after the start position in the
virtual total order, each with its duplicate count. The table is never
physically sorted; each worker contributes its local candidates and the
tree merge keeps K.

Spark translation: lexicographic-≥ predicate (pushable, prunes most rows
at the scan) -> groupBy(order cols) for distinct+multiplicity ->
orderBy().limit(K) (TakeOrderedAndProject: per-partition top-K, merge of
K-row partials — the same "never full sort" property as NextKSketch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hiero_spark.views import RecordOrder


def after_predicate(order: RecordOrder, start: dict) -> Column:
    """Lexicographic `row >= start` over mixed asc/desc columns.

    Built as the standard nested expansion:
      (c1 > v1) or (c1 == v1 and (c2 > v2 or (c2 == v2 and ...)))
    with > flipped to < for descending columns. Equality on the last level
    keeps the start row itself (NextK is inclusive of the start position).
    Nulls: a null start value sorts per the order's null convention; we use
    eqNullSafe for the equality legs so nulls chain correctly.
    """
    cols = list(order.cols)

    def build(i: int) -> Column:
        name, asc = cols[i]
        c = F.col(name)
        v = start[name]
        if v is None:
            # start is null: null sorts first when asc -> everything is >=;
            # when desc, only nulls and nothing else follow (nulls last).
            strictly_after = F.lit(False) if not asc else c.isNotNull()
        else:
            strictly_after = (c > v) if asc else (c < v)
            if asc:
                pass  # nulls-first: null is before any value, never after
            else:
                strictly_after = strictly_after | c.isNull()  # nulls-last
        eq = c.eqNullSafe(F.lit(v))
        if i == len(cols) - 1:
            return strictly_after | eq
        return strictly_after | (eq & build(i + 1))

    return build(0)


def next_k(
    df: DataFrame, order: RecordOrder, k: int, start: dict | None = None
) -> DataFrame:
    """O1/A13: next K distinct rows (by the order columns) with multiplicity."""
    if start is not None:
        df = df.filter(after_predicate(order, start))
    names = [name for name, _ in order.cols]
    return (
        df.groupBy(*names)
        .agg(F.count(F.lit(1)).alias("row_multiplicity"))
        .orderBy(*order.to_columns())
        .limit(k)
    )
