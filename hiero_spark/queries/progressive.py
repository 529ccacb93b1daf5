"""Driver-checkable evidence for the progressive layer.

`hiero_spark/progressive.py` emulates hiero's PartialResult stream as a
sequence of jobs over deterministic hash-slices. The unit tests assert
every emission; this query routes the layer's core claim — the FINAL
progressive_merge emission equals the exact whole-input sketch — through
the driver's DuckDB hash comparison (round-1 verdict item 8).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.progressive import progressive_merge
from hiero_spark.registry import query
from hiero_spark.queries._util import t


@query(
    "prog_merge_final",
    group="PROG",
    doc="progressive_merge final emission: per-returnflag counts and exact "
        "money sums built by sketching four disjoint hash-slices once each "
        "and merging the partials (the monoid merge). The oracle is the "
        "plain one-shot aggregation — hash equality IS the final==exact "
        "proof.",
    oracle="""
        SELECT l_returnflag,
               COUNT(*) AS cnt,
               (SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0) AS sum_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def prog_merge_final(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def partial(d):
        return d.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("_cents"),
        )

    def merge(d):
        return d.groupBy("l_returnflag").agg(
            F.sum("cnt").cast("long").alias("cnt"),
            (F.sum("_cents") / 100.0).alias("sum_price"),
        )

    final = None
    for _frac, merged in progressive_merge(
        li, partial, merge, ["l_orderkey", "l_linenumber"], tiers=4
    ):
        final = merged  # lazy: only the final emission is ever executed
    return final
