"""Filter/projection/combine demo queries (SURVEY.md §2.2 P1–P8, §2.7 V1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.operators import filters as fl
from hiero_spark.operators import sketches as sk
from hiero_spark.registry import query
from hiero_spark.queries._util import t
from hiero_spark.views import View


@query(
    "p1_project",
    group="P1",
    doc="ITable.project: column subset (pruned at the parquet scan).",
    oracle="SELECT n_nationkey, n_name FROM nation",
)
def p1_project(spark, sf_dir):
    return fl.project(t(spark, sf_dir, "nation"), ["n_nationkey", "n_name"])


@query(
    "p2_range_filter",
    group="P2",
    doc="Range filter (histogram brush): l_quantity ∈ [10, 20].",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_quantity >= 10 AND l_quantity <= 20
    """,
)
def p2_range_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .filter(fl.range_filter("l_quantity", 10, 20))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "p2_date_range_filter",
    group="P2",
    doc="Date-range filter over l_shipdate.",
    oracle="""
        SELECT l_orderkey, l_linenumber FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <= TIMESTAMP '1997-06-30 00:00:00'
    """,
)
def p2_date_range_filter(spark, sf_dir):
    pred = fl.range_filter(
        "l_shipdate",
        F.lit("1997-01-01 00:00:00").cast("timestamp"),
        F.lit("1997-06-30 00:00:00").cast("timestamp"),
    )
    return t(spark, sf_dir, "lineitem").filter(pred).select("l_orderkey", "l_linenumber")


@query(
    "p3_string_substring_ci",
    group="P3",
    doc="String filter: case-insensitive substring match.",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE contains(lower(p_name), 'widget')
    """,
)
def p3_string_substring_ci(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(fl.string_filter("p_name", "WIDGET", mode="substring", case_sensitive=False))
        .select("p_partkey", "p_name")
    )


@query(
    "p3_string_regex",
    group="P3",
    doc="String filter: regex match (anchored alternation).",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
    """,
)
def p3_string_regex(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(fl.string_filter("p_name", "^(red|blue) (bolt|gear)$", mode="regex"))
        .select("p_partkey", "p_name")
    )


@query(
    "p3_string_prefix",
    group="P3",
    doc="String filter: prefix match.",
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'small%'",
)
def p3_string_prefix(spark, sf_dir):
    return (
        t(spark, sf_dir, "part")
        .filter(fl.string_filter("p_name", "small", mode="prefix"))
        .select("p_partkey", "p_name")
    )


@query(
    "p4_missing_filter",
    group="P4",
    doc="Missing-value filter: drop rows with null o_totalprice.",
    oracle="SELECT o_orderkey FROM orders WHERE o_totalprice IS NOT NULL",
)
def p4_missing_filter(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .filter(fl.missing_filter("o_totalprice"))
        .select("o_orderkey")
    )


@query(
    "p5_row_equality",
    group="P5",
    doc="Row-snapshot equality filter (click a row, filter to equals).",
    oracle="""
        SELECT COUNT(*) AS match_count FROM lineitem
        WHERE l_returnflag = 'R' AND l_linestatus = 'F' AND l_quantity = 25.0
    """,
)
def p5_row_equality(spark, sf_dir):
    pred = fl.row_equality_filter(
        {"l_returnflag": "R", "l_linestatus": "F", "l_quantity": 25.0}
    )
    return t(spark, sf_dir, "lineitem").filter(pred).agg(
        F.count(F.lit(1)).alias("match_count")
    )


@query(
    "p6_heavy_hitter_filter",
    group="P6",
    doc="Keep rows whose p_brand is in the exact top-3 (broadcast semi join).",
    oracle="""
        SELECT p_partkey, p_brand FROM part
        WHERE p_brand IN (
          SELECT p_brand FROM (
            SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
            ORDER BY cnt DESC, p_brand ASC LIMIT 3
          )
        )
    """,
)
def p6_heavy_hitter_filter(spark, sf_dir):
    return sk.heavy_hitter_filter(t(spark, sf_dir, "part"), ["p_brand"], 3).select(
        "p_partkey", "p_brand"
    )


@query(
    "p7_comparison",
    group="P7",
    doc="Typed comparison filter against a literal.",
    oracle="SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0",
)
def p7_comparison(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .filter(fl.comparison_filter("c_acctbal", ">", 5000.0))
        .select("c_custkey", "c_acctbal")
    )


# -- V1: combine views (membership-set algebra on one base table) ----------

def _two_views(spark, sf_dir):
    base = t(spark, sf_dir, "lineitem")
    v1 = View(base).filter(F.col("l_quantity") < 5)
    v2 = View(base).filter(F.col("l_discount") > 0.08)
    return v1, v2


@query(
    "v1_combine_union",
    group="V1",
    doc="Combine/Union of two views of the same base (zero-copy predicate OR).",
    oracle="""
        SELECT COUNT(*) AS row_count FROM lineitem
        WHERE l_quantity < 5 OR l_discount > 0.08
    """,
)
def v1_combine_union(spark, sf_dir):
    v1, v2 = _two_views(spark, sf_dir)
    return v1.union(v2).df().agg(F.count(F.lit(1)).alias("row_count"))


@query(
    "v1_combine_intersect",
    group="V1",
    doc="Combine/Intersection of two views (predicate AND).",
    oracle="""
        SELECT COUNT(*) AS row_count FROM lineitem
        WHERE l_quantity < 5 AND l_discount > 0.08
    """,
)
def v1_combine_intersect(spark, sf_dir):
    v1, v2 = _two_views(spark, sf_dir)
    return v1.intersect(v2).df().agg(F.count(F.lit(1)).alias("row_count"))


@query(
    "v1_combine_exclude",
    group="V1",
    doc="Combine/Exclude: rows in view1 but not view2 (predicate AND NOT).",
    oracle="""
        SELECT COUNT(*) AS row_count FROM lineitem
        WHERE l_quantity < 5 AND NOT (l_discount > 0.08)
    """,
)
def v1_combine_exclude(spark, sf_dir):
    v1, v2 = _two_views(spark, sf_dir)
    return v1.exclude(v2).df().agg(F.count(F.lit(1)).alias("row_count"))
