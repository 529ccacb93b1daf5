"""Flagship analytical queries (SURVEY.md §7.1 step 0).

TPC-H-shaped queries over the star schema — these exercise scan, filter,
join (broadcast + shuffle), group-agg, and top-k in one plan and are the
headline bench queries. The reference has no joins (SURVEY.md §2.3); these
are declared engine extensions.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.registry import query
from hiero_spark.queries._util import day_str, money_sum, money_sum_sql, t


@query(
    "q1_pricing_summary",
    group="flagship",
    doc="TPC-H Q1: pricing summary report over lineitem (scan+filter+group agg).",
    oracle=f"""
        SELECT
          l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)       AS sum_qty,
          {money_sum_sql('l_extendedprice')}                    AS sum_base_price,
          {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_price,
          {money_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 1000000)} AS sum_charge,
          ROUND(AVG(l_quantity), 6)                             AS avg_qty,
          ROUND(AVG(l_extendedprice), 4)                        AS avg_price,
          ROUND(AVG(l_discount), 6)                             AS avg_disc,
          COUNT(*)                                              AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    ep, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            money_sum(ep).alias("sum_base_price"),
            money_sum(ep * (1 - disc), 10000).alias("sum_disc_price"),
            money_sum(ep * (1 - disc) * (1 + tax), 1000000).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    group="flagship",
    doc="TPC-H Q3 (adapted): top-10 unshipped orders by revenue; "
        "broadcast dim join + shuffle join + agg + top-k.",
    oracle=f"""
        SELECT
          l_orderkey,
          {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS revenue,
          strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF: no forced broadcast, AQE decides
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
        .select("l_orderkey", "revenue", day_str(F.col("o_orderdate")).alias("orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    group="flagship",
    doc="TPC-H Q5 (adapted): revenue by nation for one region where the "
        "supplier and customer share a nation; 6-table join.",
    oracle=f"""
        SELECT
          n_name,
          {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
    )


@query(
    "q4_order_priority",
    group="flagship",
    doc="TPC-H Q4 (adapted to the slim schema): order counts per priority for "
        "orders with at least one lineitem shipped >60 days after the order "
        "date — a non-equi left-semi join (EXISTS).",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q6_forecast_revenue",
    group="flagship",
    doc="TPC-H Q6: forecast revenue change — pure scan+pushed-filter+agg, the "
        "canonical predicate-pushdown probe.",
    oracle=f"""
        SELECT {money_sum_sql('l_extendedprice * l_discount', 10000)} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias("revenue"))
    )


@query(
    "q10_returned_items",
    group="flagship",
    doc="TPC-H Q10 (adapted): top-20 customers by revenue lost to returns in "
        "a quarter — fact-fact shuffle join + broadcast dims + agg + top-k.",
    oracle=f"""
        SELECT c_custkey, c_name,
               {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    joined = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q7_nation_volume",
    group="flagship",
    doc="TPC-H Q7 (adapted): shipping volume between customer-nation and "
        "supplier-nation pairs — two fact joins, two broadcast dim joins, "
        "grouped agg over the pair.",
    oracle=f"""
        SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name <> sn.n_name
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    """,
)
def q7_nation_volume(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
    )
    return joined.groupBy("cust_nation", "supp_nation").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue")
    )


@query(
    "q14_promo_revenue",
    group="flagship",
    doc="TPC-H Q14: promo revenue share — conditional aggregation over a "
        "fact-dim join (part is broadcast).",
    oracle=f"""
        SELECT
          ROUND(100.0 * {money_sum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 10000)}
                      / {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)}, 6) AS promo_share
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return joined.agg(
        F.round(100.0 * money_sum(promo, 10000) / money_sum(rev, 10000), 6).alias(
            "promo_share"
        )
    )


@query(
    "q18_large_orders",
    group="flagship",
    doc="TPC-H Q18: customers with orders above a quantity threshold — "
        "HAVING-style agg used as a semi-join filter on the fact table.",
    oracle="""
        WITH big AS (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
        )
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice,
               CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM big)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
)
def q18_large_orders(spark, sf_dir):
    # The HAVING aggregate already holds each big order's total quantity, so
    # it joins back directly — the naive form (semi-join filter, then re-join
    # lineitem and re-aggregate) scans and shuffles the fact table twice for
    # numbers the first pass computed.  One scan, one agg, two dim joins.
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    joined = big.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.select(
            "c_name", "c_custkey", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", F.col("_qty").cast("long").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q19_disjunctive_join",
    group="flagship",
    doc="TPC-H Q19 (adapted): revenue under a disjunction of brand/size/"
        "quantity predicate bundles — the disjunctive join-filter shape.",
    oracle=f"""
        SELECT {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)} AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity >= 1 AND l_quantity <= 20)
           OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
               AND l_quantity >= 10 AND l_quantity <= 30)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
               AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_join(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#7") & s.between(10, 30) & q.between(10, 30))
        | ((b == "Brand#13") & s.between(20, 50) & q.between(20, 40))
    )
    return j.filter(pred).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000).alias("revenue")
    )


@query(
    "q13_customer_distribution",
    group="flagship",
    doc="TPC-H Q13 (adapted): distribution of order counts per customer — "
        "LEFT OUTER join keeping order-less customers, then a double "
        "aggregation (per-customer count, then histogram of counts).",
    oracle="""
        WITH c_orders AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer
          LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count(col): nulls excluded
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    group="flagship",
    doc="TPC-H Q15: supplier(s) with maximum quarterly revenue — aggregate, "
        "then a scalar-subquery max joined back (broadcast of a 1-row "
        "aggregate; revenue equality compared on exact scaled cents).",
    oracle="""
        WITH rev AS (
          SELECT l_suppkey AS supplier_no,
                 SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS rev_exact
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, (rev_exact / 10000.0) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = supplier_no
        WHERE rev_exact = (SELECT MAX(rev_exact) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    sup = t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
                .cast("long")
            ).alias("rev_exact")
        )
    )
    top = rev.agg(F.max("rev_exact").alias("_max_rev"))
    return (
        sup.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(top))
        .filter(F.col("rev_exact") == F.col("_max_rev"))
        .select(
            "s_suppkey", "s_name", (F.col("rev_exact") / 10000.0).alias("total_revenue")
        )
    )


@query(
    "q22_global_sales_opportunity",
    group="flagship",
    doc="TPC-H Q22 (adapted): per-nation count and balance total of "
        "above-average-balance customers with no order since 2000 — scalar "
        "subquery threshold (computed in exact cents so the comparison is "
        "bit-identical across engines) plus a LEFT ANTI join. (Classic Q22 "
        "uses never-ordered customers; this corpus has none, which would "
        "hash an empty result.)",
    oracle="""
        WITH ab AS (
          SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               (SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0) AS totacctbal
        FROM customer, ab
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    ab = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long")) / 100.0
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    rich = cust.join(F.broadcast(ab)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    never_ordered = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return never_ordered.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        money_sum(F.col("c_acctbal")).alias("totacctbal"),
    )


@query(
    "q2_best_supplier",
    group="flagship",
    doc="TPC-H Q2 (adapted to the reduced schema: lineitem links parts to "
        "suppliers): for size-10 parts, the top-balance supplier shipping "
        "each part — the correlated-max shape rewritten as a window max "
        "over the distinct (part, supplier) pairs.",
    oracle="""
        WITH ps AS (
          SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem
        ), ranked AS (
          SELECT p_partkey, p_name, s_name, s_acctbal,
                 MAX(s_acctbal) OVER (PARTITION BY p_partkey) AS best_bal
          FROM part
          JOIN ps ON p_partkey = partkey
          JOIN supplier ON s_suppkey = suppkey
          WHERE p_size = 10
        )
        SELECT p_partkey, p_name, s_name, s_acctbal
        FROM ranked WHERE s_acctbal = best_bal
        ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        LIMIT 10
    """,
)
def q2_best_supplier(spark, sf_dir):
    from pyspark.sql.window import Window

    ps = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    sup = t(spark, sf_dir, "supplier")
    joined = part.join(ps, F.col("p_partkey") == F.col("partkey")).join(
        sup, F.col("s_suppkey") == F.col("suppkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("_best", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("_best"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"), F.asc("s_name"))
        .limit(10)
    )
