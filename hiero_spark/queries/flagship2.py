"""Second batch of TPC-H-shaped flagship queries (Q8/Q9/Q11/Q12/Q16/Q17/
Q20/Q21 adaptations).

The testdata schema is TPC-H-reduced — no partsupp table, no
l_shipmode/l_commitdate/l_receiptdate — so each query keeps its
characteristic PLAN SHAPE (the thing that matters at 100 TB) while
substituting available columns:

- Q8  market-share ratio over a 5-way join, conditional aggregation;
- Q9  profit by (nation, year) with a cost proxy (p_retailprice);
- Q11 global-fraction HAVING via a broadcast scalar aggregate;
- Q12 ship-lag classification (shipdate - orderdate) per line status;
- Q16 distinct-supplier variety count with exclusion filters;
- Q17 per-part average used as a correlated threshold (small-quantity);
- Q20 nested semi-join chain (part filter -> qty HAVING -> supplier);
- Q21 exists + not-exists double correlation (last supplier to ship on
  multi-supplier finished orders).

Money sums use the scaled-bigint trick from queries/_util.py so Spark and
DuckDB hash bit-identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.registry import query
from hiero_spark.queries._util import money_sum, money_sum_sql, t


@query(
    "q8_market_share",
    group="flagship",
    doc="TPC-H Q8 (adapted): NATION_3 suppliers' revenue share of PROMO-type "
        "parts sold to region AMERICA customers, by order year. 5-way join "
        "(two broadcast dims), conditional-ratio aggregation.",
    oracle=f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               ROUND(
                 {money_sum_sql("CASE WHEN sn.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 10000)}
                 / {money_sum_sql('l_extendedprice * (1 - l_discount)', 10000)}, 6) AS mkt_share
        FROM lineitem
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part      ON l_partkey = p_partkey
        WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
        GROUP BY 1
    """,
)
def q8_market_share(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.round(money_sum(target, 10000) / money_sum(rev, 10000), 6).alias("mkt_share")
    )


@query(
    "q9_product_profit",
    group="flagship",
    doc="TPC-H Q9 (adapted): profit on 'red' parts by supplier nation and "
        "order year. No partsupp table in this schema, so supply cost is "
        "proxied as 0.5 * p_retailprice * l_quantity — the join/agg shape "
        "(fact + two dims + date extract, grouped two ways) is Q9's. "
        "Round-3 verdict: TPC-H's canonical 'green' matches zero synthetic "
        "part names, making the green vacuously empty — 'red' (257 parts "
        "at sf0.01) exercises the arithmetic and grouping for real.",
    oracle=f"""
        SELECT sn.n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               {money_sum_sql('l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity', 10000)} AS profit
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE contains(p_name, 'red')
        GROUP BY 1, 2
    """,
)
def q9_product_profit(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    nation = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return joined.groupBy(
        "nation", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(money_sum(profit, 10000).alias("profit"))


@query(
    "q11_important_parts",
    group="flagship",
    doc="TPC-H Q11 (adapted, no partsupp): parts whose shipped value from "
        "NATION_5 suppliers exceeds 0.1% of that nation's total — the "
        "global-fraction HAVING realized as a broadcast scalar aggregate "
        "joined back (one extra tiny join, no second scan of the grouped "
        "data; the fact table is scanned twice, once per aggregate — at "
        "100 TB you'd cache the filtered join or compute both in one pass).",
    oracle=f"""
        WITH joined AS (
          SELECT l_partkey AS partkey,
                 l_quantity * p_retailprice AS val
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN part     ON l_partkey = p_partkey
          WHERE n_name = 'NATION_5'
        ), tot AS (
          SELECT {money_sum_sql('val', 100)} AS total FROM joined
        )
        SELECT partkey, {money_sum_sql('val', 100)} AS part_value
        FROM joined, tot
        GROUP BY partkey, total
        HAVING {money_sum_sql('val', 100)} > total * 0.001
    """,
)
def q11_important_parts(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    part = t(spark, sf_dir, "part")
    joined = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("l_partkey").alias("partkey"),
            (F.col("l_quantity") * F.col("p_retailprice")).alias("val"),
        )
    )
    per_part = joined.groupBy("partkey").agg(money_sum(F.col("val"), 100).alias("part_value"))
    total = joined.agg(money_sum(F.col("val"), 100).alias("_total"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_total") * 0.001)
        .select("partkey", "part_value")
    )


@query(
    "q12_ship_lag",
    group="flagship",
    doc="TPC-H Q12 (adapted, no shipmode/commitdate): lines shipped more "
        "than 60 days after the order date, classified by line status and "
        "order-priority class — join + date_diff + conditional counts.",
    oracle="""
        SELECT l_linestatus,
               COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
                 AS high_line_count,
               COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
                 AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', o_orderdate, l_shipdate) > 60
        GROUP BY 1
    """,
)
def q12_ship_lag(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.count(F.when(high, 1)).alias("high_line_count"),
        F.count(F.when(~high, 1)).alias("low_line_count"),
    )


@query(
    "q16_part_variety",
    group="flagship",
    doc="TPC-H Q16 (adapted, no partsupp): distinct suppliers who shipped "
        "each (brand, type, size) combination, excluding Brand#4 and PROMO "
        "parts — exclusion filters + distinct-count aggregation.",
    oracle="""
        SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#4' AND p_type <> 'PROMO' AND p_size <= 10
        GROUP BY 1, 2, 3
    """,
)
def q16_part_variety(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 10)
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.groupBy(
        "p_brand", "p_type", F.col("p_size").cast("long").alias("p_size")
    ).agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))


@query(
    "q17_small_quantity_revenue",
    group="flagship",
    doc="TPC-H Q17: average yearly revenue lost if small-quantity orders "
        "(below 20% of the part's average quantity) were not taken, for "
        "Brand#2 parts. The correlated per-part average becomes a grouped "
        "aggregate joined back on the part key — no correlated subquery, "
        "no re-scan per row.",
    oracle=f"""
        WITH li AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#2'
        ), avgq AS (
          SELECT l_partkey AS a_partkey, AVG(l_quantity) AS avg_qty
          FROM li GROUP BY 1
        )
        SELECT ROUND({money_sum_sql('l_extendedprice', 100)} / 7.0, 2) AS avg_yearly
        FROM li JOIN avgq ON l_partkey = a_partkey
        WHERE l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = joined.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    small = joined.join(
        F.broadcast(avgq), F.col("l_partkey") == F.col("a_partkey")
    ).filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    return small.agg(
        F.round(money_sum(F.col("l_extendedprice"), 100) / 7.0, 2).alias("avg_yearly")
    )


@query(
    "q20_green_part_suppliers",
    group="flagship",
    doc="TPC-H Q20 (adapted, no partsupp): suppliers in NATION_7 who "
        "shipped more than 40 units of 'red' parts during 1996 — the "
        "nested semi-join chain (part filter -> per-(supplier, part) "
        "quantity HAVING -> supplier semi-join) that must never become a "
        "cartesian or a row-duplicating inner join. ('red' not 'green': "
        "zero 'green' parts exist in the synthetic names, which made the "
        "round-2 green row vacuous — round-3 verdict item 2.)",
    oracle="""
        WITH red AS (
          SELECT p_partkey FROM part WHERE contains(p_name, 'red')
        ), heavy AS (
          SELECT l_suppkey
          FROM lineitem JOIN red ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(l_quantity) > 40
        )
        SELECT DISTINCT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN heavy ON s_suppkey = l_suppkey
        WHERE n_name = 'NATION_7'
    """,
)
def q20_green_part_suppliers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red = t(spark, sf_dir, "part").filter(F.col("p_name").contains("red")).select(
        "p_partkey"
    )
    heavy = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 40)
        .select("l_suppkey")
    )
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q21_waiting_suppliers",
    group="flagship",
    doc="TPC-H Q21 (adapted, no receipt/commit dates): for finished ('F') "
        "multi-supplier orders, count per supplier the orders where THEY "
        "were the last to ship — EXISTS (another supplier on the order) "
        "as a semi-join and NOT EXISTS (anyone shipping later) as an "
        "anti-join, both correlated on the order key; no row duplication.",
    oracle="""
        WITH l1 AS (
          SELECT l_orderkey, l_suppkey, l_shipdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l1 one
              WHERE EXISTS (SELECT 1 FROM l1 two
                            WHERE two.l_orderkey = one.l_orderkey
                              AND two.l_suppkey <> one.l_suppkey)
                AND NOT EXISTS (
                        SELECT 1 FROM l1 three
                        WHERE three.l_orderkey = one.l_orderkey
                          AND three.l_suppkey <> one.l_suppkey
                          AND three.l_shipdate > (
                              SELECT MAX(four.l_shipdate) FROM l1 four
                              WHERE four.l_orderkey = one.l_orderkey
                                AND four.l_suppkey = one.l_suppkey))
             ) w
        JOIN supplier ON w.l_suppkey = s_suppkey
        GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # per (order, supplier): that supplier's latest ship date on the order
    per_supp = l1.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("_my_last")
    )
    other = l1.select(
        F.col("l_orderkey").alias("o_key"),
        F.col("l_suppkey").alias("o_supp"),
        F.col("l_shipdate").alias("o_ship"),
    )
    # EXISTS another supplier on the same order
    exists_cond = (F.col("l_orderkey") == F.col("o_key")) & (
        F.col("l_suppkey") != F.col("o_supp")
    )
    waited = per_supp.join(other, exists_cond, "left_semi")
    # NOT EXISTS another supplier shipping after my last line
    late_cond = exists_cond & (F.col("o_ship") > F.col("_my_last"))
    last_to_ship = waited.join(other, late_cond, "left_anti")
    supp = t(spark, sf_dir, "supplier")
    return (
        last_to_ship.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
