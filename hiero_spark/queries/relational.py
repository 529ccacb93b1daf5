"""Relational extensions (SURVEY.md §2.3/§2.5/§2.6/§2.7 engine decisions).

The reference has no joins, windows, general group-bys, or relational set
ops — all declared extensions here, implemented as plain DataFrame ops so
Catalyst picks broadcast vs shuffle strategies (AQE re-plans at runtime).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hiero_spark.registry import query
from hiero_spark.queries._util import money_sum, money_sum_sql, t


@query(
    "ext_join_inner",
    group="ext-join",
    doc="Inner join fact→dim with broadcast: order revenue by nation.",
    oracle=f"""
        SELECT n_name, COUNT(*) AS order_count,
               {money_sum_sql('o_totalprice')} AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def ext_join_inner(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "ext_join_left",
    group="ext-join",
    doc="Left outer join: customers with their order counts (0 for none).",
    oracle="""
        SELECT c_custkey,
               CAST(COUNT(o_orderkey) AS BIGINT) AS order_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
)
def ext_join_left(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_count"))
    )


@query(
    "ext_join_semi",
    group="ext-join",
    doc="Left-semi join (EXISTS): customers that placed at least one order.",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def ext_join_semi(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey")


@query(
    "ext_join_anti",
    group="ext-join",
    doc="Left-anti join (NOT EXISTS): customers with no orders.",
    oracle="""
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def ext_join_anti(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


@query(
    "ext_groupby_agg",
    group="ext-agg",
    doc="General GROUP BY with mixed aggregates (count/sum/min/max/avg/distinct).",
    oracle=f"""
        SELECT o_orderpriority,
               COUNT(*) AS order_count,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               {money_sum_sql('o_totalprice')} AS sum_price,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
)
def ext_groupby_agg(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.count_distinct(F.col("o_custkey")).cast("long").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            money_sum(F.col("o_totalprice")).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@query(
    "ext_groupby_rollup",
    group="ext-agg",
    doc="ROLLUP grouping sets over (l_returnflag, l_linestatus).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def ext_groupby_rollup(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@query(
    "ext_groupby_cube",
    group="ext-agg",
    doc="CUBE grouping sets over (l_returnflag, l_linestatus).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def ext_groupby_cube(spark, sf_dir):
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
    )


@query(
    "ext_setop_intersect",
    group="ext-setop",
    doc="INTERSECT (distinct): customer keys that appear in orders.",
    oracle="""
        SELECT c_custkey AS k FROM customer
        INTERSECT
        SELECT o_custkey AS k FROM orders
    """,
)
def ext_setop_intersect(spark, sf_dir):
    a = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.intersect(b)


@query(
    "ext_setop_except",
    group="ext-setop",
    doc="EXCEPT (distinct): customer keys with no orders.",
    oracle="""
        SELECT c_custkey AS k FROM customer
        EXCEPT
        SELECT o_custkey AS k FROM orders
    """,
)
def ext_setop_except(spark, sf_dir):
    # subtract() IS SQL EXCEPT (distinct).  The previous form
    # exceptAll(b).distinct() subtracts multiplicities first, so a tuple
    # with count(A) > count(B) > 0 wrongly survives — invisible on this
    # unique-key oracle, falsified by the set-operation fuzzer
    # (tests/test_fuzz_parity.py) and pinned by ext_setop_except_bag.
    a = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    b = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return a.subtract(b)


@query(
    "ext_setop_except_bag",
    group="ext-setop",
    doc="EXCEPT (distinct) on a heavy-multiplicity projection: every "
        "(returnflag, linestatus, linenumber) combo occurs thousands of "
        "times on each side, so bag-subtraction idioms "
        "(exceptAll+distinct) give a different answer than SQL EXCEPT — "
        "this oracle can SEE the bag/set divergence the unique-key "
        "ext_setop_except oracle cannot.",
    oracle="""
        SELECT l_returnflag AS rf, l_linestatus AS ls, l_linenumber AS ln
        FROM lineitem
        EXCEPT
        SELECT l_returnflag, l_linestatus, l_linenumber
        FROM lineitem WHERE l_quantity < 2 AND l_linenumber <= 2
    """,
)
def ext_setop_except_bag(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    proj = ["l_returnflag", "l_linestatus", "l_linenumber"]
    a = li.select(*proj)
    b = (
        li.filter((F.col("l_quantity") < 2) & (F.col("l_linenumber") <= 2))
        .select(*proj)
    )
    return (
        a.subtract(b)
        .select(
            F.col("l_returnflag").alias("rf"),
            F.col("l_linestatus").alias("ls"),
            F.col("l_linenumber").alias("ln"),
        )
    )


@query(
    "ext_setop_union_distinct",
    group="ext-setop",
    doc="UNION (distinct) of two key projections.",
    oracle="""
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey AS k FROM orders WHERE o_totalprice > 400000.0
    """,
)
def ext_setop_union_distinct(spark, sf_dir):
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = orders.filter(F.col("o_totalprice") > 400000.0).select(F.col("o_custkey").alias("k"))
    return a.union(b).distinct()


@query(
    "ext_window_rank",
    group="ext-window",
    doc="Ranking window: top-3 orders by price within each priority class.",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice, rk FROM (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
                 CAST(RANK() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice DESC) AS INTEGER) AS rk
          FROM orders
        ) WHERE rk <= 3
    """,
)
def ext_window_rank(spark, sf_dir):
    from hiero_spark.operators.grouptopk import grouped_topk

    # 5 priority groups over the whole orders table: the single-window
    # form serializes each group onto one task — grouped_topk's salted
    # two-phase rank (rank_fn=F.rank keeps the SQL ties semantics) fans
    # them out; only ~3*n_salt survivors reach the final per-group rank
    ranked = grouped_topk(
        t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        ),
        "o_orderpriority",
        [F.desc("o_totalprice")],
        salt_col="o_orderkey",
        k=3,
        rank_fn=F.rank,
    )
    return ranked.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("rank").cast("int").alias("rk"),
    )


@query(
    "ext_window_running_sum",
    group="ext-window",
    doc="Running aggregate: cumulative spend per customer in order-date order "
        "(exact integer cents — order-dependent double sums don't cross-check).",
    oracle="""
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate ASC, o_orderkey ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS running_cents
        FROM orders
    """,
)
def ext_window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", F.sum(cents).over(w).cast("long").alias("running_cents")
    )


@query(
    "ext_window_lag",
    group="ext-window",
    doc="lag(): days since the customer's previous order.",
    oracle="""
        SELECT o_orderkey,
               CAST(date_diff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate ASC, o_orderkey ASC),
                    o_orderdate) AS BIGINT) AS days_since_prev
        FROM orders
    """,
)
def ext_window_lag(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


@query(
    "ext_topk_orders",
    group="ext-sort",
    doc="ORDER BY ... LIMIT k (TakeOrderedAndProject — no full sort).",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
)
def ext_topk_orders(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "ext_pivot",
    group="ext-agg",
    doc="Pivot l_linestatus into columns of quantity sums per returnflag.",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_O,
               CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_F
        FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_pivot(spark, sf_dir):
    pv = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("long")))
    )
    return pv.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "ext_asof_join",
    group="EXT-ASOF",
    doc="As-of join: each event picks up the user's latest purchase value "
        "at or before the event time (union + last-ignorenulls window — one "
        "shuffle, no range explosion). Oracle uses DuckDB's native ASOF "
        "LEFT JOIN.",
    oracle="""
        WITH versions AS (
          SELECT user_id, ts, MAX(value) AS purchase_value
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id, ts
        )
        SELECT e.event_id,
               e.user_id,
               CAST(FLOOR(epoch(e.ts)) AS BIGINT) AS ts_s,
               ROUND(v.purchase_value, 2) AS last_purchase_value
        FROM events e
        ASOF LEFT JOIN versions v
          ON e.user_id = v.user_id AND e.ts >= v.ts
    """,
)
def ext_asof_join(spark, sf_dir):
    from hiero_spark.operators.temporal import as_of_join

    ev = t(spark, sf_dir, "events")
    versions = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = as_of_join(ev, versions, "user_id", "ts", "ts", ["purchase_value"])
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.round("purchase_value", 2).alias("last_purchase_value"),
    )


@query(
    "ext_range_join",
    group="EXT-ASOF",
    doc="Range join: signup events falling in the hour after each purchase "
        "— bucketed candidate generation (equi-join on a coarse time "
        "bucket) then exact containment, never a cartesian product.",
    oracle="""
        WITH p AS (
          SELECT event_id AS purchase_id, ts AS lo, ts + INTERVAL 1 HOUR AS hi
          FROM events WHERE event_type = 'purchase'
        ), s AS (
          SELECT event_id AS signup_id, ts AS s_ts
          FROM events WHERE event_type = 'signup'
        )
        SELECT purchase_id, signup_id
        FROM p JOIN s ON s.s_ts >= p.lo AND s.s_ts < p.hi
    """,
)
def ext_range_join(spark, sf_dir):
    from hiero_spark.operators.temporal import range_join

    ev = t(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
    )
    points = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    out = range_join(points, intervals, "s_ts", "lo", "hi")
    return out.select("purchase_id", "signup_id")


@query(
    "ext_gap_fill",
    group="W-ext",
    doc="Time-series gap fill (operators/temporal.py:gap_fill): hourly "
        "buckets per user densified over each user's [first, last] span, "
        "missing hours filled by last-observation-carried-forward. Grid "
        "generation is sequence+explode (size = span/step, independent "
        "of event count); fills are one per-key window pass. The oracle "
        "rebuilds the grid with generate_series and IGNORE NULLS "
        "last_value.",
    oracle="""
        WITH b AS (
          SELECT user_id,
                 to_timestamp(FLOOR(epoch(ts) / 3600) * 3600) AS bucket,
                 SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                   / (COUNT(*) * 1000000.0) AS v
          FROM events WHERE user_id < 20
          GROUP BY 1, 2
        ), span AS (
          SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM b GROUP BY 1
        ), grid AS (
          SELECT user_id,
                 UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM span
        )
        SELECT g.user_id,
               strftime(g.bucket, '%Y-%m-%d %H') AS bucket_h,
               last_value(b.v IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value,
               (b.v IS NULL) AS filled
        FROM grid g LEFT JOIN b
          ON b.user_id = g.user_id AND b.bucket = g.bucket
    """,
)
def ext_gap_fill(spark, sf_dir):
    from hiero_spark.operators.temporal import gap_fill

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    out = gap_fill(ev, "user_id", "ts", "value", step_seconds=3600,
                   exact_mean_scale=1_000_000)
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH").alias("bucket_h"),
        "value",
        "filled",
    )


@query(
    "ext_gap_fill_linear",
    group="W-ext",
    doc="Gap fill with linear interpolation: each missing hour gets the "
        "value on the straight line between its neighboring observations "
        "(the grid spans [first, last] per key, so both neighbors always "
        "exist). One extra mirrored window pass vs LOCF.",
    oracle="""
        WITH b AS (
          SELECT user_id,
                 to_timestamp(FLOOR(epoch(ts) / 3600) * 3600) AS bucket,
                 SUM(CAST(ROUND(value * 1000000) AS BIGINT))
                   / (COUNT(*) * 1000000.0) AS v
          FROM events WHERE user_id < 20
          GROUP BY 1, 2
        ), span AS (
          SELECT user_id, MIN(bucket) AS lo, MAX(bucket) AS hi
          FROM b GROUP BY 1
        ), grid AS (
          SELECT user_id,
                 UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
          FROM span
        ), j AS (
          SELECT g.user_id, g.bucket, b.v
          FROM grid g LEFT JOIN b
            ON b.user_id = g.user_id AND b.bucket = g.bucket
        ), f AS (
          SELECT user_id, bucket, v,
            last_value(v IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
            first_value(v IGNORE NULLS) OVER (
              PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
          FROM j
        )
        SELECT user_id,
               strftime(bucket, '%Y-%m-%d %H') AS bucket_h,
               (CASE WHEN v IS NOT NULL THEN v
                     ELSE pv + (nv - pv) * ((epoch(bucket) - epoch(pt))
                                         / (epoch(nt) - epoch(pt))) END)
                     AS value,
               (v IS NULL) AS filled
        FROM f
    """,
)
def ext_gap_fill_linear(spark, sf_dir):
    from hiero_spark.operators.temporal import gap_fill

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    out = gap_fill(ev, "user_id", "ts", "value", step_seconds=3600,
                   fill="linear", exact_mean_scale=1_000_000)
    return out.select(
        "user_id",
        F.date_format("bucket", "yyyy-MM-dd HH").alias("bucket_h"),
        "value",
        "filled",
    )


@query(
    "ext_grouping_sets",
    group="ext-agg",
    doc="Arbitrary GROUPING SETS — ((returnflag, linestatus), "
        "(returnflag), (linenumber)) — via the DataFrame groupingSets "
        "API (Spark 4), with grouping_id() disambiguating which set "
        "each output row belongs to (the NULL-vs-grouped-NULL problem "
        "rollup/cube share). One expand+aggregate pass, same "
        "partial-agg shape as a plain groupBy.",
    oracle="""
        SELECT l_returnflag, l_linestatus, l_linenumber,
               CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
                    + GROUPING(l_linenumber) AS BIGINT) AS gid,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linenumber))
    """,
)
def ext_grouping_sets(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], ["l_linenumber"]],
        "l_returnflag", "l_linestatus", "l_linenumber",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "ext_window_distribution",
    group="ext-window",
    doc="Distribution window functions — percent_rank, cume_dist, "
        "ntile(4) — per customer market segment over account balance. "
        "percent_rank/cume_dist are emitted as EXACT basis points "
        "((rank-1)*10000 DIV (n-1), cum*10000 DIV n) derived from "
        "rank/count windows, sidestepping double-division ulp "
        "concerns; ntile is the built-in (identical floor-split "
        "semantics in both engines). Unique (segment, custkey) order "
        "key, so every column hash-checks.",
    oracle="""
        WITH r AS (
          SELECT c_mktsegment, c_custkey,
                 CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
                 RANK() OVER w AS rnk,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n,
                 CAST(NTILE(4) OVER w AS BIGINT) AS quartile
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment
                       ORDER BY ROUND(c_acctbal * 100, 0), c_custkey)
        )
        SELECT c_mktsegment, c_custkey, bal_cents,
               CAST((rnk - 1) * 10000 // (n - 1) AS BIGINT) AS pr_bp,
               CAST(rnk * 10000 // n AS BIGINT) AS cd_bp,
               quartile
        FROM r
    """,
)
def ext_window_distribution(spark, sf_dir):
    from pyspark.sql.window import Window

    cust = t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100, 0).cast("long")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round(F.col("c_acctbal") * 100, 0), F.col("c_custkey")
    )
    seg = Window.partitionBy("c_mktsegment")
    r = cust.select(
        "c_mktsegment",
        "c_custkey",
        cents.alias("bal_cents"),
        F.rank().over(w).alias("rnk"),
        F.count(F.lit(1)).over(seg).alias("n"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return r.select(
        "c_mktsegment",
        "c_custkey",
        "bal_cents",
        F.expr("(rnk - 1) * 10000 DIV (n - 1)").alias("pr_bp"),
        F.expr("rnk * 10000 DIV n").alias("cd_bp"),
        "quartile",
    )


@query(
    "ext_k_anonymity",
    group="ext-agg",
    doc="k-anonymity audit over quasi-identifiers (nationkey, "
        "mktsegment): every equivalence class with its size and a "
        "risky flag (size < k=20 means those customers are "
        "re-identifiable within their class — the privacy audit run "
        "before publishing a dataset, alongside scrub_pii and the "
        "bloom-routed deletion path). ONE partial+final groupBy; "
        "output is bounded by the quasi-identifier domain.",
    oracle="""
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS class_size,
               COUNT(*) < 20 AS risky
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
    """,
)
def ext_k_anonymity(spark, sf_dir):
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            "c_nationkey", "c_mktsegment", "class_size",
            (F.col("class_size") < 20).alias("risky"),
        )
    )


@query(
    "ext_join_full",
    group="ext-join",
    doc="Full-outer join: per-nation customer and supplier counts kept "
        "even when one side has no rows for that nation — completes the "
        "inner/left/semi/anti join matrix. Both sides pre-aggregate to "
        "one row per key BEFORE the join (partial map-side combine), so "
        "the full-outer shuffle moves 25-ish rows, not base tables; "
        "coalesce folds the two key columns into one output key.",
    oracle="""
        WITH c AS (
          SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
          FROM customer GROUP BY c_nationkey
        ), s AS (
          SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
          FROM supplier GROUP BY s_nationkey
        )
        SELECT COALESCE(c.nk, s.nk) AS nationkey,
               COALESCE(n_customers, 0) AS n_customers,
               COALESCE(n_suppliers, 0) AS n_suppliers
        FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def ext_join_full(spark, sf_dir):
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cust.join(
        supp, F.col("nk_c") == F.col("nk_s"), "full_outer"
    ).select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@query(
    "ext_l_diversity",
    group="ext-agg",
    doc="l-diversity audit, the step past ext_k_anonymity: a class can "
        "be large (k-anonymous) yet reveal its sensitive attribute if "
        "every member shares one value. Per quasi-identifier class "
        "(nationkey, mktsegment): distinct sensitive values "
        "(o_orderpriority of the customers' orders), the top value's "
        "share, and a risky flag (fewer than l=3 distinct values OR "
        "top value above 80%). One join orders->customer on the "
        "broadcastable customer dim, then ONE two-level aggregate; "
        "output bounded by the QI domain.",
    oracle="""
        WITH j AS (
          SELECT c_nationkey, c_mktsegment, o_orderpriority
          FROM orders JOIN customer ON o_custkey = c_custkey
        ), v AS (
          SELECT c_nationkey, c_mktsegment, o_orderpriority,
                 COUNT(*) AS cnt
          FROM j GROUP BY 1, 2, 3
        )
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS l_distinct,
               CAST(SUM(cnt) AS BIGINT) AS class_rows,
               ROUND(MAX(cnt) * 1.0 / SUM(cnt), 6) AS top_share,
               (COUNT(*) < 3 OR MAX(cnt) * 1.0 / SUM(cnt) > 0.8) AS risky
        FROM v GROUP BY c_nationkey, c_mktsegment
    """,
)
def ext_l_diversity(spark, sf_dir):
    j = t(spark, sf_dir, "orders").join(
        F.broadcast(
            t(spark, sf_dir, "customer").select(
                "c_custkey", "c_nationkey", "c_mktsegment"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    v = j.groupBy("c_nationkey", "c_mktsegment", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    top_share = F.round(
        F.max("cnt") * F.lit(1.0) / F.sum("cnt"), 6
    )
    return v.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("l_distinct"),
        F.sum("cnt").alias("class_rows"),
        top_share.alias("top_share"),
        (
            (F.count(F.lit(1)) < 3)
            | (F.max("cnt") * F.lit(1.0) / F.sum("cnt") > 0.8)
        ).alias("risky"),
    )

from hiero_spark.functions.privacy import dp_oracle_sql  # noqa: E402


@query(
    "ext_dp_release",
    group="ext-agg",
    doc="Differentially-private count release — the PRODUCING step the "
        "k-anonymity / l-diversity audits sit in front of: customers per "
        "nation with truncated discrete-Laplace noise (eps=0.5, trunc=20, "
        "inverse-CDF against a seeded per-group uniform). The 40 CDF "
        "thresholds are computed once driver-side and embedded as the "
        "SAME literal doubles in the Spark plan and this oracle "
        "(functions/privacy.py:dp_oracle_sql keeps them from drifting), "
        "and the uniform is exact BIGINT LCG arithmetic over a dyadic "
        "division — so the whole mechanism is bit-identical across "
        "engines and hash-checked with no tolerance. Deterministic seed "
        "= verifiable harness, NOT a private release; production swaps "
        "in secret randomness (the documented seam). True counts are "
        "not in the output.",
    oracle=dp_oracle_sql("customer", ["c_nationkey"], "c_nationkey"),
)
def ext_dp_release(spark, sf_dir):
    from hiero_spark.functions.privacy import dp_noisy_counts

    return dp_noisy_counts(
        t(spark, sf_dir, "customer"), ["c_nationkey"], "c_nationkey"
    )


from hiero_spark.functions.privacy import dp_histogram_oracle_sql  # noqa: E402


@query(
    "ext_dp_histogram",
    group="ext-agg",
    doc="Domain-complete DP histogram — the release shape a real "
        "publication needs where ext_dp_release is the mechanism demo: "
        "suppliers per nation over the FULL nation-table domain, so "
        "nations with NO suppliers release 0+noise like any other "
        "(omitting empty buckets leaks emptiness exactly — "
        "presence/absence is the strongest membership signal). "
        "Broadcast domain left-join + the same shared-literal "
        "inverse-CDF mechanism (functions/privacy.py), bit-identical "
        "across engines.",
    oracle=dp_histogram_oracle_sql(
        "supplier", "nation", "s_nationkey", "n_nationkey"
    ),
)
def ext_dp_histogram(spark, sf_dir):
    from hiero_spark.functions.privacy import dp_noisy_histogram

    return dp_noisy_histogram(
        t(spark, sf_dir, "supplier"),
        t(spark, sf_dir, "nation").select("n_nationkey"),
        "s_nationkey",
    )


from hiero_spark.functions.privacy import dp_mean_oracle_sql  # noqa: E402


@query(
    "ext_dp_mean",
    group="ext-agg",
    doc="Differentially-private bounded MEAN release — the third mechanism "
        "of the family (count, histogram, mean): average document length "
        "per language, values clamped to [0, 2000] (the sensitivity "
        "bound), released as noisy_sum / noisy_count with independent "
        "truncated discrete-Laplace draws (sum noise scaled by the clamp "
        "width). Same shared-literal inverse-CDF machinery "
        "(functions/privacy.py:dp_noisy_mean), one final IEEE division — "
        "bit-identical across engines, hash-checked with no tolerance. "
        "The integer draw key derives from the group label via ascii() "
        "(both engines agree on it literally).",
    oracle=dp_mean_oracle_sql(
        "documents", ["lang"], "n_chars",
        "ascii(lang) * 256 + length(lang)", lo=0, hi=2000,
    ),
)
def ext_dp_mean(spark, sf_dir):
    from hiero_spark.functions.privacy import dp_noisy_mean

    key = F.ascii(F.col("lang")) * 256 + F.length(F.col("lang"))
    return dp_noisy_mean(
        t(spark, sf_dir, "documents"), ["lang"], "n_chars", key,
        lo=0, hi=2000,
    )


@query(
    "ext_rollup_answer",
    group="ext-agg",
    doc="Materialized-rollup reuse: the monthly revenue question answered "
        "from the DAILY rollup instead of the event log — sums and counts "
        "are additive, so re-aggregating the cube's partials is EXACT, "
        "and the oracle (computed straight from the base table) IS the "
        "additivity proof, hash-checked. This is the read side of the "
        "s17 incremental-aggregate state: maintain the fine-grained cube "
        "once (O(delta) per batch), answer every coarser slice from its "
        "keys x days rows without touching raw events — the "
        "materialized-view contract a 100 TB dashboard runs on.",
    oracle="""
        SELECT event_type,
               CAST(strftime(ts, '%Y-%m') AS VARCHAR) AS month,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sum_cents
        FROM events
        GROUP BY 1, 2
    """,
)
def ext_rollup_answer(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    daily = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("pn"), F.sum(cents).alias("ps")
    )
    # the question is answered from the CUBE's partials, never the log
    return daily.groupBy(
        "event_type", F.substring("day", 1, 7).alias("month")
    ).agg(
        F.sum("pn").cast("long").alias("n_events"),
        F.sum("ps").cast("long").alias("sum_cents"),
    )
