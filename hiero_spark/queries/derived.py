"""Derived-column / scalar-function demo queries (SURVEY.md §2.8 F1–F7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.functions import derive as dv
from hiero_spark.registry import query
from hiero_spark.queries._util import money_sum, money_sum_sql, t


@query(
    "f1_derived_column",
    group="F1",
    doc="CreateColumnJSMap analog: per-row derived revenue as an expression "
        "(scaled to exact integral units for cross-engine determinism).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS revenue_e4
        FROM lineitem
    """,
)
def f1_derived_column(spark, sf_dir):
    df = dv.derive_expr(
        t(spark, sf_dir, "lineitem"),
        "revenue_e4",
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)",
    )
    return df.select("l_orderkey", "l_linenumber", "revenue_e4")


@query(
    "f2_convert_column",
    group="F2",
    doc="ConvertColumnMap: double→bigint and bigint→string kind conversions.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty_int,
               CAST(l_orderkey AS VARCHAR) AS okey_str
        FROM lineitem
    """,
)
def f2_convert_column(spark, sf_dir):
    df = t(spark, sf_dir, "lineitem")
    df = dv.convert_column(df, "l_quantity", "long", "qty_int")
    df = dv.convert_column(df, "l_orderkey", "string", "okey_str")
    return df.select("l_orderkey", "l_linenumber", "qty_int", "okey_str")


@query(
    "f2_interval_lag",
    group="F2",
    doc="Duration column kind (hiero ContentsKind.Duration -> Spark "
        "DayTimeIntervalType, SURVEY.md §1.2): the order-to-ship lag "
        "becomes a real interval column, is compared against INTERVAL "
        "literals for bucketing, added back to the order timestamp "
        "(interval arithmetic must round-trip to the ship date), and "
        "max-aggregated as an interval. Final projection extracts day "
        "counts because the driver hash-compares primitive values; the "
        "interval type is exercised on every intermediate step.",
    oracle="""
        WITH l AS (
          SELECT to_days(CAST(date_diff('day', o_orderdate, l_shipdate) AS INT))
                   AS lag_iv,
                 o_orderdate, l_shipdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), b AS (
          SELECT CASE WHEN lag_iv <= INTERVAL '30' DAY THEN '0-30d'
                      WHEN lag_iv <= INTERVAL '90' DAY THEN '31-90d'
                      ELSE '>90d' END AS lag_bucket,
                 lag_iv,
                 CASE WHEN CAST(o_orderdate AS TIMESTAMP) + lag_iv
                           = CAST(l_shipdate AS TIMESTAMP)
                      THEN 1 ELSE 0 END AS rt_ok
          FROM l
        )
        SELECT lag_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(date_part('day', MAX(lag_iv)) AS BIGINT) AS max_lag_days,
               CAST(SUM(rt_ok) AS BIGINT) AS n_roundtrip_ok
        FROM b GROUP BY lag_bucket
    """,
)
def f2_interval_lag(spark, sf_dir):
    li = (
        t(spark, sf_dir, "lineitem")
        .join(
            t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn("_lag_days", F.datediff("l_shipdate", "o_orderdate"))
    )
    df = dv.convert_column(li, "_lag_days", "interval_day", "lag_iv")
    bucket = (
        F.when(F.col("lag_iv") <= F.expr("INTERVAL '30' DAY"), "0-30d")
        .when(F.col("lag_iv") <= F.expr("INTERVAL '90' DAY"), "31-90d")
        .otherwise(">90d")
    )
    rt_ok = F.when(
        F.col("o_orderdate").cast("timestamp") + F.col("lag_iv")
        == F.col("l_shipdate").cast("timestamp"),
        1,
    ).otherwise(0)
    return (
        df.withColumn("lag_bucket", bucket)
        .withColumn("rt_ok", rt_ok)
        .groupBy("lag_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.expr("CAST(extract(DAY FROM max(lag_iv)) AS BIGINT)").alias(
                "max_lag_days"
            ),
            F.sum("rt_ok").cast("long").alias("n_roundtrip_ok"),
        )
    )


@query(
    "f3_json_extract",
    group="F3",
    doc="JSON field extraction from the events.props Json column.",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
    """,
)
def f3_json_extract(spark, sf_dir):
    return t(spark, sf_dir, "events").select(
        "event_id", dv.json_field("props", "k").cast("long").alias("k_val")
    )


@query(
    "f4_date_bucket",
    group="F4",
    doc="Date bucketing: orders per month with exact revenue sum.",
    oracle=f"""
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               COUNT(*) AS order_count,
               {money_sum_sql('o_totalprice')} AS total_price
        FROM orders GROUP BY 1
    """,
)
def f4_date_bucket(spark, sf_dir):
    return (
        t(spark, sf_dir, "orders")
        .groupBy(
            F.date_format(dv.date_bucket("o_orderdate", "month"), "yyyy-MM-dd").alias(
                "month_start"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "f5_string_ops",
    group="F5",
    doc="String scalar ops: lower/upper/substring/length in a projection.",
    oracle="""
        SELECT p_partkey,
               lower(p_type) AS type_lower,
               upper(p_name) AS name_upper,
               substr(p_name, 1, 3) AS name_prefix,
               CAST(length(p_name) AS INTEGER) AS name_len
        FROM part
    """,
)
def f5_string_ops(spark, sf_dir):
    return t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 3).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "f6_log_bucket",
    group="F6",
    doc="Log-scale bucketing of l_extendedprice (decade buckets via "
        "comparison thresholds — deterministic across engines, no libm).",
    oracle="""
        SELECT CASE WHEN l_extendedprice < 9000.0 THEN 0
                    WHEN l_extendedprice < 90000.0 THEN 1
                    ELSE 2 END AS log_bucket,
               COUNT(*) AS bucket_count
        FROM lineitem GROUP BY 1
    """,
)
def f6_log_bucket(spark, sf_dir):
    c = F.col("l_extendedprice")
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.when(c < 9000.0, 0).when(c < 90000.0, 1).otherwise(2).alias("log_bucket")
        )
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


@query(
    "f7_linear_projection",
    group="F7",
    doc="LinearProjectionMap: project rows onto 2 fixed component vectors "
        "(the PCA apply step; eigenvectors would come from the A12 sketch).",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_quantity * 0.6 + l_discount * 40.0 AS proj_0,
               l_quantity * -0.25 + l_discount * 10.0 AS proj_1
        FROM lineitem
    """,
)
def f7_linear_projection(spark, sf_dir):
    df = dv.linear_projection(
        t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_discount"],
        [[0.6, 40.0], [-0.25, 10.0]],
    )
    return df.select("l_orderkey", "l_linenumber", "proj_0", "proj_1")


@query(
    "f7_pca_projection",
    group="F7",
    doc="Full F7 pipeline: covariance via one distributed aggregation pass "
        "(the A12 sketch), eigendecomposition at the driver (d x d, tiny), "
        "projection as pure column expressions. Rows-only: eigensolves "
        "aren't SQL-reproducible; variance/orthogonality invariants are "
        "asserted in unit tests.",
    oracle=None,
)
def f7_pca_projection(spark, sf_dir):
    from hiero_spark.functions import pca

    df = pca.pca_project(
        t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
        k=2,
    )
    return df.select(
        "l_orderkey", "l_linenumber", F.round("pc1", 6).alias("pc1"),
        F.round("pc2", 6).alias("pc2"),
    )


@query(
    "f7_pca_verdict",
    group="F7",
    doc="PCA invariants as a hashable property verdict: anchor = row count; "
        "booleans assert the projected components come out variance-ordered "
        "(var(pc1) >= var(pc2)), uncorrelated (|corr| <= 0.01 — exact "
        "eigensolve gives ~1e-15; slack is float noise), and centered "
        "(|mean| tiny relative to spread). These are the defining PCA "
        "properties no SQL engine can recompute (eigensolves are not SQL) "
        "but any engine can CHECK.",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               TRUE AS variance_ordered, TRUE AS uncorrelated, TRUE AS centered
        FROM lineitem
    """,
)
def f7_pca_verdict(spark, sf_dir):
    from hiero_spark.functions import pca

    df = pca.pca_project(
        t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount"],
        k=2,
    )
    agg = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.var_pop("pc1").alias("_v1"),
        F.var_pop("pc2").alias("_v2"),
        F.corr("pc1", "pc2").alias("_corr"),
        F.avg("pc1").alias("_m1"),
        F.avg("pc2").alias("_m2"),
        F.stddev_pop("pc1").alias("_s1"),
    )
    return agg.select(
        "n_rows",
        F.coalesce(F.col("_v1") >= F.col("_v2"), F.lit(True)).alias("variance_ordered"),
        F.coalesce(F.abs(F.col("_corr")) <= 0.01, F.lit(True)).alias("uncorrelated"),
        F.coalesce(
            (F.abs(F.col("_m1")) <= F.col("_s1") * 0.001)
            & (F.abs(F.col("_m2")) <= F.col("_s1") * 0.001),
            F.lit(True),
        ).alias("centered"),
    )
