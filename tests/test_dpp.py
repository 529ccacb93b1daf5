"""Dynamic partition pruning evidence: a dim-side filter prunes fact
partitions at RUNTIME (Spark inserts a dynamicpruning subquery into the
fact scan's partition filters).  This is the mechanism that makes
star-schema queries over a date-partitioned 100 TB fact table read only
the partitions the filtered dimension selects — no manual predicate on
the fact needed."""

import pytest
from pyspark.sql import functions as F

from hiero_spark import plans as P


@pytest.fixture(scope="module")
def parts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("dpp")
    fact_path = str(base / "orders_by_year")
    dim_path = str(base / "year_dim")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_path)
    years = [r["o_year"] for r in orders.select("o_year").distinct().collect()]
    dim = spark.createDataFrame(
        [(y, "target" if y == min(years) else "other") for y in years],
        "o_year int, tag string",
    )
    dim.write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path, min(years), len(years)


def test_dpp_subquery_in_fact_scan(spark, parts):
    fact_path, dim_path, target_year, n_years = parts
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "target")
    j = fact.join(dim, "o_year").agg(F.count(F.lit(1)).alias("n"))
    plan = P.plan_str(j).lower()
    assert "dynamicpruning" in plan, "fact scan lacks a runtime pruning subquery"


def test_dpp_result_matches_static_filter(spark, parts):
    fact_path, dim_path, target_year, n_years = parts
    assert n_years > 1, "fixture needs multiple partitions to prune"
    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("tag") == "target")
    dynamic = fact.join(dim, "o_year").count()
    static = fact.filter(F.col("o_year") == target_year).count()
    assert dynamic == static and static > 0
