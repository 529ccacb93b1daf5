"""SparkSession factory tuned for the engine.

Local testing runs on local[N]; the config below is written for a real
cluster too: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow for the pandas-UDF slow path, sane shuffle partition
count. On a 1000-executor cluster only `master` and memory sizing change —
operators never assume local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: coalesce post-shuffle partitions, convert SMJ->broadcast at runtime,
    # split skewed shuffle partitions. Essential at 100 TB, harmless locally.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Start from cores locally; on a cluster this should be ~2-3x total cores.
    # AQE coalescing makes over-provisioning cheap.
    "spark.sql.shuffle.partitions": "32",
    # Arrow transfer for pandas_udf / applyInPandas / toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamps across engines (DuckDB oracle runs in UTC).
    "spark.sql.session.timeZone": "UTC",
    # Dims in our star schema are small: keep broadcast threshold generous.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Testdata events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    # reader rejects; read as long and convert in the catalog (see
    # catalog.load_table ts normalization).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


def get_spark(app_name: str = "hiero_spark", **overrides: str) -> SparkSession:
    """Build (or reuse) a SparkSession.

    `SPARK_GRAFT_CPUS` controls local parallelism (default: all cores).
    Any key in `overrides` wins over the defaults.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = {**_DEFAULTS, **overrides}
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
