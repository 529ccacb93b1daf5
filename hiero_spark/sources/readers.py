"""Readers / writers for the formats the reference supports (SURVEY.md §2.1).

hiero loci: CsvFileReader (S1, incl. schema guessing), Schema.java JSON
schema files (S2), JsonFileLoader (S3), Orc/Parquet loaders (S4/S5), JDBC
(S6), grok-style log readers (S7), file-set enumeration (S8), save-view
sink (S10).

Spark-first: every format maps to a built-in DataSource (distributed,
splittable, predicate-pushdown where the format allows). The JDBC reader
is config-only here (no database in this container) — partitioned reads
via (partitionColumn, lowerBound, upperBound, numPartitions).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# -- S2: JSON schema files --------------------------------------------------

def save_schema(df_schema: T.StructType, path: str) -> None:
    with open(path, "w") as f:
        json.dump(json.loads(df_schema.json()), f, indent=2)


def load_schema(path: str) -> T.StructType:
    with open(path) as f:
        return T.StructType.fromJson(json.load(f))


# -- S1: CSV ------------------------------------------------------------------

def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None,
    header: bool = True, infer: bool = False,
) -> DataFrame:
    """CSV with explicit schema (hiero schema file) or guessing (inferSchema)."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


# -- S3: newline-delimited JSON ----------------------------------------------

def read_json(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# -- S4/S5: columnar ----------------------------------------------------------

def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# -- S6: JDBC (config-only in this container) ---------------------------------

def read_jdbc(
    spark: SparkSession, url: str, table: str,
    partition_column: str | None = None,
    lower: int | None = None, upper: int | None = None, num_partitions: int = 8,
    properties: dict | None = None,
) -> DataFrame:
    """Partitioned JDBC read; Spark pushes filters/pruning to the database
    (the analog of hiero's sketch-to-SQL pushdown, storage/jdbc/*)."""
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


# -- S7: structured log parsing ------------------------------------------------

LOG_PATTERN = r"^(\S+) (\S+) \[([^\]]*)\] (.*)$"


def read_logs(spark: SparkSession, path: str, pattern: str = LOG_PATTERN,
              fields: tuple[str, ...] = ("ts", "level", "source", "message")) -> DataFrame:
    """Grok-like log reader: text source + regexp_extract per field."""
    lines = spark.read.text(path)
    cols = [
        F.regexp_extract(F.col("value"), pattern, i + 1).alias(name)
        for i, name in enumerate(fields)
    ]
    return lines.select(*cols)


# -- S10: sinks -----------------------------------------------------------------

def save_view(df: DataFrame, path: str, fmt: str = "parquet",
              partition_by: tuple[str, ...] = ()) -> None:
    """Persist a (filtered/derived) view. partition_by enables partition
    pruning for downstream readers — the on-disk analog of hiero's
    membership sets."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
