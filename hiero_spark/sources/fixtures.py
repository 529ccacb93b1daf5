"""Multi-file test fixtures.

The driver-generated testdata parquet is a single row group per table, so
every scan is one task no matter how many cores the session has — local
bench numbers say nothing about scan parallelism or AQE behavior (round-1
verdict watch item). `materialize_multifile` rewrites each table as N
separate parquet files (a directory per table, same `<name>.parquet` naming
the catalog expects), giving scans real split boundaries.

The rewrite goes through `catalog.load_table`, so the events table's
TIMESTAMP(NANOS) column lands in the copy as a plain timestamp — the
catalog's LongType guard then skips the nanos conversion on read-back.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hiero_spark.catalog import TABLES, load_table, table_path


def materialize_multifile(
    spark: SparkSession, sf_dir: str, out_dir: str, files_per_table: int = 8
) -> str:
    """Copy every catalog table from sf_dir to out_dir as multi-file parquet."""
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        (
            df.repartition(files_per_table)
            .write.mode("overwrite")
            .parquet(table_path(out_dir, name))
        )
    return out_dir
