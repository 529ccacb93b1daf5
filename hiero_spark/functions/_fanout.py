"""Scan-width utility shared across operator families.

`fan_out` started life in functions/dedup.py; by round 14 it was used
by seven operator modules (dedup, setsim, similarity, incremental,
overlap, bloom, pipeline, spans, paragraphs) and its single-function
evidence blast radius in dedup.py hit 24 registered queries — above
the <20 bound tests/test_evidence_slice.py pins for routine dedup.py
edits.  It lives here so an edit to dedup proper no longer lapses
every set-similarity and ANN pin; an edit to THIS module correctly
lapses exactly the queries whose plans depend on scan widening.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, key: str) -> DataFrame:
    """Spread CPU-bound map work (tokenize/shingle/hash) over the session's
    parallelism when the scan arrived narrower — a single-file table scans
    as ONE task, serializing the dominant map stage onto one core. A no-op
    on a real multi-file corpus; the repartition shuffles document rows
    once and every downstream stage runs wide."""
    par = df.sparkSession.sparkContext.defaultParallelism
    # partition-count probe via the JVM queryExecution directly
    # (round-14 verdict #6): `df.rdd` additionally builds the
    # Python-serialization RDD wrapper (javaToPython) on every call —
    # pure driver-side build cost, measurable on deep plans.  Both
    # forms plan the query; neither runs a job.
    try:
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # private-API drift: fall back to the public path
        n = df.rdd.getNumPartitions()
    if n < par:
        return df.repartition(par, key)
    return df
