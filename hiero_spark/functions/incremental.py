"""Incremental (snapshot-delta) dedup: admit a new ingest batch against
an existing corpus without reprocessing the corpus.

A production crawl dedups each day's batch against the full history. The
history's contribution is a FINGERPRINT INDEX — one 16-byte md5 per
distinct historical text — never the bodies; the daily job is then

    batch -> fingerprint -> anti-join index -> keep min-id per batch fp

Scale shape (100 TB history, ~GB-scale daily batch): the index is
(corpus distinct fps) and is built ONCE, then maintained by appending
each admitted batch's fps (`updated_index`); the per-batch cost is one
shuffle of batch fps + the index-side join scan. Persist the index
bucketed by fp (sources/readers.py:save_bucketed) and the anti-join's
index side needs no shuffle at all — tested in tests/test_incremental.py.
Bodies never move in any step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hiero_spark.functions.text import fingerprint


def fingerprint_index(corpus_df: DataFrame, text_col: str) -> DataFrame:
    """Distinct content fingerprints of the corpus — the only state the
    incremental path keeps (16 bytes per distinct text)."""
    return corpus_df.select(
        fingerprint(F.col(text_col)).alias("fp")
    ).distinct()


def admit_batch(
    batch_df: DataFrame, index_df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, fp, batch_dups): batch docs to admit — not an exact
    duplicate of anything in the index, one representative (min id) per
    duplicate group WITHIN the batch; batch_dups counts the batch-internal
    copies the representative stands for. The fp column feeds
    `updated_index` without re-hashing."""
    batch_fp = batch_df.select(
        F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp")
    )
    fresh = batch_fp.join(index_df, "fp", "left_anti")
    return fresh.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("batch_dups"),
    ).select("doc_id", "fp", "batch_dups")


def updated_index(index_df: DataFrame, admitted_batch: DataFrame, text_col: str) -> DataFrame:
    """Next snapshot's index: old index ∪ admitted batch fps. Admitted fps
    are disjoint from the index by construction, so a cheap unionByName
    (no re-distinct) suffices when `admitted_batch` carries `fp`; callers
    re-fingerprint when it carries text."""
    cols = set(admitted_batch.columns)
    fps = (
        admitted_batch.select("fp")
        if "fp" in cols
        else admitted_batch.select(fingerprint(F.col(text_col)).alias("fp")).distinct()
    )
    return index_df.unionByName(fps)
