"""Contamination overlap scoring: per-document n-gram overlap fraction
against a training corpus.

Boolean decontamination (functions/pipeline.py:contaminated_docs) answers
"does this eval doc share ANY k-gram with train?" — the right gate for
benchmark hygiene, but a blunt one for auditing: a doc sharing one gram
out of 500 and a doc that is 90% training text both flag identically.
This module grades the overlap instead: the fraction of an eval doc's
distinct word k-grams that appear anywhere in the train split (the
eval-side containment form of Jaccard used by contamination audits).

Scale shape (100 TB): one explode of the eval side, one distinct of the
train shingle set, ONE shuffle for the left join on the gram key, then a
partial+final count per doc. The join output is exactly the eval shingle
count (the train side is distinct), so nothing amplifies; the groupBy is
map-side combinable. Skew on a degenerate common gram hits the join's
build rows only once per gram — the distinct collapses it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hiero_spark.functions._fanout import fan_out
from hiero_spark.functions.dedup import shingles


def contamination_overlap(
    eval_df: DataFrame,
    train_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-eval-doc overlap grade: (doc_id, n_shingles, n_hit, overlap)
    where overlap = |doc's distinct k-grams ∩ train grams| / |doc's
    distinct k-grams| ∈ [0, 1].  Shingling matches MinHash dedup and the
    boolean decontamination path (shingle_array distincts per doc)."""
    ev = shingles(fan_out(eval_df, id_col), text_col, id_col, k=k)
    tr = (
        shingles(fan_out(train_df, id_col), text_col, id_col, k=k)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ev.join(tr, "shingle", "left")
        .groupBy(F.col("doc").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("_hit").alias("n_hit"),
        )
        .withColumn(
            "overlap", F.round(F.col("n_hit") / F.col("n_shingles"), 6)
        )
    )
