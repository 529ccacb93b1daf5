"""Per-group top-k that survives low group cardinality.

The textbook formulation — `ROW_NUMBER() OVER (PARTITION BY g ORDER BY
...) <= k` — shuffles EVERY row to one task per group. With few, huge
groups (top documents per language: 5-ish languages over a 100 TB
corpus) that serializes the whole corpus onto a handful of cores; the
window operator also buffers each partition to rank it. This module runs
the same query in two windows:

  phase 1: rank within (group, salt) — salt = pmod(xxhash64(tiebreak),
           n_salt) fans each group over n_salt tasks; a row in the
           global top-k of its group is necessarily in the top-k of its
           salt bucket, so keeping k per bucket loses nothing;
  phase 2: rank the ≤ k·n_salt survivors per group — the second shuffle
           moves k·n_salt rows per group, not the corpus.

The ordering must be a TOTAL order (include a unique tiebreaker) — with
ties left unresolved, phase-1 bucket boundaries could drop rows the
plain window would keep, and results would be nondeterministic anyway.

The salt is derived by hashing a stated column, never from
spark_partition_id or rand: reruns and retried tasks see the same
bucket, which keeps the operator deterministic under task retry — the
same property every dedup operator in this repo holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def grouped_topk(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    salt_col: str,
    k: int,
    n_salt: int = 32,
    rank_fn=F.row_number,
) -> DataFrame:
    """Rows forming each group's top-k under `order_by` (which must be a
    total order — end it with a unique column such as the id used for
    `salt_col`), plus a `rank` column (1-based within the group).

    `rank_fn=F.rank` gives SQL rank-with-ties semantics instead: rows
    tied at the k boundary are all kept (output may exceed k per group,
    exactly like the single-window form).  Phase 1 stays sound — a row
    whose GLOBAL group rank is <= k has bucket rank <= its global rank,
    so keeping bucket rank <= k loses nothing; with ties, a bucket keeps
    at most its boundary tie-class extra."""
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))
    w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order_by)
    survivors = (
        df.withColumn("_r1", rank_fn().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        survivors.withColumn("rank", rank_fn().over(w2))
        .filter(F.col("rank") <= k)
    )
