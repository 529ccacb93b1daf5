"""Domain mixture-weight computation for training-data assembly.

Raw web-scale corpora are dominated by their largest sources; training
mixtures therefore re-weight domains by a tempered power of their size
(weight ∝ n^alpha, alpha < 1 — the same alpha-smoothing used for
multilingual sampling in XLM-R and for domain mixing in Pile-style
datasets). This computes, per source: its raw share, its tempered
target share, and the sampling boost (target/raw) an assembly job
(functions/pipeline.py:mixture_sample) would apply.

Scale shape: one partial+final count per source (the only corpus-wide
pass), then pure arithmetic over the tiny per-domain aggregate — the
normalizing sum runs as an unpartitioned window over rows-per-source
rows (a handful), deliberately NOT a scalar-broadcast join, so the plan
stays free of BroadcastNestedLoopJoin.

Cross-engine determinism: the normalizer is a sum of doubles, so
summation ORDER matters at the last ulp; the window sums in (source)
sort order on both engines to make the doubles bit-identical, and all
emitted ratios are rounded to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def mixture_weights(
    df: DataFrame, domain_col: str, alpha: float = 0.5
) -> DataFrame:
    """(source, n_docs, raw_share, weight, boost) — weight ∝ n_docs^alpha
    normalized over domains; boost = weight / raw_share."""
    counts = df.groupBy(F.col(domain_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # Ordered frame => deterministic double-summation order; the frame is
    # the whole (tiny) aggregate either way.
    w = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # sqrt is correctly rounded per IEEE-754 in both engines; pow(x, 0.5)
    # carries no such guarantee, so the default alpha takes the sqrt path
    # for bit-identical cross-engine doubles.
    n_dbl = F.col("n_docs").cast("double")
    tempered = F.sqrt(n_dbl) if alpha == 0.5 else F.pow(n_dbl, F.lit(alpha))
    return (
        counts.withColumn("_t", tempered)
        .withColumn("raw_share", F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6))
        .withColumn("weight", F.round(F.col("_t") / F.sum("_t").over(w), 6))
        .withColumn("boost", F.round(F.col("weight") / F.col("raw_share"), 6))
        .drop("_t")
    )
