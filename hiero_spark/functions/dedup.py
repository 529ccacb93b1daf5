"""Deduplication operators for training-data pipelines (SURVEY.md §2.11 N1).

Scale design:
- Exact dedup = hash groupBy on a fingerprint — one shuffle of (hash, id),
  never of document bodies.
- MinHash+LSH near-dup: shingle -> 64 minhashes -> band into 16 buckets ->
  self-join per band bucket. The join key is (band, signature-slice), so
  candidate generation shuffles only signatures; verification computes true
  Jaccard only for candidates sharing a bucket. This is the standard
  LSH-at-scale shape (skew guarded by a bucket-size cap).
- All hashing is xxhash64(seed-mixed) — JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from hiero_spark.functions.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative (min id) per exact content fingerprint."""
    return (
        df.withColumn("_fp", fingerprint(F.col(text_col)))
        .groupBy("_fp")
        .agg(F.min(F.col(id_col)).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .drop("_fp")
        .select("keep_id", "dup_count")
    )


def shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Word k-gram shingle set per document (exploded, distinct)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return (
        df.select(F.col(id_col).alias("doc"), F.explode(grams).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """num_hashes-wide MinHash signature per doc, one aggregation pass.

    h_i(s) = xxhash64(shingle, seed=i); signature_i = min over shingles.
    """
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = 64, bands: int = 16, max_bucket: int = 50
) -> DataFrame:
    """Banded LSH: docs sharing any band-bucket become candidate pairs.

    `max_bucket` caps pathological buckets (skew guard: a degenerate bucket
    of B docs would emit B² pairs; at 100 TB that's the failure mode).
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.xxhash64(*cols).alias(f"band_{b}"))
    banded = sig.select("doc", *band_cols)
    buckets = banded.select(
        "doc",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bkt"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt"))
    counted = buckets.withColumn(
        "bucket_size", F.count(F.lit(1)).over(Window.partitionBy("band", "bkt"))
    ).filter(F.col("bucket_size") <= max_bucket)
    a = counted.select("band", "bkt", F.col("doc").alias("doc_a"))
    b = counted.select("band", "bkt", F.col("doc").alias("doc_b"))
    return (
        a.join(b, ["band", "bkt"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, sh: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (the verify stage after LSH).

    Joins shingle sets only for candidate docs — the expensive all-pairs
    comparison never happens.
    """
    sh_a = sh.select(F.col("doc").alias("doc_a"), F.col("shingle"))
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("shingle"))
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def minhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → Jaccard verify."""
    sh = shingles(df, text_col, id_col, k)
    sig = minhash_signatures(sh, num_hashes)
    pairs = lsh_candidate_pairs(sig, num_hashes, bands)
    return jaccard_verify(pairs, sh, threshold)
