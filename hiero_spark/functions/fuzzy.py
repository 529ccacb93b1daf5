"""Fuzzy key dedup: exact edit-distance-1 pair detection WITHOUT an
all-pairs comparison (the FastSS / SymSpell deletion-neighborhood trick).

Near-identical short keys — titles, product names, author strings —
escape exact dedup over one typo. Classic result: lev(a, b) <= 1 iff
the <=1-deletion neighborhoods of a and b intersect (a substitution at
position i collides after deleting position i from both sides; an
insertion/deletion means one side's single-deletion equals the other
side verbatim; equal keys share the key itself). So the join is:
explode each key into itself plus its single-deletion variants,
equi-join on the variant, verify candidates with one levenshtein call.

Scale shape (100 TB of keys): candidate generation is a bucket
equi-join on variant strings — len+1 variants per key (keys are SHORT;
this operator is for key columns, not document bodies), one shuffle of
the variant relation, never a cartesian. A degenerate hot variant (many
keys one deletion apart from each other) is capped by `max_bucket`
exactly like the LSH band buckets in functions/dedup.py — pairs beyond
the cap in one bucket are sacrificed, stated, and bounded. Verification
cost is |candidates|, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _deletions(key: Column) -> Column:
    """Every single-character deletion of the key:
    substr(1, i-1) || substr(i+1) for i in 1..len."""
    n = F.length(key)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(key.substr(F.lit(1), i - 1), key.substr(i + 1, n)),
    )
    # sequence(1, 0) counts DOWN in Spark — guard the empty key
    return F.when(n >= 1, dels).otherwise(F.array().cast("array<string>"))


def fuzzy_pairs_d1(
    df: DataFrame, key_col: str, id_col: str, max_bucket: int = 1000
) -> DataFrame:
    """(id_a, id_b, dist): all pairs with levenshtein(key_a, key_b) <= 1,
    id_a < id_b. Exact for distance <= 1 by the deletion-neighborhood
    property (empty keys included: their neighborhood is the empty
    string itself)."""
    key, did = F.col(key_col), F.col(id_col)
    variants = df.select(
        did.alias("_id"),
        key.alias("_key"),
        F.explode(
            F.array_distinct(F.concat(F.array(key), _deletions(key)))
        ).alias("_v"),
    )
    capped = variants.withColumn(
        "_bucket_size", F.count(F.lit(1)).over(Window.partitionBy("_v"))
    ).filter(F.col("_bucket_size") <= max_bucket)
    a = capped.select(
        F.col("_v").alias("v"), F.col("_id").alias("id_a"), F.col("_key").alias("key_a")
    )
    b = capped.select(
        F.col("_v").alias("v"), F.col("_id").alias("id_b"), F.col("_key").alias("key_b")
    )
    cand = (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "key_a", "id_b", "key_b")
        .distinct()
    )
    return cand.filter(F.levenshtein("key_a", "key_b") <= 1).select(
        "id_a", "id_b", F.levenshtein("key_a", "key_b").alias("dist")
    )
