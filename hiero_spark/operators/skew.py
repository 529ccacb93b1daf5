"""Skew-handling utilities for hot-key joins (the 100 TB toolkit).

Spark already covers two of the three skew regimes: map-side partial
aggregation absorbs skewed groupBy keys, and AQE's skewJoin splits
oversized sort-merge partitions at runtime. The remaining regime — a
shuffle join where one side has a few pathologically hot keys and the
other side is too big to broadcast — is handled here by salting:
replicate the smaller side `salt` times and scatter the big side's hot
rows uniformly across the replicas, turning one straggler partition into
`salt` even ones at the cost of a `salt`-times-larger small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SALT = "_hiero_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Row-level semantics are identical to `big.join(small, on, how)` for
    inner/left joins (each big row matches exactly one replica). The salt
    column never leaves this function.
    """
    big_s = big.withColumn(_SALT, F.floor(F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_s.join(small_s, on + [_SALT], how).drop(_SALT)


def top_keys(df: DataFrame, cols: list[str], k: int = 20) -> DataFrame:
    """Hot-key probe: the k most frequent key combos with counts — run this
    (cheap: partial-agg + top-k) to decide whether salting is warranted."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(k)
    )
