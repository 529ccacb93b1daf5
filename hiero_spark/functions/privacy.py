"""Differentially-private aggregate release: the step past auditing.

ext_k_anonymity and ext_l_diversity AUDIT a release; this module
produces one — per-group counts with truncated discrete-Laplace
(two-sided geometric) noise, the mechanism DP count releases actually
use (alpha^|k| mass, sensitivity-1 counts => eps-DP up to the
documented truncation). Three design decisions carry the verifiability
story the rest of the repo runs on:

- Noise is drawn by INVERSE CDF against a uniform in [0,1): the CDF of
  the truncated mechanism is a fixed list of 2*trunc constants computed
  once driver-side and embedded as literals in BOTH the Spark plan and
  the DuckDB oracle, so noise = -trunc + #(thresholds <= u) is a pure
  comparison fold — bit-identical across engines, hash-checked with no
  tolerance.
- The uniform comes from a seeded LCG over the group's integer key in
  exact BIGINT arithmetic, divided by 2^31 (a dyadic, so the double is
  exact). A pluggable generator is the explicit seam: PRODUCTION MUST
  SUPPLY SECRET RANDOMNESS — a deterministic seed makes the release
  reproducible for tests/audits but voids the privacy guarantee, which
  is exactly the trade a verification harness wants and a real release
  must flip.
- Truncation at +/-trunc bounds the error a consumer sees; the pmf mass
  beyond the truncation (reported by `truncated_mass`) quantifies the
  (eps, delta)-style slack it introduces.

Scale shape: one partial+final groupBy for the counts; the noise is a
per-row expression over the group keys (no shuffle, no UDF — a fold of
2*trunc codegen comparisons). Output is bounded by the group domain.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31; u = x / 2^31 is an exact dyadic double


def discrete_laplace_cdf(eps: float, trunc: int) -> list[float]:
    """Cumulative probabilities of the truncated discrete Laplace on
    [-trunc, trunc]: pmf(k) proportional to exp(-eps)^|k|. Returns the
    2*trunc interior thresholds; noise = -trunc + #(thresholds <= u)."""
    alpha = math.exp(-eps)
    pmf = [alpha ** abs(k) for k in range(-trunc, trunc + 1)]
    z = sum(pmf)
    cdf, acc = [], 0.0
    for p in pmf[:-1]:
        acc += p / z
        cdf.append(acc)
    return cdf


def truncated_mass(eps: float, trunc: int) -> float:
    """Probability mass the UNtruncated mechanism puts beyond +/-trunc —
    the delta-style slack truncation introduces (two geometric tails)."""
    alpha = math.exp(-eps)
    # untruncated Z = (1 + alpha) / (1 - alpha); each tail sums
    # alpha^(trunc+1) / (1 - alpha)
    return 2 * alpha ** (trunc + 1) / (1 + alpha)


def lcg_uniform(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform in [0,1) from an integer group key: one
    LCG step in exact BIGINT arithmetic, then an exact dyadic division.
    The seed shifts the KEY before the multiply (an additive constant
    after it would move u by only seed/2^31 — too small to cross any
    CDF threshold). pmod, not %: truncated modulo follows the dividend's
    sign, so a negative key yielded u in (-1, 0), every CDF threshold
    comparison failed, and the noise silently degenerated to the
    constant -trunc — with both engines agreeing, so parity hid it
    (round-8 ADVICE). Replace with secret randomness for a real release
    (see module docstring)."""
    x = F.pmod(
        (key.cast("long") + F.lit(seed)) * F.lit(LCG_A) + F.lit(LCG_C),
        F.lit(LCG_M),
    )
    return x / F.lit(float(LCG_M))


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    eps: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> DataFrame:
    """(group..., released): per-group count plus truncated discrete-
    Laplace noise. `key_col` must be an integer-typed group column (it
    seeds the per-group noise draw). The true count is intentionally
    NOT in the output — releasing it next to the noisy value would
    defeat the mechanism; tests recover it independently."""
    cdf = discrete_laplace_cdf(eps, trunc)
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    u = lcg_uniform(F.col(key_col), seed)
    noise = sum(
        (F.when(u >= F.lit(c), 1).otherwise(0) for c in cdf),
        F.lit(-trunc),
    )
    return counts.select(
        *group_cols, (F.col("_n") + noise).cast("long").alias("released")
    )


def dp_oracle_sql(
    table_sql: str,
    group_cols: list[str],
    key_col: str,
    eps: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> str:
    """The DuckDB mirror of dp_noisy_counts: SAME literal thresholds
    (repr round-trips the exact double), SAME LCG arithmetic. Kept next
    to the implementation so the constants cannot drift apart."""
    cdf = discrete_laplace_cdf(eps, trunc)
    gcols = ", ".join(group_cols)
    noise_terms = " + ".join(
        f"(CASE WHEN u >= CAST({c!r} AS DOUBLE) THEN 1 ELSE 0 END)"
        for c in cdf
    )
    return f"""
        WITH c AS (
          SELECT {gcols}, COUNT(*) AS n,
                 -- pmod, not %: DuckDB's % is truncated too (see
                 -- lcg_uniform docstring)
                 (((((CAST({key_col} AS BIGINT) + {seed}) * {LCG_A} + {LCG_C})
                   % {LCG_M}) + {LCG_M}) % {LCG_M})
                   / CAST({LCG_M} AS DOUBLE) AS u
          FROM {table_sql} GROUP BY {gcols}
        )
        SELECT {gcols},
               CAST(n + ({noise_terms}) - {trunc} AS BIGINT) AS released
        FROM c
    """


def dp_noisy_mean(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    key_expr: Column,
    lo: int,
    hi: int,
    eps_sum: float = 0.5,
    eps_count: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> DataFrame:
    """(group..., released_mean): the standard bounded-mean mechanism —
    clamp values to [lo, hi] (the sensitivity bound), release
    noisy_sum / noisy_count with independent truncated discrete-Laplace
    draws (sum noise scales by the clamp width, the sum's sensitivity;
    count noise is sensitivity-1).  Same inverse-CDF literal machinery
    as dp_noisy_counts, so the whole release is bit-identical across
    engines.  `key_expr` must be an integer column/expression derivable
    from the group key (it seeds both draws; seed and seed+1 decorrelate
    them)."""
    cdf_s = discrete_laplace_cdf(eps_sum, trunc)
    cdf_c = discrete_laplace_cdf(eps_count, trunc)
    clamped = F.greatest(F.lit(lo), F.least(F.lit(hi), F.col(value_col)))
    agg = df.groupBy(*group_cols).agg(
        F.sum(clamped.cast("long")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    u_s = lcg_uniform(key_expr, seed)
    u_c = lcg_uniform(key_expr, seed + 1)
    noise_s = sum(
        (F.when(u_s >= F.lit(c), 1).otherwise(0) for c in cdf_s), F.lit(-trunc)
    ) * F.lit(hi - lo)
    noise_c = sum(
        (F.when(u_c >= F.lit(c), 1).otherwise(0) for c in cdf_c), F.lit(-trunc)
    )
    denom = F.col("_n") + noise_c
    released = F.when(
        denom > 0,
        (F.col("_s") + noise_s).cast("double") / denom.cast("double"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        *group_cols, F.round(released, 6).alias("released_mean")
    )


def dp_mean_oracle_sql(
    table_sql: str,
    group_cols: list[str],
    value_col: str,
    key_sql: str,
    lo: int,
    hi: int,
    eps_sum: float = 0.5,
    eps_count: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> str:
    """DuckDB mirror of dp_noisy_mean (same literal thresholds, same
    pmod-expanded LCG; `key_sql` mirrors key_expr)."""
    cdf_s = discrete_laplace_cdf(eps_sum, trunc)
    cdf_c = discrete_laplace_cdf(eps_count, trunc)
    gcols = ", ".join(group_cols)

    def u(seed_val: int) -> str:
        return (
            f"(((((CAST({key_sql} AS BIGINT) + {seed_val}) * {LCG_A} + {LCG_C})"
            f" % {LCG_M}) + {LCG_M}) % {LCG_M}) / CAST({LCG_M} AS DOUBLE)"
        )

    def noise(cdf: list[float], uname: str) -> str:
        terms = " + ".join(
            f"(CASE WHEN {uname} >= CAST({c!r} AS DOUBLE) THEN 1 ELSE 0 END)"
            for c in cdf
        )
        return f"(({terms}) - {trunc})"

    return f"""
        WITH a AS (
          SELECT {gcols},
                 SUM(CAST(GREATEST({lo}, LEAST({hi}, {value_col}))
                     AS BIGINT)) AS s,
                 COUNT(*) AS n,
                 {u(seed)} AS us,
                 {u(seed + 1)} AS uc
          FROM {table_sql} GROUP BY {gcols}
        ), r AS (
          SELECT {gcols},
                 s + {noise(cdf_s, "us")} * ({hi} - {lo}) AS noisy_s,
                 n + {noise(cdf_c, "uc")} AS noisy_n
          FROM a
        )
        SELECT {gcols},
               ROUND(CASE WHEN noisy_n > 0
                          THEN CAST(noisy_s AS DOUBLE) / CAST(noisy_n AS DOUBLE)
                          ELSE 0.0 END, 6) AS released_mean
        FROM r
    """


def dp_noisy_histogram(
    df: DataFrame,
    domain: DataFrame,
    group_col: str,
    eps: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> DataFrame:
    """dp_noisy_counts over a KNOWN bounded domain: every domain value
    gets a released count, including groups with NO rows — omitting
    empty buckets leaks their emptiness exactly (presence/absence is the
    strongest membership signal), so a real histogram release completes
    the domain first. `domain` is the dimension table of legal values
    (broadcastable by definition); observed counts left-join onto it
    and absent groups release 0 + noise like any other."""
    cdf = discrete_laplace_cdf(eps, trunc)
    counts = df.groupBy(F.col(group_col)).agg(F.count(F.lit(1)).alias("_n"))
    dom = domain.select(F.col(domain.columns[0]).alias(group_col))
    full = dom.join(F.broadcast(counts), group_col, "left").select(
        group_col, F.coalesce(F.col("_n"), F.lit(0)).alias("_n")
    )
    u = lcg_uniform(F.col(group_col), seed)
    noise = sum(
        (F.when(u >= F.lit(c), 1).otherwise(0) for c in cdf),
        F.lit(-trunc),
    )
    return full.select(
        group_col, (F.col("_n") + noise).cast("long").alias("released")
    )


def dp_histogram_oracle_sql(
    table_sql: str,
    domain_sql: str,
    group_col: str,
    domain_col: str,
    eps: float = 0.5,
    trunc: int = 20,
    seed: int = 0,
) -> str:
    """DuckDB mirror of dp_noisy_histogram (same literal thresholds)."""
    cdf = discrete_laplace_cdf(eps, trunc)
    noise_terms = " + ".join(
        f"(CASE WHEN u >= CAST({c!r} AS DOUBLE) THEN 1 ELSE 0 END)"
        for c in cdf
    )
    return f"""
        WITH c AS (
          SELECT {group_col}, COUNT(*) AS n FROM {table_sql}
          GROUP BY {group_col}
        ), full_dom AS (
          SELECT d.{domain_col} AS {group_col}, COALESCE(c.n, 0) AS n,
                 (((((CAST(d.{domain_col} AS BIGINT) + {seed}) * {LCG_A}
                   + {LCG_C}) % {LCG_M}) + {LCG_M}) % {LCG_M})
                   / CAST({LCG_M} AS DOUBLE) AS u
          FROM {domain_sql} d LEFT JOIN c ON c.{group_col} = d.{domain_col}
        )
        SELECT {group_col},
               CAST(n + ({noise_terms}) - {trunc} AS BIGINT) AS released
        FROM full_dom
    """
