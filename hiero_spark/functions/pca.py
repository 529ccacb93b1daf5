"""PCA projection (SURVEY.md §2.8 F7: LinearProjectionMap fed by
FullCorrelationSketch).

Architecture mirrors the reference exactly — and it is the right shape at
100 TB: the d×d covariance is computed as ONE distributed aggregation pass
(d sums + d(d+1)/2 product sums, all algebraic, partial+final merge), the
eigendecomposition happens on the driver where the d×d matrix is tiny, and
the projection is a pure column expression (JVM codegen, no Python, no
second shuffle). Driver-side work is O(d³) independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def covariance_fit(df: DataFrame, cols: list[str]):
    """One-pass mean vector + covariance matrix. Returns (n, mean, cov) as
    plain Python/numpy values (the 'root node' of the sketch tree)."""
    import numpy as np

    d = len(cols)
    aggs = [F.count(F.lit(1)).alias("_n")]
    aggs += [F.sum(F.col(c)).alias(f"_s{i}") for i, c in enumerate(cols)]
    aggs += [
        F.sum(F.col(cols[i]) * F.col(cols[j])).alias(f"_p{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    row = df.agg(*aggs).collect()[0]
    n = row["_n"]
    mean = np.array([row[f"_s{i}"] / n for i in range(d)])
    cov = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            cov[i, j] = cov[j, i] = row[f"_p{i}_{j}"] / n - mean[i] * mean[j]
    return n, mean, cov


def pca_fit(df: DataFrame, cols: list[str], k: int):
    """Top-k principal directions. Returns (mean, components[d,k], variances[k]).

    Sign convention: each component's largest-|loading| entry is positive,
    so directions are deterministic (eigenvectors are sign-ambiguous).
    """
    import numpy as np

    _, mean, cov = covariance_fit(df, cols)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for c in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, c])))
        if comps[i, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps, w[order]


def pca_project(df: DataFrame, cols: list[str], k: int = 2, prefix: str = "pc") -> DataFrame:
    """Append pc1..pck columns: centered projection onto the top-k principal
    components, built as pure column expressions."""
    mean, comps, _ = pca_fit(df, cols, k)
    out = []
    for c in range(comps.shape[1]):
        expr = None
        for i, col in enumerate(cols):
            term = (F.col(col) - float(mean[i])) * float(comps[i, c])
            expr = term if expr is None else expr + term
        out.append(expr.alias(f"{prefix}{c + 1}"))
    return df.select("*", *out)
