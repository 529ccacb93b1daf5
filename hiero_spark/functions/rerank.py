"""Two-stage ANN: coarse retrieval in a PCA-reduced space, exact rerank
of the candidates — the standard production retrieval architecture
(retrieve cheap, rerank exact).

Why it matters at 100 TB: the coarse scan reads d_red/d of the vector
arithmetic (8/64 here) and can run over the int8 or PCA-projected
relation; only n_candidates rows ever get the full-dimension exact
cosine. Recall is controlled by n_candidates — the audit number the
verdict query pins.

PCA over an ARRAY column is fitted distributed: each partition emits its
partial (count, sum, Gram) via mapInPandas (numpy X^T X per Arrow
batch), the driver folds the partials — O(d^2) driver state — and takes
the top eigenvectors (deterministic sign convention as in
functions/pca.py). Partials fold in sorted partition order so the fit
is reproducible for a given layout.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F


def pca_fit_array(df: DataFrame, vec_col: str, dim: int, k: int):
    """(mean[d], components[d, k]) from one distributed Gram pass."""
    import numpy as np
    import pandas as pd

    def part(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        yield pd.DataFrame(
            {"n": [n], "s": [s.tolist()], "g": [g.reshape(-1).tolist()]}
        )

    parts = df.select(vec_col).mapInPandas(
        part, schema="n long, s array<double>, g array<double>"
    ).collect()
    parts = sorted(parts, key=lambda r: (r["n"], r["s"]))  # fold order pinned
    n = sum(r["n"] for r in parts)
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in parts:
        s += np.array(r["s"])
        g += np.array(r["g"]).reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for c in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, c])))
        if comps[i, c] < 0:
            comps[:, c] = -comps[:, c]
    return mean, comps


def _project_expr(vec, mean, comps, c):
    """Σ_i (vec[i] - mean_i) * comps[i, c] as a column expression."""
    expr = None
    for i in range(len(mean)):
        term = (vec[i] - float(mean[i])) * float(comps[i, c])
        expr = term if expr is None else expr + term
    return expr


def pca_rerank_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 50,
    d_red: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-rerank top-k: coarse top-n_candidates by cosine in the
    d_red-dim PCA space, then exact full-dim cosine on those candidates
    only. The full vector rides along with the candidates, so the rerank
    is projection arithmetic on n_candidates rows — no second corpus
    scan, no join."""
    import math

    dim = len(query_vec)
    mean, comps = pca_fit_array(emb, vec_col, dim, d_red)
    v = F.col(vec_col).cast("array<double>")
    red = [ _project_expr(v, mean, comps, c) for c in range(d_red) ]
    q_red = [
        sum((query_vec[i] - mean[i]) * comps[i, c] for i in range(dim))
        for c in range(d_red)
    ]
    q_norm = math.sqrt(sum(x * x for x in q_red)) or 1.0
    dot = None
    nrm = None
    for c in range(d_red):
        t = red[c] * float(q_red[c])
        sq = red[c] * red[c]
        dot = t if dot is None else dot + t
        nrm = sq if nrm is None else nrm + sq
    coarse_cos = dot / (F.sqrt(nrm) * F.lit(q_norm))
    candidates = (
        emb.select(F.col(id_col), v.alias("_v"), coarse_cos.alias("_coarse"))
        .orderBy(F.desc("_coarse"), F.asc(id_col))
        .limit(n_candidates)
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    fdot = F.aggregate(
        F.zip_with(F.col("_v"), q, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    fnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("_v"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    exact_cos = fdot / (fnorm * F.lit(qn))
    return (
        candidates.select(
            F.col(id_col).alias("neighbor_id"), exact_cos.alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(k)
    )
