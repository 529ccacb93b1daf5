"""MMR diversified retrieval: integer-exact greedy, planted-cluster
diversification, and Spark == reference-python equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hiero_spark.functions import mmr as M


def _mk_emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _ref_mmr(vecs, qvec, n_candidates, k, lam_num=7, lam_den=10):
    """Plain-python greedy twin (no numpy argmax subtleties)."""
    q = np.rint(np.asarray(qvec, dtype=np.float64) * M.MICRO).astype(np.int64)
    V = np.rint(np.asarray(vecs, dtype=np.float64) * M.MICRO).astype(np.int64)
    rel = V @ q
    order = sorted(range(len(vecs)), key=lambda i: (-rel[i], i))[:n_candidates]
    S = V @ V.T
    lam2 = lam_den - lam_num
    selected, out = [], []
    for step in range(min(k, len(order))):
        best = None
        for i in order:
            if i in selected:
                continue
            sc = lam_num * rel[i] - (
                lam2 * max(S[i][j] for j in selected) if selected else 0
            )
            if best is None or sc > best[0] or (sc == best[0] and i < best[1]):
                best = (sc, i)
        selected.append(best[1])
        out.append((step + 1, best[1], int(best[0])))
    return out


def test_planted_clusters_interleave(spark):
    # Query sits BETWEEN two clusters (closer to A). A-copies have mutual
    # sim ~1.0 but rel only ~0.8, so after one A pick the copy scores
    # 7*0.8 - 3*1.0 = 2.6 while orthogonal B scores 7*0.6 - 3*0 = 4.2:
    # MMR must pull B forward where pure top-4 returns A,A,A,B.
    vecs = [
        [1.00, 0.00], [0.999, -0.01], [0.998, -0.02],  # cluster A (ids 0-2)
        [0.00, 1.00], [-0.01, 0.999],                  # cluster B (ids 3-4)
    ]
    emb = _mk_emb(spark, vecs)
    queries = spark.createDataFrame(
        [(0, [0.8, 0.6])], "query_id long, query_vec array<float>"
    )
    got = (
        M.mmr_diversify(emb, queries, n_candidates=5, k=4)
        .orderBy("rank").select("doc_id").collect()
    )
    picks = [r.doc_id for r in got]
    assert picks[0] == 0                       # most relevant first
    assert picks[1] in (3, 4)                  # diversity beats 2nd copy
    assert picks != [0, 1, 2, 3]               # not the pure-relevance ORDER


def test_matches_reference_greedy_random(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16)).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    qvec = vecs[5] * 0.9 + 0.1 * rng.normal(size=16)
    emb = _mk_emb(spark, vecs)
    queries = spark.createDataFrame(
        [(0, [float(x) for x in qvec])], "query_id long, query_vec array<float>"
    )
    got = (
        M.mmr_diversify(emb, queries, n_candidates=12, k=6)
        .orderBy("rank").collect()
    )
    want = _ref_mmr(vecs, qvec, n_candidates=12, k=6)
    assert [(r["rank"], r.doc_id, r.mmr_score) for r in got] == want


def test_k_exceeds_candidates(spark):
    emb = _mk_emb(spark, [[1.0, 0.0], [0.0, 1.0]])
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0])], "query_id long, query_vec array<float>"
    )
    out = M.mmr_diversify(emb, queries, n_candidates=5, k=8).collect()
    assert len(out) == 2  # gracefully truncates to the candidate pool


def test_lambda_validation(spark):
    emb = _mk_emb(spark, [[1.0]])
    with pytest.raises(ValueError):
        M.mmr_diversify(emb, emb, lam_num=0)


def test_oracle_sql_matches_spark(spark, duck):
    """The generated unrolled-CTE oracle reproduces the Spark greedy
    exactly on the real sf0.01 embeddings (the registry query's shape)."""
    from tests.conftest import SF_ORACLE

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = (
        M.mmr_diversify(emb, queries, n_candidates=24, k=8)
        .orderBy("query_id", "rank").collect()
    )
    want = duck.sql(
        M.mmr_oracle_sql() + " ORDER BY query_id, rank"
    ).fetchall()
    assert [(r.query_id, r["rank"], r.doc_id, r.mmr_score) for r in got] == [
        tuple(w) for w in want
    ]
