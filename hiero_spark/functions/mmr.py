"""Maximal Marginal Relevance (MMR) diversified retrieval.

Plain top-k over a crawl-scale embedding corpus returns near-duplicate
clusters — the highest-relevance region of the space is usually one
boilerplate family repeated.  MMR (Carbonell & Goldstein, SIGIR'98) is
the standard fix every RAG/retrieval stack ships: greedily pick the
candidate maximizing

    lambda * rel(q, d)  -  (1 - lambda) * max_{s in selected} sim(d, s)

so each pick is relevant AND far from what's already chosen.

Scale shape: the corpus-wide work is exactly the bounded batch-ANN scan
(`batch_topk`'s shape — Q broadcast queries x N corpus in ONE pass, a
per-query top-N window, vectors never shuffle beyond the N survivors).
The greedy loop — inherently sequential, k steps — runs INSIDE ONE
Arrow batch per query via applyInPandas over the N-candidate group
(N x dims int64 matrix, an O(N^2 d) matmul on <=24 rows).  Nothing
driver-side, nothing quadratic in the corpus: at 100 TB the cost is the
one scoring scan; diversification is free.

Exactness design (the centroid_outliers discipline): vectors quantize
to MICRO-UNIT longs (round(x*1e6), half-away-from-zero in both
engines), relevance and pairwise similarity are INTEGER inner products
(<= 64 * 1.1e6^2 ~ 7.7e13 << 2^63), and lambda=0.7 is the integer pair
(7, 3) scaling the objective by 10: score = 7*rel - 3*max_sim.  Every
score is an exact long, ties break on doc_id, so the full (query, rank,
doc, score) table hash-matches an unrolled-CTE SQL oracle with no
tolerance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICRO = 1_000_000


def quantize_micro(vec: Column) -> Column:
    """array<float> -> array<long> micro-units; round() is
    half-away-from-zero in both Spark and DuckDB (quantize.py
    convention), so quantized values are oracle-identical."""
    return F.transform(
        vec.cast("array<double>"), lambda x: F.round(x * MICRO).cast("long")
    )


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda s, v: s + v
    )


def mmr_diversify(
    emb: DataFrame,
    queries: DataFrame,
    n_candidates: int = 24,
    k: int = 8,
    lam_num: int = 7,
    lam_den: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Diversified top-k for every query: one broadcast scoring scan,
    per-query top-`n_candidates` window, then the k-step greedy inside
    one Arrow batch per query.  Returns (query_id, rank, doc_id,
    mmr_score) — rank 1..k in selection order, score = the integer
    objective lam_den*MMR at the moment of selection (rank 1 has no
    diversity term: lam_num * rel).
    """
    from pyspark.sql.window import Window

    if not 0 < lam_num <= lam_den:
        raise ValueError("lambda must satisfy 0 < lam_num <= lam_den")
    lam2 = lam_den - lam_num

    qc = emb.select(F.col(id_col).alias("doc_id"), quantize_micro(F.col(vec_col)).alias("qv"))
    qs = queries.select(
        F.col(qid_col).alias("query_id"), quantize_micro(F.col(qvec_col)).alias("qq")
    )
    scored = qc.crossJoin(F.broadcast(qs)).select(
        "query_id", "doc_id", "qv", _int_dot(F.col("qv"), F.col("qq")).alias("rel")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    cand = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_candidates)
        .drop("_rn")
    )

    def pick(pdf):
        import numpy as np
        import pandas as pd

        V = np.array(pdf["qv"].tolist(), dtype=np.int64)
        rel = pdf["rel"].to_numpy(np.int64)
        ids = pdf["doc_id"].to_numpy(np.int64)
        qid = int(pdf["query_id"].iloc[0])
        S = V @ V.T  # exact int64 pairwise inner products
        n = len(ids)
        selected: list[int] = []
        out = []
        for step in range(min(k, n)):
            if selected:
                scores = lam_num * rel - lam2 * S[:, selected].max(axis=1)
            else:
                scores = lam_num * rel
            order = np.lexsort((ids, -scores))  # score desc, doc_id asc
            best = next(i for i in order if i not in selected)
            selected.append(int(best))
            out.append((qid, step + 1, int(ids[best]), int(scores[best])))
        return pd.DataFrame(out, columns=["query_id", "rank", "doc_id", "mmr_score"])

    return cand.groupBy("query_id").applyInPandas(
        pick, "query_id long, rank int, doc_id long, mmr_score long"
    )


def mmr_oracle_sql(
    n_queries: int = 4, n_candidates: int = 24, k: int = 8,
    lam_num: int = 7, lam_den: int = 10, table: str = "embeddings",
) -> str:
    """Generate the unrolled-CTE SQL twin of `mmr_diversify` (queries =
    the first `n_queries` vectors of `table`).  The greedy loop needs an
    aggregate (max sim to the selected set) per step, which recursive
    CTEs disallow in the recursive term — with k fixed, the loop unrolls
    into k chained CTEs instead, each picking the argmax via a window.
    SUMs are cast to BIGINT (DuckDB sums BIGINT into HUGEINT).

    Every CTE is AS MATERIALIZED: the chained sel{s} references make the
    dependency graph deep, and DuckDB's default CTE INLINING re-evaluates
    each referenced CTE per reference — exponential (2^k) re-execution of
    the whole rel/sim pipeline (measured: >5 min at sf0.01 inlined,
    sub-second materialized)."""
    lam2 = lam_den - lam_num
    steps = []
    for s in range(2, k + 1):
        steps.append(f"""p{s} AS MATERIALIZED (
  SELECT query_id, doc_id, mmr_score, {s} AS rank FROM (
    SELECT c.query_id, c.doc_id,
           {lam_num} * c.rel - {lam2} * MAX(m.sim) AS mmr_score
    FROM cand c
    JOIN sel{s - 1} t ON t.query_id = c.query_id
    JOIN sim m ON m.query_id = c.query_id AND m.da = c.doc_id
              AND m.db = t.doc_id
    WHERE c.doc_id NOT IN
          (SELECT doc_id FROM sel{s - 1} x WHERE x.query_id = c.query_id)
    GROUP BY c.query_id, c.doc_id, c.rel
  ) QUALIFY ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY mmr_score DESC, doc_id) = 1
),
sel{s} AS MATERIALIZED (SELECT * FROM sel{s - 1} UNION ALL SELECT * FROM p{s})""")
    unrolled = ",\n".join(steps)
    return f"""WITH cq AS MATERIALIZED (
  SELECT vec_id, i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {MICRO}, 0) AS BIGINT) AS v
  FROM {table}, UNNEST(range(1, len(embedding) + 1)) AS t(i)
),
rel AS MATERIALIZED (
  SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
         CAST(SUM(q.v * d.v) AS BIGINT) AS rel
  FROM cq q JOIN cq d ON q.i = d.i
  WHERE q.vec_id < {n_queries}
  GROUP BY 1, 2
),
cand AS MATERIALIZED (
  SELECT query_id, doc_id, rel FROM rel
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, doc_id) <= {n_candidates}
),
sim AS MATERIALIZED (
  SELECT a.query_id, a.doc_id AS da, b.doc_id AS db,
         CAST(SUM(x.v * y.v) AS BIGINT) AS sim
  FROM cand a
  JOIN cand b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id
  JOIN cq x ON x.vec_id = a.doc_id
  JOIN cq y ON y.vec_id = b.doc_id AND y.i = x.i
  GROUP BY 1, 2, 3
),
p1 AS MATERIALIZED (
  SELECT query_id, doc_id, {lam_num} * rel AS mmr_score, 1 AS rank FROM cand
  QUALIFY ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, doc_id) = 1
),
sel1 AS MATERIALIZED (SELECT query_id, doc_id, mmr_score, rank FROM p1),
{unrolled}
SELECT query_id, CAST(rank AS INT) AS rank, doc_id, mmr_score
FROM sel{k}"""
