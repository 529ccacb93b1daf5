"""BM25 full-text ranking over a document corpus.

The retrieval primitive every corpus-curation and RAG pipeline needs
beside embedding ANN: score documents against a term query with
Okapi BM25 and return the top-k. Shape at 100 TB:

- the token explode is filtered to the QUERY terms before any shuffle —
  the relation that moves is (doc, query-term) hits, bounded by
  |q| * n_docs_matching, never the corpus token stream;
- per-term document frequencies aggregate from that same filtered
  relation and broadcast back (|q| rows);
- corpus stats (N, avgdl) are two scalars — one agg, O(1) driver state,
  same bounded-model contract as the classifier/PCA fits;
- top-k is orderBy+limit => TakeOrderedAndProject, never a global sort.

Cross-engine exactness (the tf_idf_keywords conventions,
queries/northstar.py): IDF uses the smooth RATIO
(N - df + 0.5) / (df + 0.5) rather than its ln() — +,*,/ are
IEEE-defined and bit-identical across engines while ln() is not
ulp-guaranteed — and the per-document sum over matched terms folds in
SORTED TERM ORDER via aggregate() over an array_sort'ed struct array
(the ext_ewma_levels fold pattern), so float addition order cannot
diverge between engines or partitionings. Scores are therefore
bit-identical pre-round; ROUND(6) is display only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 against `query_terms` (whitespace/lowercase
    tokenization). Returns (id, n_terms matched, bm25 rounded to 6)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tokenized = docs.select(F.col(id_col), toks.alias("w"))
    # two scalars of corpus state: N and average document length
    n_docs, total_toks = tokenized.agg(
        F.count(F.lit(1)), F.sum(F.size("w"))
    ).collect()[0]
    avgdl = float(total_toks) / float(n_docs)

    hits = (
        tokenized.select(
            id_col, F.size("w").alias("dl"), F.explode("w").alias("tok")
        )
        .filter(F.col("tok").isin(list(query_terms)))  # before ANY shuffle
    )
    tf = hits.groupBy(id_col, "dl", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = tf.join(F.broadcast(dfreq), "tok").select(
        id_col,
        "tok",
        (idf * (F.col("tf") * (k1 + 1.0)) / denom).alias("c"),
    )
    scored = (
        contrib.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            # fold in sorted term order, seed 0.0: addition order is pinned
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("tok", "c"))),
                F.lit(0.0),
                lambda acc, x: acc + x["c"],
            ).alias("s"),
        )
    )
    return (
        scored.orderBy(F.desc("s"), F.asc(id_col))
        .limit(k)
        .select(id_col, "n_terms", F.round("s", 6).alias("bm25"))
    )
