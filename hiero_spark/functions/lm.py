"""In-engine n-gram language model for perplexity-based quality scoring
(SURVEY.md §2.11 N4 extension).

CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks CommonCrawl documents
by language-model perplexity — low-perplexity text reads like the
training corpus, high-perplexity text is boilerplate/gibberish.  The
production version uses KenLM; this is the same signal from a
Laplace-smoothed bigram model trained and applied entirely as DataFrame
ops, so the whole train -> score loop is distributed and SQL-mirrorable
(the DuckDB oracle recomputes it exactly):

    p(w2 | w1) = (c2(w1,w2) + 1) / (c1(w1) + V)

- train: two partial+final count aggregations over exploded bigrams /
  unigrams of the training split.  The model IS a pair of DataFrames —
  at 100 TB it stays distributed (no driver collect; V, a scalar, is the
  only driver state) and the scoring joins shuffle on gram keys.
- score: per-doc mean log p over its bigrams via two left joins
  (bigram counts, then first-token counts) and one groupBy.  Unseen
  bigrams fall back to the smoothed floor 1/(c1+V) or 1/V — never
  log(0).

Docs with < 2 tokens have no bigrams and score NULL (callers gate on
n_bigrams).  Log-domain means are rounded by callers for cross-engine
hashing (ln agrees to ~1e-15 between engines; 6 decimals is safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w1, w2) for every adjacent token pair (duplicates kept —
    counts, not sets)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(toks)
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(
        F.col(id_col).alias("doc"), F.explode(pairs).alias("bg")
    ).select("doc", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def train_bigram_lm(
    train_df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame, int]:
    """Fit the smoothed bigram model on a corpus.

    Returns (unigram_counts(w1, c1), bigram_counts(w1, w2, c2), V) where
    V is the distinct-unigram vocabulary size.  Two shuffles (one per
    count table); both stay distributed."""
    bg = _doc_bigrams(train_df, text_col, id_col)
    toks = train_df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("w1")
    ).filter(F.col("w1") != "")
    c1 = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    v = c1.count()
    return c1, c2, v


def lm_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    c1: DataFrame,
    c2: DataFrame,
    vocab_size: int,
) -> DataFrame:
    """(id, n_bigrams, avg_logp): mean log p(w2|w1) per document under the
    trained model.  Two left equi-joins on gram keys + one groupBy doc —
    all shuffles are on fixed keys and partial-aggregated."""
    bg = _doc_bigrams(df, text_col, id_col)
    scored = (
        bg.join(c2, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .select(
            "doc",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1.0)
                / (F.coalesce(F.col("c1"), F.lit(0)) + float(vocab_size))
            ).alias("_lp"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc"))
        .join(
            scored.groupBy("doc").agg(
                F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.mean("_lp").alias("avg_logp"),
            ),
            "doc",
            "left",
        )
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logp",
        )
    )
