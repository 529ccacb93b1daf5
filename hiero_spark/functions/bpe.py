"""In-engine BPE tokenizer training (SURVEY.md §2.11 N4 extension).

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) is the
tokenizer-training step of every LLM data pipeline.  The classic
scalability trick makes it engine-friendly: training never touches the
corpus again after ONE groupBy — it operates on the word-frequency
DICTIONARY (distinct words + counts), which is orders of magnitude
smaller than the corpus (Zipf: a 100 TB crawl has ~10^7 distinct words).

- `word_dict`: corpus -> (word, count) — the one corpus-scale shuffle.
- `train_bpe`: driver-looped merge rounds over the dict.  Each round:
  explode each word's adjacent symbol pairs weighted by word count,
  one partial+final count aggregation, take the top pair (count desc,
  then lexicographic — fully deterministic), then apply the merge to
  the symbol arrays.  The merge application is a vectorized pandas_udf
  over the DICT (not the corpus): a linear left-to-right scan per word,
  the same greedy-adjacent rule reference BPE uses.  Driver state is the
  merge list, O(n_merges).
- `bpe_encode`: apply a trained merge list to documents — per-row, no
  shuffle; token counts come out as a column.

The dict DataFrame is localCheckpointed every few merges: each merge
adds a plan layer, and 30+ stacked pandas_udf stages otherwise make the
lineage unexecutable (same lesson as dedup clustering's label
propagation)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def word_dict(df: DataFrame, text_col: str) -> DataFrame:
    """(word, count): the corpus compressed to its vocabulary — the only
    corpus-scale aggregation BPE training needs."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_apply_udf(a: str, b: str):
    """Vectorized single-merge application: greedy left-to-right replace
    of adjacent (a, b) with a+b in each symbol array."""
    merged = a + b

    @pandas_udf("array<string>")
    def _apply(syms: pd.Series) -> pd.Series:
        def one(arr):
            out = []
            i, n = 0, len(arr)
            while i < n:
                if i + 1 < n and arr[i] == a and arr[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            return out

        return syms.map(one)

    return _apply


def train_bpe(
    words: DataFrame, n_merges: int = 10, checkpoint_every: int = 4
) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from a (word, count) dictionary.

    Returns the merge list in learned order.  Ties in pair frequency
    break lexicographically, so the result is deterministic across runs
    and partitionings.  Stops early if no adjacent pair remains."""
    spark = words.sparkSession
    dic = words.select(
        F.split(F.col("word"), "").alias("syms"), F.col("count")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for step in range(n_merges):
        pairs = dic.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                    F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
            F.col("count"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("count").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        dic = dic.select(
            _merge_apply_udf(a, b)(F.col("syms")).alias("syms"), F.col("count")
        )
        if (step + 1) % checkpoint_every == 0:
            dic = dic.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]],
    id_col: str = "doc_id", out: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize documents with a trained merge list: per-word greedy merge
    application in learned order (reference BPE semantics), emitted as a
    token-count column plus the first tokens for inspection.  Narrow
    per-row pandas_udf over Arrow batches — no shuffle, no driver loop."""
    merge_list = list(merges)

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        def one(text):
            toks = []
            for w in (text or "").strip().lower().split():
                syms = list(w)
                for a, b in merge_list:
                    out_syms = []
                    i, n = 0, len(syms)
                    while i < n:
                        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                            out_syms.append(a + b)
                            i += 2
                        else:
                            out_syms.append(syms[i])
                            i += 1
                    syms = out_syms
                toks.extend(syms)
            return toks

        return texts.map(one)

    return df.select(
        F.col(id_col),
        _encode(F.col(text_col)).alias(out),
    ).withColumn("n_bpe_tokens", F.size(F.col(out)).cast("long"))
