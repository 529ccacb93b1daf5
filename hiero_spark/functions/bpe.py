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
  the symbol arrays.  The merge application is a native `aggregate`
  fold over the DICT (not the corpus): a linear left-to-right scan per
  word, the same greedy-adjacent rule reference BPE uses, with no
  JVM<->Python boundary (round 14 — it was a pandas_udf, one
  ArrowEvalPython round trip per un-checkpointed merge layer).  Driver
  state is the merge list, O(n_merges).
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


def _merge_apply_expr(syms, a: str, b: str):
    """Single-merge application as a native fold — greedy left-to-right
    replace of adjacent (a, b) with a+b in each symbol array, with NO
    Python boundary (round-14, guide §4: the previous pandas_udf form
    stacked one ArrowEvalPython round trip per un-checkpointed merge).

    The fold appends each symbol unless the accumulator's LAST element
    equals `a` and the current symbol equals `b`, in which case the last
    element is replaced by a+b.  This is equivalent to the index-based
    greedy scan (skip-2 on merge) because a merge's output token a+b can
    never itself equal `a` — symbols are non-empty (split(word, '')
    yields no empty strings; merges concatenate non-empty pieces), so
    `b` is non-empty and a+b != a — which means a just-merged element
    can never serve as the left half of a follow-up merge, exactly the
    property the skip-2 scan enforces.  Pinned by the classic-fixture,
    determinism and encode-round-trip tests in tests/test_bpe.py."""
    merged = a + b
    return F.aggregate(
        syms,
        F.slice(syms, 1, 0),  # typed empty array<string>
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


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
            _merge_apply_expr(F.col("syms"), a, b).alias("syms"), F.col("count")
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
