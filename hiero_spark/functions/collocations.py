"""PMI collocation mining: which word pairs co-occur more than chance.

The corpus-linguistics staple (Church & Hanks 1990) behind phrase
discovery, tokenizer-vocab seeding, and boilerplate detection: rank
adjacent bigrams by pointwise mutual information

    PMI(x, y) = log P(x, y) / (P(x) P(y))

Scale shape: ONE explode of per-doc bigram arrays into a (w1, w2)
count aggregation (partial agg collapses each partition's repeats
map-side, so the shuffle carries distinct pairs, Zipf-compressed —
the BPE/word-freq discipline).  The unigram margins c_x / c_y are
GROUP-BYs OVER THE BIGRAM COUNT TABLE, never a second corpus scan,
and the final top-k is TakeOrdered (no global sort materialization).

Exactness: log is monotone, so ranking by PMI == ranking by the
integer cross-ratio  c_xy * N / (c_x * c_y).  We emit

    pmi_scaled = (c_xy * N * SCALE) DIV (c_x * c_y)

in pure long arithmetic — both engines truncate integer division
toward zero (dialect fact pinned in tests/test_incremental.py), so
the scores hash-match with no tolerance.  Overflow bound: the
`min_count` gate keeps c_xy * N * SCALE under 2^63 for corpora up to
~10^9 bigrams at SCALE=1e6; beyond that, drop SCALE a decade per
decade of corpus growth (the ordering is unchanged — it's one shared
factor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def bigram_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w1, w2, c_xy) adjacent-bigram counts over whitespace tokens
    (trim+lower, the repo-wide BM25 tokenization convention)."""
    toks = docs.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("w")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    return pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-`k` bigrams by scaled-integer PMI among pairs seen at least
    `min_count` times.  Returns (w1, w2, c_xy, pmi_scaled) with the
    fully deterministic order key (pmi_scaled DESC, w1, w2) applied via
    TakeOrdered — rank ties are impossible because (w1, w2) is unique.
    """
    # Checkpoint the count table: four consumers (gate, both margins, N)
    # would otherwise each re-derive it — Catalyst's ReuseExchange can't
    # unify the branches because different join-key null filters get
    # pushed into each (observed: 4 corpus scans + 4 explodes without
    # this; 1 scan with it).  The checkpoint holds the Zipf-compressed
    # distinct-pair table, never the corpus.
    c = bigram_counts(docs, text_col).localCheckpoint()
    lx = c.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    rx = c.groupBy("w2").agg(F.sum("c_xy").alias("c_y"))
    nb = c.agg(F.sum("c_xy").alias("nb"))  # 1 row: scalar broadcast
    scored = (
        c.filter(F.col("c_xy") >= min_count)
        .join(lx, "w1")
        .join(rx, "w2")
        .join(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.expr(f"c_xy * nb * {SCALE} DIV (c_x * c_y)").alias("pmi_scaled"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_scaled"), F.asc("w1"), F.asc("w2")
    ).limit(k)


def pmi_oracle_sql(
    min_count: int = 5, k: int = 50, table: str = "documents"
) -> str:
    """DuckDB twin.  BIGINT casts everywhere DuckDB would widen to
    HUGEINT (SUM over BIGINT), so the `//` operands match Spark's longs
    bit-for-bit; both engines truncate `//` / `DIV` toward zero."""
    return f"""
        WITH d AS (
          SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS w
          FROM {table}
        ), b AS (
          SELECT w[i] AS w1, w[i + 1] AS w2
          FROM d, UNNEST(range(1, len(w))) AS t(i)
        ), c AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
          FROM b GROUP BY 1, 2
        ), lx AS (
          SELECT w1, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM c GROUP BY 1
        ), rx AS (
          SELECT w2, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM c GROUP BY 1
        ), n AS (
          SELECT CAST(SUM(c_xy) AS BIGINT) AS nb FROM c
        )
        SELECT c.w1, c.w2, c.c_xy,
               CAST(c.c_xy * nb * {SCALE} // (c_x * c_y) AS BIGINT)
                 AS pmi_scaled
        FROM c
        JOIN lx USING (w1)
        JOIN rx USING (w2)
        CROSS JOIN n
        WHERE c.c_xy >= {min_count}
        ORDER BY pmi_scaled DESC, w1, w2
        LIMIT {k}
    """
