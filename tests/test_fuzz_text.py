"""Differential fuzzing for the text metrics (round-5 verdict item 6).

The r5 wrong-answer bug (top_2gram_share > 1.0 on overlapping repeats)
lived in a text operator whose DuckDB oracle MIRRORED the bug — parity
stayed green while the metric violated its own bound. Two defenses here:

1. Differential: hypothesis-generated documents (not the fixture corpus,
   whose word-soup never produces overlapping bigrams or trailing
   whitespace) run through the Spark expressions AND an independent DuckDB
   recomputation of the documented formulas; every value must match.
   A divergence means the "same formula" claim the n4 oracles make is
   false for some input class — exactly what the fixtures can't witness.
2. Bounds: the documented invariants (shares in [0,1], counts >= 1,
   ratios >= 0, no nulls) are asserted on the Spark output independently
   of DuckDB, so a mirrored bug still fails.

The alphabet is adversarial on purpose: newlines (line metrics), tabs +
trailing whitespace (tokenizer edge), repeated short tokens (overlapping
bigrams), SQL quotes (registration must not go through literals), symbol
chars (#) and a CJK ideograph (non-ASCII width handling).
"""

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st
from pyspark.sql import functions as F

from hiero_spark.functions import text as tx

_alphabet = "ab c.,!#\n\t'\"z中é "
_texts = st.lists(
    st.text(alphabet=_alphabet, min_size=0, max_size=60), min_size=1, max_size=8
)

# DuckDB recomputation of the documented formulas — deliberately the slow
# unnest+groupBy route for the 2-gram (vs the engine's sorted-run pass), so
# the two sides share no code shape, only the spec.
_SQL = r"""
WITH t0 AS (
  SELECT doc_id, text,
         regexp_split_to_array(text, '\n') AS lines,
         regexp_split_to_array(trim(text), '\s+') AS toks,
         length(regexp_replace(text, '[A-Za-z0-9\s.,;:!?()-]', '', 'g')) AS n_sym
  FROM fuzz_docs
), b AS (
  SELECT doc_id, len(toks) AS n_tok,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i+1])) AS bigram
  FROM t0 WHERE len(toks) >= 2
), c AS (
  SELECT doc_id, n_tok, bigram, COUNT(*) AS cnt
  FROM b GROUP BY doc_id, n_tok, bigram
), m AS (
  SELECT doc_id,
         ROUND(LEAST(MAX(cnt) * 2.0, CAST(n_tok AS DOUBLE)) / n_tok, 6) AS t2g
  FROM c GROUP BY doc_id, n_tok
)
SELECT t0.doc_id AS doc_id,
       CAST(len(toks) AS BIGINT) AS n_tok,
       ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
             / len(lines), 6) AS dlf,
       COALESCE(m.t2g, 0.0) AS t2g,
       ROUND(CAST(n_sym AS DOUBLE) / len(toks), 6) AS swr
FROM t0 LEFT JOIN m ON t0.doc_id = m.doc_id
ORDER BY t0.doc_id
"""


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
@example(texts=["a a a"])          # r5 bug: overlapping bigram occurrences
@example(texts=["a\tb\t", " \n "])  # trailing whitespace / whitespace-only
@example(texts=["# # # #", "中中 中中 中中"])
def test_text_metrics_differential(spark, con, texts):
    import pandas as pd

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = (
        df.select(
            "doc_id",
            tx.token_count(F.col("text")).alias("n_tok"),
            tx.duplicate_line_fraction(F.col("text")).alias("dlf"),
            tx.top_2gram_share(F.col("text")).alias("t2g"),
            tx.symbol_word_ratio(F.col("text")).alias("swr"),
        )
        .orderBy("doc_id")
        .collect()
    )
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con.register("fuzz_docs", pdf)
    exp = con.execute(_SQL).fetchall()
    con.unregister("fuzz_docs")

    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert (g["doc_id"], g["n_tok"], g["dlf"], g["t2g"], g["swr"]) == e, (
            texts[g["doc_id"]], tuple(g), e,
        )
    # Bound properties, independent of the oracle (a mirrored bug passes
    # the differential check but not these):
    for g in got:
        assert g["n_tok"] >= 1
        assert 0.0 <= g["dlf"] <= 1.0
        assert 0.0 <= g["t2g"] <= 1.0
        assert g["swr"] >= 0.0
