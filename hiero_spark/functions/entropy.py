"""Character-entropy quality signal (Shannon entropy of the per-document
character distribution, in bits).

Low-entropy documents are machine gibberish of the repetitive kind —
padding runs, template spam, base64-ish low-alphabet blobs — that length
and punctuation heuristics (functions/text.py:quality_score) miss;
abnormally HIGH entropy flags random-looking noise. Corpus curation
stacks this next to the Gopher repetition signals as another shuffle-free
per-row gate.

Implementation is pure Catalyst higher-order functions — per row:
distinct chars (alphabet), each char's count via a filter over the char
array, then entropy in the numerically-stable factored form

    H = ( ln(n) - (1/n) * Σ_c cnt_c * ln(cnt_c) ) / ln 2

which only ever takes logs of integer counts — the identical expression
is spelled in the DuckDB oracle, and log of the same integer is the same
IEEE double in both engines, so ROUND(..., 6) hash-compares cleanly.
Cost is O(alphabet × length) per row, JVM-side, no shuffle — linear scan
over documents, parallel per input split at 100 TB.

Cross-engine edge: Spark's split('', pattern) is [] while DuckDB's
string_split('', '') is [''] — the empty document is therefore gated
explicitly to (0 chars, 0 alphabet, 0.0 bits) on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def char_entropy(text: Column, rounded: bool = True) -> Column:
    """Shannon entropy (bits/char) of the document's character histogram,
    rounded to 6 decimals (rounded=False keeps the raw double — gate
    comparisons must use the same form as their oracle, or a value that
    rounds ACROSS the threshold flips the gate on one side only); 0.0
    for the empty document."""
    chars = F.split(text, "")
    n = F.size(chars)
    # SORTED alphabet: Spark's array_distinct keeps first-occurrence order
    # but DuckDB's list_distinct does not, and double addition is
    # order-sensitive — sorting (binary collation in both engines) pins
    # the summation order so the result is bit-identical, not just close.
    alphabet = F.array_sort(F.array_distinct(chars))
    sum_clnc = F.aggregate(
        alphabet,
        F.lit(0.0),
        lambda acc, c: acc
        + F.size(F.filter(chars, lambda x: x == c)).cast("double")
        * F.log(F.size(F.filter(chars, lambda x: x == c)).cast("double")),
    )
    h = (F.log(n.cast("double")) - sum_clnc / n.cast("double")) / F.log(F.lit(2.0))
    if rounded:
        h = F.round(h, 6)
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(h)


def alphabet_size(text: Column) -> Column:
    """Distinct characters in the document (0 for empty)."""
    return F.when(F.length(text) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(text, "")))
    )
