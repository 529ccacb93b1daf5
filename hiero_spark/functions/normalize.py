"""Unicode text normalization — the first stage of every curation
pipeline: the same logical text arrives NFC/NFD-mixed, sprinkled with
control characters and inconsistent whitespace, and every downstream
exact/fuzzy/shingle dedup treats those as distinct documents unless
ingestion canonicalizes first.

Three steps, in order:
  1. NFC composition — Spark has no built-in Unicode normalizer, so this
     is the repo's one legitimately-Python text step: an Arrow-batched
     pandas_udf over `unicodedata.normalize` (vectorized transfer,
     per-batch Python, never per-row pickling). DuckDB mirrors it with
     `nfc_normalize`, so the step stays oracle-checkable.
  2. Control-character strip (C0 minus \\t\\n\\r, plus DEL) — codegen
     regexp_replace.
  3. Whitespace-run collapse to single spaces + trim — codegen. NOTE:
     this flattens newlines, so normalize AFTER line-based operators
     (boilerplate/line dedup) or feed them the raw column.

Narrow per-row map, no shuffle; scales linearly per input split.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

# C0 control chars except \t (x09), \n (x0a), \r (x0d) — those are
# whitespace and handled by the collapse step — plus DEL. Same class
# compiles in Java regex and RE2.
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def _nfc_udf():
    # built lazily: decorating at module scope parses the return-type DDL,
    # which requires an active SparkSession at import time
    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc


def normalize_text(text: Column) -> Column:
    """NFC-composed, control-stripped, whitespace-collapsed, trimmed."""
    composed = _nfc_udf()(text)
    stripped = F.regexp_replace(composed, CONTROL_RE, "")
    return F.trim(F.regexp_replace(stripped, r"\s+", " "))


def with_normalized_text(
    df: DataFrame, text_col: str, out: str = "norm_text"
) -> DataFrame:
    norm = normalize_text(F.col(text_col))
    return df.withColumn(out, norm).withColumn(
        "changed", F.col(out) != F.col(text_col)
    )
