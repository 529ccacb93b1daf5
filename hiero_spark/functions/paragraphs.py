"""Corpus-wide line-level dedup with keep-first semantics (the C4/CCNet
recipe: every distinct line survives exactly once, at its first
occurrence; later copies are dropped and documents are reassembled from
what remains).

Complementary to functions/dedup.py:remove_boilerplate_lines, which
REMOVES every copy of lines crossing a document-frequency threshold:
keep-first dedup preserves one canonical copy of duplicated content
(navigation chrome, license headers, quoted passages), so corpus-wide
token mass shrinks without losing the text itself.

Scale shape (100 TB): posexplode is a narrow map; the keeper choice is a
groupBy(line).min(struct(doc_id, pos)) — partial aggregation combines
map-side, so a line duplicated a billion times contributes ONE row per
input partition to the shuffle, making the hot-key skew of web
boilerplate a non-issue (contrast a window over line, which would
shuffle and buffer every copy). Reassembly groups the kept units by doc
— second shuffle is bounded by the kept set. No window, no global sort,
no join: min(struct) IS the kept set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hiero_spark.functions._fanout import fan_out


def dedup_lines_keep_first(
    df: DataFrame, text_col: str, id_col: str, sep: str = "\n"
) -> DataFrame:
    """(doc_id, new_text, n_kept): documents rebuilt from the lines whose
    FIRST corpus occurrence — min (doc_id, position) — they are.
    Documents whose every line first occurred elsewhere vanish from the
    output (their reassembly would be empty)."""
    units = fan_out(df, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    kept = (
        units.groupBy("line")
        .agg(F.min(F.struct("doc_id", "pos")).alias("keep"))
        .select(
            F.col("keep.doc_id").alias("doc_id"),
            F.col("keep.pos").alias("pos"),
            "line",
        )
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_units")
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform(F.col("_units"), lambda s: s["line"]), sep
            ).alias("new_text"),
            F.size("_units").cast("long").alias("n_kept"),
        )
    )
