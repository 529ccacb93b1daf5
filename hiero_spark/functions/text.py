"""Text analysis for training-data pipelines (SURVEY.md §2.11 N4).

All hot-path logic is Catalyst expressions (split/regexp/length — JVM-side,
codegen'd); nothing here shuffles, so every op scales linearly with
documents and parallelizes per input split at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A tiny per-language marker list for the n-gram/stopword language heuristic.
# Deliberately deterministic + SQL-expressible so the oracle can mirror it.
# zh is NOT marker-based: Chinese has no space-delimited stopwords, so it is
# detected first by CJK-ideograph fraction (see with_language_id).
LANG_MARKERS = (
    ("en", " the "),
    ("fr", " le "),
    ("de", " der "),
    ("es", " el "),
)

# CJK Unified Ideographs block (U+4E00-U+9FFF) spelled as literal chars so
# the identical pattern string works in Java regex and DuckDB's RE2.
CJK_REGEX = "[一-鿿]"


def token_count(text: Column) -> Column:
    """Whitespace token count (the baseline tokenizer)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: count word + digit + punctuation chunks, the regex
    family BPE pre-tokenizers use (GPT-2-style contractions omitted)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.!?,;:]", "")).cast("long")


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: favors moderate length and
    punctuation presence, penalizes very short docs. Pure arithmetic —
    identical in the SQL oracle."""
    n_tok = token_count(text)
    n_chr = F.length(text).cast("double")
    avg_word = n_chr / n_tok.cast("double")
    len_term = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    word_term = F.when((avg_word >= 3.0) & (avg_word <= 10.0), 1.0).otherwise(0.5)
    return len_term * 0.6 + word_term * 0.4


def language_id(probe: Column) -> Column:
    """Marker-based language guess over a padded lowercase probe (first
    matching marker wins; zh is handled upstream by CJK fraction)."""
    expr = F.lit("und")
    for lang, marker in reversed(LANG_MARKERS):
        expr = F.when(probe.contains(marker), lang).otherwise(expr)
    return expr


def cjk_char_count(text: Column) -> Column:
    """Count of CJK Unified Ideograph codepoints (strip-and-diff: no
    regexp_count dependency, identical formulation in the oracle)."""
    return F.length(text) - F.length(F.regexp_replace(text, CJK_REGEX, ""))


def with_language_id(df: DataFrame, text_col: str, out: str = "pred_lang") -> DataFrame:
    """zh first — >=30% CJK ideograph chars (integer cross-multiply, no
    doubles to drift) — then the stopword-marker chain. A lone quoted
    ideograph in Latin prose stays under the fraction gate."""
    text = F.col(text_col)
    n_cjk = cjk_char_count(text)
    probe = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    pred = F.when(
        (n_cjk > 0) & (n_cjk * 10 >= F.length(text) * 3), "zh"
    ).otherwise(language_id(probe))
    return df.withColumn(out, pred)


def duplicate_line_fraction(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of a doc's lines that are
    repeats of another line (1 - distinct/total). Boilerplate-heavy pages
    (nav bars, cookie banners) score high. Pure array exprs — per-row
    compute, no shuffle."""
    lines = F.split(text, "\n")
    n = F.size(lines)
    return F.round((n - F.size(F.array_distinct(lines))).cast("double") / n, 6)


def top_2gram_share(text: Column) -> Column:
    """Gopher-style repetition signal: fraction of tokens covered by the most
    frequent word 2-gram (min(count * 2, n_tokens) / n_tokens; 0 for docs
    under 2 tokens).  Occurrences of a self-pair bigram overlap — "a a a"
    has 2 occurrences of "a a" over only 3 tokens — so raw count*2 can
    exceed n; the LEAST cap keeps the share inside its documented [0,1]
    bound (round-5 red-gate fix, caught by the bounds property test).

    Linear per row and shuffle-free: build the bigram array, sort it, and
    take the longest equal-run with one F.aggregate pass (a struct
    accumulator of prev/run/best). The explode + groupBy(doc, bigram)
    formulation computes the same number but shuffles 2x the corpus token
    count; this stays a narrow map-only pass like the rest of this module.
    """
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    bigrams = F.array_sort(
        F.zip_with(
            F.slice(toks, F.lit(1), n - 1),
            F.slice(toks, F.lit(2), n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    )
    run_of = lambda acc, x: F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
    best = F.aggregate(
        bigrams,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run_of(acc, x).alias("run"),
            F.greatest(acc.best, run_of(acc, x)).alias("best"),
        ),
        lambda acc: acc.best,
    )
    covered = F.least(best * 2.0, n.cast("double"))
    return F.when(n >= 2, F.round(covered / n, 6)).otherwise(F.lit(0.0))


# Chars counted as "symbols" for the symbol-to-word ratio: anything outside
# alphanumerics, whitespace, and common prose punctuation. The class is
# spelled identically in the DuckDB oracle — keep the two in sync.
SYMBOL_REGEX = r"[A-Za-z0-9\s.,;:!?()-]"


def symbol_word_ratio(text: Column) -> Column:
    """Gopher-style repetition/quality signal: symbol chars per word (high on
    markup residue, ASCII art, hashtag spam). Codegen'd regex, no shuffle."""
    n_sym = F.length(F.regexp_replace(text, SYMBOL_REGEX, "")).cast("double")
    return F.round(n_sym / token_count(text), 6)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 content hash (exact-dup key).

    Both engines implement RFC-1321 md5 → cross-engine checkable, unlike a
    custom rolling hash."""
    return F.md5(text)


def tf_idf_keywords(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-k keywords by TF-IDF.

    IDF uses the smooth RATIO form (N+1)/(df+1) instead of its logarithm:
    ln() is not guaranteed ulp-identical across engines (Java Math.log vs
    DuckDB's libm) and the oracle hash-compares doubles, while +,*,/ are
    IEEE-defined — so score = tf * (N+1)/(df+1) is bit-identical in both.
    Monotone in the classic ln formula for fixed tf, so top-k ranking is
    unchanged for single-term comparisons at equal tf; documented
    determinism trade.

    Scale shape: explode tokens once; tf = groupBy(id, tok) partial+final;
    doc-frequency = groupBy(tok) over distinct (id, tok) rows (reuses the
    tf output — no second explode); corpus size N is one scalar join;
    per-doc top-k via a single (id)-partitioned window. Shuffles carry
    (token, counts) pairs, never documents.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df_docs"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(doc_freq, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * (F.col("n_docs") + 1) / (F.col("df_docs") + 1), 6
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("tok").alias("keyword"), "rank", "score")
    )


def simhash64(df: DataFrame, text_col: str, out: str = "simhash") -> DataFrame:
    """64-bit SimHash over whitespace tokens via xxhash64.

    Implemented with explode + groupBy(sum of per-bit votes): fully
    distributed, no UDF. Near-dup docs differ in few bits (Hamming).
    """
    tokens = df.withColumn("_tok", F.explode(F.split(F.trim(F.col(text_col)), r"\s+")))
    tokens = tokens.withColumn("_h", F.xxhash64("_tok"))
    bit_votes = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(64)
    ]
    key_cols = [c for c in df.columns if c != text_col]
    votes = tokens.groupBy(*key_cols).agg(*bit_votes)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim + F.when(
            F.col(f"_b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select(*key_cols, sim.alias(out))


# The 10 high-frequency English function words the Gopher rules check
# (Rae et al. 2021 gate: a prose document contains at least 2 of them).
# SQL-mirrorable as a plain IN-list.
STOP_WORDS = ("the", "of", "and", "to", "in", "a", "is", "that", "for", "it")


def stopword_fraction(text: Column) -> Column:
    """Gopher prose signal: fraction of (lowercased, whitespace) tokens
    that are common function words. Near-zero on keyword stuffing, code,
    and gibberish; ~0.2-0.4 on English prose. Pure array exprs — the
    token array is built once outside the lambda (the shingle_array
    re-tokenization trap), per-row, shuffle-free."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    stops = F.array(*[F.lit(w) for w in STOP_WORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stops, x)))
    return F.round(n_stop.cast("double") / F.size(toks), 6)


def prose_gate(text: Column, min_distinct: int = 2) -> Column:
    """The Rae et al. (2021) stop-word gate itself: TRUE when the text
    contains >= min_distinct DISTINCT stop words. The funnel/pipeline
    form of stopword_fraction — a boolean the cumulative gates can AND
    onto, same pure array exprs, per-row, shuffle-free."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    stops = F.array(*[F.lit(w) for w in STOP_WORDS])
    hits = F.filter(toks, lambda x: F.array_contains(stops, x))
    return F.size(F.array_distinct(hits)) >= min_distinct


def readability_score(text: Column) -> Column:
    """Flesch-reading-ease-style score from the classic heuristics:
    syllables ~ vowel-group count ([aeiouy]+ runs; whitespace breaks
    groups so the whole-text count equals the per-word sum), sentences ~
    non-empty [.!?]+ splits (min 1). Pure codegen exprs, per-row,
    shuffle-free; the two integer ratios are single IEEE divisions and
    the three-term sum has a fixed shape, so the double is bit-identical
    cross-engine (ROUND is display only). A curation gate: very low
    scores flag dense jargon/gibberish, implausibly high ones flag
    keyword lists."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n_words = F.size(toks)
    syl = F.size(F.regexp_extract_all(F.lower(text), F.lit("[aeiouy]+"), 0))
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split(text, r"[.!?]+"), lambda x: F.trim(x) != F.lit("")
            )
        ),
        F.lit(1),
    )
    score = (
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / sentences.cast("double"))
        - 84.6 * (syl.cast("double") / n_words.cast("double"))
    )
    return F.round(score, 6)
