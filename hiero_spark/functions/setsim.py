"""Exact set-similarity self-join with prefix filtering (PPJoin family).

MinHash/LSH (functions/dedup.py) answers "probably similar" with tunable
recall; this answers EXACT Jaccard >= t, the verification-grade join a
curation pipeline runs on LSH survivors or directly when exactness is
required (eval-set hygiene, licensing dedup). The naive form is the
all-pairs O(N²) token-set comparison; prefix filtering is the classic
bound (Chaudhuri et al. SSJoin / Xiao et al. PPJoin):

  order every document's distinct tokens by GLOBAL frequency (rarest
  first, ties by token); two sets with Jaccard >= t must share at least
  one token inside their first |d| - ceil(t*|d|) + 1 ordered tokens.

So candidates are generated ONLY from prefix tokens — and because
prefixes are the rarest tokens, the per-token candidate lists are the
SHORT posting lists; the hot head of the Zipf curve never joins. The
shuffle moves (prefix-token, doc) pairs, bounded by sum of prefix
lengths ~ (1-t)*corpus tokens, not the corpus squared.

Cross-engine exactness: intersections/unions are integer counts over
distinct token sets; Jaccard is one double division per surviving pair.
The frequency order is made total by the (df, token) tiebreak, so both
engines build identical prefixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from hiero_spark.functions.dedup import (
    shingle_array as dd_shingle_array,
    shingle_hash_array as dd_shingle_hash_array,
)


def jaccard_join(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """All pairs (id_a < id_b) with exact word-k-gram-set Jaccard >=
    threshold. Returns (id_a, id_b, n_common, n_union, jaccard to 6).

    Sets are k-gram SHINGLES (the dedup-family convention), not unigrams:
    on a small-vocabulary corpus unigram sets saturate (measured at
    sf0.01: 113k candidates / 9k "pairs" at t=0.9 over unigrams vs
    25 candidates = 25 true pairs at t=0.8 over 3-grams — the shingle
    space is where prefix filtering actually prunes).

    ``hashed=True`` is the 100 TB arm: shingles become xxhash64 longs
    (functions/dedup.py:shingle_hash_array) before anything shuffles, so
    the df aggregation, the prefix self-join, and the verify arrays all
    move 8-byte longs instead of ~(k x word) strings — identical pairs
    modulo 2^-64 hash collisions (the dedup-family argument), pinned
    equal to the string arm in tests. The string arm stays the
    oracle-bearing one (DuckDB has no xxhash64). Measured at sf0.1:
    identical 256 pairs, shuffle 4.4 MB vs 6.4 MB (31% lower) and
    2.7 s vs 3.7 s warm — and the gap widens with word length (this
    corpus's words are short; real text shingles are ~3x longer)."""
    toks = (
        dd_shingle_hash_array(F.col(text_col), k)
        if hashed
        else dd_shingle_array(F.col(text_col), k)
    )
    sets = docs.select(F.col(id_col).alias("id"), toks.alias("s"))
    flat = sets.select("id", F.explode("s").alias("tok"))
    dfreq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # rarest-first total order -> per-doc ordered token array
    ordered = (
        flat.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda x: x["tok"],
            ).alias("s")
        )
    )
    # prefix length |d| - ceil(t*|d|) + 1
    sized = ordered.select(
        "id",
        "s",
        F.slice(
            "s",
            1,
            F.greatest(
                F.lit(1),
                (F.size("s") - F.ceil(F.size("s") * F.lit(float(threshold))) + 1)
                .cast("int"),
            ),
        ).alias("prefix"),
    )
    # candidate generation moves (tok, id, |d|) triples ONLY — the full
    # shingle arrays never ride the hot self-join (a doc's array would
    # otherwise be duplicated once per prefix token per candidate); the
    # arrays join back onto the deduped pair list, once per side
    pre = sized.select("id", F.size("s").alias("n"), F.explode("prefix").alias("tok"))
    a = pre.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "tok")
    b = pre.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "tok")
    # PPJoin length filter — sound pruning before the pair dedup/verify:
    # J(a,b) >= t forces t*|b| <= |a| (and symmetrically), so pairs whose
    # set sizes are too far apart never even form a candidate. On a
    # corpus where one prefix token goes hot (near-identical boilerplate)
    # this is the bound that keeps the token join from going quadratic
    # across DIFFERENT-length docs; same-size hot groups are genuinely
    # all near-dups and belong in the output.
    tt = float(threshold)
    pairs = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("n_a") >= F.ceil(F.col("n_b") * F.lit(tt)))
            & (F.col("n_b") >= F.ceil(F.col("n_a") * F.lit(tt)))
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        pairs.join(
            sized.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")),
            "id_a",
        )
        .join(
            sized.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect("s_a", "s_b"))
    union = F.size("s_a") + F.size("s_b") - inter
    jac = inter.cast("double") / union.cast("double")
    # gate on the RAW ratio (identical IEEE division both engines);
    # round only for display
    return (
        cand.filter(jac >= float(threshold))
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("n_common"),
            union.cast("long").alias("n_union"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


def containment_join(
    docs: DataFrame,
    threshold: float = 0.9,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """Directional set-CONTAINMENT join: all ordered pairs (a != b) where
    |A n B| / |A| >= threshold over word-k-gram shingle sets — the
    quote/excerpt/boilerplate-inclusion detector Jaccard structurally
    misses (a 50-shingle snippet verbatim inside a 5000-shingle page has
    containment 1.0 but Jaccard ~0.01). Returns (id_a, id_b, n_common,
    n_a, containment): "a is t-contained in b".

    Prefix filtering adapts asymmetrically (Chaudhuri et al. SSJoin):
    |A n B| >= t*|A| forces A to share a token within its first
    |A| - ceil(t*|A|) + 1 RAREST-ordered tokens, so only A-side prefixes
    generate candidates — but no symmetric bound exists for B (B may
    contain A's rare tokens anywhere), so the B side posts its full
    token list. The scale contract still holds: the join keys are
    exclusively A-PREFIX tokens, which are the globally rarest by
    construction, so the join output is bounded by
    sum_{tok in prefixes} df(tok) — short posting lists only; the Zipf
    head joins nothing because hot tokens never appear in a prefix.
    The only unbounded-looking step, shuffling B's full postings on tok,
    is one (tok, id, |B|) triple per shingle — the same volume the df
    aggregation already shuffled — and the length filter |B| >= t*|A|
    prunes candidates before pair dedup. Arrays join back once per side
    onto the deduped pair list (the jaccard_join shape).

    ``hashed=True`` swaps string shingles for xxhash64 longs end-to-end
    (the 100 TB arm, ~3x smaller shuffles; 2^-64 per-pair collisions)."""
    toks = (
        dd_shingle_hash_array(F.col(text_col), k)
        if hashed
        else dd_shingle_array(F.col(text_col), k)
    )
    sets = docs.select(F.col(id_col).alias("id"), toks.alias("s"))
    flat = sets.select("id", F.explode("s").alias("tok"))
    dfreq = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        flat.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda x: x["tok"],
            ).alias("s")
        )
    )
    tt = float(threshold)
    sized = ordered.select(
        "id",
        "s",
        F.slice(
            "s",
            1,
            F.greatest(
                F.lit(1),
                (F.size("s") - F.ceil(F.size("s") * F.lit(tt)) + 1).cast("int"),
            ),
        ).alias("prefix"),
    )
    a = sized.select(
        F.col("id").alias("id_a"),
        F.size("s").alias("n_a"),
        F.explode("prefix").alias("tok"),
    )
    b = sized.select(
        F.col("id").alias("id_b"),
        F.size("s").alias("n_b"),
        F.explode("s").alias("tok"),  # full postings: no sound B-side prefix
    )
    pairs = (
        a.join(b, "tok")
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(F.col("n_b") >= F.ceil(F.col("n_a") * F.lit(tt)))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = pairs.join(
        sized.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a"
    ).join(
        sized.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b"
    )
    inter = F.size(F.array_intersect("s_a", "s_b"))
    cont = inter.cast("double") / F.size("s_a").cast("double")
    return cand.filter(cont >= tt).select(
        "id_a",
        "id_b",
        inter.cast("long").alias("n_common"),
        F.size("s_a").cast("long").alias("n_a"),
        F.round(cont, 6).alias("containment"),
    )
