"""Int8 embedding quantization for ANN at scale.

A 100 TB embedding store is mostly float32 vector bytes; symmetric int8
quantization (x -> round(x * 127 / max|x|), one scale per vector) cuts
the scan and shuffle volume 4x while keeping cosine ranking nearly
intact — the standard memory/recall trade every vector store (FAISS
SQ8, ScaNN) offers. The quantized relation is what you PERSIST; the
per-vector scale column rides along so approximate dot products can be
de-scaled.

Everything is Catalyst array arithmetic (transform/aggregate over
array<tinyint>) — quantization is a narrow map over the corpus,
scoring is the same one-scan top-k as the float path. The quantization
is deliberately SQL-mirrorable (round-half-up on doubles, greatest of
|min|,|max|) so the quantized VALUES are oracle-checkable, and ranking
quality is pinned by a recall verdict against the exact float top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize_vectors(
    emb: DataFrame, vec_col: str = "embedding", out_col: str = "q",
    scale_col: str = "scale",
) -> DataFrame:
    """Append int8 codes + the per-vector de-scale factor.

    code_i = round(x_i * 127 / amax), amax = max(|x_i|) (0-vectors get
    scale 0 and all-zero codes); de-scaled value = code_i * scale where
    scale = amax / 127."""
    v = F.col(vec_col).cast("array<double>")
    # max|x| as greatest(|min|, |max|) — native array_min/array_max, no
    # interpreted lambda: `safe` is re-evaluated PER ELEMENT inside the
    # codes transform (interpreted HOFs get no CSE), so an amax spelled
    # as array_max(transform(v, abs)) costs O(d²) interpreted ops per
    # row and dominated the inline-quantize path (measured 1.2 s → the
    # persisted-codes 0.45 s at sf0.1 before this change).
    amax = F.greatest(F.abs(F.array_min(v)), F.abs(F.array_max(v)))
    safe = F.when(amax > 0.0, amax).otherwise(F.lit(1.0))
    codes = F.transform(
        v, lambda x: F.round(x * 127.0 / safe, 0).cast("tinyint")
    )
    return emb.withColumn(out_col, codes).withColumn(
        scale_col, (amax / 127.0).cast("double")
    )



def quantized_topk(
    qemb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", code_col: str = "q", scale_col: str = "scale",
) -> DataFrame:
    """Approximate cosine top-k over the int8 relation.

    The query is quantized the same way; the integer dot de-scales by
    (scale_a * scale_q), and norms come from the codes — so ranking uses
    only the persisted int8 bytes, never the float vectors. One scan,
    TakeOrderedAndProject, same plan shape as the exact path."""
    import math

    # round HALF AWAY FROM ZERO to match Spark/DuckDB ROUND (Python's
    # built-in round is half-to-even and would diverge on .5 boundaries)
    half_away = lambda x: math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)
    amax = max((abs(x) for x in query_vec), default=0.0) or 1.0
    q_codes = [half_away(x * 127.0 / amax) for x in query_vec]
    qc = F.array(*[F.lit(c).cast("tinyint") for c in q_codes])
    codes = F.col(code_col)
    # ONE expression tree referencing `codes` exactly once (dot and
    # norm² accumulate together in a struct; the finish lambda emits the
    # final score): when a caller ranks over an UNmaterialized quantize
    # expression, CollapseProject would otherwise inline that transform
    # into every `codes` reference — interpreted HOFs get no CSE (the
    # dedup.py:lsh_candidate_pairs trap). Scoring stays interpreted
    # either way, so the production path is rank-over-PERSISTED codes:
    # 0.45 s vs 1.28 s inline at sf0.1, and 4x fewer bytes scanned.
    acc0 = F.struct(
        F.lit(0).cast("long").alias("d"), F.lit(0).cast("long").alias("n")
    )
    nq = float(sum(c * c for c in q_codes)) ** 0.5 or 1.0
    cos = F.aggregate(
        F.zip_with(
            codes,
            qc,
            lambda x, y: F.struct(
                (x.cast("long") * y.cast("long")).alias("p"),
                (x.cast("long") * x.cast("long")).alias("s"),
            ),
        ),
        acc0,
        lambda a, e: F.struct(
            (a["d"] + e["p"]).alias("d"), (a["n"] + e["s"]).alias("n")
        ),
        # finish lambda: the whole score in ONE tree, `codes` (and hence
        # the upstream quantization transform) evaluated exactly once
        lambda a: F.when(
            a["n"] > 0,
            a["d"].cast("double")
            / (F.sqrt(a["n"].cast("double")) * F.lit(nq)),
        ).otherwise(F.lit(0.0)),
    )
    return (
        qemb.select(F.col(id_col).alias("neighbor_id"), cos.alias("cos_sim_q"))
        .orderBy(F.desc("cos_sim_q"), F.asc("neighbor_id"))
        .limit(k)
    )


SCALE_BITS = 20  # 2^20: exponent-shift scaling, exact on float32 inputs


def scaled_exact_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Full-precision cosine ranking in EXACT integer arithmetic — the
    cross-engine-reproducible ground truth a retrieval-recall evaluation
    needs (float dot products are summation-order-sensitive, so a float
    'exact' arm could never be hash-checked against DuckDB).

    Every float32 component scales to round(x * 2^20) — float32→double
    is exact and *2^20 is an exponent shift, so the scaled value is the
    same double in both engines and its rounding is deterministic.  The
    dot product and candidate norm² are then exact BIGINTs (64 dims of
    ~N(0,1) values stay far under 2^63), and the final score
    dot / sqrt(norm²) is ONE division of exact inputs — IEEE-identical
    everywhere.  Scaling cancels in cosine up to the shared query
    factor, so the RANKING equals the infinite-precision ranking of the
    rounded vectors.  Returns (neighbor_id, rank) for the top-k: the
    heavy scan is a distributed TakeOrderedAndProject; only the k
    surviving rows pass through the rank window."""
    from pyspark.sql import Window

    scale = float(1 << SCALE_BITS)
    half_away = lambda x: int(x * scale + 0.5) if x >= 0 else -int(-x * scale + 0.5)
    q = [half_away(x) for x in query_vec]
    qarr = F.array(*[F.lit(c).cast("long") for c in q])
    v = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(scale), 0).cast("long"),
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("d"), F.lit(0).cast("long").alias("n")
    )
    scored = F.aggregate(
        F.zip_with(v, qarr, lambda x, y: F.struct(
            (x * y).alias("p"), (x * x).alias("s")
        )),
        acc0,
        lambda a, e: F.struct((a["d"] + e["p"]).alias("d"),
                              (a["n"] + e["s"]).alias("n")),
        lambda a: F.when(
            a["n"] > 0,
            a["d"].cast("double") / F.sqrt(a["n"].cast("double")),
        ).otherwise(F.lit(0.0)),
    )
    w = Window.orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        emb.select(F.col(id_col).alias("neighbor_id"), scored.alias("score"))
        .orderBy(F.desc("score"), F.asc("neighbor_id"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select("neighbor_id", "rank")
    )
