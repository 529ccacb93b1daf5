"""Similarity search over embedding columns (SURVEY.md §2.11 N2).

Embeddings are `array<float>` columns. Hot-path math stays JVM-side:
`F.zip_with` + `F.aggregate` compile to codegen'd loops — no Python UDF.

Scale paths:
- `brute_force_topk`: exact cosine top-k via broadcast of the query vector;
  a single scan + TakeOrderedAndProject. Baseline and verifier.
- `lsh_bucketed_topk`: random-hyperplane LSH — vectors hash to a signature,
  search touches only the query's bucket (and Hamming-adjacent probes).
  Candidate set shrinks ~2^bits; recall traded via n_probe_bits.
- IVF variant in `ivf_topk`: coarse-quantize to the nearest of K centroids,
  probe the nearest cells only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    The query vector is a literal folded into the plan (broadcast by
    construction); one scan, per-partition top-k merge — at 100 TB this is
    the standard exact-rerank primitive.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("neighbor_id")).limit(k)


def rhp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit b = sign(vec · plane_b)."""
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(
            _dot(vec, p) >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sig = sig + bit
    return sig


def make_planes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no numpy RNG state leakage)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def probe_signatures(qsig: int, bits: int, hamming: int = 1) -> list[int]:
    """All signatures within the given Hamming distance of qsig.

    hamming=1 gives bits+1 probes — a near neighbor sitting one flipped
    hyperplane away (the common case as bits grows) is still found.  The
    probe count is C(bits, 0..hamming), so keep hamming small.
    """
    from itertools import combinations

    out = [qsig]
    for d in range(1, hamming + 1):
        for flips in combinations(range(bits), d):
            s = qsig
            for b in flips:
                s ^= 1 << b
            out.append(s)
    return out


def lsh_bucketed_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 42,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN: search only vectors whose RHP signature is within probe_hamming
    bits of the query's (multi-probe LSH; bits+1 buckets at hamming=1).

    Partition-prunable if the table is written bucketed by signature; here
    it's a scan-filter (predicate on a derived column). Recall < 1 by
    design — verified against brute force in tests; single-bucket probing
    (probe_hamming=0) hits a recall cliff as bits grows because any near
    neighbor on the far side of ONE hyperplane lands in another bucket.
    """
    dim = len(query_vec)
    planes = make_planes(dim, bits, seed)
    qsig = 0
    for b, plane in enumerate(planes):
        if sum(x * y for x, y in zip(query_vec, plane)) >= 0:
            qsig |= 1 << b
    probes = probe_signatures(qsig, bits, probe_hamming)
    vec_d = F.col(vec_col).cast("array<double>")
    cand = emb.withColumn("_sig", rhp_signature(vec_d, planes)).filter(
        F.col("_sig").isin(probes)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(id_col).alias("neighbor_id"),
            cosine(vec_d, q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(k)
    )


def min_dist2(v: Column, centroids: list[list[float]]) -> Column:
    """Column expr: squared L2 distance to the nearest centroid (the
    per-row term of k-means SSE)."""
    best = None
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        best = d if best is None else F.least(best, d)
    return best


def _nearest_cell(v: Column, centroids: list[list[float]]) -> Column:
    """Column expr: index of the nearest centroid (squared L2).

    Linear-size expression: one distance term per centroid collected into an
    array, argmin via array_position(array_min). (The obvious chained-when
    argmin nests the running best TWICE per step — the tree doubles per
    centroid and analysis goes exponential; k=16 was minutes of planning.)
    Ties resolve to the lowest cell id (array_position returns the first
    match), matching the strict `<` semantics of a sequential scan.
    """
    dists = []
    for c in centroids:
        carr = F.array(*[F.lit(float(x)) for x in c])
        dists.append(
            F.aggregate(
                F.zip_with(v, carr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def ivf_topk(
    emb: DataFrame, query_vec: list[float], centroids: list[list[float]],
    k: int = 10, n_probe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: assign vectors to their nearest centroid cell, search
    the n_probe cells nearest to the query.

    At scale the assignment is precomputed and the table partitioned by
    cell id (`save_ivf`), making the probe a partition-pruned read
    (`ivf_topk_bucketed`) instead of a filter.
    """
    vec_d = F.col(vec_col).cast("array<double>")

    def dist2(a: list[float], b: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(range(len(centroids)), key=lambda i: dist2(query_vec, centroids[i]))[:n_probe]
    cand = emb.withColumn("_cell", _nearest_cell(vec_d, centroids)).filter(
        F.col("_cell").isin(probe)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(id_col).alias("neighbor_id"),
            cosine(vec_d, q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(k)
    )


def kmeans_fit(
    emb: DataFrame,
    k: int,
    max_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-4,
) -> list[list[float]]:
    """Distributed Lloyd's k-means — trains the IVF coarse quantizer so the
    whole index build is in-engine (train -> assign -> `save_ivf`).

    Scale shape per iteration: one scan assigns every vector to its nearest
    centroid (`_nearest_cell`, a codegen'd column expression — no Python in
    the map path), then ONE partial+final aggregation computes per-cell
    mean vectors via element-wise array sums (`F.aggregate` over zipped
    arrays, shuffling k rows of d floats — never vectors per row).  The
    k x d centroid table lives on the driver between iterations, exactly
    like the PCA eigensolve (functions/pca.py): driver work is O(k*d),
    independent of corpus size.

    Deterministic init: the k seed centroids are the vectors with the k
    smallest ids (cheap, reproducible; k-means++ would cost k more scans).
    Stops when no centroid moves more than `tol` (squared L2) or after
    max_iter rounds.  Empty cells keep their previous centroid.
    """
    seed_rows = (
        emb.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    centroids = [[float(x) for x in r["v"]] for r in seed_rows]
    if len(centroids) < k:
        return centroids
    dim = len(centroids[0])
    vec_d = F.col(vec_col).cast("array<double>")

    for _ in range(max_iter):
        assigned = emb.select(
            _nearest_cell(vec_d, centroids).alias("_cell"), vec_d.alias("_v")
        )
        # per-dimension sums as d aggregate columns: partial+final merge,
        # whole-stage codegen, no row buffers — the shuffle carries one
        # (k x d) partial per task, never vectors per row
        sums = assigned.groupBy("_cell").agg(
            F.count(F.lit(1)).alias("_n"),
            *[F.sum(F.col("_v")[i]).alias(f"_s{i}") for i in range(dim)],
        )
        rows = sums.collect()
        new_centroids = list(centroids)
        for r in rows:
            c = r["_cell"]
            new_centroids[c] = [r[f"_s{i}"] / r["_n"] for i in range(dim)]
        shift = max(
            sum((a - b) ** 2 for a, b in zip(old, new))
            for old, new in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        if shift <= tol:
            break
    return centroids


def save_ivf(
    emb: DataFrame, centroids: list[list[float]], path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    files_per_cell: int = 1,
) -> None:
    """Materialize the IVF index: assign each vector to its nearest centroid
    and write the table partitioned by cell id (one directory per cell).

    This is the scale path `ivf_topk` documents: pay the assignment scan
    once at build time; every probe afterwards is a partition-PRUNED read
    of n_probe directories instead of a full-corpus scan + filter. The
    pruning is asserted on the physical plan in tests.

    The write repartitions by (cell, salt) first: without it every input
    task writes a sliver into every cell directory (tasks x cells files),
    and probes pay file-open overhead for dozens of tiny files — measured
    as IVF *losing* to brute force at 200k vectors purely on file count.
    One build-time shuffle bounds each cell to ~files_per_cell files.
    ``files_per_cell`` also sets probe-read parallelism: one file per cell
    means an n_probe-task read no matter how many cores sit idle (measured
    as a dead heat vs brute force at 1M vectors despite a 10x smaller
    scan). Size it so cell_bytes/files_per_cell ~ one parquet split — at
    100 TB that is dozens of files per cell; at bench scale 4."""
    vec_d = F.col(vec_col).cast("array<double>")
    assigned = emb.withColumn("_cell", _nearest_cell(vec_d, centroids))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(max(1, files_per_cell)))
    assigned.repartition(F.col("_cell"), salt).write.mode(
        "overwrite"
    ).partitionBy("_cell").parquet(path)


def update_ivf(
    emb_new: DataFrame, centroids: list[list[float]], path: str,
    id_col: str = "vec_id", vec_col: str = "embedding",
    files_per_cell: int = 1,
) -> None:
    """Incremental IVF maintenance: assign only the NEW vectors to their
    nearest (frozen) centroid and APPEND into the cell-partitioned
    layout — the daily-ingest twin of `save_ivf`, same contract as
    `update_text_index` and the incremental dedup indexes: the corpus is
    never re-scanned, the append costs O(new vectors), and probes are
    unchanged (a cell is just more files after an append; run the
    small-file compaction over a cell directory when counts grow).

    Because cell assignment is a pure function of (vector, centroids)
    and probes score every row they read, probe-after-append equals a
    from-scratch rebuild EXACTLY — pinned in tests. Freezing the
    quantizer is the standard IVF ingest contract (FAISS add-after-
    train): centroids drift only on explicit re-train, which is a
    rebuild, not maintenance. Caller contract: new ids are not already
    indexed (run the exact-dedup admit gate first)."""
    vec_d = F.col(vec_col).cast("array<double>")
    assigned = emb_new.withColumn("_cell", _nearest_cell(vec_d, centroids))
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(max(1, files_per_cell)))
    assigned.repartition(F.col("_cell"), salt).write.mode(
        "append"
    ).partitionBy("_cell").parquet(path)


def ivf_topk_bucketed(
    spark, path: str, query_vec: list[float], centroids: list[list[float]],
    k: int = 10, n_probe: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Probe a `save_ivf` index: read only the n_probe nearest cells
    (directory-level partition pruning), then exact cosine top-k."""

    def dist2(a: list[float], b: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(
        range(len(centroids)), key=lambda i: dist2(query_vec, centroids[i])
    )[:n_probe]
    cand = spark.read.parquet(path).filter(F.col("_cell").isin(probe))
    vec_d = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cand.select(
            F.col(id_col).alias("neighbor_id"),
            cosine(vec_d, q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
        .limit(k)
    )


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, bits: int | None = None,
    id_col: str = "vec_id", vec_col: str = "embedding", seed: int = 7,
    max_bucket: int = 200, target_bucket: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket self-join then exact cosine.

    Pairs are generated only within signature buckets (shuffle on the
    signature), then verified exactly — same candidate/verify split as
    MinHash dedup, and the same two scale guards (round-1 verdict item 3):

    - **adaptive bits**: with ``bits=None`` the signature width grows with
      the corpus — ceil(log2(N / target_bucket)) — so the expected bucket
      stays ~target_bucket rows no matter how big N gets; a fixed 8-bit
      signature would put N/256 vectors in every bucket and the self-join
      would go quadratic at scale.  One count() job buys the decision.
    - **max_bucket cap**: buckets larger than max_bucket are dropped before
      the self-join (window count, mirroring lsh_candidate_pairs).  A
      degenerate corpus — many binary-identical vectors — lands in one
      bucket whose pair set is O(N^2) *output*, not just work; such exact
      duplicates belong to exact dedup (hash the vector bytes), which
      finds them in one groupBy.  The cap is a documented recall trade on
      pathological buckets, not a correctness loss on typical data.
    """
    import math

    if bits is None:
        n = emb.count()
        bits = max(4, min(24, math.ceil(math.log2(max(n, 2) / target_bucket + 1))))
    sample = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    dim = sample[0]["d"] if sample else 64
    planes = make_planes(dim, bits, seed)
    vec_d = F.col(vec_col).cast("array<double>")
    signed = emb.select(
        F.col(id_col).alias("id"), vec_d.alias("v"), rhp_signature(vec_d, planes).alias("sig")
    )
    from pyspark.sql.window import Window

    # both self-join sides read `capped`; the lazy checkpoint stops the
    # signature projection + bucket-size window from evaluating twice
    # (the semantic_dedup `assigned` pattern)
    capped = signed.withColumn(
        "_bucket_size", F.count(F.lit(1)).over(Window.partitionBy("sig"))
    ).filter(F.col("_bucket_size") <= max_bucket).localCheckpoint(eager=False)
    a = capped.select(F.col("sig"), F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = capped.select(F.col("sig"), F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos_sim", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def semantic_dedup(
    emb: DataFrame, centroids: list[list[float]], threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_cluster: int = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the in-engine k-means
    quantizer, then inside each cluster drop every vector that has a
    LOWER-id neighbor above the cosine threshold — one representative
    survives per tight semantic group.

    Scale shape: the quadratic step is confined within clusters — one
    shuffle on the cell id, then a per-cell self-join whose cost is
    sum(|cell|^2) ~ N^2/k.  Production corpora size k so clusters average
    ~100-1000 vectors (SemDeDup used 50k clusters for LAION); here k is a
    parameter of the caller-trained `kmeans_fit` centroids.  `max_cluster`
    is the skew guard: cells above it skip pair generation entirely (all
    members conservatively KEPT — a recall trade on degenerate clusters,
    mirroring `embedding_near_dup_pairs.max_bucket`; identical-vector
    blowups belong to exact dedup upstream).

    Greedy lowest-id-wins policy: a vector is dropped iff SOME smaller-id
    same-cell vector is within the threshold — deterministic, one
    pass, no iteration to a fixed point.  (Chained groups a~b~c with
    a!~c drop both b and c; the canonical SemDeDup keep-one-per-ball has
    the same property.)  Cross-cluster near-dups are missed by design —
    that is the k-means approximation SemDeDup trades for tractability.

    Returns (id_col, _cell, kept) for every input vector.
    """
    from pyspark.sql.window import Window

    vec_d = F.col(vec_col).cast("array<double>")
    # assigned feeds the bucket-size window, BOTH sides of the self-join,
    # and the final keep/drop join — four plan branches that would each
    # re-scan the corpus and re-evaluate the k x d distance expression.
    # Materialize the assignment once (lazy: computed at first action).
    assigned = emb.select(
        F.col(id_col).alias("_id"),
        vec_d.alias("_v"),
        _nearest_cell(vec_d, centroids).alias("_cell"),
    ).localCheckpoint(eager=False)
    sized = assigned.withColumn(
        "_csize", F.count(F.lit(1)).over(Window.partitionBy("_cell"))
    )
    small = sized.filter(F.col("_csize") <= max_cluster)
    a = small.select("_cell", F.col("_id").alias("_ida"), F.col("_v").alias("_va"))
    b = small.select("_cell", F.col("_id").alias("_idb"), F.col("_v").alias("_vb"))
    dropped = (
        a.join(b, "_cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cosine(F.col("_va"), F.col("_vb")) >= threshold)
        .select(F.col("_idb").alias("_id"))
        .distinct()
    )
    return (
        assigned.join(dropped.withColumn("_dropped", F.lit(True)), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "_cell",
            F.coalesce(~F.col("_dropped"), F.lit(True)).alias("kept"),
        )
    )


def batch_topk(
    emb: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    qid_col: str = "query_id", qvec_col: str = "query_vec",
) -> DataFrame:
    """Batch ANN: top-k neighbors for EVERY query vector in one pass.

    The query set is broadcast against the corpus (no shuffle to score:
    each corpus partition scores all queries locally); the only shuffle is
    the per-query top-k window over (qid, neighbor_id, score) tuples —
    never vectors. This is the scoring shape for corpus curation at scale:
    Q queries x N corpus in one scan. For huge Q, chunk the query set and
    union the per-chunk results.
    """
    from pyspark.sql.window import Window

    from hiero_spark.functions._fanout import fan_out

    # fan out before the scoring stage: a single-file local corpus scans
    # as ONE partition, serializing the Q x N cosine work onto one core
    # (a no-op on a real multi-file corpus)
    scored = fan_out(emb, id_col).crossJoin(F.broadcast(queries)).select(
        F.col(qid_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(
            F.col(vec_col).cast("array<double>"), F.col(qvec_col).cast("array<double>")
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def centroid_outliers(
    emb: DataFrame,
    n_groups: int = 4,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier audit: each vector's squared distance to
    its group's centroid, top-k per group — the quality signal that
    catches mis-embedded/corrupted vectors and domain drift (group =
    deterministic id-hash here; a real corpus keys on source/domain).

    Exactness design (the PageRank scaled-long discipline): values
    quantize to MICRO-UNITS (round(x*1e6), half-away-from-zero in both
    engines — the quantize.py convention) and shift +1e6 so every
    operand is nonnegative (integer division below is then identical
    across engines regardless of their negative-DIV semantics; the
    shift cancels in the differences). The centroid is the
    floor-averaged integer (sum DIV n, <=1 micro-unit truncation), so
    scores are exact longs — the outlier RANKING is hash-checkable with
    no tolerance. Term bound: (1.1e6)^2 x dims ~ 1e14 << 2^63 at any n.

    Shape: one posexplode (rows = vectors x dims), centroid agg
    combines map-side, the centroid table is n_groups x dims rows and
    broadcasts back; top-k per group is a per-group window over the
    n_vectors-row score relation."""
    from pyspark.sql.window import Window

    ex = emb.select(
        id_col,
        (F.col(id_col) % n_groups).alias("grp"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        id_col,
        "grp",
        "dim",
        (
            F.round(F.col("x").cast("double") * 1_000_000, 0).cast("long")
            + 1_000_000
        ).alias("xm"),
    )
    cent = (
        ex.groupBy("grp", "dim")
        .agg(F.sum("xm").alias("s"), F.count(F.lit(1)).alias("n"))
        .selectExpr("grp", "dim", "s DIV n AS c")
    )
    diff = F.col("xm") - F.col("c")
    sc = (
        ex.join(F.broadcast(cent), ["grp", "dim"])
        .groupBy(id_col, "grp")
        .agg(F.sum(diff * diff).alias("score"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc(id_col))
    return (
        sc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("grp").cast("long").alias("grp"),
            id_col,
            F.col("score").cast("long").alias("score"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    lo: float = 0.10,
    hi: float = 0.90,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per anchor, the k
    MOST similar corpus vectors inside the band lo <= cos < hi — similar
    enough to be informative negatives, below the near-duplicate
    threshold that would make them false negatives (the curation step
    between semantic dedup and training-pair assembly; random negatives
    are trivially easy and teach nothing).

    Same scale shape as batch_topk: anchors broadcast, each corpus
    partition scores locally, the ONLY shuffle is the per-anchor window
    over (anchor, neighbor, score) tuples — vectors never shuffle; the
    band filter prunes BEFORE the shuffle, so the exchanged rows are the
    band's, not the corpus's. Self-pairs are excluded by id (a vector is
    nobody's negative). Ranking is (cos DESC, id ASC) over the same
    doubles both engines compute (the n2 family contract); ROUND is
    display-only.
    """
    from pyspark.sql.window import Window

    from hiero_spark.functions._fanout import fan_out

    # fan_out: parallelize the anchor x corpus scoring stage when the
    # local scan arrives as one partition (batch_topk contract)
    scored = fan_out(emb, id_col).crossJoin(F.broadcast(queries)).select(
        F.col(qid_col),
        F.col(id_col).alias("neighbor_id"),
        cosine(
            F.col(vec_col).cast("array<double>"),
            F.col(qvec_col).cast("array<double>"),
        ).alias("cos_sim"),
    )
    band = scored.filter(
        (F.col("neighbor_id") != F.col(qid_col))
        & (F.col("cos_sim") >= F.lit(lo))
        & (F.col("cos_sim") < F.lit(hi))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return band.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def mine_triplets(
    emb: DataFrame,
    anchors: DataFrame,
    margin: float = 0.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """(anchor, positive, negative) training triplets: positive = the
    anchor's nearest neighbor, negative = the MOST similar neighbor at
    least `margin` below the positive — the distance-weighted hard
    mining rule (semi-hard negatives teach the margin; random ones are
    trivially satisfied and teach nothing). One broadcast scoring scan
    (the batch_topk shape), then both legs are rank-1 windows over the
    same scored tuples — scalars shuffle, vectors never do. Anchors
    whose corpus has no qualifying negative (margin wider than the
    similarity spread) drop out by the inner join; ties break by
    neighbor id, so the triplet set is deterministic (the n2 contract:
    both engines rank identical doubles)."""
    from pyspark.sql.window import Window

    from hiero_spark.functions._cachetrack import persist_tracked
    from hiero_spark.functions._fanout import fan_out

    # scored feeds THREE consumers (the positive window, the negative
    # window's join, and transitively the final triplet join) — persist
    # it so the anchor x corpus cosine scan runs once, not per consumer;
    # fan_out parallelizes that scan when a single-file corpus arrives
    # as one partition (round-14; tracked persist per the cachetrack
    # contract, releasable by long-lived drivers)
    scored = persist_tracked(
        fan_out(emb, id_col).crossJoin(F.broadcast(anchors)).select(
            F.col(qid_col),
            F.col(id_col).alias("neighbor_id"),
            cosine(
                F.col(vec_col).cast("array<double>"),
                F.col(qvec_col).cast("array<double>"),
            ).alias("cos_sim"),
        ).filter(F.col("neighbor_id") != F.col(qid_col))
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    pos = persist_tracked(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(qid_col).alias("anchor"),
            F.col("neighbor_id").alias("positive_id"),
            F.col("cos_sim").alias("pos_sim"),
        )
    )
    neg = (
        scored.join(
            F.broadcast(pos), scored[qid_col] == pos["anchor"]
        )
        .filter(F.col("cos_sim") <= F.col("pos_sim") - F.lit(margin))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "anchor",
            F.col("neighbor_id").alias("negative_id"),
            F.col("cos_sim").alias("neg_sim"),
        )
    )
    return pos.join(neg, "anchor").select(
        "anchor",
        "positive_id",
        F.round("pos_sim", 4).alias("pos_sim"),
        "negative_id",
        F.round("neg_sim", 4).alias("neg_sim"),
    )
