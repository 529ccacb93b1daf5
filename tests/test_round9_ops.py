"""Round-9 operator additions: leakage-safe splits, DP mean, retrieval
recall@k ground truth, CUSUM change-point, kappa agreement."""

import duckdb
import pytest

from pyspark.sql import functions as F


def test_cluster_safe_split_never_straddles_duplicates(spark):
    """Every copy of a text must land in the same split — the leakage
    property per-document splits violate (doc_ids 79 and 80 share a text
    here; pmod(id) would put them in train and val)."""
    from hiero_spark.functions.pipeline import cluster_safe_split

    rows = [(i, f"unique text {i}") for i in range(79)]
    rows += [(79, "shared text"), (80, "shared text"), (95, "shared text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cluster_safe_split(df, "text", "doc_id")
    splits = {
        r["doc_id"]: r["split"] for r in out.collect()
    }
    assert splits[79] == splits[80] == splits[95] == "train"  # rep=79 -> train
    # per-cluster split count is 1 for EVERY cluster
    spans = (
        out.groupBy(F.md5("text"))
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0


def test_dp_noisy_mean_bounded_and_cross_engine(spark, tmp_path):
    from hiero_spark.functions.privacy import dp_mean_oracle_sql, dp_noisy_mean

    rows = [(g, v) for g in range(20) for v in range(g, g + 30)]
    df = spark.createDataFrame(rows, ["g", "x"])
    out = {r["g"]: r["released_mean"] for r in
           dp_noisy_mean(df, ["g"], "x", F.col("g"), lo=0, hi=100).collect()}
    # truncation bound: |released - true| <= (trunc*(hi-lo) + trunc*true)/n-ish;
    # with n=30, noise_sum <= 20*100, noise_count <= 20 -> crude sanity bound
    for g, rel in out.items():
        true = g + 14.5
        assert abs(rel - true) < 300
    # cross-engine: the DuckDB mirror releases the identical doubles
    p = str(tmp_path / "m.parquet")
    df.write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}/*.parquet')")
    exp = dict(con.execute(
        dp_mean_oracle_sql("t", ["g"], "x", "g", lo=0, hi=100)
    ).fetchall())
    assert out == exp


def test_scaled_exact_topk_matches_numpy_cosine(spark):
    """The integer-scaled ground truth must reproduce the float cosine
    ranking (numpy, full precision) on vectors where the 2^-20 rounding
    cannot flip an ordering."""
    import numpy as np

    from hiero_spark.functions.quantize import scaled_exact_topk

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    q = [float(x) for x in vecs[0]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    got = [
        r["neighbor_id"]
        for r in scaled_exact_topk(df, q, k=10).orderBy("rank").collect()
    ]
    sims = (vecs @ vecs[0]) / np.linalg.norm(vecs, axis=1)
    want = list(np.argsort(-sims, kind="stable")[:10])
    assert got == [int(i) for i in want]


def test_recall_at_k_output_shape_and_bounds(spark, sf_dir):
    from hiero_spark.registry import all_queries

    rows = {r["k"]: r for r in
            all_queries()["n2_recall_at_k"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 5, 10}
    for k, r in rows.items():
        assert 0 <= r["n_overlap"] <= k
        assert r["recall"] == round(r["n_overlap"] / k, 6)
    # the query vector itself is its own nearest neighbor in BOTH arms
    assert rows[1]["n_overlap"] == 1


def test_cusum_flags_a_planted_level_shift(spark):
    """A series with a mid-point level shift must put the CUSUM peak at
    the shift boundary."""
    rows = []
    ts = 0
    for day in range(40):
        n = 5 if day < 20 else 15   # sustained shift at day 20
        for _ in range(n):
            rows.append((day, ts)); ts += 1
    df = spark.createDataFrame(rows, ["day", "i"]).selectExpr(
        "make_timestamp(2024, 1, 1, 0, 0, 0) + make_interval(0,0,0,day) AS o_orderdate",
        "i AS o_orderkey",
    )
    from hiero_spark.operators.anomaly import cusum_scaled

    daily = df.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    top = (
        cusum_scaled(daily)
        .orderBy(F.abs(F.col("s_scaled")).desc(), F.asc("day"))
        .limit(1)
        .collect()[0]
    )
    assert top["day"] == "2024-01-20"  # |S| peaks at the last pre-shift day


def test_kappa_perfect_and_chance_agreement(spark):
    """kappa == 1 for identical raters; ~0 for independent ones."""
    from hiero_spark.registry import all_queries  # noqa: F401 (registry warm)
    from hiero_spark.functions import text as tx  # noqa: F401

    # reproduce the query's arithmetic on controlled tables
    def kappa_of(rows):
        df = spark.createDataFrame(rows, ["a", "b"])
        m = df.agg(
            F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
            F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
            F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
            F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        pe = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
            F.col("n01") + F.col("n00")
        ) * (F.col("n10") + F.col("n00"))
        k = (
            (F.col("n") * (F.col("n11") + F.col("n00")) - pe).cast("double")
            / (F.col("n") * F.col("n") - pe).cast("double")
        )
        return m.select(F.round(k, 6).alias("kappa")).collect()[0]["kappa"]

    assert kappa_of([(1, 1)] * 30 + [(0, 0)] * 30) == 1.0
    # independent raters: 25% in each cell -> kappa exactly 0
    assert kappa_of(
        [(1, 1)] * 25 + [(1, 0)] * 25 + [(0, 1)] * 25 + [(0, 0)] * 25
    ) == 0.0


def test_entity_resolution_identical_duplicates_collapse(spark, tmp_path):
    """The identical-record collapse (round-9): g verbatim copies must
    yield ONE entity with n_members == g (+ fuzzy partners) without g^2
    pairwise edges — and stay hash-equal to the general SQL oracle,
    which sees the copies as levenshtein-0 edges. The sf corpus has no
    verbatim duplicates, so this branch needs its own planted data."""
    from hiero_spark.registry import all_queries

    rows = (
        # 4 verbatim copies of one record (ids 5,10,15,20: %5==0 also
        # spawns variants for each -> one big cluster)
        [(k, "Customer#AAA", 7, 100.0) for k in (5, 10, 15, 20)]
        # an isolated singleton: must NOT appear in the output
        + [(3, "Customer#ZZZ", 9, 50.0)]
        # a fuzzy pair in one block (1-char difference)
        + [(11, "Customer#BBB", 2, 75.0), (12, "Customer#BBq", 2, 75.0)]
    )
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, c_acctbal double"
    )
    df.write.parquet(str(tmp_path / "customer.parquet"))
    spec = all_queries()["n1_entity_resolution"]
    got = sorted(
        map(tuple, spec.fn(spark, str(tmp_path)).collect())
    )

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{tmp_path}/customer.parquet/*.parquet')"
    )
    want = sorted(map(tuple, con.execute(spec.oracle).fetchall()))
    want = [(a, int(b), c) for a, b, c in want]
    assert got == want
    by_id = {r[0]: r for r in got}
    # the big cluster: 4 copies + 4 variants, canonical = min id 5
    assert by_id[5][1] == 8
    # the fuzzy pair resolved; the singleton id 3 is absent
    assert by_id[11][1] == 2
    assert 3 not in by_id
