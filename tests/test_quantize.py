"""Int8 quantization: code bounds, zero-vector handling, reconstruction
error bound, and ranking sanity on a planted neighborhood."""

import math

from pyspark.sql import functions as F

from hiero_spark.functions.quantize import quantize_vectors, quantized_topk


def _emb(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_codes_bounded_and_scale_reconstructs(spark):
    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [100.0, 50.0, -100.0, 1.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
    ]
    out = quantize_vectors(_emb(spark, rows)).collect()
    by_id = {r["vec_id"]: r for r in out}
    for r in out:
        assert all(-127 <= c <= 127 for c in r["q"])
    assert by_id[2]["scale"] == 0.0 and all(c == 0 for c in by_id[2]["q"])
    # de-scaled codes reconstruct within half a step (scale/2 per element)
    for vid, vec in [(0, rows[0][1]), (1, rows[1][1])]:
        scale = by_id[vid]["scale"]
        for c, x in zip(by_id[vid]["q"], vec):
            assert abs(c * scale - x) <= scale / 2 + 1e-12


def test_quantized_ranking_finds_planted_neighbor(spark):
    # query direction [1,0,...]; vec 1 is nearly parallel, vec 2 orthogonal,
    # vec 3 anti-parallel — int8 must preserve that coarse ordering
    dim = 8
    rows = [
        (1, [1.0] + [0.01] * (dim - 1)),
        (2, [0.0, 1.0] + [0.0] * (dim - 2)),
        (3, [-1.0] + [0.0] * (dim - 1)),
    ]
    qemb = quantize_vectors(_emb(spark, rows))
    got = [r["neighbor_id"] for r in quantized_topk(qemb, [1.0] + [0.0] * (dim - 1), k=3).collect()]
    assert got == [1, 2, 3]


def test_quantized_cosine_close_to_exact(spark):
    # deterministic pseudo-random vectors: quantized cosine within 0.02
    # of the float cosine for every pair against the query
    import random

    rng = random.Random(11)
    dim = 32
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(50)]
    qv = [rng.uniform(-1, 1) for _ in range(dim)]
    qemb = quantize_vectors(_emb(spark, rows))
    approx = {
        r["neighbor_id"]: r["cos_sim_q"]
        for r in quantized_topk(qemb, qv, k=50).collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for i, vec in rows:
        assert abs(approx[i] - cos(vec, qv)) < 0.02
