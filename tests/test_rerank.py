"""Two-stage PCA rerank: distributed Gram fit correctness, exactness at
full candidate width, and high recall on clustered (compressible) data —
the honest counterpart to the isotropic-corpus negative documented on
n2_pca_rerank."""

import numpy as np

from hiero_spark.functions.rerank import pca_fit_array, pca_rerank_topk
from hiero_spark.functions.similarity import brute_force_topk
from hiero_spark.sources.readers import synthetic_embeddings


def test_gram_fit_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(300, 16))
    x[:, 0] *= 5.0  # one dominant direction
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], ["vec_id", "embedding"]
    )
    mean, comps = pca_fit_array(df, "embedding", 16, 4)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:4]
    ref = v[:, order]
    for c in range(4):
        i = int(np.argmax(np.abs(ref[:, c])))
        if ref[i, c] < 0:
            ref[:, c] = -ref[:, c]
    assert np.allclose(comps, ref, atol=1e-6)


def test_full_width_candidates_reproduce_exact(spark):
    emb = synthetic_embeddings(spark, 300, 16, n_clusters=5)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    exact = [r["neighbor_id"] for r in brute_force_topk(emb, qv, 10).collect()]
    full = [
        r["neighbor_id"]
        for r in pca_rerank_topk(emb, qv, 10, n_candidates=300, d_red=4).collect()
    ]
    assert full == exact  # order too: rerank sorts by the same exact cosine


def test_high_recall_on_clustered_data(spark):
    # 32 well-separated clusters in 64 dims: the top-8 PCA space preserves
    # cluster geometry and the coarse stage finds the true neighborhood
    emb = synthetic_embeddings(spark, 2000, 64, n_clusters=32)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    exact = {r["neighbor_id"] for r in brute_force_topk(emb, qv, 10).collect()}
    rr = {
        r["neighbor_id"]
        for r in pca_rerank_topk(emb, qv, 10, n_candidates=50).collect()
    }
    assert len(exact & rr) / 10 >= 0.9  # measured 1.0; slack for layout drift


def test_persisted_model_matches_inline_fit(spark, tmp_path):
    # build-once/probe-many (round-7): fit_pca_model persists mean +
    # components; load_pca_model round-trips them bit-identically, and a
    # probe with the persisted model returns exactly what the inline fit
    # returns (same deterministic eigenfit, same candidate scan).
    from hiero_spark.functions.rerank import fit_pca_model, load_pca_model

    emb = synthetic_embeddings(spark, 400, 16, n_clusters=8)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    path = str(tmp_path / "pca_model")
    fit_pca_model(emb, path, dim=16, k=4)
    mean_p, comps_p = load_pca_model(spark, path)
    mean_i, comps_i = pca_fit_array(emb, "embedding", 16, 4)
    assert np.array_equal(mean_p, mean_i)
    assert np.array_equal(comps_p, comps_i)
    inline = [
        (r["neighbor_id"], round(r["cos_sim"], 9))
        for r in pca_rerank_topk(emb, qv, 10, n_candidates=60, d_red=4).collect()
    ]
    probed = [
        (r["neighbor_id"], round(r["cos_sim"], 9))
        for r in pca_rerank_topk(
            emb, qv, 10, n_candidates=60, model=(mean_p, comps_p)
        ).collect()
    ]
    assert probed == inline
