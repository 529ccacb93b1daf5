"""In-engine trained text classifier (fasttext-shaped: hashed bag-of-words
+ logistic regression) — the learned quality/language gate of a curation
pipeline, trained WITHOUT leaving the engine.

Model: p(doc) = sigmoid(b + sum_tokens w[xxhash64(token) mod dim] / n_tok)
— mean-pooled hashed unigram features, exactly fastText's sentence
representation with the embedding dim collapsed to 1 (Joulin et al. 2016,
arXiv:1607.01759).

Training is distributed full-batch gradient descent with the same scale
contract as `kmeans_fit` / `pca` (driver state = the model, O(dim);
data never leaves executors):

- features are materialized ONCE: explode tokens -> hash to a feature id
  -> groupBy (doc, idx) count -> normalize by doc length.  Shuffle keys
  are (doc, idx) longs; the token strings die inside the hash.
- per iteration: (1) margins = feats BROADCAST-join the dim-row weight
  table, groupBy doc, sum — one shuffle bounded by docs x distinct-
  features-per-doc; (2) residual r = sigmoid(margin) - y per doc;
  (3) gradient = feats join residuals on doc, groupBy idx — one shuffle
  bounded by dim after partial aggregation; collect dim rows.
- the driver updates w (dim floats) and b, then re-broadcasts.

Iterations cost 2 shuffles each and the collected gradient is dim rows
regardless of corpus size — at 100 TB you raise dim, not driver memory.
Scoring (`score_text`) is the same broadcast-join + groupBy shape, no
driver loop.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def hashed_features(
    df: DataFrame, text_col: str, id_col: str, dim: int = 512
) -> DataFrame:
    """(doc, idx, x): mean-pooled hashed unigram features per document.

    x = token_count / doc_length, so sum(x) == 1 per doc (empty docs get
    no rows and score sigmoid(b)).  One explode + one (doc, idx) groupBy;
    the join with per-doc lengths stays broadcast-free because the length
    rides along each exploded row (computed before the explode)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.greatest(F.size(toks), F.lit(1))
    exploded = df.select(
        F.col(id_col).alias("doc"),
        n.alias("_n"),
        F.explode(toks).alias("_tok"),
    ).filter(F.col("_tok") != "")
    return (
        exploded.select(
            "doc",
            F.pmod(F.xxhash64("_tok"), F.lit(dim)).cast("int").alias("idx"),
            (F.lit(1.0) / F.col("_n")).alias("_w1"),
        )
        .groupBy("doc", "idx")
        .agg(F.sum("_w1").alias("x"))
    )


def _margins(feats: DataFrame, weights: list[float], bias: float) -> DataFrame:
    """(doc, margin): b + w·x via a broadcast join with the dim-row weight
    table — no giant literal arrays in the plan, no Python in the path."""
    spark = feats.sparkSession
    wdf = spark.createDataFrame(
        [(i, float(w)) for i, w in enumerate(weights)], "idx int, w double"
    )
    return (
        feats.join(F.broadcast(wdf), "idx")
        .groupBy("doc")
        .agg((F.sum(F.col("x") * F.col("w")) + F.lit(float(bias))).alias("margin"))
    )


def train_text_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    dim: int = 512,
    iters: int = 10,
    lr: float = 3.0,
) -> dict:
    """Fit the hashed logistic model by full-batch gradient descent over
    STANDARDIZED features.

    Raw mean-pooled features are tiny (~1/doc_len) with tiny variance, so
    plain GD on them is hopelessly ill-conditioned (measured: 25
    iterations moved training accuracy from 0.56 to 0.68; higher lr
    oscillated).  Standardizing z = (x - mu)/sd fixes the conditioning —
    and it folds into the SPARSE dot product as a pure reparametrization:

        w_z · z + b  =  sum_j (w_z_j/sd_j) x_j  +  (b - sum_j w_z_j mu_j/sd_j)

    so executors only ever see effective x-space weights through the same
    broadcast join, and the z-space gradient is recoverable from the
    sparse x-space gradient plus the mean residual:

        g_z_j = (g_x_j - mu_j * mean(r)) / sd_j

    Nothing dense ever materializes per row; mu/sd cost ONE extra
    aggregation pass at start (sum(x), sum(x^2) per feature, dim rows).

    Returns {"weights", "bias", "loss_history"} with weights/bias already
    in effective x-space — `score_text` applies them directly.
    loss_history[0] is the untrained loss, so loss_history[-1] <
    loss_history[0] certifies learning happened.  Labels must be 0/1.
    Measured on the sf0.01 corpus (count('the') > count('a') target):
    accuracy 0.98 after 10 iterations at lr=3.
    """
    # Persist the training relations PARTITIONED BY doc (round-14): the
    # per-iteration margin aggregation (groupBy doc) and the label /
    # residual joins (on doc) then all reuse the cached partitioning, so
    # an iteration's only exchange is the dim-bounded gradient groupBy —
    # the feature relation, the heaviest thing in the loop, is shuffled
    # once at persist time instead of once per iteration (guide §2.4;
    # measured 1.36 -> 1.00 s/iter at sf0.01 locally, and at cluster
    # scale it removes a full feats shuffle per iteration).
    feats = hashed_features(df, text_col, id_col, dim).repartition("doc").persist()
    labels = df.select(
        F.col(id_col).alias("doc"), F.col(label_col).cast("double").alias("y")
    ).repartition("doc").persist()
    n_docs = labels.count()
    stat_rows = feats.groupBy("idx").agg(
        F.sum("x").alias("s1"), F.sum(F.col("x") * F.col("x")).alias("s2")
    ).collect()
    mu = [0.0] * dim
    sd = [1e-9] * dim
    seen: list[int] = []
    for row in stat_rows:
        j = row["idx"]
        mu[j] = row["s1"] / n_docs
        var = row["s2"] / n_docs - mu[j] * mu[j]
        sd[j] = math.sqrt(max(var, 1e-18))
        seen.append(j)
    wz = [0.0] * dim
    b = 0.0
    history: list[float] = []
    eps = 1e-12
    for _ in range(iters + 1):
        w_eff = [wz[j] / sd[j] for j in range(dim)]
        b_eff = b - sum(wz[j] * mu[j] / sd[j] for j in range(dim))
        # featureless docs (empty text) carry the bias-only margin
        scored = _margins(feats, w_eff, b_eff).join(
            labels, "doc", "right"
        ).fillna(float(b_eff), subset=["margin"])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
        scored = scored.select(
            "doc", (p - F.col("y")).alias("r"),
            (
                -F.col("y") * F.log(F.greatest(p, F.lit(eps)))
                - (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(eps)))
            ).alias("_l"),
        ).persist()
        if len(history) == iters:
            # final pass needs only the loss — no gradient branch
            loss_row = scored.agg(
                F.mean("_l").alias("loss"), F.mean("r").alias("mr")
            ).collect()[0]
            history.append(float(loss_row["loss"]))
            scored.unpersist()
            break
        # ONE action per iteration (round-14): the loss/mean-residual
        # aggregate and the per-feature gradient rows are unioned into a
        # single collected frame (marker idx -1 = loss, -2 = mean(r)),
        # instead of two separate collect() jobs over the same persisted
        # `scored` — measured 17.6 s -> ~9 s for the 8-iteration training
        # at sf0.01, where the cost is per-job orchestration, and at any
        # scale it halves the number of full job barriers per iteration.
        # The aggregates themselves are the identical expressions; only
        # the collection is fused, so the fitted model is bit-unchanged.
        grad = (
            feats.join(scored.select("doc", "r"), "doc")
            .groupBy("idx")
            .agg((F.sum(F.col("x") * F.col("r")) / n_docs).alias("g"))
        )
        stats2 = scored.agg(
            F.mean("_l").alias("loss"), F.mean("r").alias("mr")
        ).select(
            F.explode(
                F.array(
                    F.struct(F.lit(-1).alias("idx"), F.col("loss").alias("g")),
                    F.struct(F.lit(-2).alias("idx"), F.col("mr").alias("g")),
                )
            ).alias("s")
        ).select(F.col("s.idx").alias("idx"), F.col("s.g").alias("g"))
        rows = grad.unionByName(stats2).collect()
        loss = next(r["g"] for r in rows if r["idx"] == -1)
        mean_r = next(r["g"] for r in rows if r["idx"] == -2)
        history.append(float(loss))
        gx = {row["idx"]: row["g"] for row in rows if row["idx"] >= 0}
        for j in seen:
            wz[j] -= lr * (gx.get(j, 0.0) - mu[j] * mean_r) / sd[j]
        b -= lr * mean_r
        scored.unpersist()
    feats.unpersist()
    labels.unpersist()
    w_eff = [wz[j] / sd[j] for j in range(dim)]
    b_eff = b - sum(wz[j] * mu[j] / sd[j] for j in range(dim))
    return {"weights": w_eff, "bias": b_eff, "loss_history": history}


def score_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: dict,
    dim: int | None = None,
    out: str = "score",
) -> DataFrame:
    """Apply a trained model: (id, score in [0,1]).  Docs whose tokens all
    hash to zero-weight features score sigmoid(bias)."""
    dim = dim or len(model["weights"])
    feats = hashed_features(df, text_col, id_col, dim)
    margins = _margins(feats, model["weights"], model["bias"])
    base = df.select(F.col(id_col).alias("doc"))
    return (
        base.join(margins, "doc", "left")
        .fillna(float(model["bias"]), subset=["margin"])
        .select(
            F.col("doc").alias(id_col),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias(out),
        )
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
