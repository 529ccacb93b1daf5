#!/usr/bin/env python
"""End-to-end spreadsheet session — the reference's interaction loop
(load → filter → sketch → render → page) expressed on this engine.

Run: python examples/demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001", out=print) -> None:
    from pyspark.sql import functions as F

    from hiero_spark import progressive as pg
    from hiero_spark import viz
    from hiero_spark.catalog import load_table
    from hiero_spark.operators import filters as fl
    from hiero_spark.operators import sketches as sk
    from hiero_spark.operators.pagination import next_k
    from hiero_spark.session import get_spark
    from hiero_spark.views import RecordOrder, View

    spark = get_spark("hiero_spark_demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load the table (the "open a dataset" step)
    li = load_table(spark, sf_dir, "lineitem")
    out(f"loaded lineitem: {li.count()} rows, {len(li.columns)} columns")

    # 2. brush a histogram: filter to a quantity range via the view algebra
    view = View(li).filter(fl.range_filter("l_quantity", 10, 40))
    out(f"after range brush [10, 40]: {view.df().count()} rows")

    # 3. histogram sketch + terminal render
    hist = sk.histogram1d(view.df(), "l_extendedprice", 900.0, 105000.0, 8)
    out("\nextended price histogram (brushed view):")
    out(viz.ascii_histogram(hist.orderBy("bucket"), "bucket", "bucket_count"))

    # 4. progressive refinement of the same sketch (hiero's partial results)
    out("\nprogressive refinement:")
    for frac, part in pg.progressive_prefix(
        view.df(),
        lambda d: sk.histogram1d(d, "l_extendedprice", 900.0, 105000.0, 8),
        ["l_orderkey", "l_linenumber"],
        tiers=3,
    ):
        total = part.agg(F.sum("bucket_count")).collect()[0][0]
        out(f"  {frac:>5.0%} scanned -> {total} rows sketched")

    # 5. heavy hitters + spreadsheet page (the table view)
    out("\ntop (returnflag, linestatus):")
    for r in sk.heavy_hitters(view.df(), ["l_returnflag", "l_linestatus"], 3).collect():
        out(f"  {r[0]} {r[1]}: {r[2]}")
    order = RecordOrder((("l_shipdate", True), ("l_orderkey", True)))
    page = viz.table_page(
        next_k(view.df(), order, 5).select(
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
            "l_orderkey",
            "row_multiplicity",
        )
    )
    out("\nfirst page of the sorted table view:")
    out("  " + " | ".join(page["columns"]))
    for row in page["rows"]:
        out("  " + " | ".join(str(v) for v in row))

    # 6. training-data curation on the documents table: language + quality
    #    + Gopher repetition gates, then exact dedup — one composed plan
    from hiero_spark.functions import dedup as dd
    from hiero_spark.functions import text as tx

    docs = load_table(spark, sf_dir, "documents")
    gated = (
        tx.with_language_id(docs, "text")
        .withColumn("quality", tx.quality_score(F.col("text")))
        .withColumn("top2gram", tx.top_2gram_share(F.col("text")))
        .filter(
            (F.col("pred_lang") == "en")
            & (F.col("quality") >= 0.5)
            & (F.col("top2gram") <= 0.2)
        )
    )
    survivors = dd.exact_dedup(gated, "text", "doc_id")
    out(
        f"\ncuration: {docs.count()} docs -> {gated.count()} past gates "
        f"-> {survivors.count()} after exact dedup"
    )

    # 7. learned curation signals, all trained in-engine: a bigram LM
    #    ranks documents by perplexity (CCNet), and BPE merges come from
    #    the word-frequency dict the corpus compresses into
    from hiero_spark.functions import bpe, lm
    from hiero_spark.functions.pipeline import assign_split

    split = assign_split(docs, "doc_id")
    c1, c2, v = lm.train_bigram_lm(
        split.filter(F.col("split") == "train"), "text", "doc_id"
    )
    ranked = (
        lm.lm_score(
            split.filter(F.col("split") == "test"), "text", "doc_id", c1, c2, v
        )
        .filter(F.col("n_bigrams") > 0)
        .orderBy(F.desc("avg_logp"))
    )
    best = ranked.first()
    out(
        f"\nLM quality ranking: {ranked.count()} test docs scored; most "
        f"train-like doc {best['doc_id']} (mean log p {best['avg_logp']:.3f})"
    )
    merges = bpe.train_bpe(bpe.word_dict(docs, "text"), n_merges=6)
    out(f"BPE merges learned in-engine: {merges}")

    # 8. day-2 ingest: the corpus persists as a fingerprint index; a new
    #    batch dedups against it without re-reading corpus bodies, and
    #    near-dups are caught by probing the persisted LSH index
    from hiero_spark.functions import incremental as inc

    corpus = split.filter(F.col("split") == "train")
    batch = split.filter(F.col("split") == "test")
    fp_idx = inc.fingerprint_index(corpus, "text")
    admitted = inc.admit_batch(batch, fp_idx, "text", "doc_id")
    bidx, bsh = inc.lsh_index(corpus, "text", "doc_id")
    near = inc.incremental_near_dups(batch, bidx, bsh, "text", "doc_id")
    out(
        f"\nday-2 ingest: {batch.count()} batch docs -> "
        f"{admitted.count()} admitted (exact-new), "
        f"{near.select('batch_doc').distinct().count()} near-dup an indexed corpus doc"
    )

    # 9. operational layer: link-graph scoring and volume anomaly watch
    from hiero_spark.functions.graph import pagerank
    from hiero_spark.operators.anomaly import hourly_count_anomalies

    n_docs_total = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    links = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 13) % n_docs_total).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    pr = pagerank(links, n_iter=3)
    top_pr = pr.orderBy(F.desc("rank_micro")).first()
    events = load_table(spark, sf_dir, "events")
    n_anom = hourly_count_anomalies(events).count()
    out(
        f"\nops layer: best-linked doc {top_pr['node']} "
        f"(rank {top_pr['rank']:.3f}); {n_anom} hourly volume anomalies flagged"
    )

    # 10. retrieval layer: build the positional inverted index once, then
    #     BM25-rank and phrase-search from the persisted posting lists
    #     (partition-pruned probes — document text never rescanned)
    import tempfile

    from hiero_spark.functions.bm25 import (
        bm25_topk_indexed,
        phrase_count_indexed,
        save_text_index,
    )

    with tempfile.TemporaryDirectory() as tix:
        save_text_index(docs, tix)
        hits = bm25_topk_indexed(spark, tix, ["spark", "join", "window"], k=3)
        out("\nBM25 top-3 for 'spark join window' (index probe):")
        for r in hits.collect():
            out(f"  doc {r['doc_id']}: {r['n_terms']} terms, score {r['bm25']}")
        n_phrase = phrase_count_indexed(spark, tix, ["data", "data"]).count()
        out(f"docs containing the exact phrase 'data data': {n_phrase}")

    # 11. hybrid retrieval: BM25 and exact-cosine top lists fused by
    #     reciprocal rank (1/(60+rank) per listing source) — the
    #     lexical+vector RAG recipe as one registered query
    from hiero_spark.registry import all_queries

    fused = all_queries()["n2_hybrid_rrf"].fn(spark, sf_dir)
    out("\nhybrid RRF top-3 (text + vector fusion):")
    for r in fused.limit(3).collect():
        src = "+".join(
            s for s, hit in (("text", r["in_text"]), ("vec", r["in_vector"])) if hit
        )
        out(f"  doc {r['doc_id']}: rrf {r['rrf']} via {src}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
