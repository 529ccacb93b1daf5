"""Tests for the interactivity layer: progressive partial results and the
render (viz) layer."""

import pytest
from pyspark.sql import functions as F

from hiero_spark import progressive as pg
from hiero_spark import viz
from hiero_spark.catalog import load_table
from hiero_spark.operators import sketches as sk

KEYS = ["l_orderkey", "l_linenumber"]


def _hist(df):
    return sk.histogram1d(df, "l_quantity", 1.0, 50.0, 10)


def _collect_hist(df):
    return {r["bucket"]: r["bucket_count"] for r in df.collect()}


def test_progressive_prefix_refines_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = _collect_hist(_hist(li))
    fractions, snapshots = [], []
    for frac, part in pg.progressive_prefix(li, _hist, KEYS, tiers=4):
        fractions.append(frac)
        snapshots.append(_collect_hist(part))
    assert fractions == [0.25, 0.5, 0.75, 1.0]
    assert snapshots[-1] == exact  # last tier IS the exact answer
    # refinement is monotone: each prefix only grows
    for earlier, later in zip(snapshots, snapshots[1:]):
        assert all(earlier.get(b, 0) <= later.get(b, 0) for b in later)
    # tiers carry roughly their fraction of the rows (hash uniformity)
    total = sum(exact.values())
    first = sum(snapshots[0].values())
    assert 0.15 < first / total < 0.35


def test_progressive_merge_equals_whole_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = _collect_hist(_hist(li))

    def merge(parts):
        return parts.groupBy("bucket").agg(
            F.sum("bucket_count").alias("bucket_count")
        )

    emissions = list(pg.progressive_merge(li, _hist, merge, KEYS, tiers=4))
    assert emissions[-1][0] == 1.0
    assert _collect_hist(emissions[-1][1]) == exact


def test_histogram_and_cdf_specs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hist = _hist(li)
    spec = viz.histogram_spec(hist, "bucket", "bucket_count", title="qty")
    assert spec["mark"] == "bar" and spec["title"] == "qty"
    got = {v["bucket"]: v["bucket_count"] for v in spec["data"]["values"]}
    assert got == _collect_hist(hist)
    assert viz.cdf_spec(hist, "bucket", "bucket_count")["mark"] == "line"


def test_heatmap_and_trellis_specs(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hm = sk.heatmap(li, "l_quantity", 1.0, 50.0, 5, "l_discount", 0.0, 0.1, 3)
    spec = viz.heatmap_spec(hm, "bucket_x", "bucket_y", "cell_count")
    assert spec["mark"] == "rect"
    assert len(spec["data"]["values"]) == hm.count()
    tr = sk.trellis(
        li, "l_quantity", 1.0, 50.0, 5, "l_discount", 0.0, 0.1, 3, "l_returnflag"
    )
    tspec = viz.trellis_spec(tr, "bucket_x", "bucket_y", "cell_count", "trellis_key")
    assert tspec["encoding"]["facet"]["field"] == "trellis_key"


def test_table_page_and_ascii(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    hist = _hist(li)
    page = viz.table_page(hist.orderBy("bucket").limit(3))
    assert page["columns"] == ["bucket", "bucket_count"]
    expected = [[r["bucket"], r["bucket_count"]] for r in hist.orderBy("bucket").limit(3).collect()]
    assert page["rows"] == expected
    art = viz.ascii_histogram(hist.orderBy("bucket"), "bucket", "bucket_count")
    assert "#" in art and len(art.splitlines()) == hist.count()


def test_render_refuses_unbounded_input(spark, sf_dir, monkeypatch):
    li = load_table(spark, sf_dir, "lineitem")
    monkeypatch.setattr(viz, "_MAX_RENDER_ROWS", 100)
    with pytest.raises(ValueError, match="render"):
        viz.histogram_spec(li, "l_orderkey", "l_quantity")


def test_demo_runs_end_to_end(sf_dir):
    import importlib.util, os

    path = os.path.join(os.path.dirname(__file__), "..", "examples", "demo.py")
    spec = importlib.util.spec_from_file_location("demo", path)
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)
    lines = []
    demo.main(sf_dir, out=lines.append)
    joined = "\n".join(str(x) for x in lines)
    assert "loaded lineitem" in joined and "#" in joined
    assert "first page of the sorted table view:" in joined


def test_dataset_card_renders(spark, sf_dir):
    from hiero_spark import viz

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = viz.dataset_card(docs)
    assert "# Dataset card" in card
    assert "Column profile" in card and "Constraints" in card
    assert "| doc_id |" in card or "| column |" in card
    assert "exact-duplicate rate" in card
    # every declared constraint row rendered
    assert card.count("not_null") >= 2 and "unique" in card
