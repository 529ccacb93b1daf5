"""Z-order layout + footer-stats file skipping (sources/layout.py):
pruned reads return exactly the filtered rows, the Z-layout prunes on
BOTH dimensions where a single-column sort layout prunes on one, and
absent statistics never prune."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.sources import layout

RECT = {"o_custkey": (100.0, 400.0), "o_totalprice": (20000.0, 60000.0)}


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def zpath(orders, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("zorder") / "orders_z")
    layout.save_zordered(orders, p, ["o_custkey", "o_totalprice"], n_files=16)
    return p


def test_pruned_read_is_exact(spark, orders, zpath):
    got = {
        r["o_orderkey"]
        for r in layout.read_pruned(spark, zpath, RECT).collect()
    }
    want = {
        r["o_orderkey"]
        for r in orders.filter(
            (F.col("o_custkey").between(*RECT["o_custkey"]))
            & (F.col("o_totalprice").between(*RECT["o_totalprice"]))
        ).collect()
    }
    assert got == want and want


def test_zorder_prunes_both_dimensions(zpath):
    kept, total = layout.prune_files(zpath, RECT)
    assert total == 16
    assert len(kept) < total / 2, f"kept {len(kept)}/{total}"


def test_single_sort_layout_cannot_prune_second_dim(
    spark, orders, zpath, tmp_path_factory
):
    """The motivating comparison: sorted-by-custkey files each span the
    full totalprice range, so a totalprice predicate reads everything;
    the Z-layout reads a strict subset for the same predicate."""
    p = str(tmp_path_factory.mktemp("zorder") / "orders_single")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(p)
    )
    price_only = {"o_totalprice": RECT["o_totalprice"]}
    kept_single, total_single = layout.prune_files(p, price_only)
    kept_z, total_z = layout.prune_files(zpath, price_only)
    assert total_single == total_z == 16
    assert len(kept_single) == 16, "single-sort should span price everywhere"
    assert len(kept_z) < len(kept_single)


def test_unknown_column_never_prunes(zpath):
    kept, total = layout.prune_files(zpath, {"no_such_col": (0, 1)})
    assert len(kept) == total


def test_empty_rectangle_returns_empty(spark, zpath):
    df = layout.read_pruned(spark, zpath, {"o_custkey": (-50.0, -10.0)})
    assert df.count() == 0
