"""Bloom-sidecar file skipping: equality lookups bounded by per-file-group
bitmaps on ANY layout (the complement of footer-stats range/prefix
pruning, which needs sorted layouts)."""

import pytest
from pyspark.sql import functions as F

from hiero_spark.sources import layout as L


@pytest.fixture(scope="module")
def bloom_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bloomtbl") / "t")
    df = spark.range(2000).selectExpr("id", "CONCAT('key_', id) AS k", "id * 3 AS val")
    sidecar = L.save_bloom_indexed(spark, df, path, "k", n_files=16)
    return path, sidecar


def test_point_lookup_correct_and_pruned(spark, bloom_table):
    path, sc = bloom_table
    out = L.read_bloom_pruned(spark, path, "key_1234")
    rows = out.collect()
    assert [(r.id, r.val) for r in rows] == [(1234, 3702)]
    # I/O bound: the scan planned a strict subset of the 16 file groups
    groups = {f.split("_grp=")[1].split("/")[0] for f in out.inputFiles()}
    assert len(groups) < 16


def test_no_false_negatives_sampled(spark, bloom_table):
    path, _ = bloom_table
    for i in range(0, 2000, 97):
        assert L.read_bloom_pruned(spark, path, f"key_{i}").count() == 1


def test_absent_key_yields_empty(spark, bloom_table):
    path, _ = bloom_table
    assert L.read_bloom_pruned(spark, path, "nope_xyz").count() == 0


def test_sidecar_is_sparse_and_typed(bloom_table):
    _, sc = bloom_table
    assert sc["n_files"] == 16 and sc["key_col"] == "k"
    # 2000 keys x 3 hashes over 16 groups x 1024 words: far from dense
    total_words = sum(len(v) for v in sc["blooms"].values())
    assert 0 < total_words < 16 * 1024
