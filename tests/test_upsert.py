"""Copy-on-write partitioned upsert: merge semantics, untouched
partitions keep their exact files, emptied partitions are cleared."""

import glob
import os

from pyspark.sql import Row, functions as F

from hiero_spark.sources.layout import upsert_partitioned


def _snapshot(path):
    return {
        f: (os.path.getsize(f), os.path.getmtime(f))
        for f in glob.glob(f"{path}/*/part-*.parquet")
    }


def test_merge_touches_only_affected_partitions(spark, tmp_path):
    dst = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i), "p%d" % (i % 3)) for i in range(60)], ["k", "v", "part"]
    )
    base.write.partitionBy("part").parquet(dst)
    before = _snapshot(dst)

    changes = spark.createDataFrame(
        [
            Row(k=0, v=100.0, part="p0", _delete=False),   # update
            Row(k=3, v=0.0, part="p0", _delete=True),      # delete
            Row(k=999, v=9.5, part="p0", _delete=False),   # insert
        ]
    )
    audit = upsert_partitioned(spark, dst, changes, "k", "part")
    assert audit == {"partitions_rewritten": 1, "partitions_emptied": 0}

    after = _snapshot(dst)
    untouched_before = {f: s for f, s in before.items() if "part=p0" not in f}
    untouched_after = {f: s for f, s in after.items() if "part=p0" not in f}
    assert untouched_before == untouched_after  # exact same files, same bytes

    got = {r["k"]: r["v"] for r in spark.read.parquet(dst).filter("part = 'p0'").collect()}
    assert got[0] == 100.0 and 3 not in got and got[999] == 9.5
    assert len(got) == 20  # 20 original p0 rows - 1 delete + 1 insert


def test_fully_deleted_partition_is_cleared(spark, tmp_path):
    dst = str(tmp_path / "tbl2")
    spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["k", "part"]
    ).write.partitionBy("part").parquet(dst)
    changes = spark.createDataFrame(
        [Row(k=1, part="a", _delete=True), Row(k=2, part="a", _delete=True)]
    )
    audit = upsert_partitioned(spark, dst, changes, "k", "part")
    assert audit["partitions_emptied"] == 1
    assert not glob.glob(f"{dst}/part=a/part-*.parquet")
    assert [r["k"] for r in spark.read.parquet(dst).collect()] == [3]


def test_partition_moving_update_leaves_no_stale_copy(spark, tmp_path):
    # round-6 ADVICE: an update that MOVES a key to a new partition must
    # rewrite the key's OLD partition too, or a stale duplicate survives
    dst = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, float(i), "p%d" % (i % 3)) for i in range(30)], ["k", "v", "part"]
    )
    base.write.partitionBy("part").parquet(dst)

    # k=4 lives in p1; the change row re-homes it to p0
    changes = spark.createDataFrame(
        [Row(k=4, v=40.0, part="p0", _delete=False)]
    )
    audit = upsert_partitioned(spark, dst, changes, "k", "part")
    assert audit["partitions_rewritten"] == 2  # p0 (target) AND p1 (old home)

    rows = spark.read.parquet(dst).filter(F.col("k") == 4).collect()
    assert len(rows) == 1  # exactly one copy, no stale p1 row
    assert rows[0]["part"] == "p0" and rows[0]["v"] == 40.0
    total = spark.read.parquet(dst).count()
    assert total == 30  # nothing else gained or lost
