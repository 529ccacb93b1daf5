"""Custom Python DataSource (sources/pyds.py): partitioned reads (one
task per file), filter pushdown into the parse loop, grok skip-on-
malformed semantics, and agreement with the classic text+regexp reader."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from hiero_spark.sources import pyds
from hiero_spark.sources.readers import read_logs


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pyds")
    for i in range(3):
        lines = []
        for j in range(10):
            n = i * 10 + j
            level = "INFO" if n % 2 == 0 else "WARN"
            lines.append(f"t{n} {level} [src{i}] message number {n}")
        lines.append("this line is malformed and must be skipped")
        (d / f"part{i}.txt").write_text("\n".join(lines) + "\n")
    pyds.register(spark)
    return str(d)


def test_partition_per_file(log_dir):
    reader = pyds.LogReader({"path": f"{log_dir}/*.txt"})
    assert len(reader.partitions()) == 3


def test_reads_all_well_formed_rows(spark, log_dir):
    df = spark.read.format("hiero_logs").option("path", f"{log_dir}/*.txt").load()
    assert df.count() == 30  # 33 lines, 3 malformed skipped
    assert df.columns == ["ts", "level", "source", "message"]


def test_matches_classic_reader(spark, log_dir):
    custom = spark.read.format("hiero_logs").option(
        "path", f"{log_dir}/*.txt"
    ).load()
    classic = read_logs(spark, log_dir).filter(F.col("ts") != "")
    assert sorted(map(tuple, custom.collect())) == sorted(
        map(tuple, classic.collect())
    )


def test_filter_pushdown_claims_equality_only(log_dir):
    reader = pyds.LogReader({"path": f"{log_dir}/*.txt"})
    unhandled = list(
        reader.pushFilters(
            [EqualTo(("level",), "INFO"), GreaterThan(("ts",), "t5")]
        )
    )
    assert reader.eq == {1: "INFO"}
    assert len(unhandled) == 1 and isinstance(unhandled[0], GreaterThan)


def test_pushed_filter_correct_end_to_end(spark, log_dir):
    df = (
        spark.read.format("hiero_logs")
        .option("path", f"{log_dir}/*.txt")
        .load()
        .filter(F.col("level") == "INFO")
    )
    rows = df.collect()
    assert len(rows) == 15
    assert all(r["level"] == "INFO" for r in rows)


def test_streaming_source_consumes_incrementally(spark, tmp_path):
    """The streaming side: batch 1 consumes the files present, a restart
    with the same checkpoint consumes ONLY files that appeared since —
    offset tracking through the engine's normal checkpoint machinery."""
    src = tmp_path / "stream_src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.txt").write_text("t1 INFO [s] alpha\nt2 WARN [s] beta\n")
    pyds.register(spark)

    def run():
        stream = (
            spark.readStream.format("hiero_logs")
            .option("path", f"{src}/*.txt")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 2
    (src / "b.txt").write_text("t3 INFO [s] gamma\n")
    run()
    got = sorted(r["ts"] for r in spark.read.parquet(out).collect())
    assert got == ["t1", "t2", "t3"], "restart must consume only new files"


def test_stream_reader_offsets_replayable():
    reader = pyds.LogStreamReader({"path": "/nonexistent/*.txt"})
    start = reader.initialOffset()
    rows, end = reader.read(start)
    assert list(rows) == [] and end == {"seen": []}
