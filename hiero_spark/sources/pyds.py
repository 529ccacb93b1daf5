"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
modern way to plug a bespoke format into the engine so it behaves like a
first-class table: Spark plans PARTITIONED reads over it (one task per
split), and filters can be PUSHED into the source so non-matching data
dies at the point of parse instead of riding through the plan.

This upgrades the S7 grok/log reader from "text source + regexp columns"
(sources/readers.py:read_logs) to a real DataSource:

- `partitions()` returns one InputPartition per log file — Spark
  schedules them across executors exactly like parquet splits; a
  directory of 10k log files becomes 10k-way parallel parse work with
  no driver loop.
- `pushFilters()` accepts EqualTo filters on parsed fields and drops
  non-matching LINES during the scan (cheap string test before the
  regex groups are materialized into a Row).  Unhandled filters are
  returned to Spark, which re-applies them — pushdown here is an
  optimization, never a correctness dependency.
- `read()` yields tuples per matched line; malformed lines are skipped
  (grok semantics), so a corrupt shard degrades to fewer rows, not a
  failed job.

Usage:
    spark.dataSource.register(LogDataSource)
    spark.read.format("hiero_logs").option("path", "logs/*.txt").load()
"""

from __future__ import annotations

import glob
import re
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LOG_PATTERN = r"^(\S+) (\S+) \[([^\]]*)\] (.*)$"
LOG_FIELDS = ("ts", "level", "source", "message")


class LogFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class LogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hiero_logs requires option('path', <glob>)")
        self.pattern = options.get("pattern", LOG_PATTERN)
        self.eq: dict[int, str] = {}

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Claim string-equality filters on parsed fields; everything else
        goes back to Spark."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in LOG_FIELDS
                and isinstance(f.value, str)
            ):
                self.eq[LOG_FIELDS.index(f.attribute[0])] = f.value
            else:
                yield f

    def partitions(self) -> list[InputPartition]:
        return [LogFilePartition(p) for p in sorted(glob.glob(self.path))]

    def read(self, partition: LogFilePartition) -> Iterator[tuple]:
        rx = re.compile(self.pattern)
        eq = self.eq
        with open(partition.path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                m = rx.match(line.rstrip("\n"))
                if m is None:
                    continue
                row = m.groups()
                if any(row[i] != v for i, v in eq.items()):
                    continue
                yield row


def _parse_files(paths: list[str], pattern: str) -> Iterator[tuple]:
    rx = re.compile(pattern)
    for p in paths:
        with open(p, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                m = rx.match(line.rstrip("\n"))
                if m is not None:
                    yield m.groups()


class LogStreamReader(SimpleDataSourceStreamReader):
    """Streaming side: log files land in a directory over time (immutable
    once written — the standard object-store landing pattern); each
    micro-batch consumes the files that appeared since the last offset.

    The offset is the sorted list of consumed file paths — JSON in the
    checkpoint, so a restarted query resumes exactly where it stopped,
    and `readBetweenOffsets` re-parses a replayed batch's files
    deterministically (immutability makes replay = re-read).  This is
    FileStreamSource's contract rebuilt on the Python API, which is what
    makes the custom format usable from Structured Streaming with the
    engine's normal exactly-once checkpointing."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("hiero_logs requires option('path', <glob>)")
        self.pattern = options.get("pattern", LOG_PATTERN)

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _new_files(self, seen: list[str]) -> list[str]:
        return [p for p in sorted(glob.glob(self.path)) if p not in set(seen)]

    def read(self, start: dict):
        new = self._new_files(start["seen"])
        rows = list(_parse_files(new, self.pattern))
        return iter(rows), {"seen": sorted(start["seen"] + new)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        replay = [p for p in end["seen"] if p not in set(start["seen"])]
        return _parse_files(replay, self.pattern)


class LogDataSource(DataSource):
    """format('hiero_logs'): partitioned, pushdown-capable grok reader —
    batch and streaming."""

    @classmethod
    def name(cls) -> str:
        return "hiero_logs"

    def schema(self) -> str:
        return "ts string, level string, source string, message string"

    def reader(self, schema) -> LogReader:
        return LogReader(self.options)

    def simpleStreamReader(self, schema) -> LogStreamReader:
        return LogStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine —
    latest registration wins in the session's data source registry).
    Python-side filter pushdown ships behind a conf in Spark 4 — enable
    it here so the reader's pushFilters() is actually consulted."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LogDataSource)
