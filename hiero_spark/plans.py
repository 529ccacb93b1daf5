"""Plan inspection / audit helpers.

The scale contract ("filters reach the scan", "dims broadcast", "top-k
never global-sorts") is only real if it survives code change — these
helpers turn `.explain` eyeballing into assertions that run in CI
(tests/test_plans.py). They parse the formatted explain string, which is
stable enough for presence checks (node names, PushedFilters lists).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(m)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_str(df)):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def node_names(df: DataFrame) -> list[str]:
    """Physical operator names in plan order, e.g. ['Scan parquet ', ...]."""
    return re.findall(r"^\(\d+\) ([A-Za-z ]+)", plan_str(df), re.MULTILINE)


def has_node(df: DataFrame, name: str) -> bool:
    return any(name in n for n in node_names(df))


def broadcast_join_count(df: DataFrame) -> int:
    return sum("BroadcastHashJoin" in n for n in node_names(df))


def whole_stage_codegen_ids(df: DataFrame) -> list[int]:
    """Codegen span ids ("[codegen id : N]" in formatted mode). Under AQE
    these exist only in the FINAL plan, so the query is executed first —
    collect() (not count(), which builds a separate query execution) so
    THIS DataFrame's own plan finalizes. Audit-only: call on bounded
    sketch outputs, not base tables."""
    df.collect()
    return [int(x) for x in re.findall(r"codegen id : (\d+)", plan_str(df))]


def shuffle_bytes_written(df: DataFrame) -> int:
    """Total shuffle bytes written while executing this DataFrame.

    Runs the query (collect), then walks the executed physical plan —
    through the AQE wrapper and query-stage nodes — summing every
    'shuffle bytes written' SQLMetric. Audit-only (bounded outputs):
    this is how the repo demonstrates claims like 'hashed semi-join keys
    shrink the shuffle' with a measurement instead of an adjective.
    """
    df.collect()
    node = df._jdf.queryExecution().executedPlan()
    total = 0
    seen_metric_ids: set[int] = set()
    stack = [node]
    while stack:
        n = stack.pop()
        cls = n.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(n.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            stack.append(n.plan())
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "shuffleBytesWritten":
                # ReusedExchangeExec (and a QueryStageExec plus its wrapped
                # exchange) expose the SAME SQLMetric accumulators — sum
                # each accumulator id once or reuse double-counts.
                mid = kv._2().id()
                if mid not in seen_metric_ids:
                    seen_metric_ids.add(mid)
                    total += kv._2().value()
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return total


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — audit column pruning."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan_str(df))


def partition_filters(df: DataFrame) -> list[str]:
    """Non-empty PartitionFilters of each file scan — audit partition
    pruning on partitionBy-written datasets (directory-level skipping,
    the coarsest and cheapest filter there is)."""
    out = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan_str(df)):
        if m.group(1).strip():
            out.append(m.group(1))
    return out
