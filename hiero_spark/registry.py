"""Query registry: every implemented operator registers a named demo query
plus (when SQL-expressible) a DuckDB oracle, fulfilling the driver contract
in __spark_entry__.py.

Column-name discipline: every computed column is aliased identically in the
Spark callable and the oracle SQL — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views; None => rows-only check
    group: str  # SURVEY.md §2 group tag, e.g. "A4", "N1", "ext-join"
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, *, oracle: str | None, group: str, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, group=group, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import operator modules for their registration side effects.
    import hiero_spark.queries  # noqa: F401

    return dict(_REGISTRY)
