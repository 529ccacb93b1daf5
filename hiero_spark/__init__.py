"""hiero_spark — a PySpark-native analytics engine with the capabilities of
mbudiu-vmw/hiero (the pre-rename Hillview big-data spreadsheet).

Architecture (see SURVEY.md):
- Everything is a lazy Spark DataFrame; Catalyst owns physical planning.
- hiero's IMembershipSet view algebra -> `views.View` (base table + predicate
  stack + derived columns), compiled to one collapsed DataFrame plan.
- hiero's ISketch monoid -> Spark partial+final aggregation (built-in F.* aggs).
- Extensions beyond the reference (joins, windows, group-by aggs, streaming,
  dedup / similarity / text analysis) are first-class operators here.

Reference parity notes cite public-repo class names from SURVEY.md §2 (the
/root/reference tree was empty at survey time; citations are class-name
level, confidence-tagged in SURVEY.md).
"""

from hiero_spark.session import get_spark
from hiero_spark.catalog import TABLES, load_table, load_tables, register_views
from hiero_spark.views import RecordOrder, View

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
    "TABLES",
    "RecordOrder",
    "View",
]
__version__ = "0.1.0"
