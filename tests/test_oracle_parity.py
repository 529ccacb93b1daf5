"""The big one: every registered query must match its DuckDB oracle at
sf0.01 — the same comparison the driver runs (t2 correctness gate)."""

import pytest

from hiero_spark.registry import all_queries
from tests.conftest import SF_ORACLE
from tests.parity import compare_query

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_parity(spark, duck, name):
    spec = SPECS[name]
    problems = compare_query(spark, duck, spec, SF_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)
