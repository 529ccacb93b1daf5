"""Declarative constraints (functions/checks.py): planted violations are
counted exactly, nulls only trip not_null, and the whole report is one
scan."""

import pytest
from pyspark.sql import functions as F

from hiero_spark import plans as P
from hiero_spark.functions.checks import Checks


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        (1, "F", 10.0, "1-URGENT"),
        (1, "O", 20.0, "2-HIGH"),        # duplicate id
        (None, "X", -5.0, "9-BOGUS"),    # null id, bad status/range/regex
        (3, None, None, None),           # nulls elsewhere: only not_null(id) cares
    ]
    return spark.createDataFrame(rows, "id long, st string, price double, pri string")


@pytest.fixture(scope="module")
def report(dirty):
    return {
        (r["check"], r["column"]): r
        for r in (
            Checks()
            .not_null("id")
            .unique("id")
            .in_range("price", 0, 100)
            .accepted_values("st", ["F", "O", "P"])
            .matches("pri", "^[1-5]-")
            .report(dirty)
            .collect()
        )
    }


def test_violation_counts(report):
    assert report[("not_null", "id")]["n_violations"] == 1
    # 4 rows, 3 distinct non-null ids -> count(*) - count_distinct = 1 dup
    assert report[("unique", "id")]["n_violations"] == 1
    assert report[("in_range", "price")]["n_violations"] == 1
    assert report[("accepted_values", "st")]["n_violations"] == 1
    assert report[("matches", "pri")]["n_violations"] == 1


def test_passed_flags(report):
    assert all(not r["passed"] for r in report.values())


def test_clean_table_passes(spark):
    clean = spark.createDataFrame([(1, "F"), (2, "O")], "id long, st string")
    rep = Checks().not_null("id").unique("id").accepted_values(
        "st", ["F", "O"]
    ).report(clean)
    assert all(r["passed"] and r["n_violations"] == 0 for r in rep.collect())


def test_single_scan(dirty):
    rep = (
        Checks().not_null("id").in_range("price", 0, 100).report(dirty)
    )
    scans = [n for n in P.node_names(rep) if "Scan" in n]
    assert len(scans) == 1, scans


def test_empty_checks_rejected(dirty):
    with pytest.raises(ValueError):
        Checks().report(dirty)
