"""ordered_lead — the low-cardinality-key LEAD scale path (round 10).

The other temporal operators (as-of/range joins, gap fill, SCD2, OHLC,
seasonal decompose) are covered in tests/test_scale_toolkit.py; this file
pins the two-phase distributed LEAD against the plain-window ground truth.
"""

def test_ordered_lead_matches_plain_window(spark):
    """ordered_lead (round 10: the low-cardinality-key LEAD scale path)
    must reproduce LEAD OVER (PARTITION BY key ORDER BY ts, id) exactly,
    including across range-partition boundaries and for keys whose runs
    span several partitions."""
    from pyspark.sql import Window, functions as F

    from hiero_spark.operators.temporal import ordered_lead

    rows = [
        (("a", "b", "c")[i % 3], i, (i * 37) % 101)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    got = sorted(
        (r["k"], r["id"], r["_lead"])
        for r in ordered_lead(
            df, ["k"], ["v", "id"], "id", n_parts=7
        ).collect()
    )
    w = Window.partitionBy("k").orderBy("v", "id")
    exp = sorted(
        (r["k"], r["id"], r["_lead"])
        for r in df.withColumn("_lead", F.lead("id").over(w)).collect()
    )
    assert got == exp
    # each key's global last row has a null lead, all others don't
    assert sum(1 for _k, _i, nxt in got if nxt is None) == 3


def test_ordered_lead_single_partition_and_singleton_keys(spark):
    """Degenerate shapes: one range partition (no boundary rows at all)
    and a key with a single row (lead null)."""
    from hiero_spark.operators.temporal import ordered_lead

    df = spark.createDataFrame(
        [("x", 1, 10), ("x", 2, 20), ("solo", 9, 90)],
        "k string, id long, v long",
    )
    got = {
        (r["k"], r["id"]): r["nxt"]
        for r in ordered_lead(
            df, ["k"], ["v", "id"], "v", out_col="nxt", n_parts=2
        ).collect()
    }
    assert got == {("x", 1): 20, ("x", 2): None, ("solo", 9): None}
