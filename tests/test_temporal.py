"""ordered_lead — the low-cardinality-key LEAD scale path (round 10).

The other temporal operators (as-of/range joins, gap fill, SCD2, OHLC,
seasonal decompose) are covered in tests/test_scale_toolkit.py; this file
pins the two-phase distributed LEAD against the plain-window ground truth.
"""

import os

# round boundaries deep-sweep the in-file fuzzers too (HIERO_FUZZ_EXAMPLES=200)
_FUZZ_EXAMPLES = int(os.environ.get("HIERO_FUZZ_EXAMPLES", "25"))


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


def test_ordered_lead_null_partition_key(spark):
    """A NULL partition key is a real group to lead()'s window, so the
    boundary stitch must resolve its cross-partition successors too —
    before the round-11 eqNullSafe fix, the null-unsafe left join never
    matched the NULL key and every physical-partition-final row of the
    null run kept a null lead mid-sequence."""
    from pyspark.sql import Window, functions as F

    from hiero_spark.operators.temporal import ordered_lead

    rows = [
        ((None, "a")[i % 2], i, (i * 37) % 101)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    got = sorted(
        ((r["k"] is None, r["k"]), r["id"], r["_lead"])
        for r in ordered_lead(df, ["k"], ["v", "id"], "id", n_parts=6).collect()
    )
    w = Window.partitionBy("k").orderBy("v", "id")
    exp = sorted(
        ((r["k"] is None, r["k"]), r["id"], r["_lead"])
        for r in df.withColumn("_lead", F.lead("id").over(w)).collect()
    )
    assert got == exp
    # exactly one global-last row per group (None and "a") has a null lead
    assert sum(1 for _k, _i, nxt in got if nxt is None) == 2


def test_asof_join_fuzz_against_duckdb_native_asof(spark):
    """Differential check against an INDEPENDENT implementation: DuckDB's
    native ASOF LEFT JOIN (greatest right_ts <= left_ts per key) must
    agree with operators/temporal.as_of_join on generated frames.  Right
    (key, ts) pairs are unique — with duplicate timestamps the pick is
    tie-broken differently per engine (ours: max payload struct), so the
    generator stays inside the deterministic contract."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from hiero_spark.operators.temporal import as_of_join

    keys = st.sampled_from(["a", "b", "c"])
    left_rows = st.lists(
        st.tuples(keys, st.integers(0, 40)), min_size=0, max_size=25
    )
    right_rows = st.lists(
        st.tuples(keys, st.integers(0, 40)),
        min_size=0,
        max_size=25,
        unique=True,
    )

    @settings(max_examples=_FUZZ_EXAMPLES, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(lrows=left_rows, rrows=right_rows)
    def run(lrows, rrows):
        lpdf = pd.DataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
            columns=["id", "k", "ts"],
        )
        rpdf = pd.DataFrame(
            [(k, ts, ts * 100 + ord(k[0])) for k, ts in rrows],
            columns=["k", "ts", "v"],
        )
        con = duckdb.connect()
        con.register("l", lpdf)
        con.register("r", rpdf)
        exp = sorted(
            (int(i), None if pd.isna(v) else int(v))
            for i, v in con.execute(
                "SELECT l.id, r.v FROM l ASOF LEFT JOIN r "
                "ON l.k = r.k AND l.ts >= r.ts"
            ).fetchall()
        )
        ldf = spark.createDataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(lrows)],
            "id long, k string, ts long",
        )
        rdf = spark.createDataFrame(
            [(k, ts, ts * 100 + ord(k[0])) for k, ts in rrows],
            "k string, ts long, v long",
        )
        got = sorted(
            (r["id"], r["v"])
            for r in as_of_join(ldf, rdf, "k", "ts", "ts", ["v"]).collect()
        )
        assert got == exp, (lrows, rrows)

    run()


def test_asof_join_null_quadrants(spark):
    """Round-11 null probe fix: the as-of predicate is three-valued —
    a version with NULL key or NULL timestamp never matches, and a left
    row with NULL key or NULL timestamp matches no version.  Before the
    fix, the union+window mechanics invented matches in all four
    quadrants: NULL keys partition together, and a NULL right timestamp
    sorts NULLS-FIRST, acting as a -infinity version.  (DuckDB's native
    ASOF differs on the left-NULL-timestamp quadrant only — it reads a
    NULL left ts as +infinity and attaches the latest version; the
    docstring documents that divergence.)"""
    from hiero_spark.operators.temporal import as_of_join

    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", None), (3, None, 20), (4, "b", 5)],
        "lid int, k string, ts int",
    )
    right = spark.createDataFrame(
        [("a", 5, 100), ("a", None, 200), (None, 15, 300), ("b", None, 400)],
        "k string, ts int, val int",
    )
    got = {
        r["lid"]: r["val"]
        for r in as_of_join(left, right, "k", "ts", "ts", ["val"]).collect()
    }
    assert got == {
        1: 100,   # plain match: latest 'a' version at ts<=10 is (5, 100)
        2: None,  # left ts NULL: matches nothing (strict 3VL)
        3: None,  # left key NULL: never equals any right key
        4: None,  # only 'b' version has NULL ts: never satisfies <=
    }


def test_range_join_fuzz_against_duckdb_inequality_join(spark):
    """Differential check for operators/temporal.range_join: the bucketed
    equi-join + exact containment filter must equal DuckDB's plain
    inequality join (p_ts >= lo AND p_ts < hi) on generated frames —
    and must be INVARIANT to bucket_seconds (the buckets are a physical
    routing key, never a semantic one).  The generator injects NULL
    timestamps and NULL/inverted interval bounds: both engines drop
    them (NULL comparison / NULL bucket key), inverted intervals match
    nothing."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings, strategies as st

    from hiero_spark.operators.temporal import range_join

    sec = st.one_of(st.none(), st.integers(0, 500))
    point_rows = st.lists(sec, min_size=0, max_size=25)
    ival_rows = st.lists(st.tuples(sec, sec), min_size=0, max_size=10)

    def ts(v):
        return None if v is None else pd.Timestamp(v, unit="s")

    @settings(max_examples=_FUZZ_EXAMPLES, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(prows=point_rows, irows=ival_rows,
           bucket=st.sampled_from([1, 7, 60, 3600]))
    def run(prows, irows, bucket):
        ppdf = pd.DataFrame(
            [(i, ts(v)) for i, v in enumerate(prows)],
            columns=["pid", "p_ts"],
        )
        ipdf = pd.DataFrame(
            [(i, ts(lo), ts(hi)) for i, (lo, hi) in enumerate(irows)],
            columns=["iid", "lo", "hi"],
        )
        con = duckdb.connect()
        con.register("p", ppdf)
        con.register("i", ipdf)
        exp = sorted(
            (int(a), int(b))
            for a, b in con.execute(
                "SELECT p.pid, i.iid FROM p JOIN i "
                "ON p.p_ts >= i.lo AND p.p_ts < i.hi"
            ).fetchall()
        )
        pdf = spark.createDataFrame(ppdf.astype(object).where(ppdf.notna(), None),
                                    "pid long, p_ts timestamp")
        idf = spark.createDataFrame(ipdf.astype(object).where(ipdf.notna(), None),
                                    "iid long, lo timestamp, hi timestamp")
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(pdf, idf, "p_ts", "lo", "hi",
                                bucket_seconds=bucket)
            .select("pid", "iid")
            .collect()
        )
        assert got == exp, (prows, irows, bucket)

    run()
