"""Differential fuzzing over a NULL-bearing table (Spark vs DuckDB).

The round-10/11 bug class — View.exclude dropping NULL-predicate rows,
grouped PPS losing NULL strata to a null-unsafe join, ordered_lead's
boundary stitch never matching NULL partition keys — shares one root:
TPC-H columns are NOT NULL, so the main fuzz suite (test_fuzz_parity.py)
can never draw an example where three-valued logic or null-(un)safe
equality diverges.  This family closes that hole: a deterministic
synthetic table with ~20% NULLs in the key, value, and string columns,
written once to parquet and read by BOTH engines, then
hypothesis-generated queries across the surfaces where NULL semantics
bite:

* predicates (three-valued logic: a NULL comparison must drop the row,
  IS [NOT] NULL, null-safe equality <=> vs IS NOT DISTINCT FROM),
* grouped aggregation (NULL is a group; COUNT(col) skips NULLs),
* joins on a nullable key (NULL never equi-matches; eqNullSafe does),
* set operations (NULLs compare equal under UNION/INTERSECT/EXCEPT),
* window functions (NULL partition is a partition; null ordering pinned
  NULLS FIRST on both sides because the engine DEFAULTS disagree —
  Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST).

Aggregation determinism follows the suite convention: sums over the
2-decimal value column go through the scaled-bigint cast.
"""

import os

import duckdb
import pytest
from hypothesis import HealthCheck, example, given, settings, strategies as st

from pyspark.sql import Window, functions as F

FUZZ_EXAMPLES = int(os.environ.get("HIERO_FUZZ_EXAMPLES", "25"))

_PARQUET = "/tmp/hiero_spark_sources/fuzz_nulls.parquet"
_N = 500


def _rows():
    """Deterministic null-bearing rows: ~20% NULLs per column, small key
    domain so joins/groups collide, 2-decimal values for exact sums."""
    out = []
    for i in range(_N):
        h = (i * 2654435761) % 2**32
        k = None if h % 5 == 0 else (h >> 3) % 11
        v = None if (h >> 8) % 5 == 1 else ((h >> 16) % 10000) / 100.0
        s = None if (h >> 4) % 5 == 2 else "abcde"[(h >> 12) % 5]
        out.append((i, k, v, s))
    return out


@pytest.fixture(scope="module")
def ntab(spark):
    df = spark.createDataFrame(_rows(), "id long, k int, v double, s string")
    os.makedirs(os.path.dirname(_PARQUET), exist_ok=True)
    df.coalesce(1).write.mode("overwrite").parquet(_PARQUET)
    return spark.read.parquet(_PARQUET)


@pytest.fixture(scope="module")
def ncon():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW t AS SELECT * FROM read_parquet('{_PARQUET}/*.parquet')"
    )
    return c


_OPS = {
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    "=": lambda c, v: c == v,
    "<=>": lambda c, v: c.eqNullSafe(v),
}
_SQL_OP = {"<": "<", "<=": "<=", ">": ">", "=": "=",
           "<=>": "IS NOT DISTINCT FROM"}

_pred = st.one_of(
    st.tuples(st.just("k"), st.sampled_from(["<", "<=", ">", "=", "<=>"]),
              st.integers(0, 11)),
    st.tuples(st.just("v"), st.sampled_from(["<", ">", "="]),
              st.sampled_from([0.0, 25.5, 49.99, 80.0])),
    st.tuples(st.just("s"), st.sampled_from(["=", "<=>"]),
              st.sampled_from(["a", "c", "e"])),
    st.tuples(st.sampled_from(["k", "v", "s"]),
              st.sampled_from(["isnull", "notnull"]), st.none()),
)
_preds = st.lists(_pred, min_size=0, max_size=3)


def _apply(preds, df):
    cond = F.lit(True)
    sql = []
    for col, op, lit in preds:
        if op == "isnull":
            cond = cond & F.col(col).isNull()
            sql.append(f"{col} IS NULL")
        elif op == "notnull":
            cond = cond & F.col(col).isNotNull()
            sql.append(f"{col} IS NOT NULL")
        else:
            cond = cond & _OPS[op](F.col(col), F.lit(lit))
            lit_sql = f"'{lit}'" if isinstance(lit, str) else repr(lit)
            sql.append(f"{col} {_SQL_OP[op]} {lit_sql}")
    return df.filter(cond), (" AND ".join(sql) or "TRUE")


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(preds=_preds, group=st.sampled_from([None, "k", "s"]))
def test_null_filter_aggregate_parity(ntab, ncon, preds, group):
    filtered, where = _apply(preds, ntab)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.count("v").alias("nv"),  # COUNT(col) skips NULLs
        F.sum(F.round(F.col("v") * 100).cast("long")).alias("sv100"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    ]
    sql_aggs = (
        "COUNT(*) AS n, COUNT(v) AS nv, "
        "SUM(CAST(round(v * 100) AS BIGINT)) AS sv100, "
        "MIN(id) AS min_id, MAX(id) AS max_id"
    )
    if group is None:
        got = [tuple(r) for r in filtered.agg(*aggs).collect()]
        exp = ncon.execute(f"SELECT {sql_aggs} FROM t WHERE {where}").fetchall()
    else:
        got = sorted(
            (tuple(r) for r in filtered.groupBy(group).agg(*aggs).collect()),
            key=repr,
        )
        exp = sorted(
            ncon.execute(
                f"SELECT {group}, {sql_aggs} FROM t WHERE {where} "
                f"GROUP BY {group}"
            ).fetchall(),
            key=repr,
        )
    assert got == exp, (where, group)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(preds_a=_preds, preds_b=_preds,
       how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
       null_safe=st.booleans())
def test_null_key_join_parity(ntab, ncon, preds_a, preds_b, how, null_safe):
    """Equi-joins on the nullable key: NULL = NULL is UNKNOWN (row drops
    / anti-keeps), while the null-safe form matches NULL rows to each
    other — both engines must agree on both forms."""
    a, wa = _apply(preds_a, ntab)
    b, wb = _apply(preds_b, ntab)
    a = a.select(F.col("id").alias("aid"), F.col("k").alias("ak"))
    b = b.select(F.col("id").alias("bid"), F.col("k").alias("bk"))
    on = a["ak"].eqNullSafe(b["bk"]) if null_safe else a["ak"] == b["bk"]
    joined = a.join(b, on, how)
    op = "IS NOT DISTINCT FROM" if null_safe else "="
    ca = f"(SELECT id AS aid, k AS ak FROM t WHERE {wa}) a"
    cb = f"(SELECT id AS bid, k AS bk FROM t WHERE {wb}) b"
    if how == "inner":
        sql = f"SELECT aid, bid FROM {ca} JOIN {cb} ON ak {op} bk"
        got = sorted((r["aid"], r["bid"]) for r in joined.collect())
    elif how == "left":
        sql = f"SELECT aid, bid FROM {ca} LEFT JOIN {cb} ON ak {op} bk"
        got = sorted(
            ((r["aid"], r["bid"]) for r in joined.collect()),
            key=lambda t: (t[0], -1 if t[1] is None else t[1]),
        )
    elif how == "left_semi":
        sql = (f"SELECT aid FROM {ca} WHERE EXISTS "
               f"(SELECT 1 FROM {cb} WHERE ak {op} bk)")
        got = sorted(r["aid"] for r in joined.collect())
    else:
        sql = (f"SELECT aid FROM {ca} WHERE NOT EXISTS "
               f"(SELECT 1 FROM {cb} WHERE ak {op} bk)")
        got = sorted(r["aid"] for r in joined.collect())
    exp = ncon.execute(sql).fetchall()
    if how == "inner":
        exp = sorted((r[0], r[1]) for r in exp)
    elif how == "left":
        exp = sorted(
            ((r[0], r[1]) for r in exp),
            key=lambda t: (t[0], -1 if t[1] is None else t[1]),
        )
    else:
        exp = sorted(r[0] for r in exp)
    assert got == exp, (wa, wb, how, null_safe)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(preds_a=_preds, preds_b=_preds,
       op=st.sampled_from(["union", "intersect", "except"]))
def test_null_set_operation_parity(ntab, ncon, preds_a, preds_b, op):
    """Set operations over a NULL-bearing (k, s) projection: SQL set ops
    use grouping equality, under which NULLs are EQUAL — the opposite of
    predicate equality.  The EXCEPT arm uses subtract() (the round-10
    fix) on rows whose multiplicities exceed 1 by construction."""
    a, wa = _apply(preds_a, ntab)
    b, wb = _apply(preds_b, ntab)
    a, b = a.select("k", "s"), b.select("k", "s")
    if op == "union":
        got_df = a.union(b).distinct()
    elif op == "intersect":
        got_df = a.intersect(b)
    else:
        got_df = a.subtract(b)
    sql = (
        f"SELECT k, s FROM t WHERE {wa} {op.upper()} "
        f"SELECT k, s FROM t WHERE {wb}"
    )
    key = lambda t: ((t[0] is None, t[0]), (t[1] is None, t[1]))  # noqa: E731
    got = sorted((tuple(r) for r in got_df.collect()), key=key)
    exp = sorted(ncon.execute(sql).fetchall(), key=key)
    assert got == exp, (wa, wb, op)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(preds=_preds, shape=st.sampled_from(["rollup", "cube"]))
def test_null_rollup_cube_parity(ntab, ncon, preds, shape):
    """ROLLUP/CUBE over NULL-bearing grouping columns: a data NULL in k
    is indistinguishable from the subtotal NULL in the output values —
    only GROUPING() disambiguates.  Both engines must agree on the full
    (k, s, grouping_id, aggregates) multiset, which pins (a) that data
    NULLs form their own group at each grouping set, and (b) that the
    two engines' grouping-id bitmasks align (SQL standard: one bit per
    listed column, first column = most significant).  The r10 rollup
    fuzz ran on NOT NULL TPC-H columns and could never see (a)."""
    filtered, where = _apply(preds, ntab)
    grouped = filtered.rollup("k", "s") if shape == "rollup" else filtered.cube("k", "s")
    got = sorted(
        (
            tuple(r)
            for r in grouped.agg(
                F.grouping_id().alias("gid"),
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("v") * 100).cast("long")).alias("sv100"),
            ).collect()
        ),
        key=repr,
    )
    kw = "ROLLUP" if shape == "rollup" else "CUBE"
    exp = sorted(
        ncon.execute(
            f"SELECT k, s, GROUPING(k, s) AS gid, COUNT(*) AS n, "
            f"SUM(CAST(round(v * 100) AS BIGINT)) AS sv100 "
            f"FROM t WHERE {where} GROUP BY {kw} (k, s)"
        ).fetchall(),
        key=repr,
    )
    if not got:
        # the documented empty-input divergence (see test_fuzz_parity):
        # DuckDB emits the grand-total grouping sets, Spark emits nothing
        assert all(r[2] == 3 or r[3] == 0 for r in exp), exp
        return
    assert got == exp, (shape, where)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(preds=_preds, fn=st.sampled_from(["row_number", "rank", "dense_rank",
                                         "lag_id", "count_star"]))
def test_null_partition_window_parity(ntab, ncon, preds, fn):
    """Windows partitioned by the nullable key: the NULL partition is a
    real partition in both engines.  Null ordering is pinned NULLS FIRST
    explicitly on both sides because the defaults disagree (Spark ASC =
    NULLS FIRST, DuckDB ASC = NULLS LAST) — any query relying on a
    default here is a portability bug this family documents."""
    filtered, where = _apply(preds, ntab)
    order = [F.asc_nulls_first("v"), F.asc("id")]
    w = Window.partitionBy("k").orderBy(*order)
    sql_over = ("OVER (PARTITION BY k ORDER BY v ASC NULLS FIRST, id)")
    if fn == "row_number":
        expr, sql_fn = F.row_number().over(w), "ROW_NUMBER()"
    elif fn == "rank":
        expr, sql_fn = F.rank().over(w), "RANK()"
    elif fn == "dense_rank":
        expr, sql_fn = F.dense_rank().over(w), "DENSE_RANK()"
    elif fn == "lag_id":
        expr, sql_fn = F.lag("id", 1).over(w), "LAG(id, 1)"
    else:
        expr = F.count(F.lit(1)).over(Window.partitionBy("k"))
        sql_fn, sql_over = "COUNT(*)", "OVER (PARTITION BY k)"
    got = sorted(
        (r["id"], r["x"]) for r in filtered.select("id", expr.alias("x")).collect()
    )
    exp = sorted(
        (r[0], r[1])
        for r in ncon.execute(
            f"SELECT id, {sql_fn} {sql_over} AS x FROM t WHERE {where}"
        ).fetchall()
    )
    got = [(i, x) for i, x in got]
    assert got == exp, (where, fn)


@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=list(HealthCheck))
# the round-11 exclude fix's falsifying shape: preds_b evaluates to NULL
# on v-NULL rows; before views.py:102 pinned ~coalesce(p2, false), those
# rows were silently dropped from the exclusion's survivor set
@example(preds_a=[], preds_b=[("v", "<", 25.5)], op="exclude")
@example(preds_a=[("k", "<", 5)], preds_b=[("s", "=", "c")], op="union")
@example(preds_a=[("v", ">", 0.0)], preds_b=[("k", "=", 3)], op="intersect")
@given(preds_a=_preds, preds_b=_preds,
       op=st.sampled_from(["union", "intersect", "exclude", "set_to"]))
def test_null_view_combine_parity(ntab, ncon, preds_a, preds_b, op):
    """V1 combine algebra (views.py union/intersect/exclude/set_to) vs a
    DuckDB BOOLEAN-MEMBERSHIP mirror on NULL-bearing predicates.

    hiero membership is two-valued: a row belongs to a view iff its
    predicate stack evaluates to literal TRUE — a NULL (three-valued)
    predicate is a non-member.  The mirror therefore wraps each side in
    coalesce(pred, false) and applies plain boolean algebra:

        union      coalesce(A,f) OR  coalesce(B,f)
        intersect  coalesce(A,f) AND coalesce(B,f)
        exclude    coalesce(A,f) AND NOT coalesce(B,f)
        set_to     coalesce(B,f)

    Each combine compiles to a single filter over the shared base (no
    join, no materialization), so parity here proves the predicate
    algebra — including the 3VL edges that only a ~20%-NULL table can
    reach — not just the plumbing."""
    from hiero_spark.views import View

    _, where_a = _apply(preds_a, ntab)
    _, where_b = _apply(preds_b, ntab)

    # build each side's predicate STACK through the public filter API —
    # one .filter per generated predicate, same shape as a drill-down
    def stacked(view, preds):
        for p in preds:
            col, opname, lit = p
            if opname == "isnull":
                view = view.filter(F.col(col).isNull())
            elif opname == "notnull":
                view = view.filter(F.col(col).isNotNull())
            else:
                view = view.filter(_OPS[opname](F.col(col), F.lit(lit)))
        return view

    va = stacked(View(ntab), preds_a)
    vb = stacked(View(ntab), preds_b)
    combined = getattr(va, op)(vb)
    got = sorted(r[0] for r in combined.df().select("id").collect())

    ma = f"coalesce(({where_a}), false)"
    mb = f"coalesce(({where_b}), false)"
    mirror = {
        "union": f"{ma} OR {mb}",
        "intersect": f"{ma} AND {mb}",
        "exclude": f"{ma} AND NOT {mb}",
        "set_to": mb,
    }[op]
    exp = [r[0] for r in ncon.execute(
        f"SELECT id FROM t WHERE {mirror} ORDER BY id").fetchall()]
    assert got == exp, (op, where_a, where_b)
