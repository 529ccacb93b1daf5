"""Temporal joins (engine extension; the as-of/range family the prompt's
training-data pipelines need — e.g. join each event to the dimension
version that was current when the event happened).

Spark has no ASOF JOIN operator. The classic emulations are a range join
(quadratic blowup) or a per-key correlated subquery (no). The scalable
shape used here is union + window:

  1. union the left (probe) and right (version) rows into one relation
     tagged by side, carrying the right side's payload columns (null on
     left rows);
  2. one shuffle: partition by key, order by (ts, side) with right rows
     sorting BEFORE left rows at equal timestamps (inclusive semantics);
  3. last_value(payload, ignorenulls) over that window gives every left
     row the most recent right payload with right_ts <= left_ts;
  4. keep the left rows.

Cost: ONE shuffle of (keys + payload), no row multiplication, no range
explosion — the same work a sort-merge join would do, which is what makes
it hold at 100 TB. Duplicate (key, ts) right rows resolve to the max
payload struct via the window sort order itself (no pre-dedup shuffle),
so the match stays well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """For each left row, attach `payload` from the latest right row of the
    same `key` with right_ts <= left_ts (nulls where no version exists yet).

    Output: all left columns + payload columns.

    NULL semantics follow the predicate as written, three-valued: a right
    version with NULL key or NULL timestamp satisfies neither `key = key`
    nor `right_ts <= left_ts`, so it never matches (filtered up front);
    a left row with NULL key or NULL timestamp matches no version and
    gets NULL payload.  Without the filter the union+window mechanics
    silently invent matches — NULL keys form a window partition that
    pairs left and right NULL-key rows, and a NULL right timestamp sorts
    NULLS-FIRST, acting as a -infinity version that matches every left
    row (caught by the round-11 null probe; tests/test_temporal.py pins
    all four quadrants).  DuckDB's native ASOF instead treats a NULL
    LEFT timestamp as +infinity (it matches the largest right version) —
    a documented divergence from the strict reading, so the ASOF fuzz
    oracle keeps to non-null timestamps.
    """
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload columns {sorted(clash)} already exist on the left side; "
            "rename before joining"
        )
    # The payload travels as ONE struct so a version is matched atomically:
    # per-column dedup/fill would mix values from different versions when
    # duplicate-timestamp versions differ across columns, or resurrect an
    # older column value when the latest version holds NULL in it.  The
    # struct itself is never null on right rows (its fields may be), so
    # last(ignorenulls) skips exactly the left rows, nothing else.
    #
    # Duplicate (key, ts) right rows are NOT pre-deduplicated with a
    # groupBy(max(struct)) — that costs a full extra exchange+aggregate of
    # the right side.  Instead `_p` is the window's final sort key: at
    # equal (ts, side) the running last() lands on the max struct, which
    # is exactly the groupBy-max tie-break, for one shuffle total.
    r = right.filter(
        F.col(key).isNotNull() & F.col(right_ts).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.struct(*payload).alias("_p"),
        F.lit(0).alias("_side"),
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_row"),
    )
    unioned = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType)).unionByName(
        l.withColumn("_p", F.lit(None).cast(r.schema["_p"].dataType))
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_p").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "_side",
        "_row",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    out = filled.filter(F.col("_side") == 1).select(
        "_row.*", *[F.col("_p")[c].alias(c) for c in payload]
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join without a cartesian product.

    Both sides get a coarse time-bucket equi key — intervals explode into
    every bucket they overlap (fan-out = span/bucket + 1, bounded and
    tunable), points into exactly one — so the work is a plain hash join
    on the bucket followed by the exact half-open containment filter
    (point_ts in [lo, hi)). Without the bucket key Spark would fall back
    to a broadcast-nested-loop over the full cross product, which is the
    100 TB failure mode. Column names of the two inputs must be disjoint.
    """
    clash = set(points.columns) & set(intervals.columns)
    if clash:
        raise ValueError(
            f"point/interval column names must be disjoint; clash: {sorted(clash)}"
        )
    pb = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds)
    )
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(hi)) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, "_bkt")
        .filter((F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi)))
        .drop("_bkt")
    )


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    step_seconds: int = 3600,
    fill: str = "locf",
    exact_mean_scale: int | None = None,
) -> DataFrame:
    """Densify a sparse time series: bucket to a fixed grid, then emit EVERY
    grid point between each key's first and last observation, filling gaps
    by last-observation-carried-forward (`fill="locf"`) or linear
    interpolation between the neighboring observations (`fill="linear"`)
    — the hypertable gap-fill/interpolate shape dashboards and feature
    pipelines need.

    Linear fill adds one mirrored window pass (first non-null LOOKING
    FORWARD, the symmetric twin of the LOCF window); because the grid
    spans exactly [first, last] observation per key, every gap has both
    neighbors and the interpolation denominator is never zero.

    Three bounded steps, no row explosion beyond the grid itself:
      1. one aggregation: avg(value) per (key, bucket) — buckets are
         epoch-floor arithmetic, mirrorable in any SQL engine;
      2. per-key [min,max] bucket span -> `sequence()` + explode builds
         the dense grid (grid size = span/step per key, independent of
         the raw event count);
      3. left join actuals onto the grid (equi-join on (key, bucket)) +
         one `last(ignorenulls)` window per key fills the gaps.
    Shuffles: the bucket agg, the grid join, and the window — all keyed
    by (key[, bucket]), so at 100 TB each is an ordinary partial-agg /
    co-partitioned shuffle; a key's window pass is linear in ITS grid.

    Output: (key, bucket, value, filled) where filled marks carried
    (gap) points; leading gaps before a key's first observation cannot
    occur because the grid starts at its first bucket.

    `exact_mean_scale` makes the bucket mean ORDER-DETERMINISTIC via the
    scaled-bigint trick (sum round(v*scale) exactly, one division at the
    end).  Plain avg() of doubles varies in its last bits with reduction
    order; interpolation then lands values exactly on round-half
    boundaries where Spark and an oracle engine disagree (observed: the
    linear-fill oracle diverged at 2/10500 rows by one ulp of the 6th
    decimal).  Bit-identical means make every downstream IEEE op
    bit-identical too."""
    from pyspark.sql.window import Window

    bucket = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds) * step_seconds
    )
    if exact_mean_scale:
        s = exact_mean_scale
        mean = (
            F.sum(F.round(F.col("_v") * s).cast("long")).cast("double")
            / (F.count(F.lit(1)) * float(s))
        )
    else:
        mean = F.avg("_v")
    # The bucket aggregate feeds BOTH the grid (via its per-key span) and
    # the fill join — a diamond Catalyst won't reuse (the subtrees differ
    # past the agg), so without materialization the corpus is scanned and
    # aggregated twice (observed: 2 parquet scans in the plan).  A lazy
    # localCheckpoint computes it once at first action and shares it.
    actual = (
        df.select(F.col(key_col).alias("key"), bucket.alias("bucket"),
                  F.col(val_col).alias("_v"))
        .groupBy("key", "bucket")
        .agg(mean.alias("_v"))
        .localCheckpoint(eager=False)
    )
    grid = (
        actual.groupBy("key")
        .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
        .select(
            "key",
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"),
                    F.expr(f"INTERVAL {int(step_seconds)} SECONDS"),
                )
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = grid.join(actual, ["key", "bucket"], "left")
    if fill == "locf":
        value = F.last("_v", ignorenulls=True).over(w)
    elif fill == "linear":
        wf = (
            Window.partitionBy("key")
            .orderBy("bucket")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_t = F.when(F.col("_v").isNotNull(), F.col("bucket"))
        prev_v = F.last("_v", ignorenulls=True).over(w)
        prev_t = F.last(obs_t, ignorenulls=True).over(w)
        next_v = F.first("_v", ignorenulls=True).over(wf)
        next_t = F.first(obs_t, ignorenulls=True).over(wf)
        frac = (
            (F.unix_timestamp("bucket") - F.unix_timestamp(prev_t)).cast("double")
            / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
        )
        value = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
            prev_v + (next_v - prev_v) * frac
        )
    else:
        raise ValueError(f"unknown fill mode: {fill!r}")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        value.alias("value"),
        F.col("_v").isNull().alias("filled"),
    )


def scd2_from_log(
    df,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
):
    """Build a slowly-changing-dimension (SCD type 2) history from an
    event log: one validity interval per (key, attribute-value) RUN —
    consecutive events that don't change the attribute collapse into
    the run that set it; `valid_to` is the next change's timestamp
    (NULL = current). The output is exactly what `as_of_join` (this
    module) probes.

    Two per-key windows over the LOG ordered by (ts, tiebreak) — the
    tiebreak makes the order total when timestamps collide, which is
    what keeps the run-collapse deterministic. Shuffle = one exchange
    on the key; rows never amplify (filters only).
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.unix_micros(F.col(ts_col)).alias("valid_from"),
        F.unix_micros(F.lead(ts_col).over(w2)).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def interval_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Peak concurrency per key over half-open intervals [start, end):
    the sweep-line counting primitive behind "max simultaneous sessions /
    connections / jobs" dashboards. Returns (key, max_concurrent,
    n_intervals).

    Shape: each interval explodes into exactly two (t, ±1) events — the
    relation that shuffles is 2 rows per interval, grouped by key; the
    running sum is a per-KEY window (keys partition the work; no global
    ordering anywhere). The event order is made total by (t, delta, id):
    at a boundary instant the -1 sorts before the +1 (delta -1 < +1), so
    back-to-back intervals [a,b) [b,c) never double-count — the half-open
    semantics fall out of the sort key, and the unique id tiebreak keeps
    the prefix sums engine-deterministic for the oracle (the window-
    fuzzer lesson: a non-total ORDER BY makes ROWS-frame sums
    nondeterministic).
    """
    from pyspark.sql.window import Window

    events = df.select(
        key_col,
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select(key_col, F.col("e.t").alias("t"), F.col("e.delta").alias("delta"), "_id")
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("t").asc(), F.col("delta").asc(), F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = events.withColumn("c", F.sum("delta").over(w))
    return running.groupBy(key_col).agg(
        F.max("c").cast("long").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


def rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    entity_col: str,
    window_hours: int = 24,
) -> DataFrame:
    """Distinct entities per key over a trailing event-time window ending
    at each hour — the rolling-DAU / sliding-window-uniques shape.
    Returns (key, bucket_ts, n_distinct) for every hour that has at
    least one contributing event in its trailing window.

    Distinct counts do NOT merge across window positions (union ≠ sum),
    so no window frame over hourly aggregates can compute this. The
    scalable shape: collapse events to DISTINCT (key, hour, entity)
    triples first — one shuffle, and the reduction is what makes the
    fan-out affordable — then each triple contributes to the
    window_hours hourly buckets it is visible in (bounded explode,
    x24 here), and a distinct-count per (key, bucket) finishes. Shuffle
    volume is bounded by distinct-triples x window_hours, independent
    of raw event volume; the alternative (re-scanning raw events per
    window position) is window_hours full scans.
    """
    hour = (F.unix_timestamp(F.date_trunc("hour", F.col(ts_col)))).alias("h")
    triples = df.select(key_col, hour, F.col(entity_col).alias("e")).distinct()
    fanned = triples.select(
        key_col,
        "e",
        F.explode(
            F.sequence(
                F.col("h"),
                F.col("h") + F.lit(3600 * (window_hours - 1)),
                F.lit(3600),
            )
        ).alias("bucket_ts"),
    )
    return (
        fanned.groupBy(key_col, "bucket_ts")
        .agg(F.count_distinct("e").alias("n_distinct"))
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    half_window: int = 12,
    period: int = 24,
) -> DataFrame:
    """Classical additive decomposition of an hourly series into
    trend + seasonal + residual — the moving-average core of STL,
    in EXACT long arithmetic so the whole table hash-checks.

    Steps (per key):
      1. hourly cents sums (integer hour buckets, epoch-us DIV 3600e6);
      2. trend = centered moving average over RANGE +/-`half_window`
         hour buckets (25 points at the default) — RANGE, not ROWS, so
         gaps in the series can't de-center the window; only FULL
         windows survive (edge trim, documented);
      3. seasonal = per hour-of-day mean of the detrended series;
      4. residual = detrended - seasonal.

    Exactness: divisions would leave the integer ring, so every series
    is carried SCALED — detrend_xw = w*cents - trend_sum where
    w = 2*half_window+1, and the per-phase seasonal mean divides with
    DIV (both engines truncate toward zero, the pinned dialect fact).

    Scale shape: one partial+final hourly aggregation, then windows
    partitioned by key over O(hours) rows — the window input is the
    DOWNSAMPLED series (8.8k rows/key/year), never raw events, so a
    key's whole window history fits one task at any corpus size; more
    keys = more parallelism.
    """
    w = 2 * half_window + 1
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    hourly = (
        df.select(
            F.col(key_col).alias("key"),
            F.expr(f"unix_micros({ts_col}) DIV 3600000000").alias("hb"),
            cents.alias("c"),
        )
        .groupBy("key", "hb")
        .agg(F.sum("c").alias("cents"))
    )
    win = (
        Window.partitionBy("key").orderBy("hb").rangeBetween(-half_window, half_window)
    )
    trended = hourly.select(
        "key",
        "hb",
        "cents",
        F.sum("cents").over(win).alias("trend_sum"),
        F.count(F.lit(1)).over(win).alias("n_win"),
    ).filter(F.col("n_win") == w)
    det = trended.select(
        "key",
        "hb",
        "cents",
        F.col("trend_sum").alias(f"trend_sum{w}"),
        (F.lit(w) * F.col("cents") - F.col("trend_sum")).alias("detrend_xw"),
        F.pmod(F.col("hb"), F.lit(period)).alias("phase"),
    )
    seas = det.groupBy("key", "phase").agg(
        F.expr("sum(detrend_xw) DIV count(*)").alias("seasonal_xw")
    )
    return (
        det.join(seas, ["key", "phase"])
        .select(
            F.col("key").alias(key_col),
            F.col("hb").alias("hour_bucket"),
            "cents",
            f"trend_sum{w}",
            F.col("detrend_xw").alias(f"detrend_x{w}"),
            F.col("seasonal_xw").alias(f"seasonal_x{w}"),
            (F.col("detrend_xw") - F.col("seasonal_xw")).alias(f"residual_x{w}"),
        )
    )


def ordered_lead(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    target_col: str,
    out_col: str = "_lead",
    n_parts: int | None = None,
) -> DataFrame:
    """LEAD(target) over (PARTITION BY part_cols ORDER BY order_cols) for
    LOW-cardinality partition keys — the shape where the textbook window
    serializes each key's ENTIRE sequence onto one task (10 event types
    over 100 TB = 10 tasks doing all the work).

    Two-phase: range-repartition by (part_cols, order_cols) — equal-key
    rows co-locate and each part value spans a CONTIGUOUS, ordered run
    of partitions — then window within (physical partition, part value),
    which fans each key over ~n_parts tasks.  Only the last row of each
    (partition, key) run has a null local lead; its true successor is
    the first row of the key's next partition, resolved driver-side from
    one tiny aggregate (n_parts x |keys| rows) and broadcast back.

    `order_cols` must be a total order (end with a unique id): ties
    spanning a range boundary would make "first row of the next
    partition" ambiguous.  `target_col` must be non-null — a null mid-
    sequence would be indistinguishable from a run-end local lead and
    would wrongly pull the boundary value.

    Cost: one range shuffle + one hash shuffle over (pid, keys) + an
    O(n_parts x keys) driver exchange — vs. the single-window form's one
    shuffle into |keys| tasks.  Use the plain window when keys are
    high-cardinality; use this when keys ~ O(10-1000) and rows are big.
    """
    if n_parts is None:
        n_parts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    order_exprs = [F.col(c) for c in order_cols]
    d = (
        df.repartitionByRange(
            n_parts, *[F.col(c) for c in part_cols], *order_exprs
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()  # pin pids: the boundary map keys on them
    )
    # first row of every (pid, key) run, by the total order
    firsts = (
        d.groupBy("_pid", *part_cols)
        .agg(F.min(F.struct(*order_exprs, F.col(target_col))).alias("_f"))
        .collect()
    )
    by_key: dict[tuple, list] = {}
    for r in firsts:
        by_key.setdefault(tuple(r[c] for c in part_cols), []).append(
            (r["_pid"], r["_f"][target_col])
        )
    boundary_rows = []
    for key, lst in by_key.items():
        lst.sort()
        for (pid, _v), (_npid, nxt_v) in zip(lst, lst[1:]):
            boundary_rows.append((*key, pid, nxt_v))
    spark = df.sparkSession
    target_type = dict(zip(df.schema.names, df.schema.fields))[
        target_col
    ].dataType.simpleString()
    key_fields = ", ".join(
        f"{c} {dict(zip(df.schema.names, df.schema.fields))[c].dataType.simpleString()}"
        for c in part_cols
    )
    boundary = spark.createDataFrame(
        boundary_rows,
        f"{key_fields}, _pid int, _boundary_next {target_type}",
    )
    w = Window.partitionBy("_pid", *part_cols).orderBy(*order_exprs)
    # eqNullSafe on the partition keys: lead()'s window treats NULL as a
    # real group, so the boundary stitch must too — a null-unsafe join
    # would never match a NULL key and the last row of each physical
    # partition's null-key run would keep a null lead mid-sequence,
    # silently diverging from the plain-window form this reproduces.
    boundary = boundary.withColumnsRenamed(
        {"_pid": "_b_pid", **{c: f"_b_{c}" for c in part_cols}}
    )
    cond = F.col("_pid") == F.col("_b_pid")
    for c in part_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_b_{c}"))
    return (
        d.withColumn("_lead_local", F.lead(target_col).over(w))
        .join(F.broadcast(boundary), cond, "left")
        .withColumn(out_col, F.coalesce("_lead_local", "_boundary_next"))
        .drop(
            "_pid", "_b_pid", "_lead_local", "_boundary_next",
            *[f"_b_{c}" for c in part_cols],
        )
    )
