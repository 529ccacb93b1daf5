"""Streaming-extension queries in batch mode (SURVEY.md §2.9 X1–X5).

The same window expressions run unchanged under Structured Streaming
(readStream + watermark); hiero_spark/streaming/pipelines.py wires the
streaming variants, smoke-tested in tests/test_streaming.py. Batch mode
here makes them DuckDB-oracle-checkable.

Window starts are output as epoch seconds (bigint) — raw timestamps don't
hash consistently across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hiero_spark.registry import query
from hiero_spark.queries._util import t


@query(
    "x1_tumbling_window",
    group="X1",
    doc="Tumbling 1-hour windows over events: count + exact value sum.",
    oracle="""
        SELECT CAST(epoch(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS window_start,
               event_type,
               COUNT(*) AS event_count,
               (SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0) AS value_sum
        FROM events GROUP BY 1, 2
    """,
)
def x1_tumbling_window(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


@query(
    "x2_sliding_window",
    group="X2",
    doc="Sliding windows (1 hour every 15 min): each event lands in 4 windows.",
    oracle="""
        WITH e AS (
          SELECT event_type,
                 CAST(FLOOR(epoch(ts) / 900) AS BIGINT) * 900 AS w0
          FROM events
        )
        SELECT w0 - k.k * 900 AS window_start,
               event_type,
               COUNT(*) AS event_count
        FROM e, (SELECT UNNEST([0, 1, 2, 3]) AS k) k
        GROUP BY 1, 2
    """,
)
def x2_sliding_window(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "event_count",
        )
    )


@query(
    "x3_session_window",
    group="X3",
    doc="Session windows (30-min gap) per user. Oracle reproduces session "
        "assignment with a lag + running-flag-sum window (identical semantics: "
        "a gap >= 30min starts a new session).",
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(LAG(ts) OVER w) >= 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
        ),
        sessions AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
               COUNT(*) AS event_count
        FROM sessions GROUP BY user_id, session_id
    """,
)
def x3_session_window(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "event_count",
        )
    )


@query(
    "x5_dedup_keys",
    group="X5",
    doc="Exact key dedup (batch twin of dropDuplicatesWithinWatermark): "
        "one row per event_id, keeping the earliest timestamp.",
    oracle="""
        SELECT event_id, CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS first_seen
        FROM events GROUP BY event_id
    """,
)
def x5_dedup_keys(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_id")
        .agg(F.unix_timestamp(F.min("ts")).alias("first_seen"))
    )


@query(
    "x6_sessionization_batch",
    group="X6",
    doc="Batch sessionization: per-user sessions split at >30-minute gaps "
        "(lag + running-sum windows). One shuffle on user_id; the session "
        "assignment never leaves the user's partition — the batch twin of "
        "the session_window streaming pipeline.",
    oracle="""
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR date_diff('second', lag(ts) OVER w, ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sess AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM marked
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
               CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS session_end
        FROM sess GROUP BY user_id, session_id
    """,
)
def x6_sessionization_batch(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_session = F.when(
        lag_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(lag_ts)) > 1800),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.unix_timestamp(F.max("ts")).alias("session_end"),
    )


@query(
    "x7_funnel_conversion",
    group="X7",
    doc="Funnel: users who viewed, later clicked, later purchased — one "
        "conditional-min aggregation per stage over a single user-grouped "
        "pass (no self-joins), then ordered-timestamp comparisons.",
    oracle="""
        WITH stages AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                 MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
          FROM events GROUP BY user_id
        )
        SELECT
          COUNT(*) AS n_users,
          COUNT(t_view) AS viewed,
          COUNT(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
          COUNT(CASE WHEN t_purchase > t_click AND t_click > t_view THEN 1 END)
            AS purchased_after_click
        FROM stages
    """,
)
def x7_funnel_conversion(spark, sf_dir):
    ev = t(spark, sf_dir, "events")

    def stage_min(kind):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    stages = ev.groupBy("user_id").agg(
        stage_min("view").alias("t_view"),
        stage_min("click").alias("t_click"),
        stage_min("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "clicked_after_view"
        ),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@query(
    "x8_retention_cohorts",
    group="X8",
    doc="Daily retention cohorts: users grouped by first-seen day, counted "
        "by days-since-cohort activity — two grouped aggregations joined on "
        "user_id. No broadcast hint: the cohort map is O(users) and only "
        "AQE should decide if it fits (at 100 TB it's a shuffle join on the "
        "key both sides are already aggregated by).",
    oracle="""
        WITH firsts AS (
          SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
          FROM events GROUP BY user_id
        )
        SELECT CAST(FLOOR(epoch(cohort_day)) AS BIGINT) AS cohort,
               date_diff('day', cohort_day, date_trunc('day', e.ts)) AS day_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
)
def x8_retention_cohorts(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min(F.date_trunc("day", "ts"))).alias("cohort_day")
    )
    joined = ev.join(firsts, "user_id")
    return (
        joined.groupBy(
            F.unix_timestamp("cohort_day").alias("cohort"),
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "x9_user_running_stats",
    group="UDAF",
    doc="Batch twin of the applyInPandasWithState running-stats operator "
        "(streaming/pipelines.py:user_running_stats — the user-definable "
        "ISketch zero/add/merge surface): per-user event count and "
        "first/last epoch-ms. The streaming pipeline's final update per "
        "user equals exactly this aggregate "
        "(tests/test_streaming.py:test_stateful_user_stats_matches_batch), "
        "so a driver-green row here certifies the UDAF semantics too.",
    oracle="""
        SELECT user_id,
               COUNT(*) AS event_count,
               CAST(epoch_ms(MIN(ts)) AS BIGINT) AS first_ms,
               CAST(epoch_ms(MAX(ts)) AS BIGINT) AS last_ms
        FROM events GROUP BY user_id
    """,
)
def x9_user_running_stats(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.unix_millis(F.min("ts")).alias("first_ms"),
            F.unix_millis(F.max("ts")).alias("last_ms"),
        )
    )


@query(
    "x10_attribution_batch",
    group="X6",
    doc="Batch twin of the stream-stream interval join "
        "(streaming/pipelines.py:attribution_join): every (view, click) "
        "pair by the same user with the click inside the 30-minute window "
        "after the view. Same column expressions run under readStream with "
        "watermarks on both sides (equivalence asserted in "
        "tests/test_streaming.py); the time-bounded condition is what "
        "keeps stream-state finite.",
    oracle="""
        SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts
         AND c.ts < v.ts + INTERVAL 30 MINUTE
        WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
)
def x10_attribution_batch(spark, sf_dir):
    from hiero_spark.streaming.pipelines import attribution_join

    ev = t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    # the same helper builds the batch plan (withWatermark is a no-op on
    # batch DataFrames), so the driver hashes the exact streaming logic
    return attribution_join(views, clicks)


@query(
    "x19_quality_monitor",
    group="X19",
    doc="Streaming data-quality monitor, batch mode: per 1-minute ingest "
        "window (deterministic 1-doc/sec clock from doc_id), gate pass "
        "counts (quality / symbol / dup-line / prose — the funnel's "
        "Catalyst expressions), all-gates pass rate, alert below 50%. "
        "The EXACT streaming code path (streaming/pipelines.py:"
        "quality_monitor_stream) runs here on a batch frame — windowed "
        "conditional sums are mergeable, so the state per window is one "
        "row and append mode emits it once; the streaming twin equality "
        "is pinned in tests/test_streaming.py.",
    oracle=r"""
        WITH m AS (
          SELECT doc_id, text,
                 CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
                 CAST(length(text) AS DOUBLE) AS n_chr,
                 regexp_split_to_array(text, '\n') AS lines,
                 regexp_split_to_array(trim(text), '\s+') AS toks,
                 length(regexp_replace(text, '[A-Za-z0-9\s.,;:!?()-]', '', 'g')) AS n_sym,
                 epoch('2024-01-01 00:00:00'::TIMESTAMP) + doc_id AS ets
          FROM documents
        ), f AS (
          SELECT doc_id,
                 (ets - ets % 60) AS bucket_ts,
                 LEAST(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.6 +
                 (CASE WHEN n_chr / CAST(n_tok AS DOUBLE) >= 3.0
                        AND n_chr / CAST(n_tok AS DOUBLE) <= 10.0
                       THEN 1.0 ELSE 0.5 END) * 0.4 >= 0.5 AS g1,
                 ROUND(CAST(n_sym AS DOUBLE) / len(toks), 6) <= 0.10 AS g2,
                 ROUND(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
                       / len(lines), 6) <= 0.30 AS g3,
                 len(list_distinct(list_filter(
                   regexp_split_to_array(trim(lower(text)), '\s+'),
                   x -> x IN ('the','of','and','to','in','a','is','that','for','it')
                 ))) >= 2 AS g4
          FROM m
        )
        SELECT CAST(bucket_ts AS BIGINT) AS bucket_ts,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
               CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS n_symbol,
               CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dupline,
               CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS n_prose,
               CAST(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pass_all,
               ROUND(SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                     * 1.0 / COUNT(*), 6) AS pass_rate,
               SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*) < 0.5 AS alert
        FROM f GROUP BY 1
    """,
)
def x19_quality_monitor(spark, sf_dir):
    from hiero_spark.streaming.pipelines import (
        quality_monitor_stream, with_synthetic_ingest_ts,
    )

    docs = with_synthetic_ingest_ts(t(spark, sf_dir, "documents"))
    return quality_monitor_stream(docs)
