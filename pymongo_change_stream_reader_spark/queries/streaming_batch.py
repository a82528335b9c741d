"""Time-windowed / sessionized / as-of operators (SURVEY §2.C
streaming ◐ family), exercised in batch mode against the DuckDB
oracle.  The same expressions run unchanged on a streaming DataFrame
with `withWatermark` (covered by tests/test_streaming_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "events_hourly_window",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           COUNT(*)                AS n,
           ROUND(SUM(value), 2)    AS total_value
    FROM events
    GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
    doc="Tumbling 1-hour window aggregation (streaming `window()` in "
    "batch mode; epoch-aligned boundaries on both engines).",
    tags=("streaming", "window"),
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: partial aggregation per (window, type) before the
    shuffle; with a watermark this exact plan runs incrementally."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    oracle="""
    WITH buckets AS (
        SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                       time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
               AS window_start,
               value
        FROM events
        WHERE event_type = 'purchase'
    )
    SELECT window_start,
           COUNT(*)             AS n,
           ROUND(SUM(value), 2) AS total_value
    FROM buckets
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc="Sliding window (1 h length, 30 min slide): each event lands "
    "in 2 overlapping windows.",
    tags=("streaming", "window"),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


@query(
    "events_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts)                            AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE       AS session_end,
           COUNT(*)                           AS n_events,
           ROUND(SUM(value), 2)               AS session_value
    FROM sess
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc="Gap-based sessions via session_window (30 min gap) == the "
    "lag/cumsum sessionization the oracle spells out.",
    tags=("streaming", "window"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window merges events <= 30 min apart; end = last + gap.
    Scale: one shuffle on user_id; state per open session when run as
    a stream."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "asof_join_last_click",
    oracle="""
    SELECT p.event_id           AS purchase_id,
           p.user_id,
           p.ts                 AS purchase_ts,
           c.ts                 AS click_ts,
           ROUND(c.value, 2)    AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY purchase_id
    """,
    doc="As-of join (Spark has no native one): for each purchase, the "
    "latest click at-or-before it per user — composed from a union + "
    "last_value(ignorenulls) window, vs DuckDB's native ASOF JOIN.",
    tags=("streaming", "asof"),
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The union-window formulation: interleave both sides on the time
    axis per user, carry the most recent click forward, keep purchase
    rows.  Scale: ONE shuffle on user_id + in-partition sort — beats
    the naive range-join (quadratic per user) and needs no
    equality-bucketing of time."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    tagged = purchases.select(
        "event_id", "user_id", "ts", F.lit(None).cast("double").alias("c_value"),
        F.lit(None).cast("timestamp").alias("c_ts"), F.lit(1).alias("is_p"),
    ).unionByName(
        clicks.select(
            "event_id", "user_id", "ts", F.col("value").alias("c_value"),
            F.col("ts").alias("c_ts"), F.lit(0).alias("is_p"),
        )
    )
    # clicks sort before purchases at equal ts (is_p) — matches ASOF's
    # p.ts >= c.ts inclusivity
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "ts",
            "is_p",
            F.last("c_ts", ignorenulls=True).over(w).alias("click_ts"),
            F.round(F.last("c_value", ignorenulls=True).over(w), 2).alias(
                "click_value"
            ),
        )
        .filter(F.col("is_p") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            "click_value",
        )
        .orderBy("purchase_id")
    )


@query(
    "user_session_funnel",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts,
               LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS next_type
        FROM events
    )
    SELECT event_type, next_type, COUNT(*) AS n
    FROM ordered
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    ORDER BY event_type, next_type
    """,
    doc="Event-transition funnel (lead over per-user timelines) — the "
    "classic clickstream pattern.",
    tags=("streaming", "window"),
)
def user_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "next_type")
    )


@query(
    "join_range_bucketed",
    oracle="""
    SELECT p.event_id  AS point_id,
           i.event_id  AS interval_id,
           ROUND(p.value, 2) AS v
    FROM (SELECT event_id, value FROM events WHERE event_id < 5000) p
    JOIN (SELECT event_id, value - 5 AS lo, value + 5 AS hi
          FROM events WHERE event_id % 97 = 0) i
      ON p.value >= i.lo AND p.value < i.hi
    ORDER BY point_id, interval_id
    """,
    doc="Bucketed range (interval) join: bucket equi-join + exact "
    "refinement instead of the nested-loop theta join (the 100 TB "
    "rewrite for point-in-interval matching).",
    tags=("join", "range"),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.joins import (
        range_join_bucketed,
    )

    e = load_table(spark, sf_dir, "events")
    points = e.filter(F.col("event_id") < 5000).select(
        F.col("event_id").alias("point_id"), "value"
    )
    intervals = e.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("interval_id"),
        (F.col("value") - 5).alias("lo"),
        (F.col("value") + 5).alias("hi"),
    )
    return (
        range_join_bucketed(points, intervals, "value", "lo", "hi", 10.0)
        .select(
            "point_id",
            "interval_id",
            F.round("value", 2).alias("v"),
        )
        .orderBy("point_id", "interval_id")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(min(date_trunc('week', ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               f.cohort,
               CAST(floor(date_diff('day', f.cohort,
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7)
                    AS BIGINT) AS week_n
        FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT cohort, week_n, COUNT(*) AS active_users
    FROM activity
    WHERE week_n <= 8
    GROUP BY cohort, week_n
    ORDER BY cohort, week_n
    """,
    doc="Cohort retention: users grouped by first-seen week, counted "
    "in each subsequent activity week (weeks 0..8) — the classic "
    "product-analytics rollup.  Two hash aggregations (first-seen, "
    "distinct user-week) and one join on user_id; the cohort frame "
    "never materializes a user x week matrix.",
    tags=("relational", "agg"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = (
        e.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort"))
    )
    activity = (
        e.select("user_id", wk.alias("wk"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("bigint")
            .alias("week_n"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_n") <= 8)
        .groupBy("cohort", "week_n")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort", "week_n")
    )
