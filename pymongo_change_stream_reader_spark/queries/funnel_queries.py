"""Funnel-analysis queries (operators/funnel.py): ordered multi-step
conversion over the events stream — per-user frontiers and the
step-conversion summary, both against CTE-chain oracles that spell
out the same conditional-min recurrence."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

_STEPS = ["view", "click", "purchase"]
_WITHIN_H = 72

_FRONTIER_CTE = f"""
    s1 AS (
        SELECT user_id AS "user", MIN(ts) AS step_1_ts
        FROM events WHERE event_type = 'view'
        GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id AS "user", MIN(e.ts) AS step_2_ts
        FROM events e JOIN s1 ON s1."user" = e.user_id
        WHERE e.event_type = 'click'
          AND e.ts > s1.step_1_ts
          AND e.ts <= s1.step_1_ts + INTERVAL {_WITHIN_H * 3600} SECONDS
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id AS "user", MIN(e.ts) AS step_3_ts
        FROM events e
        JOIN s2 ON s2."user" = e.user_id
        JOIN s1 ON s1."user" = e.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.step_2_ts
          AND e.ts <= s1.step_1_ts + INTERVAL {_WITHIN_H * 3600} SECONDS
        GROUP BY e.user_id
    )
"""


@query(
    "funnel_user_steps",
    oracle=f"""
    WITH {_FRONTIER_CTE}
    SELECT s1."user", s1.step_1_ts, s2.step_2_ts, s3.step_3_ts
    FROM s1
    LEFT JOIN s2 ON s2."user" = s1."user"
    LEFT JOIN s3 ON s3."user" = s1."user"
    ORDER BY s1."user"
    """,
    doc="Per-user view->click->purchase funnel frontier (72 h window "
    "from the first view; each step strictly after the previous): "
    "operators/funnel.py:funnel_steps — k filtered scans + k hash "
    "aggregations joined on the shrinking user frontier, no windows "
    "and no per-user sorting; the oracle chains the same conditional "
    "mins as CTEs.",
    tags=("funnel",),
)
def funnel_user_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.funnel import (
        funnel_steps,
    )

    ev = load_table(spark, sf_dir, "events")
    return funnel_steps(
        ev, "user_id", "ts", "event_type", _STEPS, within_hours=_WITHIN_H
    ).orderBy("user")


@query(
    "funnel_conversion_rates",
    oracle=f"""
    WITH {_FRONTIER_CTE},
    c AS (
        SELECT (SELECT COUNT(*) FROM s1) AS c1,
               (SELECT COUNT(*) FROM s2) AS c2,
               (SELECT COUNT(*) FROM s3) AS c3
    )
    SELECT 1 AS step, 'view' AS event_type, c1 AS users,
           ROUND(CASE WHEN c1 = 0 THEN 0.0
                      ELSE CAST(c1 AS DOUBLE) / c1 END, 6) AS conversion
    FROM c
    UNION ALL
    SELECT 2, 'click', c2,
           ROUND(CASE WHEN c1 = 0 THEN 0.0
                      ELSE CAST(c2 AS DOUBLE) / c1 END, 6)
    FROM c
    UNION ALL
    SELECT 3, 'purchase', c3,
           ROUND(CASE WHEN c1 = 0 THEN 0.0
                      ELSE CAST(c3 AS DOUBLE) / c1 END, 6)
    FROM c
    ORDER BY step
    """,
    doc="Funnel conversion summary: users reaching each of "
    "view->click->purchase (72 h window) and the conversion ratio "
    "from step 1 — one count aggregate over the |users| frontier "
    "frame (operators/funnel.py:funnel_conversion).",
    tags=("funnel",),
)
def funnel_conversion_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.funnel import (
        funnel_conversion,
    )

    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(
        ev, "user_id", "ts", "event_type", _STEPS, within_hours=_WITHIN_H
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH cohorts AS (
        SELECT user_id AS "user",
               CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id AS "user",
               CAST(DATE_TRUNC('week', ts) AS DATE) AS act_week
        FROM events
    ),
    counts AS (
        SELECT c.cohort_week,
               CAST(DATE_DIFF('day', c.cohort_week, a.act_week) / 7
                    AS INT) AS week_offset,
               COUNT(*) AS active_users
        FROM active a JOIN cohorts c ON c."user" = a."user"
        GROUP BY 1, 2
    )
    SELECT k.cohort_week, k.week_offset, k.active_users,
           ROUND(CAST(k.active_users AS DOUBLE) / b.active_users, 6)
               AS retention
    FROM counts k
    JOIN counts b ON b.cohort_week = k.cohort_week AND b.week_offset = 0
    ORDER BY k.cohort_week, k.week_offset
    """,
    doc="Weekly cohort-retention matrix over the events stream: "
    "cohort = ISO week of each user's first event, retention = "
    "active users at each week offset over the cohort's week-0 size "
    "(operators/funnel.py:cohort_retention — two user-keyed hash "
    "aggregations, one join, a broadcast of the |cohorts|-row base).",
    tags=("funnel",),
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.funnel import (
        cohort_retention,
    )

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts")
