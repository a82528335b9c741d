"""Time-series queries (operators/timeseries.py): spine gap-fill with
LOCF, per-key EWMA, rolling-window anomaly scores — the regularize/
smooth/flag kit an event stream needs before it feeds a model.

The EWMA oracle folds DuckDB's ordered ``list`` aggregate with the
same recurrence the Arrow kernel runs (``list_reduce`` seeds with the
first element, exactly ``y_0 = x_0``); the ``(1 - 0.2)`` complement is
spelled as the same IEEE subtraction on both sides (the
graph_pagerank precedent) so the arithmetic is bit-identical before
the final rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "ts_gap_fill_locf",
    oracle="""
    WITH b AS (
        SELECT user_id AS key,
               DATE_TRUNC('hour', ts) AS bucket,
               AVG(value) AS v
        FROM events WHERE user_id < 30
        GROUP BY 1, 2
    ),
    spans AS (
        SELECT key, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM b GROUP BY key
    ),
    spine AS (
        SELECT key,
               UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM spans
    )
    SELECT s.key,
           s.bucket,
           ROUND(
               LAST_VALUE(b.v IGNORE NULLS) OVER (
                   PARTITION BY s.key ORDER BY s.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 6) AS filled,
           b.v IS NULL AS is_gap
    FROM spine s LEFT JOIN b ON b.key = s.key AND b.bucket = s.bucket
    ORDER BY s.key, s.bucket
    """,
    doc="Hourly spine densification + last-observation-carried-forward "
    "over the events stream (users < 30): one row per (user, hour) "
    "between that user's first and last event, carried values marked "
    "is_gap — the TimescaleDB time_bucket_gapfill/locf semantics via "
    "operators/timeseries.py:gap_fill_locf (hash agg -> JVM sequence "
    "explode -> co-partitioned left join -> per-key LOCF window; "
    "nothing global, no UDFs).",
    tags=("timeseries",),
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        gap_fill_locf,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    out = gap_fill_locf(ev, "user_id", "ts", "value", minutes=60)
    return out.select(
        "key",
        F.col("bucket").cast("timestamp_ntz").alias("bucket"),
        F.round("filled", 6).alias("filled"),
        "is_gap",
    ).orderBy("key", "bucket")


@query(
    "ts_ewma_by_user",
    oracle="""
    SELECT user_id AS key,
           COUNT(*) AS n_obs,
           ROUND(
               list_reduce(
                   list(value ORDER BY ts, value),
                   (acc, x) -> x * 0.2 + acc * (1 - 0.2)
               ), 6) AS ewma
    FROM events
    GROUP BY user_id
    ORDER BY key
    """,
    doc="Final EWMA state (alpha=0.2) of every user's value series — "
    "operators/timeseries.py:ewma_last; the recurrence is sequential "
    "per key so it runs as one Arrow-batched applyInPandas kernel per "
    "user (state = one float), while the oracle folds DuckDB's "
    "ordered list aggregate through the identical recurrence with "
    "list_reduce.",
    tags=("timeseries",),
)
def ts_ewma_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        ewma_last,
    )

    ev = load_table(spark, sf_dir, "events")
    return (
        ewma_last(ev, "user_id", "ts", "value", alpha=0.2)
        .select("key", "n_obs", F.round("ewma", 6).alias("ewma"))
        .orderBy("key")
    )


@query(
    "ts_rolling_anomaly",
    oracle="""
    SELECT user_id AS key, ts, value,
           CASE WHEN cnt = 12 AND sd > 0
                THEN ROUND((value - mu) / sd, 6) END AS zscore
    FROM (
        SELECT user_id, ts, value,
               AVG(value) OVER w AS mu,
               STDDEV_SAMP(value) OVER w AS sd,
               COUNT(value) OVER w AS cnt
        FROM events
        WHERE user_id < 50
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, value
                     ROWS BETWEEN 12 PRECEDING AND 1 PRECEDING)
    )
    ORDER BY key, ts, value
    """,
    doc="Rolling anomaly z-score: each event (users < 50) scored "
    "against the mean/stddev of its own 12 PRECEDING events (self "
    "excluded; partial lookbacks emit NULL) — operators/timeseries.py:"
    "rolling_zscore, per-key bounded ROWS windows on both sides.",
    tags=("timeseries",),
)
def ts_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        rolling_zscore,
    )

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    out = rolling_zscore(ev, "user_id", "ts", "value", n_prev=12)
    return out.select(
        "key", "ts", "value", F.round("zscore", 6).alias("zscore")
    ).orderBy("key", "ts", "value")


@query(
    "ts_sessionize",
    oracle="""
    WITH s AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                    THEN 1 ELSE 0 END AS ns
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT user_id, ts,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session
        FROM s
    )
    SELECT user_id, CAST(session AS BIGINT) AS session,
           COUNT(*) AS n_events,
           MIN(ts) AS start_ts, MAX(ts) AS end_ts,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM g GROUP BY user_id, session
    ORDER BY user_id, session
    """,
    doc="Gap-based sessionization (operators/timeseries.py:"
    "sessionize/session_stats): per-user sessions split on a 30-min "
    "silence gap — two partitioned ROWS windows (lag gap test + "
    "running sum ordinal) and one hash aggregation, all exact "
    "microsecond integer arithmetic (unix_micros/epoch_us — no float "
    "timestamps), nothing global.  The batch analogue of the "
    "streaming session window and the standard clickstream primitive.",
    tags=("ts",),
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        session_stats,
    )

    ev = load_table(spark, sf_dir, "events")
    return session_stats(
        ev, "user_id", "ts", gap_seconds=1800, tiebreak_cols=["event_id"]
    ).orderBy("user_id", "session")
