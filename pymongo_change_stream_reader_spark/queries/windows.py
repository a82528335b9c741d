"""Window functions (SURVEY.md §2.C): ranking, offsets, frames.

Every window has a total order (unique tie-break column) so results
are deterministic and hash-comparable against the DuckDB oracle.

Scale note: a window shuffles once on its partition keys and sorts
within partitions; partition keys here are high-cardinality
(customer, user) so no single partition becomes a straggler. Windows
that would be partitioned on a constant (global running totals) are
deliberately absent — they serialize at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
        FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
    doc="Top-K per group via row_number over a partitioned window.",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.col("c_custkey"))
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id,
           ROUND(value, 2)                                              AS value,
           ROUND(LAG(value)  OVER w, 2)                                 AS prev_value,
           ROUND(LEAD(value) OVER w, 2)                                 AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0.0), 2)           AS delta
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
    doc="lag/lead offsets within per-user event timelines.",
    tags=("window",),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            F.round("value", 2).alias("value"),
            F.round(F.lag("value").over(w), 2).alias("prev_value"),
            F.round(F.lead("value").over(w), 2).alias("next_value"),
            F.round(
                F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0)), 2
            ).alias("delta"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS INT)             AS order_seq
    FROM orders
    ORDER BY o_custkey, order_seq
    """,
    doc="Cumulative sum with an explicit ROWS frame.",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2
            ).alias("running_total"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(AVG(value) OVER (
               PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS mov_avg_7
    FROM events
    WHERE event_type = 'click'
    ORDER BY user_id, event_id
    """,
    doc="7-row moving average over per-user click streams.",
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w), 4).alias("mov_avg_7"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           ROUND(c_acctbal, 2) AS acctbal,
           CAST(COUNT(*) OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal
               RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within_100
    FROM customer
    WHERE c_nationkey < 5
    ORDER BY c_mktsegment, c_custkey
    """,
    doc="RANGE frame over a numeric ordering (value-based window).",
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-100, 0)
    )
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 5)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.count("*").over(w).alias("n_within_100"),
        )
        .orderBy("c_mktsegment", "c_custkey")
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT p_brand, p_partkey,
           ROUND(p_retailprice, 2) AS retailprice,
           CAST(RANK()       OVER w AS INT) AS price_rank,
           CAST(DENSE_RANK() OVER w AS INT) AS price_dense_rank,
           CAST(NTILE(4) OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice, p_partkey) AS INT) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ORDER BY p_brand, price_rank, p_partkey
    """,
    doc="rank / dense_rank / ntile ranking family.",
    tags=("window",),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
    w_asc = W.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("retailprice"),
            F.rank().over(w).alias("price_rank"),
            F.dense_rank().over(w).alias("price_dense_rank"),
            F.ntile(4).over(w_asc).alias("quartile"),
        )
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


@query(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           CAST(FIRST_VALUE(o_orderdate) OVER w AS DATE) AS first_order,
           CAST(LAST_VALUE(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS DATE)                                    AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey
    """,
    doc="first_value/last_value with full-partition frame + distinct.",
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.first("o_orderdate").over(w).cast("date").alias("first_order"),
            F.last("o_orderdate").over(w_full).cast("date").alias("last_order"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@query(
    "window_percentile_family",
    oracle="""
    SELECT s_suppkey,
           ROUND(s_acctbal, 2)                               AS acctbal,
           ROUND(PERCENT_RANK() OVER w, 6)                   AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6)                      AS cume,
           ROUND(NTH_VALUE(s_acctbal, 3) OVER (
               ORDER BY s_acctbal DESC, s_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING), 2)         AS third_best
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
    doc="percent_rank / cume_dist / nth_value — the remaining ranking "
    "family members (global frame on the small supplier dim; at scale "
    "these would partition by a key as in the other window queries).",
    tags=("window",),
)
def window_percentile_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note: the whole-table ranking family is computed WITHOUT
    an unpartitioned window (which would serialize a billion-row sort
    into one task): a TeraSort-style distributed global rank
    (operators/ranking.py) supplies the 1-based position in the total
    order (s_acctbal, s_suppkey) — unique tiebreaker, so RANK ==
    ROW_NUMBER and

        PERCENT_RANK = (rank - 1) / (n - 1)
        CUME_DIST    = rank / n

    are exact pure arithmetic.  NTH_VALUE(s_acctbal, 3) over the full
    descending frame is one scalar — the 3rd-highest balance — fetched
    with a sort+limit(3) (3 driver rows, any scale) and attached as a
    literal, NULL when the table has fewer than 3 rows, as in SQL."""
    from pymongo_change_stream_reader_spark.operators.ranking import (
        with_global_rank,
    )

    sup = load_table(spark, sf_dir, "supplier")
    ranked, n = with_global_rank(
        sup, [F.col("s_acctbal"), F.col("s_suppkey")]
    )
    top3 = (
        sup.select("s_acctbal")
        .orderBy(F.desc("s_acctbal"), "s_suppkey")
        .limit(3)
        .collect()
    )
    third = top3[2][0] if len(top3) >= 3 else None
    rank = F.col("__rank")
    return (
        ranked.select(
            "s_suppkey",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.round((rank - 1) / F.lit(max(n - 1, 1)), 6).alias("pct_rank"),
            F.round(rank / F.lit(n), 6).alias("cume"),
            F.round(F.lit(third).cast("double"), 2).alias("third_best"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "window_gaps_islands_sessions",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w
                         <= 1800000000
                    THEN 0 ELSE 1 END AS new_session
        FROM events
        WHERE user_id < 300
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, event_id,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_n
        FROM marked
    )
    SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
           COUNT(*) AS n_events,
           CAST(min(event_id) AS BIGINT) AS first_event,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT)
               AS duration_s
    FROM sessions
    GROUP BY user_id, session_n
    ORDER BY user_id, session_n
    """,
    doc="Batch sessionization by gaps-and-islands: a 30-minute "
    "inactivity gap starts a new session (lag -> boundary flag -> "
    "running sum = session id), then one aggregation per session — "
    "the classic batch counterpart to the streaming session window "
    "(events_session_window).  One window shuffle on user_id; the "
    "session id needs no join back.",
    tags=("window", "relational"),
)
def window_gaps_islands_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap <= 1_800_000_000, 0).otherwise(1).alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_n",
        F.sum("new_session").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    return (
        sessions.groupBy("user_id", "session_n")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            (
                F.max(F.unix_timestamp(F.col("ts")))
                - F.min(F.unix_timestamp(F.col("ts")))
            ).alias("duration_s"),
        )
        .orderBy("user_id", "session_n")
    )
