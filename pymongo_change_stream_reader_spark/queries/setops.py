"""Set operations (SURVEY.md §2.C): union / intersect / except.

Spark's ``intersect``/``exceptAll`` map exactly onto ANSI
INTERSECT / EXCEPT ALL, which DuckDB also implements, so oracles are
literal.  Scale note: set ops hash-shuffle both sides on the full
row; projections are pruned to key columns first to keep the shuffle
narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


def _open_closed(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    open_keys = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    closed_keys = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return open_keys, closed_keys


@query(
    "set_union_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    )
    GROUP BY custkey
    ORDER BY custkey
    """,
    doc="UNION ALL (bag union) + aggregation over the combined set.",
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return (
        open_keys.unionAll(closed_keys)
        .groupBy("custkey")
        .agg(F.count("*").alias("n"))
        .orderBy("custkey")
    )


@query(
    "set_union_distinct",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    doc="UNION (distinct) of two key sets.",
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return open_keys.union(closed_keys).distinct().orderBy("custkey")


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    doc="INTERSECT (distinct): customers with both open and closed orders.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return open_keys.intersect(closed_keys).orderBy("custkey")


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    doc="EXCEPT (distinct): open-order customers without closed orders.",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return open_keys.subtract(closed_keys).orderBy("custkey")


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    doc="EXCEPT ALL (bag difference, multiplicity-aware).",
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return open_keys.exceptAll(closed_keys).orderBy("custkey")


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    ORDER BY custkey
    """,
    doc="INTERSECT ALL (bag intersection).",
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    open_keys, closed_keys = _open_closed(spark, sf_dir)
    return open_keys.intersectAll(closed_keys).orderBy("custkey")


@query(
    "set_union_by_name",
    oracle="""
    SELECT custkey, acctbal FROM (
        SELECT c_custkey AS custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey AS custkey, ROUND(c_acctbal, 2) AS acctbal
        FROM customer WHERE c_mktsegment = 'MACHINERY'
    )
    ORDER BY custkey
    """,
    doc="unionByName: column-name-resolved union (order-independent).",
    tags=("setop",),
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.round("c_acctbal", 2).alias("acctbal")
    )
    # deliberately reversed column order: unionByName resolves by name
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.round("c_acctbal", 2).alias("acctbal"), F.col("c_custkey").alias("custkey")
    )
    return a.unionByName(b).orderBy("custkey")
