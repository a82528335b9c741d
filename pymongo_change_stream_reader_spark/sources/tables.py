"""Parquet table loaders for the driver-generated TPC-H-ish tables.

All relational queries load through here so that scan behavior is
uniform: plain ``spark.read.parquet`` gives Catalyst full pushdown
(predicates + column pruning + partition pruning) into the parquet
scan — verify with ``df.explain('formatted')`` (``PushedFilters`` /
``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table; scans stay columnar with full Catalyst pushdown.

    The driver-generated ``events.parquet`` stores ``ts`` as parquet
    TIMESTAMP(NANOS), which Spark's vectorized reader rejects.  We
    read nanos as raw INT64 (``spark.sql.legacy.parquet.nanosAsLong``)
    and rebuild a micro-precision timestamp with ``timestamp_micros(
    ns div 1000)`` — the same floor-to-micros conversion DuckDB
    applies, so oracle comparisons stay exact.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The caller's session may not come from our get_spark (the driver
    # passes its own); oracle parity requires UTC timestamps.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL entry points)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
