"""Deterministic change-stream simulation from the `events` table.

Gives the CDC operators (filter/envelope/key/topic, operators/cdc.py)
an oracle-checkable batch input at any scale factor: each events row
becomes one change event with a fixed event_type -> operationType
mapping and synthetic-but-deterministic payloads.  The same mapping is
reproduced in ANSI SQL by the cdc_batch oracle queries, so the full
envelope string assembly is hash-verified against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.sources.tables import load_table

# Deterministic op mapping; 'view' plays the non-data 'drop' role so
# the op filter (A5) has something to drop.
EVENT_TYPE_TO_OP = {
    "signup": "insert",
    "purchase": "update",
    "click": "replace",
    "error": "delete",
    "view": "drop",
}


def simulate_change_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events row -> CHANGE_EVENT_SCHEMA-shaped row (payloads as
    Extended-JSON strings, all JVM expressions)."""
    e = load_table(spark, sf_dir, "events")
    op = F.col("event_type")
    operation = (
        F.when(op == "signup", "insert")
        .when(op == "purchase", "update")
        .when(op == "click", "replace")
        .when(op == "error", "delete")
        .otherwise("drop")
    )
    oid = F.lpad(F.lower(F.hex(F.col("event_id"))), 24, "0")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    doc = F.concat(
        F.lit('{"_id": {"$oid": "'), oid, F.lit('"}, "value_cents": '),
        cents.cast("string"), F.lit(', "k": '), k.cast("string"), F.lit("}"),
    )
    before_doc = F.concat(
        F.lit('{"_id": {"$oid": "'), oid, F.lit('"}, "value_cents": '),
        (cents + 1).cast("string"), F.lit(', "k": '), k.cast("string"), F.lit("}"),
    )
    updated_fields = F.concat(
        F.lit('{"value_cents": '), cents.cast("string"), F.lit("}")
    )
    is_data = operation.isin("insert", "update", "replace", "delete")
    has_after = operation.isin("insert", "update", "replace")
    has_before = operation.isin("update", "replace", "delete")
    return e.select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias("_data")
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.unix_timestamp("ts").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.col("ts").alias("wallTime"),
        F.struct(
            F.lit("appdb").alias("db"),
            F.concat(F.lit("users_"), (F.col("user_id") % 4).cast("string")).alias(
                "coll"
            ),
        ).alias("ns"),
        F.when(
            is_data,
            F.concat(F.lit('{"_id": {"$oid": "'), oid, F.lit('"}}')),
        ).alias("documentKey"),
        F.when(has_after, doc).alias("fullDocument"),
        F.when(has_before, before_doc).alias("fullDocumentBeforeChange"),
        F.when(
            operation == "update",
            F.struct(
                updated_fields.alias("updatedFields"),
                F.array().cast("array<string>").alias("removedFields"),
                F.array()
                .cast("array<struct<field:string,newSize:int>>")
                .alias("truncatedArrays"),
            ),
        ).alias("updateDescription"),
    )
