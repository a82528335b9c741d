"""Oracle-checked batch coverage of the CDC operators (SURVEY §2 A5,
A8, A9, A10).

The streaming relay itself is verified by the e2e pytest suite
(tests/test_streaming_e2e.py — golden events, checkpoint restart);
these queries run the *same column expressions* over the deterministic
change-stream simulation of the `events` table so the driver's DuckDB
gate hash-verifies the envelope/key/topic string assembly at sf scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.cdc import (
    filter_data_ops,
    op_code,
    to_kafka_records,
)
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.simulate import simulate_change_stream

# Shared SQL fragments reproducing sources/simulate.py in DuckDB.
_SIM = """
    SELECT
        event_id,
        ts,
        CASE event_type
            WHEN 'signup'   THEN 'insert'
            WHEN 'purchase' THEN 'update'
            WHEN 'click'    THEN 'replace'
            WHEN 'error'    THEN 'delete'
            ELSE 'drop'
        END AS operation,
        lpad(lower(hex(event_id)), 24, '0') AS oid,
        CAST(round(value * 100, 0) AS BIGINT) AS cents,
        CAST(json_extract_string(props, '$.k') AS INT) AS k,
        'test.appdb.users_' || CAST(user_id % 4 AS VARCHAR) AS topic
    FROM events
"""

_DOC = (
    "'{{\"_id\": {{\"$oid\": \"' || oid || '\"}}, \"value_cents\": ' || "
    "CAST({cents} AS VARCHAR) || ', \"k\": ' || CAST(k AS VARCHAR) || '}}'"
)
_AFTER = _DOC.format(cents="cents")
_BEFORE = _DOC.format(cents="cents + 1")


@query(
    "cdc_envelope",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        topic,
        '{{"_id": {{"$oid": "' || oid || '"}}}}' AS key,
        CASE operation
            WHEN 'insert' THEN '{{"after": ' || {_AFTER} || ', "op": "c"}}'
            WHEN 'update' THEN '{{"before": ' || {_BEFORE}
                 || ', "updateDescription": {{"removedFields": [], "truncatedArrays": [], "updatedFields": '
                 || '{{"value_cents": ' || CAST(cents AS VARCHAR) || '}}'
                 || '}}, "after": ' || {_AFTER} || ', "op": "u"}}'
            WHEN 'replace' THEN '{{"before": ' || {_BEFORE} || ', "after": '
                 || {_AFTER} || ', "op": "u"}}'
            WHEN 'delete' THEN '{{"before": ' || {_BEFORE} || ', "op": "d"}}'
        END AS value
    FROM sim
    WHERE operation IN ('insert', 'update', 'replace', 'delete')
    """,
    doc="A5+A8+A9+A10: op filter -> Debezium envelope -> key/topic "
    "projection, hash-verified string-for-string against the oracle.",
    tags=("cdc",),
)
def cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure narrow projection over the source scan — no
    shuffle, fully codegen'd; identical plan shape to the streaming
    relay's per-micro-batch work."""
    sim = simulate_change_stream(spark, sf_dir)
    # no sort: the relay plan is a pure narrow projection (zero
    # exchanges); the driver's value-hash compare is order-insensitive
    return to_kafka_records(filter_data_ops(sim), "test")


@query(
    "cdc_op_counts",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        topic,
        CASE operation
            WHEN 'insert' THEN 'c'
            WHEN 'update' THEN 'u'
            WHEN 'replace' THEN 'u'
            WHEN 'delete' THEN 'd'
        END AS op,
        COUNT(*) AS n
    FROM sim
    WHERE operation IN ('insert', 'update', 'replace', 'delete')
    GROUP BY topic, op
    ORDER BY topic, op
    """,
    doc="Per-topic op-code distribution of the relayed stream "
    "(A5 filter + A10 routing + op map).",
    tags=("cdc", "agg"),
)
def cdc_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = filter_data_ops(simulate_change_stream(spark, sf_dir))
    topic = F.concat_ws(
        ".", F.lit("test"), F.col("ns.db"), F.col("ns.coll")
    ).alias("topic")
    return (
        sim.select(topic, op_code().alias("op"))
        .groupBy("topic", "op")
        .agg(F.count("*").alias("n"))
        .orderBy("topic", "op")
    )


@query(
    "cdc_heartbeat_frontier",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        CAST(SUM(CASE WHEN operation IN ('insert','update','replace','delete')
                 THEN 1 ELSE 0 END) AS BIGINT)            AS data_events,
        CAST(SUM(CASE WHEN operation NOT IN ('insert','update','replace','delete')
                 THEN 1 ELSE 0 END) AS BIGINT)            AS heartbeat_only,
        COUNT(*)                                          AS offset_frontier,
        max_by('tok' || CAST(event_id AS VARCHAR), event_id) AS last_token
    FROM sim
    """,
    doc="A3/A18 analog: ALL events (including non-data ops) advance "
    "the commit frontier; the last token is the max-by-time offset.",
    tags=("cdc", "agg"),
)
def cdc_heartbeat_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference sends every event down the commit path regardless
    of the data-path filter (change_handler.py:24-41); here the
    frontier aggregate proves the same accounting declaratively."""
    sim = simulate_change_stream(spark, sf_dir)
    is_data = F.col("operationType").isin("insert", "update", "replace", "delete")
    return sim.agg(
        F.sum(F.when(is_data, 1).otherwise(0)).cast("bigint").alias("data_events"),
        F.sum(F.when(~is_data, 1).otherwise(0)).cast("bigint").alias("heartbeat_only"),
        F.count("*").alias("offset_frontier"),
        # tie-safe: order by the unique numeric token suffix
        F.max_by(
            F.col("_id._data"), F.expr("CAST(substring(_id._data, 4) AS BIGINT)")
        ).alias("last_token"),
    )
