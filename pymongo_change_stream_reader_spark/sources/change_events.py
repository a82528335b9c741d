"""Change-event sources: file/JSON (tests), Kafka, MongoDB connector.

The reference opens a MongoDB change-stream cursor scoped to a
deployment / database / collection with a user pipeline and resume
token (reference: change_stream_reading/watch.py:46-58,73-111 [A1/A2]).
In Spark that scope + options map onto the MongoDB Spark connector's
streaming read; the resume-token persistence (A16/A17) is subsumed by
the query's ``checkpointLocation``.

The connector jar is not bundled in this environment, so
``mongo_change_stream`` raises with setup instructions unless the
format is available; tests use the JSON file source with the same
schema, which exercises every downstream operator identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pymongo_change_stream_reader_spark.schema import CHANGE_EVENT_SCHEMA


def read_change_events_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of change events from JSON lines (golden fixtures)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).json(path)


def stream_change_events_json(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming read of change-event JSON files — the test stand-in
    for the Mongo change stream (one file ≈ one cursor batch)."""
    return (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(path)
    )


def mongo_change_stream(
    spark: SparkSession,
    connection_uri: str,
    database: str | None = None,
    collection: str | None = None,
    pipeline: str | None = None,
    full_document: str | None = "updateLookup",
    full_document_before_change: str | None = None,
) -> DataFrame:
    """A1/A2: MongoDB change-stream streaming source via the MongoDB
    Spark connector (>=10.x).

    Scope resolution mirrors the reference (watch.py:46-58): both
    database and collection -> collection watch; database only ->
    database watch; neither -> deployment watch; collection without
    database is rejected.

    Requires ``org.mongodb.spark:mongo-spark-connector`` on the
    classpath (``spark.jars.packages``); raises a clear error here
    when absent.
    """
    if collection and not database:
        # reference: watch.py:56-58 — collection scope requires a database.
        raise ValueError("collection requires database (reference watch.py:56-58)")
    reader = (
        spark.readStream.format("mongodb")
        .option("spark.mongodb.connection.uri", connection_uri)
        .option("spark.mongodb.change.stream.publish.full.document.only", "false")
    )
    if database:
        reader = reader.option("spark.mongodb.database", database)
    if collection:
        reader = reader.option("spark.mongodb.collection", collection)
    if pipeline:
        # Pushed server-side, same as the reference's cursor pipeline
        # (watch.py:79; settings.py:85-90).
        reader = reader.option("spark.mongodb.read.aggregation.pipeline", pipeline)
    if full_document:
        reader = reader.option("change.stream.lookup.full.document", full_document)
    if full_document_before_change:
        reader = reader.option(
            "change.stream.full.document.before.change", full_document_before_change
        )
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - connector not bundled
        raise RuntimeError(
            "MongoDB Spark connector not available; add "
            "org.mongodb.spark:mongo-spark-connector_2.13 to "
            "spark.jars.packages"
        ) from exc


def kafka_change_events(
    spark: SparkSession, bootstrap_servers: str, topics: str, starting_offsets: str = "earliest"
) -> DataFrame:
    """Change events re-read from Kafka (envelope JSON in ``value``);
    parse with CHANGE_EVENT_SCHEMA via from_json downstream."""
    try:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topics)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as exc:  # pragma: no cover - kafka jars not bundled
        raise RuntimeError(
            "Kafka source not available; add org.apache.spark:"
            "spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        ) from exc
