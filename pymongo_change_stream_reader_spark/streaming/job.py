"""The CDC relay as one declarative Structured Streaming job.

Reference dataflow (SURVEY §3.2):
    resume-token restore -> change-stream scan -> op filter ->
    hash-partition -> envelope -> Kafka produce -> ack -> prefix-commit
    -> token upsert

Spark expression (everything after the arrow is built-in machinery):
    readStream(source) -> filter_data_ops -> to_kafka_records ->
    writeStream.format("kafka").option("checkpointLocation", ...)

The entire commit path (reference committing/: A12-A17 — acks,
prefix-commit state machine, token saver/retriever) is replaced by the
checkpoint's offset+commit logs: offsets are durably committed only
after the micro-batch's sink write succeeds, which is the identical
at-least-once contract (SURVEY §3.3).  The commit cadence knobs map to
``trigger(processingTime=...)`` / ``maxOffsetsPerTrigger``-style rate
limits (A15).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from pymongo_change_stream_reader_spark.operators.cdc import (
    filter_data_ops,
    to_kafka_records,
)


@dataclass(frozen=True)
class RelaySettings:
    """Engine options mirroring the reference's env settings
    (reference: settings.py:37-112).  Names kept for parity."""

    stream_reader_name: str = "change-stream-reader"
    kafka_prefix: str = ""
    producers_count: int = 0  # 0 = let the sink's key hashing partition
    commit_interval_s: float = 30.0  # trigger cadence (settings.py:60)
    checkpoint_dir: str = "/tmp/cdc-checkpoints"
    # User aggregation pipeline (JSON, reference settings.py:85-90).
    # The reference applies it to EVERY cursor it opens (watch.py:79);
    # sources that cannot push it down server-side (the custom Python
    # DataSource, Kafka re-reads, file sources) get it applied here by
    # build_relay via the translator.  Leave None when the source
    # already pushed it down (the Mongo connector path).
    pipeline: str | None = None

    @property
    def checkpoint_location(self) -> str:
        # stream_reader_name is the durable identity of the run, the
        # same role it plays as the token-collection unique key
        # (reference: token_saver.py:40-44).
        return f"{self.checkpoint_dir}/{self.stream_reader_name}"


# mongod's change-stream pipeline whitelist (public docs; anything
# else is rejected server-side when the reference opens the cursor).
_CHANGE_STREAM_STAGES = frozenset(
    {
        "$addFields",
        "$match",
        "$project",
        "$replaceRoot",
        "$replaceWith",
        "$redact",
        "$set",
        "$unset",
        "$changeStreamSplitLargeEvent",
    }
)
# Engine extensions beyond the server whitelist that remain
# streaming-safe (stateless row-local transforms).
_STREAMING_SAFE_EXTENSIONS = frozenset({"$sampleRate", "$unwind"})


def _apply_user_pipeline(events: DataFrame, pipeline: str) -> DataFrame:
    """Validate the user pipeline against the server's change-stream
    stage whitelist and apply it.  Fail fast: mongod rejects anything
    else on a watch() cursor — the reference surfaces that as a server
    error at open time (settings.py:85-90, watch.py:79) — and without
    this gate a $group/$sort/$lookup pipeline surfaces as a deep
    AnalysisException when the streaming query starts."""
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        PipelineError,
        parse_pipeline,
        translate_pipeline,
    )

    allowed = _CHANGE_STREAM_STAGES | _STREAMING_SAFE_EXTENSIONS
    for stage in parse_pipeline(pipeline):
        (name,) = stage
        if name not in allowed:
            raise PipelineError(
                f"stage {name!r} is not valid in a change-stream "
                f"pipeline (server whitelist: "
                f"{sorted(_CHANGE_STREAM_STAGES)}; engine "
                f"extensions: {sorted(_STREAMING_SAFE_EXTENSIONS)})"
            )
    return translate_pipeline(pipeline)(events)


def build_relay(events: DataFrame, settings: RelaySettings) -> DataFrame:
    """user pipeline (when not pushed down) -> filter(A5) ->
    envelope+routing(A8/A9/A10). Works identically on batch and
    streaming DataFrames (tests use both).

    The user pipeline runs FIRST, on the raw change events — the same
    position it holds in the reference, where it is part of the change
    stream cursor itself (watch.py:79) and therefore sees events before
    any relay-side processing."""
    if settings.pipeline:
        events = _apply_user_pipeline(events, settings.pipeline)
    data = filter_data_ops(events)
    if settings.producers_count > 0:
        from pymongo_change_stream_reader_spark.operators.cdc import partition_by_key

        # Exchange before the envelope projection drops documentKey.
        data = partition_by_key(data, settings.producers_count)
    return to_kafka_records(data, settings.kafka_prefix)


def start_kafka_relay(
    events: DataFrame,
    settings: RelaySettings,
    bootstrap_servers: str,
    create_topics: bool = False,
) -> StreamingQuery:
    """Production sink: Kafka with per-row ``topic`` column (A10/A11).

    ``kafka.enable.idempotence`` mirrors the reference's producer
    config (producing/builder.py:85-86); delivery acks and retry/
    backpressure are the sink's built-ins (A11/A12).  With
    ``create_topics`` the job routes through foreachBatch for
    AdminClient topic auto-creation (no Spark built-in; see
    streaming/kafka_sink.py).
    """
    records = build_relay(events, settings)
    if create_topics:
        from pymongo_change_stream_reader_spark.streaming.kafka_sink import (
            foreach_batch_kafka_with_topics,
        )

        return (
            records.writeStream.foreachBatch(
                foreach_batch_kafka_with_topics(bootstrap_servers, settings)
            )
            .option("checkpointLocation", settings.checkpoint_location)
            .trigger(processingTime=f"{settings.commit_interval_s} seconds")
            .start()
        )
    return (
        records.selectExpr(
            "topic", "CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("kafka.enable.idempotence", "true")
        .option("checkpointLocation", settings.checkpoint_location)
        .trigger(processingTime=f"{settings.commit_interval_s} seconds")
        .start()
    )


def start_memory_relay(
    events: DataFrame, settings: RelaySettings, query_name: str
) -> StreamingQuery:
    """Test sink: memory table, with the same checkpointed semantics."""
    return (
        build_relay(events, settings)
        .writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", settings.checkpoint_location)
        .start()
    )


def start_parquet_relay(
    events: DataFrame, settings: RelaySettings, out_dir: str
) -> StreamingQuery:
    """File sink variant (reference's file-writer test flavor,
    tests/test_file_writer/) — exactly-once via the file sink's
    transaction log."""
    return (
        build_relay(events, settings)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", settings.checkpoint_location)
        .start()
    )


# Fields the materializer reads (streaming/materialize.py
# _last_event_per_key); dotted names denote struct sub-fields.
_REPLICA_REQUIRED = (
    "operationType",
    "documentKey",
    "fullDocument",
    "clusterTime.t",
    "clusterTime.i",
    "_id._data",
)


def _require_replica_columns(stream: DataFrame) -> None:
    """Fail fast if the user pipeline projected away a column the
    replica materializer needs — otherwise a $project/$unset that drops
    ``clusterTime`` or ``_id`` surfaces as a deep AnalysisException only
    when the streaming query starts (the exact failure mode the
    _apply_user_pipeline gate exists to prevent)."""
    from pyspark.sql.types import StructType

    from pymongo_change_stream_reader_spark.plans.pipeline import PipelineError

    def has(schema: StructType, dotted: str) -> bool:
        cur = schema
        for part in dotted.split("."):
            if not isinstance(cur, StructType) or part not in cur.fieldNames():
                return False
            cur = cur[part].dataType
        return True

    missing = [f for f in _REPLICA_REQUIRED if not has(stream.schema, f)]
    if missing:
        raise PipelineError(
            "the user pipeline dropped column(s) the replica sink "
            f"requires: {missing} — keep operationType, documentKey, "
            "fullDocument, clusterTime.t/.i and _id._data in any "
            "$project/$unset feeding the replica relay"
        )


def start_replica_relay(
    events: DataFrame,
    settings: RelaySettings,
    replica_path: str,
    n_buckets: int = 16,
) -> StreamingQuery:
    """Replica sink variant (engine extension): instead of relaying
    envelopes to Kafka, maintain a queryable bucket-partitioned
    parquet replica of the watched collection
    (streaming/materialize.py) — the Debezium->lakehouse consumer
    collapsed into the relay itself.  The user pipeline (when set)
    runs first, exactly as on every other sink; note a $project that
    drops ``fullDocument``/``documentKey`` would defeat
    materialization, and the materializer raises on missing
    post-images."""
    from pymongo_change_stream_reader_spark.streaming.materialize import (
        start_replica_maintenance,
    )

    stream = events
    if settings.pipeline:
        from pymongo_change_stream_reader_spark.plans.pipeline import (
            PipelineError,
            parse_pipeline,
        )

        if any(
            "$changeStreamSplitLargeEvent" in st
            for st in parse_pipeline(settings.pipeline)
        ):
            # fragments would upsert as partial documents; the Kafka
            # relay is the split-events consumer (reassembly happens
            # downstream via operators.cdc.reassemble_split_events)
            raise PipelineError(
                "$changeStreamSplitLargeEvent cannot feed the replica "
                "sink — materialization needs whole documents"
            )
        stream = _apply_user_pipeline(events, settings.pipeline)
        _require_replica_columns(stream)
    return start_replica_maintenance(
        stream,
        replica_path,
        settings.checkpoint_location,
        n_buckets=n_buckets,
        trigger_interval=f"{settings.commit_interval_s} seconds",
    )
