"""CDC operators: op-type filter, Debezium-style envelope, key/topic
projection, key-hash partitioning.

Spark-first re-expression of the reference's hand-written operators
(reference: change_stream_reading/change_handler.py:11,43-48 [A5 op
filter], producing/change_event_handler.py:14-19,84-113 [A8 envelope,
A9 key, A10 topic], change_handler.py:67-81 [A6 partitioner]) — all
pure JVM column expressions, whole-stage-codegen'd, no Python on the
executor path.

The envelope `value` is assembled by string concatenation rather than
``to_json`` because the payload fields are already Extended-JSON
strings: embedding them through ``to_json`` would re-escape them as
string literals.  Concatenation preserves the reference's exact
output bytes (``json_util.dumps`` with ``", "``/``": "`` separators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# reference: change_handler.py:11 — ops forwarded to the data path.
DATA_OPERATION_TYPES = ("insert", "replace", "update", "delete")

# reference: change_event_handler.py:14-19 — Debezium op codes.
OPERATION_CODE = {"insert": "c", "update": "u", "replace": "u", "delete": "d"}


def filter_data_ops(df: DataFrame) -> DataFrame:
    """A5: keep only data-path operations.

    Heartbeats / drop / dropDatabase / invalidate still advance the
    stream offset — in Spark that is automatic (the source commits
    offsets for all consumed input regardless of downstream filters,
    SURVEY §2 A18)."""
    return df.filter(F.col("operationType").isin(*DATA_OPERATION_TYPES))


def op_code() -> Column:
    """Map operationType -> Debezium op code (c/u/u/d)."""
    expr = None
    for op, code in OPERATION_CODE.items():
        expr = (
            F.when(F.col("operationType") == op, code)
            if expr is None
            else expr.when(F.col("operationType") == op, code)
        )
    return expr


def topic(kafka_prefix: str = "") -> Column:
    """A10: `{prefix}.{db}.{coll}` (or `{db}.{coll}` with empty prefix)."""
    parts = [F.col("ns.db"), F.col("ns.coll")]
    if kafka_prefix:
        parts.insert(0, F.lit(kafka_prefix))
    return F.concat_ws(".", *parts)


def document_key_json() -> Column:
    """A9: Extended-JSON of documentKey — carried as an opaque string
    column end-to-end, so ANY BSON ``_id`` type (ObjectId, int, string,
    compound document) round-trips byte-faithful to the reference's
    ``json_util.dumps(documentKey)`` (change_event_handler.py:93-98)."""
    return F.col("documentKey")


def _update_description_json() -> Column:
    """Render the updateDescription struct with raw embedded
    updatedFields (already Extended JSON).  Field order mirrors the
    reference fixtures: removedFields, truncatedArrays, updatedFields."""
    truncated = F.coalesce(
        F.to_json(F.col("updateDescription.truncatedArrays")), F.lit("[]")
    )
    removed = F.coalesce(
        F.to_json(F.col("updateDescription.removedFields")), F.lit("[]")
    )
    updated = F.coalesce(F.col("updateDescription.updatedFields"), F.lit("{}"))
    return F.concat(
        F.lit('"updateDescription": {"removedFields": '),
        removed,
        F.lit(', "truncatedArrays": '),
        truncated,
        F.lit(', "updatedFields": '),
        updated,
        F.lit("}"),
    )


def envelope_value() -> Column:
    """A8: `{before?, updateDescription?, after?, op}` as one JSON
    string; optional members rendered only when present (matches the
    reference's dict-insertion order, change_event_handler.py:100-113)."""
    before = F.when(
        F.col("fullDocumentBeforeChange").isNotNull(),
        F.concat(F.lit('"before": '), F.col("fullDocumentBeforeChange")),
    )
    upd = F.when(
        F.col("updateDescription").isNotNull(), _update_description_json()
    )
    after = F.when(
        F.col("fullDocument").isNotNull(),
        F.concat(F.lit('"after": '), F.col("fullDocument")),
    )
    op = F.concat(F.lit('"op": "'), op_code(), F.lit('"'))
    return F.concat(F.lit("{"), F.concat_ws(", ", before, upd, after, op), F.lit("}"))


def to_kafka_records(df: DataFrame, kafka_prefix: str = "") -> DataFrame:
    """A8+A9+A10 combined: project the filtered change stream into
    Kafka-sink records ``(topic, key, value)``.

    Scale: narrow projection, no shuffle; Kafka partition assignment by
    key hash then gives the same per-key ordering contract as the
    reference's `_id`-hash producer queues (A6)."""
    return df.select(
        topic(kafka_prefix).alias("topic"),
        document_key_json().alias("key"),
        envelope_value().alias("value"),
    )


def partition_by_key(df: DataFrame, num_partitions: int) -> DataFrame:
    """A6: hash-exchange on documentKey so one task owns each key
    (per-key ordering within the micro-batch; reference
    change_handler.py:77-81).  At cluster scale this is the only
    shuffle on the CDC hot path; skip it when the Kafka sink's key
    hashing is ordering enough."""
    return df.repartition(num_partitions, F.col("documentKey"))


def reassemble_split_events(df: DataFrame) -> DataFrame:
    """Consumer-side inverse of $changeStreamSplitLargeEvent: group
    fragments by the event id, merge each payload field from the one
    fragment that carries it, and verify completeness (all ``of``
    fragments arrived).  Unsplit events (null ``splitEvent``) pass
    through the same plan unchanged.

    Output matches the pre-split change-event schema (``splitEvent``
    removed) plus ``complete`` — false when fragments are missing, so
    a consumer can quarantine partial events instead of silently
    processing them.

    Scale: one hash-shuffle keyed on the event id with map-side
    partial aggregation; payload merge is first(ignorenulls) — each
    field exists in exactly one fragment by the split contract.
    """
    if "splitEvent" not in df.columns:
        raise ValueError("reassemble_split_events needs a splitEvent column")
    payload = ["fullDocument", "fullDocumentBeforeChange", "updateDescription"]
    envelope = [
        c for c in df.columns if c not in payload and c != "splitEvent"
    ]
    aggs = [
        *[F.first(c, ignorenulls=False).alias(c) for c in envelope if c != "_id"],
        *[F.first(c, ignorenulls=True).alias(c) for c in payload],
        F.count(F.lit(1)).alias("__n_frags"),
        F.first(F.col("splitEvent")["of"], ignorenulls=True).alias("__of"),
    ]
    out = df.groupBy("_id").agg(*aggs)
    return out.select(
        *[c for c in df.columns if c != "splitEvent"],
        F.coalesce(
            F.col("__n_frags") == F.col("__of"), F.lit(True)
        ).alias("complete"),
    )


def scd2_from_events(
    events: DataFrame, composite: bool = False
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change-event
    log: one row per document VERSION — (key, doc, valid_from,
    valid_to, is_current) where a version is valid from its own event
    time until the key's NEXT event (exclusive; NULL = still open),
    and a delete closes the prior version without opening one.  The
    standard warehouse temporal-dimension build, computed from the
    same envelope the replica stores consume (non-delete events must
    carry a post-image).

    CAVEAT at second granularity: two versions in the SAME cluster
    second produce a zero-width ``[t, t)`` interval the default
    columns cannot distinguish — an as-of probe AT ``t`` resolves to
    the later version only.  ``composite=True`` adds the
    ``clusterTime.i`` sequence components (``valid_from_i`` /
    ``valid_to_i``) so intervals are half-open over the TOTAL event
    order ``(t, i)`` and same-second versions stay resolvable
    (encode ``t * K + i`` for a sortable single-column instant and
    pair with an as-of join — operators/joins.py — to answer "what
    did key K look like at (t, i)").

    One partitioned lead() window over (clusterTime.t, clusterTime.i)
    — per-key bounded state, no global sort; at 100 TB this is one
    hash exchange on the document key."""
    ev = events.filter(
        F.col("operationType").isin(
            "insert", "update", "replace", "delete"
        )
    ).select(
        F.col("documentKey").alias("key"),
        F.col("operationType").alias("op"),
        F.col("fullDocument").alias("doc"),
        F.col("clusterTime.t").alias("__t"),
        F.col("clusterTime.i").alias("__i"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy("__t", "__i")
    if composite:
        return (
            ev.withColumn("valid_to", F.lead("__t").over(w))
            .withColumn("valid_to_i", F.lead("__i").over(w))
            .filter(F.col("op") != "delete")
            .select(
                "key",
                "doc",
                F.col("__t").alias("valid_from"),
                F.col("__i").alias("valid_from_i"),
                "valid_to",
                "valid_to_i",
                F.col("valid_to").isNull().alias("is_current"),
            )
        )
    return (
        ev.withColumn("valid_to", F.lead("__t").over(w))
        .filter(F.col("op") != "delete")
        .select(
            "key",
            "doc",
            F.col("__t").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
