"""Canonical schemas for the change-event stream and its Kafka output.

Derived from the reference's golden fixtures and envelope accesses
(reference: tests/mocks/events.py:7-160,
change_stream_reading/change_handler.py:44,78,
producing/change_event_handler.py:84-109) — see FIXTURES.md.

Design (SURVEY §1.2): *fixed envelope, dynamic payload*.  The envelope
fields are typed; the schemaless user documents (``fullDocument``,
``fullDocumentBeforeChange``, ``updateDescription.updatedFields``) are
carried as MongoDB Extended JSON strings for exact fidelity, with
optional typed projection via ``from_json`` when the user supplies a
schema.
"""

from __future__ import annotations

from pyspark.sql import types as T

# BSON Timestamp(t, i): ordering-preserving struct.
CLUSTER_TIME = T.StructType(
    [
        T.StructField("t", T.LongType(), False),
        T.StructField("i", T.IntegerType(), False),
    ]
)

UPDATE_DESCRIPTION = T.StructType(
    [
        # Extended-JSON object of changed fields (schemaless payload).
        T.StructField("updatedFields", T.StringType(), True),
        T.StructField("removedFields", T.ArrayType(T.StringType()), True),
        T.StructField(
            "truncatedArrays",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("field", T.StringType(), True),
                        T.StructField("newSize", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# One row per change event (reference: models.py:35-38 ChangeEvent).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        # Resume token — the stream offset (reference: watch.py:118-141).
        T.StructField(
            "_id",
            T.StructType([T.StructField("_data", T.StringType(), False)]),
            False,
        ),
        T.StructField("operationType", T.StringType(), False),
        T.StructField("clusterTime", CLUSTER_TIME, True),
        T.StructField("wallTime", T.TimestampType(), True),
        T.StructField(
            "ns",
            T.StructType(
                [
                    T.StructField("db", T.StringType(), True),
                    T.StructField("coll", T.StringType(), True),
                ]
            ),
            True,
        ),
        # Extended-JSON string of the WHOLE documentKey document —
        # `_id` can be ANY BSON value (ObjectId, int, string, compound
        # doc), so the key is carried opaque end-to-end and emitted
        # byte-faithful to the reference's json_util.dumps(documentKey)
        # (reference: producing/change_event_handler.py:93-98).
        T.StructField("documentKey", T.StringType(), True),
        T.StructField("fullDocument", T.StringType(), True),
        T.StructField("fullDocumentBeforeChange", T.StringType(), True),
        T.StructField("updateDescription", UPDATE_DESCRIPTION, True),
    ]
)

# Kafka sink record (reference: change_event_handler.py:60-113).
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), False),
    ]
)
