"""CDC operator unit tests over the 7 golden change events.

Mirrors the reference's e2e expectations
(tests/test_change_stream_reading/test_application.py:24-56): 4
data-path rows, topic `test.test-database.TestCollection`, key =
documentKey Extended JSON, envelope values with correct
before/after/updateDescription/op.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.cdc import (
    DATA_OPERATION_TYPES,
    filter_data_ops,
    partition_by_key,
    to_kafka_records,
)
from pymongo_change_stream_reader_spark.schema import CHANGE_EVENT_SCHEMA
from pymongo_change_stream_reader_spark.sources.change_events import (
    read_change_events_json,
)

FIXTURE = "tests/fixtures/change_events.jsonl"
OID = "6692b4a31ede014d28852865"
DOC = '{"_id": {"$oid": "%s"}, "a": %d}' % (OID, 1)


def _doc(a: int) -> str:
    return '{"_id": {"$oid": "%s"}, "a": %d}' % (OID, a)


@pytest.fixture(scope="module")
def events(spark):
    return read_change_events_json(spark, FIXTURE).cache()


def test_fixture_roundtrip(events):
    """Schema <-> fixture roundtrip (analog of
    test_change_events_encode_decode.py)."""
    assert events.count() == 10
    # JSON reads are always nullable; compare structure ignoring nullability
    assert events.schema.simpleString() == CHANGE_EVENT_SCHEMA.simpleString()
    ops = {r["operationType"] for r in events.select("operationType").collect()}
    assert ops == {
        "insert", "update", "replace", "delete", "drop", "dropDatabase", "invalidate"
    }
    # every event carries a resume token (the offset, FIXTURES.md §1)
    assert events.filter(F.col("_id._data").isNull()).count() == 0


def test_op_filter(events):
    kept = filter_data_ops(events)
    assert kept.count() == 7
    assert {r["operationType"] for r in kept.collect()} == set(DATA_OPERATION_TYPES)


def test_kafka_records_golden(events):
    records = to_kafka_records(filter_data_ops(events), "test")
    rows = records.collect()
    assert all(
        r["topic"] == "test.test-database.TestCollection" for r in rows
    )
    oid_key = '{"_id": {"$oid": "%s"}}' % OID
    by_value = sorted(r["value"] for r in rows if r["key"] == oid_key)
    expected = sorted(
        [
            '{"after": %s, "op": "c"}' % _doc(1),
            '{"before": %s, "updateDescription": {"removedFields": [], '
            '"truncatedArrays": [], "updatedFields": {"a": 2}}, "after": %s, '
            '"op": "u"}' % (_doc(1), _doc(2)),
            '{"before": %s, "after": %s, "op": "u"}' % (_doc(2), _doc(3)),
            '{"before": %s, "op": "d"}' % _doc(3),
        ]
    )
    assert by_value == expected


def test_kafka_key_arbitrary_bson_id(events):
    """A9: the Kafka key is byte-faithful json_util.dumps(documentKey)
    for ANY `_id` type — int, string, and compound-document keys, not
    just ObjectId (reference change_event_handler.py:93-98)."""
    records = to_kafka_records(filter_data_ops(events), "test")
    keys = {r["key"]: r["value"] for r in records.collect()}
    assert '{"_id": 42}' in keys
    assert '{"_id": "user-7"}' in keys
    assert '{"_id": {"tenant": 3, "name": "x"}}' in keys
    assert keys['{"_id": 42}'] == '{"after": {"_id": 42, "a": 10}, "op": "c"}'
    assert (
        keys['{"_id": {"tenant": 3, "name": "x"}}']
        == '{"after": {"_id": {"tenant": 3, "name": "x"}, "a": 12}, "op": "c"}'
    )


def test_topic_without_prefix(events):
    records = to_kafka_records(filter_data_ops(events), "")
    assert {r["topic"] for r in records.collect()} == {"test-database.TestCollection"}


def test_partitioning_per_key(spark, events):
    """A6: same documentKey -> same partition (the reference asserts
    all events of one key land on one queue)."""
    per_key = (
        partition_by_key(filter_data_ops(events), 4)
        .select("documentKey", F.spark_partition_id().alias("pid"))
        .groupBy("documentKey")
        .agg(F.countDistinct("pid").alias("npid"))
        .collect()
    )
    assert per_key and all(r["npid"] == 1 for r in per_key)


def test_split_reassemble_roundtrip(spark):
    """split -> reassemble is the identity on the simulated change
    stream (payloads land back on their events, completeness holds),
    and a withheld fragment flips `complete` to False."""
    from pymongo_change_stream_reader_spark.operators.cdc import (
        reassemble_split_events,
    )
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )
    from pymongo_change_stream_reader_spark.sources.simulate import (
        simulate_change_stream,
    )
    from tests.conftest import SF_SMOKE

    events = simulate_change_stream(spark, SF_SMOKE)
    split = translate_pipeline(
        [{"$changeStreamSplitLargeEvent": {"maxSize": 80}}]
    )(events)
    back = reassemble_split_events(split)
    assert back.count() == events.count()
    assert back.filter(~F.col("complete")).count() == 0
    key = [r["_id"]["_data"] for r in events.collect()]
    orig = {
        r["_id"]["_data"]: (
            r["fullDocument"],
            r["fullDocumentBeforeChange"],
            r["updateDescription"],
        )
        for r in events.collect()
    }
    got = {
        r["_id"]["_data"]: (
            r["fullDocument"],
            r["fullDocumentBeforeChange"],
            r["updateDescription"],
        )
        for r in back.collect()
    }
    assert got == orig and set(got) == set(key)

    # withhold one fragment of a split event -> incomplete
    frag = split.filter(F.col("splitEvent").isNotNull()).limit(1).collect()
    if frag:
        ev = frag[0]["_id"]["_data"]
        partial = split.filter(
            ~(
                (F.col("_id")["_data"] == ev)
                & (F.col("splitEvent")["fragment"] == 1)
            )
        )
        bad = reassemble_split_events(partial).filter(
            F.col("_id")["_data"] == ev
        ).collect()
        assert len(bad) == 1 and bad[0]["complete"] is False


def test_scd2_intervals_versions_and_deletes(spark):
    from pymongo_change_stream_reader_spark.operators.cdc import (
        scd2_from_events,
    )

    rows = [
        # k1: insert@10 -> update@20 -> delete@30 (two closed versions)
        ("insert", "k1", '{"v": 1}', 10, 1, "a"),
        ("update", "k1", '{"v": 2}', 20, 1, "b"),
        ("delete", "k1", None, 30, 1, "c"),
        # k2: insert@15, still open
        ("insert", "k2", '{"v": 9}', 15, 1, "d"),
        # k3: insert@5 -> replace@5 (same t, i breaks the tie)
        ("insert", "k3", '{"v": 1}', 5, 1, "e"),
        ("replace", "k3", '{"v": 2}', 5, 2, "f"),
    ]
    ev = spark.createDataFrame(
        rows,
        "operationType STRING, documentKey STRING, fullDocument STRING,"
        " t INT, i INT, d STRING",
    ).selectExpr(
        "operationType", "documentKey", "fullDocument",
        "named_struct('t', t, 'i', i) AS clusterTime",
        "named_struct('_data', d) AS _id",
    )
    out = {
        (r["key"], r["doc"]): (
            r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in scd2_from_events(ev).collect()
    }
    assert out[("k1", '{"v": 1}')] == (10, 20, False)
    assert out[("k1", '{"v": 2}')] == (20, 30, False)  # delete closes
    assert len([k for k in out if k[0] == "k1"]) == 2  # delete opens nothing
    assert out[("k2", '{"v": 9}')] == (15, None, True)
    # tie on t: the i-ordered successor closes the first version at
    # the SAME t (zero-length interval), the second stays current
    assert out[("k3", '{"v": 1}')] == (5, 5, False)
    assert out[("k3", '{"v": 2}')] == (5, None, True)
