"""End-to-end streaming tests: file source -> relay -> sink, with
checkpoint-restart at-least-once semantics.

Mirrors the reference's full-topology test
(tests/test_change_stream_reading/test_application.py) and its
crash-replay contract (SURVEY §3.3): after a restart with the same
checkpoint, already-committed input is not reprocessed.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.sources.change_events import (
    stream_change_events_json,
)
from pymongo_change_stream_reader_spark.streaming.job import (
    RelaySettings,
    build_relay,
    start_memory_relay,
    start_parquet_relay,
)

FIXTURE = "tests/fixtures/change_events.jsonl"


def test_memory_relay_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "batch0.json")
    settings = RelaySettings(
        stream_reader_name="e2e-mem",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = start_memory_relay(
        stream_change_events_json(spark, str(src)), settings, "relay_out"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM relay_out")
    assert out.count() == 7
    assert {r["topic"] for r in out.collect()} == {"test.test-database.TestCollection"}
    ops = sorted(
        r["value"].rsplit('"op": "', 1)[1][0] for r in out.collect()
    )
    assert ops == ["c", "c", "c", "c", "d", "u", "u"]


def test_checkpoint_restart_no_replay(spark, tmp_path):
    """At-least-once without duplicate delivery across a restart:
    batch0 is committed before the 'crash'; after restart only batch1
    is processed (4 new rows, not 8)."""
    src = tmp_path / "in"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    settings = RelaySettings(
        stream_reader_name="e2e-restart",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    shutil.copy(FIXTURE, src / "batch0.json")
    q = start_parquet_relay(
        stream_change_events_json(spark, str(src)), settings, out_dir
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.read.parquet(out_dir).count() == 7

    # "restart": new query object, same checkpoint; new input appears
    shutil.copy(FIXTURE, src / "batch1.json")
    q2 = start_parquet_relay(
        stream_change_events_json(spark, str(src)), settings, out_dir
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # 7 from batch0 (not replayed) + 7 from batch1
    assert spark.read.parquet(out_dir).count() == 14


def test_relay_is_streaming_safe(spark, tmp_path):
    """The relay plan contains no batch-only operations (it must bind
    to an unbounded source)."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")
    df = build_relay(
        stream_change_events_json(spark, str(src)),
        RelaySettings(stream_reader_name="plan-check"),
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["topic", "key", "value"]


def test_partitioned_relay_streaming(spark, tmp_path):
    """producers_count > 0 inserts the key exchange (A6) and still
    streams (repartition is streaming-compatible)."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")
    settings = RelaySettings(
        stream_reader_name="e2e-part",
        producers_count=2,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = start_memory_relay(
        stream_change_events_json(spark, str(src)), settings, "relay_part_out"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.sql("SELECT * FROM relay_part_out").count() == 7


def test_relay_applies_user_pipeline(spark, tmp_path):
    """The user PIPELINE (reference settings.py:85-90) must be applied
    on sources that cannot push it down server-side, exactly as the
    reference runs it on every cursor (watch.py:79): a $match filters
    events before the relay, a $set reshapes them."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "batch0.json")
    settings = RelaySettings(
        stream_reader_name="e2e-pipe",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        pipeline=json.dumps(
            [
                {"$match": {"operationType": "insert"}},
                {"$set": {"fullDocument": "$documentKey"}},
            ]
        ),
    )
    q = start_memory_relay(
        stream_change_events_json(spark, str(src)), settings, "relay_pipe_out"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM relay_pipe_out").collect()
    # only the 4 inserts survive the $match
    assert len(rows) == 4
    assert all(r["value"].rsplit('"op": "', 1)[1][0] == "c" for r in rows)
    # the $set reshapes: the envelope's "after" is now the documentKey
    for r in rows:
        after = r["value"].split('"after": ', 1)[1].rsplit(', "op"', 1)[0]
        assert after == r["key"]


def test_relay_pipeline_stays_streaming(spark, tmp_path):
    """A $match/$project user pipeline keeps the relay plan
    streaming-safe (binds to an unbounded source)."""
    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")
    df = build_relay(
        stream_change_events_json(spark, str(src)),
        RelaySettings(
            stream_reader_name="plan-pipe",
            pipeline='[{"$match": {"ns.coll": "TestCollection"}}]',
        ),
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["topic", "key", "value"]


def test_relay_sample_rate_streaming_safe(spark, tmp_path):
    """$sampleRate is a stateless content-hash filter, so it binds to
    an unbounded source and drops a deterministic subset end-to-end
    (same events in -> same events out, across restarts too)."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")
    settings = RelaySettings(
        stream_reader_name="e2e-samplerate",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        pipeline=json.dumps([{"$sampleRate": 0.5}]),
    )
    q = start_memory_relay(
        stream_change_events_json(spark, str(src)),
        settings,
        "relay_sr_out",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    first = sorted(
        r["key"] for r in spark.sql("SELECT * FROM relay_sr_out").collect()
    )
    # a strict, deterministic subset of the 6 data events
    assert 0 < len(first) < 6
    # identical replay from a fresh checkpoint -> identical sample
    settings2 = RelaySettings(
        stream_reader_name="e2e-samplerate2",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt2"),
        pipeline=json.dumps([{"$sampleRate": 0.5}]),
    )
    q2 = start_memory_relay(
        stream_change_events_json(spark, str(src)),
        settings2,
        "relay_sr_out2",
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    second = sorted(
        r["key"] for r in spark.sql("SELECT * FROM relay_sr_out2").collect()
    )
    assert second == first


def test_relay_split_large_event_fragments(spark, tmp_path):
    """$changeStreamSplitLargeEvent as the user PIPELINE: oversized
    events fan out into per-fragment relay records (each fragment
    carries only its packed payload fields), small events pass
    through as single records — end-to-end through the streaming
    relay, exactly as mongod would fragment the cursor's events."""
    import json

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")

    # count the data-path events and their per-event payload presence
    # directly from the batch frame to derive the expected fan-out
    from pymongo_change_stream_reader_spark.operators.cdc import filter_data_ops
    from pymongo_change_stream_reader_spark.sources.change_events import (
        read_change_events_json,
    )

    batch = filter_data_ops(read_change_events_json(spark, str(src)))
    expected = 0
    for r in batch.collect():
        # PRESENCE (not truthiness): an empty-string document or an
        # updateDescription without updatedFields still occupies a
        # fragment
        present = sum(
            1
            for v in (
                r["fullDocument"],
                r["fullDocumentBeforeChange"],
                r["updateDescription"],
            )
            if v is not None
        )
        # maxSize=1: every present payload field overflows into its
        # own fragment; single-payload events stay unsplit
        expected += present if present >= 2 else 1

    settings = RelaySettings(
        stream_reader_name="e2e-split",
        kafka_prefix="test",
        checkpoint_dir=str(tmp_path / "ckpt"),
        pipeline=json.dumps([{"$changeStreamSplitLargeEvent": {"maxSize": 1}}]),
    )
    q = start_memory_relay(
        stream_change_events_json(spark, str(src)), settings, "relay_split_out"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM relay_split_out").collect()
    assert len(rows) == expected > 4  # more records than events: fan-out happened
    # fragments of one event share its key; an update's fragments carry
    # disjoint envelope payloads (one after-only, one before-only)
    from collections import Counter

    per_key = Counter(r["key"] for r in rows)
    assert max(per_key.values()) >= 2


def test_relay_rejects_non_change_stream_stages(spark, tmp_path):
    """mongod rejects anything outside its change-stream stage
    whitelist when the cursor opens; the relay fails equally fast —
    at build time with the whitelist in the message — instead of a
    deep AnalysisException when the streaming query starts."""
    import json

    from pymongo_change_stream_reader_spark.plans.pipeline import PipelineError

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy(FIXTURE, src / "b.json")
    events = stream_change_events_json(spark, str(src))
    for bad in (
        [{"$group": {"_id": "$operationType"}}],
        [{"$sort": {"operationType": 1}}],
        [{"$lookup": {"from": "x", "localField": "a", "foreignField": "b", "as": "c"}}],
    ):
        with pytest.raises(PipelineError, match="change-stream"):
            build_relay(
                events,
                RelaySettings(
                    stream_reader_name="bad-pipe", pipeline=json.dumps(bad)
                ),
            )
    # the server whitelist and the streaming-safe extensions still pass
    ok = build_relay(
        events,
        RelaySettings(
            stream_reader_name="ok-pipe",
            pipeline=json.dumps(
                [{"$match": {"operationType": "insert"}}, {"$sampleRate": 0.5}]
            ),
        ),
    )
    assert ok.isStreaming
