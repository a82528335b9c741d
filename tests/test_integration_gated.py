"""Environment-gated integration tests — the executable half of
RUNBOOK.md.  Each test names one external dependency this sandbox
lacks (Kafka broker, MongoDB deployment + Spark connector jar, image/
audio codec libs) and SKIPS with instructions until the environment
provides it; with the dependency present it drives the real path
end-to-end.  RUNBOOK.md maps every skip here to the exact install/
config step that un-skips it.
"""

from __future__ import annotations

import os

import pytest

IT_KAFKA = os.environ.get("IT_KAFKA_BOOTSTRAP")
IT_MONGO = os.environ.get("IT_MONGO_URI")


@pytest.mark.skipif(
    not IT_KAFKA,
    reason="set IT_KAFKA_BOOTSTRAP=host:port (broker with "
    "spark-sql-kafka jars on the classpath) — RUNBOOK.md §1",
)
def test_kafka_relay_roundtrip(spark, tmp_path):
    """A11 end-to-end: relay change events to a real broker with the
    idempotent producer config, then read the topic back and check the
    envelope payloads arrived exactly once."""
    import shutil

    from pymongo_change_stream_reader_spark.sources.change_events import (
        stream_change_events_json,
    )
    from pymongo_change_stream_reader_spark.streaming.job import (
        RelaySettings,
        start_kafka_relay,
    )

    src = tmp_path / "in"
    src.mkdir()
    shutil.copy("tests/fixtures/change_events.jsonl", src / "b0.json")
    settings = RelaySettings(
        stream_reader_name="it-kafka",
        kafka_prefix="it",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q = start_kafka_relay(
        stream_change_events_json(spark, str(src)), settings, IT_KAFKA
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", IT_KAFKA)
        .option("subscribe", "it.test-database.TestCollection")
        .option("startingOffsets", "earliest")
        .load()
    )
    assert back.count() == 7


@pytest.mark.skipif(
    not IT_MONGO,
    reason="set IT_MONGO_URI=mongodb://... (replica set; "
    "mongo-spark-connector on spark.jars.packages) — RUNBOOK.md §2",
)
def test_mongo_change_stream_opens(spark):
    """A1: the connector-backed change-stream source resolves scope and
    returns a streaming DataFrame with the change-event schema."""
    from pymongo_change_stream_reader_spark.sources.change_events import (
        mongo_change_stream,
    )

    stream = mongo_change_stream(
        spark, IT_MONGO, database="it_db", collection="it_coll"
    )
    assert stream.isStreaming
    assert "operationType" in stream.columns


def test_decode_image_real(spark):
    """decode_image with pillow installed: a generated 4x2 RGB PNG
    round-trips through the Arrow-batched decode with exact dimensions
    and channel means; a corrupt payload yields null fields, not a
    task failure."""
    PIL = pytest.importorskip("PIL", reason="pip install pillow — RUNBOOK.md §3")
    import io

    from PIL import Image

    from pymongo_change_stream_reader_spark.operators.multimodal import (
        decode_image,
    )

    buf = io.BytesIO()
    Image.new("RGB", (4, 2), color=(10, 20, 30)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))],
        "doc_id LONG, payload BINARY",
    )
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["mode"]) == (4, 2, "RGB")
    assert got[1]["mean_pixel"] == [10.0, 20.0, 30.0]
    assert got[2]["width"] is None and got[2]["mean_pixel"] is None


def test_decode_audio_real(spark):
    """decode_audio with soundfile installed: a generated 1-second
    8 kHz mono WAV decodes with the right rate/frames and non-empty
    windowed RMS; corrupt payloads yield nulls."""
    sf = pytest.importorskip(
        "soundfile", reason="pip install soundfile — RUNBOOK.md §3"
    )
    import io

    import numpy as np

    from pymongo_change_stream_reader_spark.operators.multimodal import (
        decode_audio,
    )

    rate = 8000
    wave = np.sin(2 * np.pi * 440 * np.arange(rate) / rate)
    buf = io.BytesIO()
    sf.write(buf, wave, rate, format="WAV")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"static"))],
        "doc_id LONG, payload BINARY",
    )
    got = {r["doc_id"]: r for r in decode_audio(df).collect()}
    assert got[1]["sample_rate"] == rate
    assert got[1]["n_frames"] == rate and got[1]["n_channels"] == 1
    assert len(got[1]["rms"]) > 0 and all(v > 0 for v in got[1]["rms"])
    assert got[2]["sample_rate"] is None


def test_decode_stubs_point_at_runbook(spark):
    """In THIS environment (no codecs), the decoders raise the loud
    gated error naming the runbook — never a silent fake decode."""
    for lib, fn_name in (("PIL", "decode_image"), ("soundfile", "decode_audio")):
        try:
            __import__(lib)
            pytest.skip(f"{lib} installed here; the *_real tests cover it")
        except ImportError:
            pass
        from pymongo_change_stream_reader_spark.operators import multimodal

        df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id LONG, payload BINARY")
        with pytest.raises(NotImplementedError, match="RUNBOOK"):
            getattr(multimodal, fn_name)(df)
