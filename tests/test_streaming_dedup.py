"""Streaming near-dup dedup against the persisted LSH index
(streaming/dedup_relay.py) — the r3 verdict ask #5 e2e: two
micro-batches; the second batch's near-dups of the first are flagged;
the on-disk index grows by the batch only; replayed epochs are no-ops.
"""

from __future__ import annotations

import json
import os
import time

import pytest

from pymongo_change_stream_reader_spark.sources.change_events import (
    stream_change_events_json,
)
from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
    dedup_flag_batch,
    read_dedup_flags,
    start_streaming_dedup,
)

LONG_A = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun"
)
LONG_B = (
    "completely different content about distributed query engines "
    "processing one hundred terabytes of training data every day"
)


def _event(data: str, key: str, text: str, t: int = 1, i: int = 1) -> str:
    return json.dumps(
        {
            "_id": {"_data": data},
            "operationType": "insert",
            "clusterTime": {"t": t, "i": i},
            "documentKey": key,
            "fullDocument": text,
        }
    )


def _index_rows(spark, path: str) -> int:
    return spark.read.parquet(path).count()


def test_streaming_dedup_two_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    index = str(tmp_path / "lsh_index")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: two distinct documents — nothing to flag yet
    (src / "b0.json").write_text(
        "\n".join([_event("a1", "k1", LONG_A), _event("a2", "k2", LONG_B)])
    )
    q = start_streaming_dedup(
        stream_change_events_json(spark, str(src)), index, flags, ckpt
    )
    try:
        q.processAllAvailable()
        assert read_dedup_flags(spark, flags) is None
        rows_after_b0 = _index_rows(spark, index)
        assert rows_after_b0 == 2 * 8  # 2 docs x 8 bands

        # batch 1: k9 repeats batch 0's text (near-dup of k1), k10 is novel
        (src / "b1.json").write_text(
            "\n".join(
                [
                    _event("a3", "k9", LONG_A, t=2),
                    _event("a4", "k10", "fresh unrelated words entirely "
                           "novel sentence with no overlap at all", t=2),
                ]
            )
        )
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    flagged = {
        (r["new_id"], r["corpus_id"])
        for r in read_dedup_flags(spark, flags).collect()
    }
    assert ("k9", "k1") in flagged
    assert all(new == "k9" for new, _ in flagged)  # k10 never flagged
    # index grew by batch 1 only: +2 docs x 8 bands
    assert _index_rows(spark, index) == rows_after_b0 + 2 * 8


def test_dedup_flag_batch_replay_is_guarded_by_marker(spark, tmp_path):
    """A replayed epoch (same epoch id, same checkpoint) must not
    double-append the index: drive the foreachBatch body directly via
    a restarted stream over the SAME checkpoint — the already-committed
    batch is skipped on restart (offset log) and, if foreachBatch were
    re-invoked anyway, the epoch marker short-circuits it."""
    src = tmp_path / "in"
    src.mkdir()
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    (src / "b0.json").write_text(_event("a1", "k1", LONG_A))

    for _ in range(2):  # run, stop, restart with same checkpoint
        q = start_streaming_dedup(
            stream_change_events_json(spark, str(src)), index, flags, ckpt
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)
    assert _index_rows(spark, index) == 8  # 1 doc x 8 bands, once


def test_dedup_flag_batch_batchwise(spark, tmp_path):
    """The batch core, without a streaming query: probe-then-append
    order means a document never flags against itself, and deletes /
    null documents are ignored."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    b0 = spark.createDataFrame(
        [("insert", "k1", LONG_A), ("delete", "k2", None)],
        "operationType STRING, documentKey STRING, fullDocument STRING",
    )
    assert dedup_flag_batch(b0, index, flags) == 0
    b1 = spark.createDataFrame(
        [("update", "k3", LONG_A)],
        "operationType STRING, documentKey STRING, fullDocument STRING",
    )
    assert dedup_flag_batch(b1, index, flags) == 1
    assert {
        (r["new_id"], r["corpus_id"])
        for r in read_dedup_flags(spark, flags).collect()
    } == {("k3", "k1")}


def test_dedup_flag_batch_lww_last_event_wins(spark, tmp_path):
    """Review r4: a batch with insert(k1, textA) then update(k1, textB)
    must index/flag the LWW-LAST text (textB), not an arbitrary row —
    a later near-dup of textB is flagged, one of the superseded textA
    is not."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    b0 = spark.createDataFrame(
        [
            ("insert", "k1", LONG_A, 1, 1, "d1"),
            ("update", "k1", LONG_B, 1, 2, "d2"),  # later triple wins
        ],
        "operationType STRING, documentKey STRING, fullDocument STRING, "
        "t INT, i INT, d STRING",
    ).selectExpr(
        "operationType",
        "documentKey",
        "fullDocument",
        "named_struct('t', t, 'i', i) AS clusterTime",
        "named_struct('_data', d) AS _id",
    )
    assert dedup_flag_batch(b0, index, flags) == 0
    # index holds exactly one doc's bands (the LWW winner)
    assert spark.read.parquet(index).count() == 8
    probe = spark.createDataFrame(
        [("insert", "k2", LONG_B), ("insert", "k3", LONG_A)],
        "operationType STRING, documentKey STRING, fullDocument STRING",
    )
    dedup_flag_batch(probe, index, flags, epoch_id=7)
    got = {
        (r["new_id"], r["corpus_id"], r["epoch"])
        for r in read_dedup_flags(spark, flags).collect()
    }
    assert ("k2", "k1", 7) in got          # near-dup of the LIVE text
    assert all(new != "k3" for new, _, _ in got)  # stale text not indexed


def test_dedup_relay_rejects_uri_paths(spark, tmp_path):
    """Review r4: URI flags/index paths must raise loudly — the
    driver-side probes are local-filesystem-only."""
    import pytest as _pytest

    b = spark.createDataFrame(
        [("insert", "k", LONG_A)],
        "operationType STRING, documentKey STRING, fullDocument STRING",
    )
    with _pytest.raises(ValueError, match="URI scheme"):
        dedup_flag_batch(b, "s3a://bkt/idx", str(tmp_path / "f"))
    with _pytest.raises(ValueError, match="URI scheme"):
        dedup_flag_batch(b, str(tmp_path / "i"), "s3a://bkt/flags")
    with _pytest.raises(ValueError, match="URI scheme"):
        read_dedup_flags(spark, "hdfs://nn/flags")
