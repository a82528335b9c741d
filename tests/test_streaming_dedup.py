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


def _batch(spark, rows):
    """Change-event frame without clusterTime (direct batch use)."""
    return spark.createDataFrame(
        rows, "operationType STRING, documentKey STRING, fullDocument STRING"
    )


def test_delete_retires_sketch_no_stale_flags(spark, tmp_path):
    """r4 ask #2 / r5 weak: a deleted document's sketch must stop
    matching — flags never point at documents that no longer exist."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A), ("insert", "k2", LONG_B)]),
        index, flags, epoch_id=0,
    )
    dedup_flag_batch(
        _batch(spark, [("delete", "k1", None)]), index, flags, epoch_id=1
    )
    # a near-dup of the DELETED text must not flag; live text still does
    n = dedup_flag_batch(
        _batch(spark, [("insert", "k9", LONG_A), ("insert", "k10", LONG_B)]),
        index, flags, epoch_id=2,
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in read_dedup_flags(spark, flags).collect()
    }
    assert ("k10", "k2") in got
    assert all(corpus != "k1" for _new, corpus in got)
    assert n == 1


def test_update_retires_superseded_sketch(spark, tmp_path):
    """An updated document's OLD sketch retires: probes match only the
    live version, and the update itself never flags against its own
    superseded sketch."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=0
    )
    assert (
        dedup_flag_batch(
            _batch(spark, [("update", "k1", LONG_B)]),
            index, flags, epoch_id=1,
        )
        == 0  # no self-flag against its own superseded sketch
    )
    dedup_flag_batch(
        _batch(spark, [("insert", "k9", LONG_A), ("insert", "k10", LONG_B)]),
        index, flags, epoch_id=2,
    )
    got = {
        (r["new_id"], r["corpus_id"], r["epoch"])
        for r in read_dedup_flags(spark, flags).collect()
    }
    # LONG_B matches the live k1; LONG_A (the superseded text) doesn't
    assert ("k10", "k1", 2) in got
    assert all(not (new == "k9" and c == "k1") for new, c, _e in got)


def test_compact_purges_dead_rows_and_shrinks(spark, tmp_path):
    """delete -> compact -> the doc's rows are physically gone, the
    index row count shrinks, the tombstone sidecar clears, and
    post-compaction probes still work."""
    from pymongo_change_stream_reader_spark.operators.maintenance import (
        compact_lsh_index,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A), ("insert", "k2", LONG_B)]),
        index, flags, epoch_id=0,
    )
    dedup_flag_batch(
        _batch(spark, [("update", "k2", LONG_B + " updated tail words")]),
        index, flags, epoch_id=1,
    )
    dedup_flag_batch(
        _batch(spark, [("delete", "k1", None)]), index, flags, epoch_id=2
    )
    # raw rows: k1 gen0 (dead) + k2 gen0 (dead) + k2 gen1 = 3 x 8
    assert spark.read.parquet(index).count() == 3 * 8
    n = compact_lsh_index(spark, index)
    assert n == 8  # only k2's live generation survives
    assert not os.path.isdir(index + "_tombstones")
    # registry keeps exactly the live registration
    reg = {
        (r["doc"], r["gen"])
        for r in spark.read.parquet(index + "_docs").collect()
    }
    assert reg == {("k2", 1)}
    # probes keep working and the purged doc cannot flag
    n = dedup_flag_batch(
        _batch(spark, [("insert", "k9", LONG_A)]), index, flags, epoch_id=3
    )
    assert n == 0


def test_delete_then_reinsert_is_live_again(spark, tmp_path):
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=0
    )
    dedup_flag_batch(
        _batch(spark, [("delete", "k1", None)]), index, flags, epoch_id=1
    )
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=2
    )
    # the re-inserted generation clears its own tombstone: a new
    # near-dup flags against k1 again
    n = dedup_flag_batch(
        _batch(spark, [("insert", "k9", LONG_A)]), index, flags, epoch_id=3
    )
    assert n == 1


def test_flag_epoch_overwrite_is_idempotent(spark, tmp_path):
    """ADVICE r5 low: a crash between the flags write and the epoch
    marker replays the batch — the epoch partition must OVERWRITE, so
    flag rows never double-count."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=0
    )
    for _ in range(2):  # the replay: same epoch id, same batch
        dedup_flag_batch(
            _batch(spark, [("insert", "k9", LONG_A)]),
            index, flags, epoch_id=1,
        )
    rows = read_dedup_flags(spark, flags).collect()
    assert len(rows) == 1  # one flag row, not two
    assert (rows[0]["new_id"], rows[0]["corpus_id"]) == ("k9", "k1")


def test_probe_blocks_while_compaction_holds_lock(spark, tmp_path):
    """ADVICE r5 low: the probe holds the index lock SHARED, so a
    compaction's directory swap cannot yank files from under a running
    scan — a cross-process exclusive holder delays the whole batch."""
    import subprocess
    import sys

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=0
    )
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import fcntl, os, sys, time\n"
            "fd = os.open(sys.argv[1], os.O_CREAT | os.O_WRONLY)\n"
            "fcntl.flock(fd, fcntl.LOCK_EX)\n"
            "print('HELD', flush=True)\n"
            "time.sleep(1.5)\n",
            index + ".writelock",
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    assert holder.stdout.readline().strip() == "HELD"
    t0 = time.monotonic()
    n = dedup_flag_batch(
        _batch(spark, [("insert", "k9", LONG_A)]), index, flags, epoch_id=1
    )
    elapsed = time.monotonic() - t0
    holder.wait()
    assert n == 1
    assert elapsed >= 1.2, (
        f"batch returned in {elapsed:.2f}s under an exclusive index lock "
        "— the probe/append paths are not taking the lock"
    )


def test_legacy_lsh_index_refuses_then_migrates(spark, tmp_path):
    """Review r6 #4: appending gen-tagged files into a pre-generation
    band dir would mix parquet schemas; writers refuse, and one
    compaction migrates in place."""
    import pytest as _pytest

    from pymongo_change_stream_reader_spark.operators.dedup import (
        append_lsh_index,
        lsh_band_table,
    )
    from pymongo_change_stream_reader_spark.operators.maintenance import (
        compact_lsh_index,
    )

    index = str(tmp_path / "idx")
    legacy = spark.createDataFrame([("k1", LONG_A)], "doc STRING, text STRING")
    # a legacy index: band table WITHOUT the gen column
    lsh_band_table(legacy, "text", "doc").write.mode(
        "overwrite"
    ).partitionBy("band").parquet(index)
    batch = spark.createDataFrame([("k2", LONG_B)], "doc STRING, text STRING")
    with _pytest.raises(RuntimeError, match="predates generation"):
        append_lsh_index(batch, index, "text", "doc")
    compact_lsh_index(spark, index)  # the migration
    assert "gen" in spark.read.parquet(index).columns
    append_lsh_index(batch, index, "text", "doc")
    assert spark.read.parquet(index).count() == 2 * 8


def test_flag_scope_isolates_checkpoint_incarnations(spark, tmp_path):
    """Review r6 #5: after a checkpoint reset, epoch ids restart from
    0 — the new incarnation's overwrite must not delete the previous
    incarnation's accumulated flags.  The query-id scope isolates
    them."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]),
        index, flags, epoch_id=0, scope="qid-old",
    )
    assert (
        dedup_flag_batch(
            _batch(spark, [("insert", "k9", LONG_A)]),
            index, flags, epoch_id=1, scope="qid-old",
        )
        == 1
    )
    # "checkpoint reset": a new incarnation restarts at epoch 0/1
    assert (
        dedup_flag_batch(
            _batch(spark, [("insert", "k10", LONG_A)]),
            index, flags, epoch_id=1, scope="qid-new",
        )
        >= 1
    )
    got = {
        (r["new_id"], r["corpus_id"])
        for r in read_dedup_flags(spark, flags).collect()
    }
    # the old incarnation's flag survived alongside the new one's
    assert ("k9", "k1") in got
    assert ("k10", "k1") in got


def test_zero_flag_batch_writes_nothing(spark, tmp_path):
    """Review r6 #7: quiet batches must not leave one empty partition
    dir per trigger — and read_dedup_flags keeps its None contract
    until a flag actually exists."""
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=0
    )
    # second batch: novel text, no flags -> nothing written at all
    assert (
        dedup_flag_batch(
            _batch(spark, [("insert", "k2", LONG_B)]),
            index, flags, epoch_id=1,
        )
        == 0
    )
    assert read_dedup_flags(spark, flags) is None
    assert not os.path.isdir(os.path.join(flags, "epoch=1"))

# ---------------------------------------------------------------------------
# Flags-store epoch compaction (VERDICT r6 ask #1): the relay writes
# one flags/epoch=N partition per non-empty trigger, forever — folding
# aged epochs into the base partition bounds partition discovery.
# ---------------------------------------------------------------------------
def _flag_pairs(spark, flags):
    df = read_dedup_flags(spark, flags)
    return (
        set()
        if df is None
        else {(r["new_id"], r["corpus_id"]) for r in df.collect()}
    )


def _epoch_dirs(flags):
    out = []
    for root, dirs, _files in os.walk(flags):
        out.extend(
            os.path.join(root, d) for d in dirs if d.startswith("epoch=")
        )
    return sorted(out)


def test_compact_dedup_flags_folds_aged_epochs(spark, tmp_path):
    """N flagged epochs -> compact -> identical flag PAIRS, bounded
    partition count (base + the newest epoch), and a second compaction
    is a no-op (-1)."""
    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags, epoch_id=0
    )
    for e in range(1, 5):  # four flagged epochs: k1..k4 each near-dup k0
        assert (
            dedup_flag_batch(
                _batch(spark, [("insert", f"k{e}", LONG_A)]),
                index, flags, epoch_id=e,
            )
            >= 1
        )
    before = _flag_pairs(spark, flags)
    assert len(_epoch_dirs(flags)) == 4  # epochs 1..4 (epoch 0 flagged nothing)
    n = compact_dedup_flags(spark, index, flags)
    assert n == len(before)
    assert _flag_pairs(spark, flags) == before
    dirs = _epoch_dirs(flags)
    assert len(dirs) == 2  # base (-1) + newest epoch (4)
    assert any(d.endswith("epoch=-1") for d in dirs)
    assert any(d.endswith("epoch=4") for d in dirs)
    # idempotent: nothing left to fold
    assert compact_dedup_flags(spark, index, flags) == -1
    assert _flag_pairs(spark, flags) == before


def test_compact_dedup_flags_streaming_replay_noop(spark, tmp_path):
    """Streaming path: fold the scoped store mid-life, then restart the
    query over the SAME checkpoint — replayed (folded, committed)
    epochs are no-ops via the epoch markers, and new epochs land
    alongside the base partition."""
    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    src = tmp_path / "in"
    src.mkdir()
    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    ckpt = str(tmp_path / "ckpt")
    (src / "b0.json").write_text(_event("a0", "k0", LONG_A))
    (src / "b1.json").write_text(_event("a1", "k1", LONG_A, t=2))
    (src / "b2.json").write_text(_event("a2", "k2", LONG_A, t=3))
    q = start_streaming_dedup(
        stream_change_events_json(spark, str(src)), index, flags, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    before = _flag_pairs(spark, flags)
    # all three texts collide; pair DIRECTION depends on file-trigger
    # order, which the source does not guarantee — 3 pairs either way
    assert len(before) == 3
    compact_dedup_flags(spark, index, flags)
    assert _flag_pairs(spark, flags) == before
    n_dirs_after_fold = len(_epoch_dirs(flags))

    # restart over the same checkpoint (folded epochs replay as no-ops
    # through the offset log / markers) and feed one new batch
    (src / "b3.json").write_text(_event("a3", "k3", LONG_A, t=4))
    q = start_streaming_dedup(
        stream_change_events_json(spark, str(src)), index, flags, ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    got = _flag_pairs(spark, flags)
    assert before < got and all(new == "k3" for new, _ in got - before)
    # exactly one new epoch dir; the folded base is untouched
    assert len(_epoch_dirs(flags)) == n_dirs_after_fold + 1


def test_compact_dedup_flags_blocks_on_shared_probe_lock(spark, tmp_path):
    """Compact-while-probing interleave: a cross-process SHARED holder
    (the relay's probe+flags span) delays the fold until release."""
    import subprocess
    import sys

    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags, epoch_id=0
    )
    for e in (1, 2):
        dedup_flag_batch(
            _batch(spark, [("insert", f"k{e}", LONG_A)]),
            index, flags, epoch_id=e,
        )
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import fcntl, os, sys, time\n"
            "fd = os.open(sys.argv[1], os.O_CREAT | os.O_WRONLY)\n"
            "fcntl.flock(fd, fcntl.LOCK_SH)\n"
            "print('HELD', flush=True)\n"
            "time.sleep(1.5)\n",
            index + ".writelock",
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    assert holder.stdout.readline().strip() == "HELD"
    t0 = time.monotonic()
    before = _flag_pairs(spark, flags)
    n = compact_dedup_flags(spark, index, flags)
    elapsed = time.monotonic() - t0
    holder.wait()
    assert n == len(before) and _flag_pairs(spark, flags) == before
    assert elapsed >= 1.2, (
        f"fold returned in {elapsed:.2f}s under a shared probe lock — "
        "compact_dedup_flags is not taking the exclusive index lock"
    )


def test_compact_lsh_index_folds_flags_in_same_lock_span(spark, tmp_path):
    """compact_lsh_index(flags_path=...) performs BOTH maintenance
    passes under one lock acquisition."""
    from pymongo_change_stream_reader_spark.operators.maintenance import (
        compact_lsh_index,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags, epoch_id=0
    )
    for e in (1, 2, 3):
        dedup_flag_batch(
            _batch(spark, [("insert", f"k{e}", LONG_A)]),
            index, flags, epoch_id=e,
        )
    before = _flag_pairs(spark, flags)
    compact_lsh_index(spark, index, flags_path=flags)
    assert _flag_pairs(spark, flags) == before
    assert len(_epoch_dirs(flags)) == 2  # base + newest


def test_unscoped_epoch0_overwrite_warns(spark, tmp_path, caplog):
    """ADVICE r6 low: a legacy batch caller repeating the default
    (scope='', epoch_id=0) call now OVERWRITES instead of appending —
    the guard warns loudly."""
    import logging

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags
    )
    dedup_flag_batch(  # writes flags at epoch 0 (near-dup of k0)
        _batch(spark, [("insert", "k1", LONG_A)]), index, flags, epoch_id=1
    )
    with caplog.at_level(logging.WARNING):
        dedup_flag_batch(  # unscoped epoch 0 again, partition exists? no
            _batch(spark, [("insert", "k2", LONG_B)]), index, flags
        )
    assert not [r for r in caplog.records if "overwriting" in r.message]
    # now force the overwrite case: epoch 0 flagged rows exist already
    dedup_flag_batch(
        _batch(spark, [("insert", "k3", LONG_A)]), index, flags, epoch_id=0
    )
    with caplog.at_level(logging.WARNING):
        dedup_flag_batch(
            _batch(spark, [("insert", "k4", LONG_A)]), index, flags, epoch_id=0
        )
    assert [r for r in caplog.records if "overwriting" in r.message]


def test_flags_fold_crash_mid_swap_no_data_loss(spark, tmp_path, monkeypatch):
    """r8 verdict "what's wrong #2" kill-point: a fold crash between
    compact_parquet_table's two renames leaves the flags dir missing
    with ``.old`` holding the entire history.  The relay must REFUSE to
    write (a fresh flags dir would make recover_table classify ``.old``
    as garbage and delete all pre-crash flags), and the next
    compaction must restore then fold with zero flag rows lost."""
    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags, epoch_id=0
    )
    for e in (1, 2, 3):
        assert (
            dedup_flag_batch(
                _batch(spark, [("insert", f"k{e}", LONG_A)]),
                index, flags, epoch_id=e,
            )
            >= 1
        )
    before = _flag_pairs(spark, flags)
    assert len(before) >= 3

    real_rename = os.rename

    def crash_on_swap_in(src, dst):
        if src.endswith(".compact-tmp") and dst == flags:
            raise RuntimeError("injected crash between the two renames")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crash_on_swap_in)
    with pytest.raises(RuntimeError, match="injected"):
        compact_dedup_flags(spark, index, flags)
    monkeypatch.undo()
    # the crash window's exact shape: live dir gone, .old = history
    assert not os.path.exists(flags)
    assert os.path.exists(flags + ".old")

    # the relay refuses to recreate a fresh flags dir over the window
    with pytest.raises(RuntimeError, match="recover_table"):
        dedup_flag_batch(
            _batch(spark, [("insert", "k9", LONG_A)]),
            index, flags, epoch_id=9,
        )
    assert not os.path.exists(flags)  # nothing recreated

    # compaction recovers first, then folds — zero rows lost
    n = compact_dedup_flags(spark, index, flags)
    assert n == len(before)
    assert _flag_pairs(spark, flags) == before
    assert not os.path.exists(flags + ".old")
    assert not os.path.exists(flags + ".compact-tmp")

    # and the relay accepts writes again, accumulating on top
    assert (
        dedup_flag_batch(
            _batch(spark, [("insert", "k9", LONG_A)]),
            index, flags, epoch_id=9,
        )
        >= 1
    )
    assert _flag_pairs(spark, flags) > before


def test_compact_dedup_flags_many_epochs_scoped(spark, tmp_path):
    """Two scopes with different epoch counts through the Spark-side
    per-scope max/count aggregate (r8 verdict "what's wrong #3"): fold
    keeps exactly the newest epoch per scope, pairs are unchanged, and
    a second fold is a no-op."""
    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "a0", LONG_A)]),
        index, flags, epoch_id=0, scope="qA",
    )
    for e in range(1, 6):
        dedup_flag_batch(
            _batch(spark, [("insert", f"a{e}", LONG_A)]),
            index, flags, epoch_id=e, scope="qA",
        )
    dedup_flag_batch(
        _batch(spark, [("insert", "b0", LONG_B)]),
        index, flags, epoch_id=0, scope="qB",
    )
    for e in (1, 2, 3):
        dedup_flag_batch(
            _batch(spark, [("insert", f"b{e}", LONG_B)]),
            index, flags, epoch_id=e, scope="qB",
        )
    before = _flag_pairs(spark, flags)
    assert len(before) >= 8
    n = compact_dedup_flags(spark, index, flags)
    assert n == len(before)
    assert _flag_pairs(spark, flags) == before
    dirs = _epoch_dirs(flags)
    # per scope: base + newest (qA keeps 5, qB keeps 3)
    assert len(dirs) == 4
    assert any(d.endswith("q=qA/epoch=-1") for d in dirs)
    assert any(d.endswith("q=qA/epoch=5") for d in dirs)
    assert any(d.endswith("q=qB/epoch=-1") for d in dirs)
    assert any(d.endswith("q=qB/epoch=3") for d in dirs)
    assert compact_dedup_flags(spark, index, flags) == -1
    assert _flag_pairs(spark, flags) == before


def test_unscoped_write_below_folded_frontier_warns(spark, tmp_path, caplog):
    """r8 verdict "what's wrong #4": after a fold, an unscoped caller
    reusing a folded epoch id writes into an ABSENT dir and silently
    double-counts alongside the folded rows — the guard must warn; a
    fresh epoch id must not."""
    import logging

    from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
        compact_dedup_flags,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    dedup_flag_batch(
        _batch(spark, [("insert", "k0", LONG_A)]), index, flags, epoch_id=0
    )
    for e in (1, 2, 3):
        dedup_flag_batch(
            _batch(spark, [("insert", f"k{e}", LONG_A)]),
            index, flags, epoch_id=e,
        )
    compact_dedup_flags(spark, index, flags)  # base + epoch=3 remain
    with caplog.at_level(logging.WARNING):
        dedup_flag_batch(  # epoch 2 was folded — reuse double-counts
            _batch(spark, [("insert", "k8", LONG_A)]),
            index, flags, epoch_id=2,
        )
    assert [r for r in caplog.records if "folded frontier" in r.message]
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        dedup_flag_batch(  # a FRESH epoch id is the contract — no warn
            _batch(spark, [("insert", "k7", LONG_A)]),
            index, flags, epoch_id=9,
        )
    assert not [r for r in caplog.records if "folded frontier" in r.message]


# ---------------------------------------------------------------------------
# Registry hygiene for bootstrapped / untracked indexes (ADVICE r6
# medium) + the compaction-crash stale-tombstone window (ADVICE r6 low).
# ---------------------------------------------------------------------------
def test_write_lsh_index_seeds_registry_for_relay_hygiene(spark, tmp_path):
    """An index bootstrapped via write_lsh_index must be fully
    update/delete-capable: tombstoning a bootstrapped doc retires its
    sketch, and a relay update supersedes rather than double-serves."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        read_lsh_index,
        tombstone_lsh_docs,
        write_lsh_index,
    )

    index = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [("k1", LONG_A), ("k2", LONG_B)], "doc STRING, text STRING"
    )
    write_lsh_index(corpus, index, "text", "doc")
    assert os.path.isdir(index + "_docs")  # the seeded registry
    ids = spark.createDataFrame([("k1",)], "doc STRING")
    assert tombstone_lsh_docs(ids, index) == 1  # not a silent no-op
    live = {r["doc"] for r in read_lsh_index(spark, index).collect()}
    assert live == {"k2"}


def test_relay_update_of_bootstrapped_doc_single_version(spark, tmp_path):
    """The advice's exact failure: a relay UPDATE of a doc that came in
    via write_lsh_index must retire the bootstrap sketch — a later
    probe sees ONE live version, not both."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        read_lsh_index,
        write_lsh_index,
    )

    index = str(tmp_path / "idx")
    flags = str(tmp_path / "flags")
    write_lsh_index(
        spark.createDataFrame([("k1", LONG_A)], "doc STRING, text STRING"),
        index, "text", "doc",
    )
    # relay batch: k1 updated to LONG_B — must supersede, and must NOT
    # flag against its own superseded gen-0 sketch
    assert (
        dedup_flag_batch(
            _batch(spark, [("update", "k1", LONG_B)]),
            index, flags, epoch_id=0,
        )
        == 0
    )
    live = read_lsh_index(spark, index).select("doc", "gen").distinct()
    assert [(r["doc"], r["gen"]) for r in live.collect()] == [("k1", 1)]


def test_registry_less_index_refuses_then_seeds(spark, tmp_path):
    """A pre-registry index (gen-tagged band rows, no registry) refuses
    relay/tracked use with a migrate-first error; seed_lsh_registry
    derives the registry and hygiene works from then on."""
    import pytest as _pytest

    from pymongo_change_stream_reader_spark.operators.dedup import (
        append_lsh_index,
        lsh_band_table,
        read_lsh_index,
        seed_lsh_registry,
        tombstone_lsh_docs,
    )
    from pyspark.sql import functions as F

    index = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [("k1", LONG_A), ("k2", LONG_B)], "doc STRING, text STRING"
    )
    lsh_band_table(corpus, "text", "doc").withColumn(
        "gen", F.lit(0)
    ).write.mode("overwrite").partitionBy("band").parquet(index)
    ids = spark.createDataFrame([("k1",)], "doc STRING")
    with _pytest.raises(RuntimeError, match="no doc registry"):
        tombstone_lsh_docs(ids, index)
    with _pytest.raises(RuntimeError, match="no doc registry"):
        append_lsh_index(
            spark.createDataFrame([("k3", LONG_B)], "doc STRING, text STRING"),
            index, "text", "doc", track_generations=True,
        )
    assert seed_lsh_registry(spark, index) == 2
    assert tombstone_lsh_docs(ids, index) == 1
    live = {r["doc"] for r in read_lsh_index(spark, index).collect()}
    assert live == {"k2"}


def test_untracked_append_registers_into_tracked_index(spark, tmp_path):
    """Mixing an untracked (gen-0) append into a registry-keeping index
    must keep the registry COMPLETE: the appended doc is tombstonable."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        append_lsh_index,
        read_lsh_index,
        tombstone_lsh_docs,
        write_lsh_index,
    )

    index = str(tmp_path / "idx")
    write_lsh_index(
        spark.createDataFrame([("k1", LONG_A)], "doc STRING, text STRING"),
        index, "text", "doc",
    )
    append_lsh_index(
        spark.createDataFrame([("k2", LONG_B)], "doc STRING, text STRING"),
        index, "text", "doc",  # untracked
    )
    ids = spark.createDataFrame([("k2",)], "doc STRING")
    assert tombstone_lsh_docs(ids, index) == 1
    live = {r["doc"] for r in read_lsh_index(spark, index).collect()}
    assert live == {"k1"}


def test_lsh_reinsert_after_compaction_crash_window(spark, tmp_path):
    """ADVICE r6 low: stale tombstones surviving a compaction crash
    (swap done, sidecar clear not) must not kill a re-inserted
    fully-deleted doc — the generation computation unions tombstone
    gens."""
    import shutil

    from pymongo_change_stream_reader_spark.operators.dedup import (
        append_lsh_index,
        read_lsh_index,
        tombstone_lsh_docs,
        write_lsh_index,
    )
    from pymongo_change_stream_reader_spark.operators.maintenance import (
        compact_lsh_index,
    )

    index = str(tmp_path / "idx")
    write_lsh_index(
        spark.createDataFrame(
            [("k1", LONG_A), ("k2", LONG_B)], "doc STRING, text STRING"
        ),
        index, "text", "doc",
    )
    ids = spark.createDataFrame([("k1",)], "doc STRING")
    assert tombstone_lsh_docs(ids, index) == 1
    saved = str(tmp_path / "saved_tombstones")
    shutil.copytree(index + "_tombstones", saved)
    compact_lsh_index(spark, index)
    assert not os.path.isdir(index + "_tombstones")
    shutil.copytree(saved, index + "_tombstones")  # the crash window
    append_lsh_index(  # re-insert the fully-deleted doc
        spark.createDataFrame([("k1", LONG_A)], "doc STRING, text STRING"),
        index, "text", "doc", track_generations=True,
    )
    live = {
        (r["doc"], r["gen"])
        for r in read_lsh_index(spark, index).select("doc", "gen")
        .distinct().collect()
    }
    # k1 is LIVE at gen 1 (above the stale (k1, 0) tombstone), not
    # born dead at gen 0
    assert live == {("k1", 1), ("k2", 0)}
