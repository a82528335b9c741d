"""Prefix-commit state machine tests — the same scenarios the
reference exercises on its ProcessCommitEvent
(tests/test_commit_flow/test_process_commit_event.py: confirm/
unconfirm orderings, token merge, contiguous-prefix extraction,
clear-after-commit), plus the streaming integration."""

from __future__ import annotations

import json

from pymongo_change_stream_reader_spark.streaming.commit_state import (
    CommitLedger,
    commit_stream,
)


def test_heartbeats_commit_immediately():
    led = CommitLedger()
    led.observe(1, False, "t1")
    led.observe(2, False, "t2")
    assert led.committable() == (2, "t2", 2)
    assert led.pending == {}


def test_data_events_wait_for_ack():
    led = CommitLedger()
    led.observe(1, True, "t1")  # reader record: needs producer ack
    assert led.committable() == (0, None, 0)
    led.observe(1, False, None)  # producer ack (no token)
    assert led.committable() == (1, "t1", 1)


def test_ack_before_reader_record():
    led = CommitLedger()
    led.observe(1, False, None)  # ack arrives first
    led.observe(1, True, "t1")  # then the reader record with the token
    assert led.committable() == (1, "t1", 1)


def test_prefix_blocks_on_gap():
    led = CommitLedger()
    led.observe(1, False, "t1")
    led.observe(3, False, "t3")  # 2 missing
    assert led.committable() == (1, "t1", 1)
    led.observe(2, True, "t2")
    led.observe(2, False, None)
    # now 2..3 contiguous; last token of the prefix is t3
    assert led.committable() == (3, "t3", 2)


def test_token_merge_prefers_newest_nonnull():
    led = CommitLedger()
    led.observe(1, True, None)  # reader record without token
    led.observe(1, False, None)  # ack
    led.observe(2, False, "t2")
    assert led.committable() == (2, "t2", 2)


def test_streaming_integration(spark, tmp_path):
    """commit events streamed in -> one committed-prefix row per
    trigger via applyInPandasWithState."""
    rows = [
        {"stream_id": "r1", "count": 1, "need_confirm": False, "resume_token": "t1"},
        {"stream_id": "r1", "count": 2, "need_confirm": True, "resume_token": "t2"},
        {"stream_id": "r1", "count": 2, "need_confirm": False, "resume_token": None},
        {"stream_id": "r1", "count": 4, "need_confirm": False, "resume_token": "t4"},
        {"stream_id": "r2", "count": 1, "need_confirm": False, "resume_token": "s1"},
    ]
    src = tmp_path / "commits"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(
        "stream_id STRING, count BIGINT, need_confirm BOOLEAN, resume_token STRING"
    ).json(str(src))
    q = (
        commit_stream(stream)
        .writeStream.format("memory")
        .queryName("commit_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()

        out = {
            r["stream_id"]: (r["committed_through"], r["resume_token"], r["n_committed"])
            for r in spark.sql("SELECT * FROM commit_out").collect()
        }
        # r1: 1..2 commit (count 4 blocked by missing 3); r2: 1 commits
        assert out == {"r1": (2, "t2", 2), "r2": (1, "s1", 1)}

        # second trigger: count 3 arrives confirmed -> prefix 3..4
        with open(src / "b1.json", "w") as f:
            f.write(
                json.dumps(
                    {
                        "stream_id": "r1",
                        "count": 3,
                        "need_confirm": False,
                        "resume_token": "t3",
                    }
                )
                + "\n"
            )
        q.processAllAvailable()
        r1 = [
            (r["committed_through"], r["resume_token"], r["n_committed"])
            for r in spark.sql(
                "SELECT * FROM commit_out WHERE stream_id = 'r1'"
            ).collect()
        ]
        assert (4, "t4", 2) in r1
    finally:
        q.stop()


def test_streaming_integration_transform_with_state(spark, tmp_path):
    """The transformWithStateInPandas form commits the identical
    prefixes as the applyInPandasWithState form (RocksDB provider
    required by the API).  The TWS state server speaks protobuf to the
    Python worker, so the test skips where protobuf is absent (the
    operator's fold logic is the shared CommitLedger, covered above)."""
    import pytest

    pytest.importorskip("google.protobuf")
    from pymongo_change_stream_reader_spark.streaming.commit_state import (
        commit_stream_tws,
    )

    rows = [
        {"stream_id": "r1", "count": 1, "need_confirm": False, "resume_token": "t1"},
        {"stream_id": "r1", "count": 2, "need_confirm": True, "resume_token": "t2"},
        {"stream_id": "r1", "count": 2, "need_confirm": False, "resume_token": None},
        {"stream_id": "r1", "count": 4, "need_confirm": False, "resume_token": "t4"},
        {"stream_id": "r2", "count": 1, "need_confirm": False, "resume_token": "s1"},
    ]
    src = tmp_path / "commits"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(
            "stream_id STRING, count BIGINT, need_confirm BOOLEAN, resume_token STRING"
        ).json(str(src))
        q = (
            commit_stream_tws(stream)
            .writeStream.format("memory")
            .queryName("commit_out_tws")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_tws"))
            .start()
        )
        try:
            q.processAllAvailable()
            out = {
                r["stream_id"]: (
                    r["committed_through"],
                    r["resume_token"],
                    r["n_committed"],
                )
                for r in spark.sql("SELECT * FROM commit_out_tws").collect()
            }
            assert out == {"r1": (2, "t2", 2), "r2": (1, "s1", 1)}

            with open(src / "b1.json", "w") as f:
                f.write(
                    json.dumps(
                        {
                            "stream_id": "r1",
                            "count": 3,
                            "need_confirm": False,
                            "resume_token": "t3",
                        }
                    )
                    + "\n"
                )
            q.processAllAvailable()
            r1 = [
                (r["committed_through"], r["resume_token"], r["n_committed"])
                for r in spark.sql(
                    "SELECT * FROM commit_out_tws WHERE stream_id = 'r1'"
                ).collect()
            ]
            assert (4, "t4", 2) in r1
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
