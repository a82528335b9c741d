"""Funnel operators (operators/funnel.py): ordering strictness, the
conversion window, dropouts, and the broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.funnel import (
    funnel_conversion,
    funnel_steps,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user LONG, ts STRING, etype STRING"
    ).select("user", F.col("ts").cast("timestamp").alias("ts"), "etype")


def test_funnel_requires_strict_order(spark):
    df = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 01:00:00", "b"),  # completes
            (2, "2024-01-01 01:00:00", "b"),  # b BEFORE a: no funnel
            (2, "2024-01-01 02:00:00", "a"),
            (3, "2024-01-01 00:00:00", "a"),
            (3, "2024-01-01 00:00:00", "b"),  # tie does not advance
        ],
    )
    out = {
        r["user"]: (r["step_1_ts"], r["step_2_ts"])
        for r in funnel_steps(df, "user", "ts", "etype", ["a", "b"]).collect()
    }
    assert out[1][1] is not None
    assert out[2][1] is None  # step-2 event predates step 1
    assert out[3][1] is None  # equal timestamps: strictly-after fails
    assert 2 in out and 3 in out  # step-1 completion keeps them


def test_funnel_window_measured_from_step_one(spark):
    df = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 01:00:00", "b"),
            (1, "2024-01-01 05:00:00", "c"),  # 5h after a: outside 4h
            (2, "2024-01-01 00:00:00", "a"),
            (2, "2024-01-01 01:00:00", "b"),
            (2, "2024-01-01 03:00:00", "c"),  # inside
        ],
    )
    out = {
        r["user"]: r["step_3_ts"]
        for r in funnel_steps(
            df, "user", "ts", "etype", ["a", "b", "c"], within_hours=4
        ).collect()
    }
    assert out[1] is None
    assert out[2] is not None


def test_funnel_picks_earliest_valid_step_event(spark):
    df = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", "a"),
            (1, "2024-01-01 00:30:00", "b"),
            (1, "2024-01-01 02:00:00", "b"),  # later duplicate ignored
        ],
    )
    row = funnel_steps(df, "user", "ts", "etype", ["a", "b"]).first()
    assert row["step_2_ts"].isoformat() == "2024-01-01T00:30:00"


def test_funnel_conversion_counts_and_ratios(spark):
    rows = []
    for u in range(10):
        rows.append((u, "2024-01-01 00:00:00", "a"))
    for u in range(6):
        rows.append((u, "2024-01-01 01:00:00", "b"))
    for u in range(3):
        rows.append((u, "2024-01-01 02:00:00", "c"))
    out = funnel_conversion(
        _ev(spark, rows), "user", "ts", "etype", ["a", "b", "c"]
    ).collect()
    assert [(r["step"], r["event_type"], r["users"], r["conversion"]) for r in out] == [
        (1, "a", 10, 1.0),
        (2, "b", 6, 0.6),
        (3, "c", 3, 0.3),
    ]


def test_funnel_plan_pushes_step_filters_no_cartesian(spark, tmp_path):
    # parquet-backed so PushedFilters is observable: each step's
    # event-type equality must reach the scan (non-step events drop
    # at the reader), and the join graph is all equi-joins (AQE
    # upgrades the user-keyed ones to broadcast at runtime from the
    # frontier's real size — never a cartesian)
    path = str(tmp_path / "ev")
    _ev(spark, [(1, "2024-01-01 00:00:00", "a")]).write.parquet(path)
    plan = (
        funnel_steps(
            spark.read.parquet(path), "user", "ts", "etype", ["a", "b", "c"]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    for step in ("a", "b", "c"):
        assert f"EqualTo(etype,{step})" in plan  # pushed to the scan


def test_cohort_retention_matrix(spark):
    from pymongo_change_stream_reader_spark.operators.funnel import (
        cohort_retention,
    )

    # 2024-01-01 is a Monday: weeks are [01-01, 01-08, 01-15)
    rows = [
        (1, "2024-01-02 10:00:00"),  # cohort w0
        (1, "2024-01-09 10:00:00"),  # active w1
        (1, "2024-01-16 10:00:00"),  # active w2
        (2, "2024-01-03 10:00:00"),  # cohort w0
        (2, "2024-01-03 11:00:00"),  # same week: one active row
        (3, "2024-01-10 10:00:00"),  # cohort w1
        (3, "2024-01-16 10:00:00"),  # active at its offset 1
    ]
    df = spark.createDataFrame(rows, "u LONG, ts STRING").select(
        "u", F.col("ts").cast("timestamp").alias("ts")
    )
    out = {
        (r["cohort_week"].isoformat(), r["week_offset"]): (
            r["active_users"],
            r["retention"],
        )
        for r in cohort_retention(df, "u", "ts").collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-01", 2)] == (1, 0.5)
    assert out[("2024-01-08", 0)] == (1, 1.0)
    assert out[("2024-01-08", 1)] == (1, 1.0)
    assert len(out) == 5


def test_funnel_step_names_with_quotes(spark):
    # step names are user data: a quote must not break (or inject
    # into) the stack() SQL the conversion summary builds
    df = _ev(
        spark,
        [
            (1, "2024-01-01 00:00:00", "sign'up"),
            (1, "2024-01-01 01:00:00", "buy"),
            (2, "2024-01-01 00:00:00", "sign'up"),
        ],
    )
    out = funnel_conversion(df, "user", "ts", "etype", ["sign'up", "buy"]).collect()
    assert [(r["step"], r["event_type"], r["users"]) for r in out] == [
        (1, "sign'up", 2),
        (2, "buy", 1),
    ]
