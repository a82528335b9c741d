"""Time-series operators (operators/timeseries.py): spine/LOCF
semantics, the EWMA recurrence, rolling z-score window edges."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.timeseries import (
    ewma_last,
    gap_fill_locf,
    rolling_zscore,
    time_bucket,
)


def _ts_df(spark, rows):
    return spark.createDataFrame(
        rows, "key LONG, ts STRING, v DOUBLE"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")


def test_gap_fill_densifies_and_carries(spark):
    df = _ts_df(
        spark,
        [
            (1, "2024-01-01 00:10:00", 10.0),
            (1, "2024-01-01 00:50:00", 20.0),  # same hour: avg 15
            (1, "2024-01-01 03:05:00", 40.0),  # 2 gap hours before
            (2, "2024-01-01 05:00:00", 7.0),  # single-point key
        ],
    )
    out = {
        (r["key"], r["bucket"].isoformat()): (r["filled"], r["is_gap"])
        for r in gap_fill_locf(df, "key", "ts", "v", minutes=60).collect()
    }
    assert len(out) == 5  # key1 hours 00..03 (4 rows) + key2's one
    assert out[(1, "2024-01-01T00:00:00")] == (15.0, False)
    assert out[(1, "2024-01-01T01:00:00")] == (15.0, True)
    assert out[(1, "2024-01-01T02:00:00")] == (15.0, True)
    assert out[(1, "2024-01-01T03:00:00")] == (40.0, False)
    assert out[(2, "2024-01-01T05:00:00")] == (7.0, False)


def test_gap_fill_window_is_partitioned(spark):
    df = _ts_df(spark, [(1, "2024-01-01 00:00:00", 1.0)])
    plan = (
        gap_fill_locf(df, "key", "ts", "v", minutes=60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "partitionBy=[]" not in plan  # never a global window


def test_time_bucket_truncates_to_epoch_multiple(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:44:59",)], "ts STRING"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    got = df.select(
        time_bucket(F.col("ts"), 15).cast("string").alias("b")
    ).first()["b"]
    assert got == "2024-01-01 00:30:00"


def test_ewma_matches_pandas_ewm(spark):
    import pandas as pd

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [
        (1, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)
    ]
    out = ewma_last(_ts_df(spark, rows), "key", "ts", "v", alpha=0.3).first()
    expect = (
        pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().iloc[-1]
    )
    assert out["n_obs"] == len(vals)
    assert math.isclose(out["ewma"], expect, rel_tol=1e-12)


def test_ewma_keys_are_independent(spark):
    rows = [(k, f"2024-01-01 00:0{i}:00", float(k * 10 + i)) for k in (1, 2) for i in range(3)]
    out = {r["key"]: r["ewma"] for r in ewma_last(_ts_df(spark, rows), "key", "ts", "v", alpha=0.5).collect()}
    # y = ((x0/2 + x1/2)/... manual: y0=x0; y1=.5x1+.5y0; y2=.5x2+.5y1
    assert out[1] == 0.5 * 12 + 0.5 * (0.5 * 11 + 0.5 * 10)
    assert out[2] == 0.5 * 22 + 0.5 * (0.5 * 21 + 0.5 * 20)


def test_rolling_zscore_excludes_self_and_partials(spark):
    rows = [
        (1, f"2024-01-01 00:0{i}:00", v)
        for i, v in enumerate([10.0, 10.0, 10.0, 22.0])
    ]
    out = rolling_zscore(_ts_df(spark, rows), "key", "ts", "v", n_prev=3)
    got = [r["zscore"] for r in out.orderBy("ts").collect()]
    # first three rows lack a full 3-row lookback -> NULL; the spike's
    # lookback is constant (sd=0) -> NULL too
    assert got == [None, None, None, None]
    rows.append((1, "2024-01-01 00:04:00", 16.0))
    out2 = rolling_zscore(_ts_df(spark, rows), "key", "ts", "v", n_prev=3)
    z = out2.orderBy("ts").collect()[-1]["zscore"]
    # lookback [10, 10, 22]: mu=14, sd=sqrt(48); z=(16-14)/sd
    assert math.isclose(z, 2.0 / math.sqrt(48.0), rel_tol=1e-12)


def test_ewma_string_key_dtype(spark):
    # the output schema derives the key dtype from the input (string
    # device ids, not just longs)
    rows = [
        ("dev-a", "2024-01-01 00:00:00", 1.0),
        ("dev-a", "2024-01-01 00:01:00", 2.0),
        ("dev-b", "2024-01-01 00:00:00", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "key STRING, ts STRING, v DOUBLE"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {
        r["key"]: (r["n_obs"], r["ewma"])
        for r in ewma_last(df, "key", "ts", "v", alpha=0.5).collect()
    }
    assert out == {"dev-a": (2, 0.5 * 2.0 + 0.5 * 1.0), "dev-b": (1, 5.0)}


def test_sessionize_gap_splits_and_ordinals(spark):
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        session_stats,
        sessionize,
    )

    rows = [
        (1, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 2),   # 10 min: same session
        (1, "2024-01-01 01:00:00", 3),   # 50 min gap: new session
        (1, "2024-01-01 01:30:00", 4),   # exactly the 30-min gap: SAME
        (2, "2024-01-01 00:00:00", 5),   # other key: own session space
    ]
    df = spark.createDataFrame(
        rows, "key LONG, ts STRING, eid LONG"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"), "eid")
    out = {
        (r["key"], r["eid"]): r["session"]
        for r in sessionize(
            df, "key", "ts", 1800, tiebreak_cols=["eid"]
        ).collect()
    }
    assert out == {
        (1, 1): 1, (1, 2): 1, (1, 3): 2, (1, 4): 2, (2, 5): 1
    }
    st = {
        (r["key"], r["session"]): (r["n_events"], r["duration_us"])
        for r in session_stats(
            df, "key", "ts", 1800, tiebreak_cols=["eid"]
        ).collect()
    }
    assert st == {
        (1, 1): (2, 600 * 1_000_000),
        (1, 2): (2, 1800 * 1_000_000),
        (2, 1): (1, 0),
    }


def test_sessionize_window_is_partitioned(spark):
    from pymongo_change_stream_reader_spark.operators.timeseries import (
        sessionize,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "key LONG, ts STRING"
    ).select("key", F.col("ts").cast("timestamp").alias("ts"))
    plan = (
        sessionize(df, "key", "ts", 60)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # every window spec carries the key partition — no global window
    assert "Window" in plan
    assert re.search(r"windowspecdefinition\(key#", plan)
    assert not re.search(r"windowspecdefinition\((?!key#)", plan)
