"""Time-series toolkit — spine generation + gap filling (LOCF),
exponentially-weighted moving averages, rolling-window anomaly
scores.

Why this exists at 100 TB: event streams arrive irregular and gappy;
the models downstream (forecasters, anomaly detectors, feature
pipelines) want REGULAR per-key series.  The classic kit is: densify
onto a time spine (one row per (key, bucket) whether or not data
arrived), carry the last observation forward across the gaps, smooth
with an EWMA, and flag points that sit far outside their own rolling
distribution.

Spark-first mechanics:

- the spine is ``sequence()`` over each key's [min, max] bucket range
  exploded JVM-side — no driver-side calendar loop, no UDF; a key
  contributes spine rows proportional to ITS span, so the explode is
  skew-bounded by the window length, not the key count;
- LOCF is ``last(value, ignorenulls=True)`` over a per-key ordered
  window — partitioned, never a global window;
- the EWMA recurrence ``y_t = a*x_t + (1-a)*y_{t-1}`` is inherently
  sequential PER KEY, so it runs as one Arrow-batched
  ``applyInPandas`` kernel per key group (numpy recurrence, state =
  one float; the closed-form window trick ``(1-a)^{-i}`` overflows
  doubles past ~6.5k points so the kernel is the scale-safe choice);
- rolling anomaly z-scores are avg/stddev over a bounded ROWS window
  — partitioned windows again, whole-stage-codegen'd.

Reference parity: the reference engine (a CDC relay) has no
time-series surface; this is training-data-pipeline extension surface
(SURVEY.md §2.D) matching the published TimescaleDB
``time_bucket_gapfill``/``locf`` and pandas ``ewm`` semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "time_bucket",
    "gap_fill_locf",
    "ewma_last",
    "rolling_zscore",
    "sessionize",
    "session_stats",
]


def time_bucket(ts: Column, minutes: int) -> Column:
    """``ts`` truncated down to its ``minutes``-wide bucket (the
    TimescaleDB ``time_bucket`` analog) — pure epoch arithmetic, no
    UDF."""
    secs = minutes * 60
    epoch = ts.cast("timestamp").cast("long")
    return F.timestamp_seconds((epoch - epoch % secs))


def gap_fill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    minutes: int,
) -> DataFrame:
    """Densify ``df`` onto a per-key ``minutes``-bucket spine and
    carry the last observation forward: one row per (key, bucket)
    between THAT key's first and last event, ``filled`` = the bucket's
    own aggregate (avg of values landing in it) when data arrived,
    else the latest earlier bucket's value; ``is_gap`` marks carried
    rows.  Buckets before a key's first observation cannot carry
    anything and do not exist (the spine starts at the key's min).

    Shape: aggregate-to-buckets (hash agg) -> per-key sequence() spine
    (explode, JVM) -> left join spine/buckets co-partitioned on
    (key, bucket) -> LOCF window per key.  Nothing global, no UDFs;
    the explode fan-out per key is bounded by the key's own span."""
    secs = minutes * 60
    bucketed = (
        df.select(
            F.col(key_col).alias("key"),
            time_bucket(F.col(ts_col), minutes).alias("bucket"),
            F.col(value_col).alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(F.avg("v").alias("v"))
    )
    spine = (
        bucketed.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(
                F.sequence(
                    "lo", "hi", F.expr(f"INTERVAL {secs} SECONDS")
                )
            ).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(bucketed, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.last("v", ignorenulls=True).over(w).alias("filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


def ewma_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Final EWMA state per key over the ``ts_col``-ordered values:
    ``y_0 = x_0; y_t = alpha*x_t + (1-alpha)*y_{t-1}`` — (key, n_obs,
    ewma).  Ties on the timestamp break by value (a total order both
    engines can reproduce).

    One ``applyInPandas`` per key group: the recurrence is sequential
    per key but keys are independent, so the shuffle is one hash
    exchange on the key and the kernel holds a single float of state —
    the same cost shape as any grouped aggregation.  (The closed-form
    ``sum a(1-a)^{t-i} x_i`` rewrite runs in pure window arithmetic
    but ``(1-a)^{-i}`` overflows IEEE doubles past ~6.5k points per
    key; the kernel has no such bound.)

    The kernel is deliberately NOT pandas' C ``ewm(adjust=False)``
    path: pandas' accumulation differs from the textbook recurrence
    in rounding (measured: alpha=1/3 over [1.0, 2.0] yields
    1.3333333333333333 from ewm vs 1.3333333333333335 from
    ``a*x + (1-a)*y`` — its normalized update divides by
    ``(1-a)+a``), and the DuckDB oracle (list_reduce) computes the
    textbook form, so the loop stays for bit-identity.  It iterates
    PYTHON floats (``.tolist()``) with the decay factor hoisted —
    same IEEE doubles, ~4x less per-observation overhead than
    iterating boxed numpy scalars.

    The output ``key`` column carries ``df``'s own key dtype (string
    device ids work, not just longs)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    def kern(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["__ts", "__v"], kind="mergesort")
        beta = 1.0 - alpha
        y = None
        for x in pdf["__v"].tolist():
            y = x if y is None else alpha * x + beta * y
        return pd.DataFrame(
            {"key": [pdf["key"].iloc[0]], "n_obs": [len(pdf)], "ewma": [y]}
        )

    prepared = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("__v"),
    )
    out_schema = StructType(
        [
            StructField("key", df.schema[key_col].dataType),
            StructField("n_obs", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    return prepared.groupBy("key").applyInPandas(kern, out_schema)


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_prev: int,
) -> DataFrame:
    """Per-key rolling anomaly score: each row's z-score against the
    mean/stddev of its ``n_prev`` PRECEDING rows (the row itself
    excluded — a self-including window dilutes the very spike it
    should flag).  Rows without a full lookback emit NULL (a 2-row
    history is not a distribution).  Output: (key, ts, value, zscore).

    Pure partitioned ROWS windows — bounded state per key, codegen'd,
    nothing global."""
    w = (
        Window.partitionBy("key")
        .orderBy("ts", "value")
        .rowsBetween(-n_prev, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    cnt = F.count("value").over(w)
    return (
        df.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
        .select(
            "key",
            "ts",
            "value",
            F.when(
                (cnt == n_prev) & (sd > 0),
                (F.col("value") - mu) / sd,
            ).alias("zscore"),
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: list[str] | None = None,
    session_col: str = "session",
) -> DataFrame:
    """Gap-based sessionization: assign every row a per-key session
    ordinal (1-based) where a new session starts when the time since
    the key's PREVIOUS event exceeds ``gap_seconds`` — the batch
    analogue of the streaming session window, and the standard
    clickstream/log primitive.

    Two partitioned ROWS windows (a lag for the gap test, a running
    sum for the ordinal) over (ts, tiebreak) — bounded per-key state,
    codegen'd, nothing global; at 100 TB this is one hash exchange on
    the key.  Pass ``tiebreak_cols`` (e.g. an event id) when
    timestamps can tie — the session SPLIT is tie-insensitive (equal
    timestamps have gap 0) but downstream per-row ordering should be
    total.  Comparison is on exact microseconds (``unix_micros``)."""
    tb = [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), *tb)
    # TIMESTAMP_NTZ needs the explicit timestamp cast before
    # unix_micros (parquet NANOS tables land as NTZ)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull()
        | ((us - prev) > F.lit(int(round(gap_seconds * 1_000_000)))),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, F.sum(new_session).over(running).cast("long")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: float,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session summary on top of :func:`sessionize`: (key,
    session, n_events, start_ts, end_ts, duration_us) — one hash
    aggregation after the sessionize windows; duration is an exact
    microsecond integer (no float normalization concerns)."""
    s = sessionize(df, key_col, ts_col, gap_seconds, tiebreak_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return s.groupBy(F.col(key_col), F.col("session")).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )
