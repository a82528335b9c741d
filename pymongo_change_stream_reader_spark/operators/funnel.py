"""Funnel analysis — ordered multi-step conversion over an event
stream: for each user, the earliest time they completed step 1, then
step 2 STRICTLY AFTER their step 1, then step 3 after that, ...,
optionally bounded to a window after the funnel's start (the classic
product-analytics funnel; the SQL analog of MATCH_RECOGNIZE's
``A+ B+ C+`` over per-user ordered rows).

Spark-first mechanics: each step is one filtered aggregation joined to
the previous step's per-user frontier —

    s1 = min ts of step-1 events per user
    s_k = min ts of step-k events per user with ts > s_{k-1}
          (and ts <= s_1 + window, when bounded)

The step frames are |users-still-in-funnel| rows (monotonically
shrinking), so every join after the first is an equi-join of the
EVENT table against a user-keyed frame — AQE upgrades those to
broadcast at runtime from the frontier's ACTUAL post-aggregation size
(a static broadcast hint would be wrong at a billion users) — and the
whole funnel is k filtered scans + k hash aggregations, each step's
type-equality pushed into the parquet reader; no windows, no per-user
sorting, no UDFs.  A per-user ``applyInPandas``
pass would touch every event column-at-a-time through Arrow; this
shape keeps everything JVM-side and lets predicate pushdown drop
non-step events at the scan.

Reference parity: the reference engine (a CDC relay) has no analytics
surface; this is training-data-pipeline extension surface
(SURVEY.md §2.D).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_steps", "funnel_conversion", "cohort_retention"]


def funnel_steps(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_hours: float | None = None,
) -> DataFrame:
    """Per-user funnel frontier: (user, step_1_ts, ..., step_k_ts)
    for every user who completed step 1; later columns are NULL once
    the user drops out.  Step k counts only events STRICTLY after the
    user's step k-1 time (ties do not advance a funnel — the same
    click cannot be both steps), and, when ``within_hours`` is set,
    no later than step 1's time + the window."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    )
    cur = (
        ev.filter(F.col("etype") == steps[0])
        .groupBy("user")
        .agg(F.min("ts").alias("step_1_ts"))
    )
    if within_hours is not None:
        secs = int(within_hours * 3600)
        cur = cur.withColumn(
            "__deadline",
            F.col("step_1_ts") + F.expr(f"INTERVAL {secs} SECONDS"),
        )
    for k, step in enumerate(steps[1:], start=2):
        prev_col = f"step_{k - 1}_ts"
        cond = F.col("ts") > F.col(prev_col)
        if within_hours is not None:
            cond = cond & (F.col("ts") <= F.col("__deadline"))
        nxt = (
            ev.filter(F.col("etype") == step)
            .join(cur, "user")
            .filter(cond)
            .groupBy("user")
            .agg(F.min("ts").alias(f"step_{k}_ts"))
        )
        cur = cur.join(nxt, "user", "left")
    return cur.drop("__deadline")


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_hours: float | None = None,
) -> DataFrame:
    """Funnel summary: one row per step — (step, event_type, users,
    conversion) where ``users`` counts users whose frontier reached
    the step and ``conversion`` = users / step-1 users (rounded to
    6).  One count aggregate over the |users| frontier frame."""
    frontier = funnel_steps(
        events, user_col, ts_col, type_col, steps, within_hours
    )
    counts = frontier.agg(
        *[
            F.count(F.col(f"step_{k}_ts")).alias(f"__c{k}")
            for k in range(1, len(steps) + 1)
        ]
    )
    # column-API stack: step names ride F.lit, so no SQL quoting and
    # no parser-mode (escapedStringLiterals) sensitivity
    stack_cols = []
    for k, step in enumerate(steps, start=1):
        stack_cols += [F.lit(k), F.lit(step), F.col(f"__c{k}")]
    return (
        counts.select(
            F.col("__c1"),
            F.stack(F.lit(len(steps)), *stack_cols).alias(
                "step", "event_type", "users"
            ),
        )
        .select(
            "step",
            "event_type",
            "users",
            F.round(
                F.when(F.col("__c1") == 0, F.lit(0.0)).otherwise(
                    F.col("users") / F.col("__c1")
                ),
                6,
            ).alias("conversion"),
        )
        .orderBy("step")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort-retention matrix (long form): users cohort by
    the ISO week of their FIRST event; for every (cohort_week,
    week_offset) count the cohort's users active that week and the
    retention ratio vs the cohort's size (its week-0 count — every
    user is active in their own first week by construction).

    Shape: one min-aggregation for first events, one distinct over
    (user, week) — both hash aggregations on user-keyed shuffles —
    then a user-keyed join and a count per (cohort, offset); the
    offset-0 row count IS the cohort size, joined back broadcast
    (|cohorts| rows).  Output: (cohort_week, week_offset,
    active_users, retention)."""
    ev = events.select(
        F.col(user_col).alias("user"), F.col(ts_col).alias("ts")
    )
    cohorts = (
        ev.groupBy("user")
        .agg(F.min("ts").alias("first_ts"))
        .select(
            "user",
            F.date_trunc("week", "first_ts").cast("date").alias(
                "cohort_week"
            ),
        )
    )
    active = ev.select(
        "user", F.date_trunc("week", "ts").cast("date").alias("act_week")
    ).distinct()
    counts = (
        active.join(cohorts, "user")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    base = counts.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("active_users").alias("__size")
    )
    return (
        counts.join(F.broadcast(base), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            F.round(F.col("active_users") / F.col("__size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_week", "week_offset")
    )
