"""Data-quality auditing — Deequ-style single-pass checks over big
tables: column profiles, declarative constraint suites, referential
orphan counts, freshness lag.

Why this exists at 100 TB: a curation pipeline that feeds a training
run has to VALIDATE its inputs (null-rate drift, key uniqueness,
broken foreign keys, stale partitions) without paying one scan per
check — the whole point of the aggregated-audit design (published as
Amazon Deequ / Great Expectations' aggregate path) is that an
arbitrary number of declarative checks compiles into ONE aggregation
job: one table scan, map-side partial aggregation, a result set of
|checks| rows on the driver.

Spark-first mechanics:

- every check is an ordinary Column expression folded into a single
  ``df.agg(...)`` — whole-stage-codegen'd, no UDFs, no per-check scan;
- exact distinct counts use Spark's multi-count-distinct planning
  (one scan; the Expand operator replicates rows once per distinct
  aggregate before partial aggregation — documented cost knob), and
  ``exact=False`` swaps them for ``approx_count_distinct`` (HLL
  partials, no Expand) for profile-at-scale runs;
- referential checks are LEFT ANTI joins, broadcast when the parent
  side is dimension-sized;
- the wide one-row aggregate unpivots to the long (metric, value)
  audit shape with ``stack`` — pure projection, no shuffle.

Reference parity: the reference engine (a CDC relay,
pymongo_change_stream_reader/change_stream_reading/watch.py) has no
validation surface; this is training-data-pipeline extension surface
(SURVEY.md §2.D).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "profile_columns",
    "Check",
    "constraint_audit",
    "referential_orphans",
    "freshness_lag",
]


# NOTE on SQL-text seams: user-supplied names must never be
# interpolated into SQL strings — quoting helpers are ambiguous
# across spark.sql.parser.escapedStringLiterals modes (a trailing
# backslash can swallow the closing quote).  Every call site here
# rides the column API instead (F.stack + F.lit), which never
# touches the parser; keep it that way for new checks.


def profile_columns(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """Per-column profile of ``cols`` in ONE scan: (column, n_rows,
    n_nulls, n_distinct, completeness) — long format, one row per
    column, ordered by column name.

    ``exact=True`` uses COUNT(DISTINCT c) (one scan via Expand —
    |cols| distinct aggregates replicate each row |cols| times into
    the partial aggregation; exact, oracle-comparable).
    ``exact=False`` uses approx_count_distinct (HLL partials, no
    Expand) — the 100 TB default where a ±2% distinct estimate is
    fine.  ``completeness`` = non-null fraction, rounded to 6."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    dcount = F.count_distinct if exact else F.approx_count_distinct
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(dcount(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    # column-API stack (no SQL interpolation: names ride F.lit, so no
    # quoting/escaping and no parser-mode sensitivity)
    stack_cols: list[Column] = []
    for c in cols:
        stack_cols += [F.lit(c), F.col(f"__nn_{c}"), F.col(f"__nd_{c}")]
    return (
        wide.select(
            F.col("__rows"),
            F.stack(F.lit(len(cols)), *stack_cols).alias(
                "column", "__nn", "n_distinct"
            ),
        )
        .select(
            F.col("column"),
            F.col("__rows").alias("n_rows"),
            (F.col("__rows") - F.col("__nn")).alias("n_nulls"),
            F.col("n_distinct"),
            F.round(F.col("__nn") / F.col("__rows"), 6).alias(
                "completeness"
            ),
        )
        .orderBy("column")
    )


@dataclass(frozen=True)
class Check:
    """One declarative constraint: ``cond`` must hold on every row
    where ``where`` (optional scope predicate) holds."""

    name: str
    cond: Column
    where: Column | None = None


def constraint_audit(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every ``Check`` in ONE aggregation pass: (rule,
    checked, violations, pass_ratio) per check, ordered by rule.

    Each check folds to two conditional counts in the same ``agg`` —
    adding a check adds two expressions to the map-side partials, not
    a scan.  ``pass_ratio`` = 1 - violations/checked, rounded to 6
    (1.0 when the scope is empty — an empty scope violates nothing)."""
    aggs: list[Column] = []
    for i, ck in enumerate(checks):
        scope = ck.where if ck.where is not None else F.lit(True)
        aggs.append(
            F.sum(F.when(scope, 1).otherwise(0)).alias(f"__chk_{i}")
        )
        aggs.append(
            F.sum(
                F.when(scope & ~ck.cond, 1).otherwise(0)
            ).alias(f"__bad_{i}")
        )
    wide = df.agg(*aggs)
    stack_cols: list[Column] = []
    for i, ck in enumerate(checks):
        stack_cols += [
            F.lit(ck.name), F.col(f"__chk_{i}"), F.col(f"__bad_{i}")
        ]
    return (
        wide.select(
            F.stack(F.lit(len(checks)), *stack_cols).alias(
                "rule", "checked", "violations"
            )
        )
        .select(
            "rule",
            "checked",
            "violations",
            F.round(
                F.when(F.col("checked") == 0, F.lit(1.0)).otherwise(
                    1.0 - F.col("violations") / F.col("checked")
                ),
                6,
            ).alias("pass_ratio"),
        )
        .orderBy("rule")
    )


def referential_orphans(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key audit: for each (name, child, fk_col, parent,
    pk_col) count child rows whose fk has NO parent row — one LEFT
    ANTI join per relation, unioned into (relation, orphans).

    The anti join broadcasts when the parent is dimension-sized
    (Spark's planner picks that from stats; all TPC-H parents here
    qualify); a fact-sized parent falls back to a shuffled anti join
    on the key — still one pass per side.  NULL fks are not orphans
    (SQL FK semantics: a null reference is absent, not dangling)."""
    parts: list[DataFrame] = []
    for name, child, fk, parent, pk in relations:
        orphans = (
            child.select(F.col(fk).alias("__fk"))
            .filter(F.col("__fk").isNotNull())
            .join(
                parent.select(F.col(pk).alias("__fk")),
                "__fk",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(name).alias("relation"), "orphans")
        )
        parts.append(orphans)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")


def freshness_lag(
    df: DataFrame, ts_col: str, group_col: str
) -> DataFrame:
    """Per-group freshness: (group, last_ts, lag_hours) where
    ``lag_hours`` is each group's distance (rounded to 4) behind the
    table-wide max timestamp — the "which partition stopped updating"
    audit.  One hash aggregation + one broadcast of the single-row
    global max; no windows."""
    per_group = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.max(ts_col).alias("last_ts")
    )
    global_max = df.agg(F.max(ts_col).alias("__gmax"))
    return (
        per_group.crossJoin(F.broadcast(global_max))
        .select(
            "grp",
            "last_ts",
            F.round(
                (
                    F.col("__gmax").cast("timestamp").cast("double")
                    - F.col("last_ts").cast("timestamp").cast("double")
                )
                / 3600.0,
                4,
            ).alias("lag_hours"),
        )
        .orderBy("grp")
    )
