"""Data-quality audit queries (operators/dataquality.py): the
Deequ-style "many checks, one scan" surface a 100 TB curation
pipeline runs before it trusts its inputs.

Every query here compiles its whole check suite into a single
aggregation job (profile + constraint audits) or one anti-join per
declared relation (referential audit) — the oracle spells the same
metrics out as one UNION ALL branch per check, which is exactly the
per-check-scan shape the aggregated audit exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

_PROFILE_COLS = [
    "l_discount",
    "l_orderkey",
    "l_quantity",
    "l_returnflag",
    "l_shipdate",
]

_PROFILE_BRANCH = """
    SELECT '{c}' AS "column",
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           ROUND(CAST(COUNT({c}) AS DOUBLE) / COUNT(*), 6)
               AS completeness
    FROM lineitem
"""


@query(
    "dq_profile_columns",
    oracle=" UNION ALL ".join(
        _PROFILE_BRANCH.format(c=c) for c in _PROFILE_COLS
    )
    + ' ORDER BY "column"',
    doc="Single-pass column profile of lineitem (null counts, exact "
    "distinct counts, completeness) — operators/dataquality.py:"
    "profile_columns folds every column's metrics into ONE "
    "aggregation (multi-count-distinct planned via Expand), where "
    "the oracle pays one scan per column.",
    tags=("dq",),
)
def dq_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one scan; |cols| distinct aggregates share it through
    the Expand operator (rows replicate x|cols| into map-side partial
    aggs — the documented exact-distinct cost); exact=False swaps in
    HLL partials with no Expand for the estimate-is-fine audit."""
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        profile_columns,
    )

    li = load_table(spark, sf_dir, "lineitem")
    return profile_columns(li, _PROFILE_COLS, exact=True)


_AUDIT_RULES = [
    # (rule, scope SQL, condition SQL) — mirrored in the Spark checks
    ("discount_range", "TRUE", "l_discount BETWEEN 0 AND 0.1"),
    ("price_positive", "TRUE", "l_extendedprice > 0"),
    ("qty_bounds", "TRUE", "l_quantity BETWEEN 1 AND 50"),
    (
        "returned_flag_domain",
        "TRUE",
        "l_returnflag IN ('A', 'N', 'R')",
    ),
    (
        "finished_have_shipdate",
        "l_linestatus = 'F'",
        "l_shipdate IS NOT NULL",
    ),
]

_AUDIT_BRANCH = """
    SELECT '{name}' AS rule,
           SUM(CASE WHEN {scope} THEN 1 ELSE 0 END) AS checked,
           SUM(CASE WHEN ({scope}) AND NOT ({cond}) THEN 1 ELSE 0 END)
               AS violations,
           ROUND(CASE WHEN SUM(CASE WHEN {scope} THEN 1 ELSE 0 END) = 0
                      THEN 1.0
                      ELSE 1.0
                           - CAST(SUM(CASE WHEN ({scope}) AND NOT ({cond})
                                           THEN 1 ELSE 0 END) AS DOUBLE)
                           / SUM(CASE WHEN {scope} THEN 1 ELSE 0 END)
                 END, 6) AS pass_ratio
    FROM lineitem
"""


@query(
    "dq_constraint_audit",
    oracle=" UNION ALL ".join(
        _AUDIT_BRANCH.format(name=n, scope=s, cond=c)
        for n, s, c in _AUDIT_RULES
    )
    + " ORDER BY rule",
    doc="Declarative constraint suite over lineitem (domain, range, "
    "scoped not-null rules) evaluated in ONE aggregation pass — "
    "operators/dataquality.py:constraint_audit; each rule is two "
    "conditional counts in the same agg, so adding a rule adds two "
    "codegen'd expressions, never a scan.",
    tags=("dq",),
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        Check,
        constraint_audit,
    )

    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        Check("discount_range", F.col("l_discount").between(0, 0.1)),
        Check("price_positive", F.col("l_extendedprice") > 0),
        Check("qty_bounds", F.col("l_quantity").between(1, 50)),
        Check(
            "returned_flag_domain",
            F.col("l_returnflag").isin("A", "N", "R"),
        ),
        Check(
            "finished_have_shipdate",
            F.col("l_shipdate").isNotNull(),
            where=F.col("l_linestatus") == "F",
        ),
    ]
    return constraint_audit(li, checks)


_FK_RELATIONS = [
    # (name, child table, fk, parent table, pk)
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
]

_FK_BRANCH = """
    SELECT '{name}' AS relation, COUNT(*) AS orphans
    FROM {child} c
    WHERE c.{fk} IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})
"""


@query(
    "dq_referential_orphans",
    oracle=" UNION ALL ".join(
        _FK_BRANCH.format(name=n, child=ch, fk=fk, parent=pa, pk=pk)
        for n, ch, fk, pa, pk in _FK_RELATIONS
    )
    + " ORDER BY relation",
    doc="Foreign-key audit across the whole star schema: orphan "
    "counts for all 7 FK edges via LEFT ANTI joins "
    "(operators/dataquality.py:referential_orphans) — parents are "
    "dimension-sized so every anti join broadcasts; the oracle "
    "spells each edge as a NOT EXISTS scan.",
    tags=("dq",),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        referential_orphans,
    )

    t = {
        name: load_table(spark, sf_dir, name)
        for name in (
            "customer",
            "lineitem",
            "nation",
            "orders",
            "part",
            "region",
            "supplier",
        )
    }
    return referential_orphans(
        [
            (n, t[ch], fk, t[pa], pk)
            for n, ch, fk, pa, pk in _FK_RELATIONS
        ]
    )


@query(
    "dq_freshness_by_type",
    oracle="""
    WITH per_type AS (
        SELECT event_type, MAX(ts) AS last_ts
        FROM events GROUP BY event_type
    ),
    gmax AS (SELECT MAX(ts) AS g FROM events)
    SELECT event_type,
           last_ts,
           ROUND((EPOCH(g) - EPOCH(last_ts)) / 3600.0, 4) AS lag_hours
    FROM per_type, gmax
    ORDER BY event_type
    """,
    doc="Freshness audit of the events stream: per-event-type last "
    "timestamp and its lag (hours) behind the table-wide max — "
    "operators/dataquality.py:freshness_lag; one hash aggregation "
    "plus a broadcast single-row global max, no windows.",
    tags=("dq",),
)
def dq_freshness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        freshness_lag,
    )

    ev = load_table(spark, sf_dir, "events")
    return freshness_lag(ev, "ts", "event_type").select(
        F.col("grp").alias("event_type"), "last_ts", "lag_hours"
    )
