"""Data-quality audit operators (operators/dataquality.py): profile
metrics, the single-pass constraint algebra (scoped rules, empty
scopes), referential orphan detection, freshness lag."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.dataquality import (
    Check,
    constraint_audit,
    freshness_lag,
    profile_columns,
    referential_orphans,
)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b"), (3, None)],
        "k INT, s STRING",
    )
    prof = {r["column"]: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert prof["k"]["n_rows"] == 5
    assert prof["k"]["n_nulls"] == 1
    assert prof["k"]["n_distinct"] == 3
    assert prof["k"]["completeness"] == 0.8
    assert prof["s"]["n_nulls"] == 2
    assert prof["s"]["n_distinct"] == 2
    assert prof["s"]["completeness"] == 0.6


def test_profile_approx_mode_runs_without_expand(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    prof = profile_columns(df, ["id", "m"], exact=False)
    assert "Expand" not in prof._jdf.queryExecution().executedPlan().toString()
    got = {r["column"]: r["n_distinct"] for r in prof.collect()}
    # HLL at default rsd is exact at these cardinalities
    assert got["m"] == 7
    assert abs(got["id"] - 1000) <= 30


def test_constraint_audit_scoped_and_empty_scope(spark):
    df = spark.createDataFrame(
        [(1, "x"), (-2, "x"), (3, "y"), (-4, "y")], "v INT, g STRING"
    )
    out = {
        r["rule"]: r
        for r in constraint_audit(
            df,
            [
                Check("positive", F.col("v") > 0),
                Check(
                    "x_positive",
                    F.col("v") > 0,
                    where=F.col("g") == "x",
                ),
                Check(
                    "empty_scope",
                    F.col("v") > 0,
                    where=F.col("g") == "zzz",
                ),
            ],
        ).collect()
    }
    assert (out["positive"]["checked"], out["positive"]["violations"]) == (4, 2)
    assert out["positive"]["pass_ratio"] == 0.5
    assert (out["x_positive"]["checked"], out["x_positive"]["violations"]) == (
        2,
        1,
    )
    # empty scope violates nothing: ratio pins to 1.0, not NULL/0-div
    assert (out["empty_scope"]["checked"], out["empty_scope"]["pass_ratio"]) == (
        0,
        1.0,
    )


def test_constraint_audit_is_one_aggregation(spark):
    df = spark.range(100).select(F.col("id").alias("v"))
    plan = (
        constraint_audit(
            df,
            [Check(f"r{i}", F.col("v") >= i) for i in range(8)],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # 8 rules, still exactly one scan of the input
    assert plan.count("Range (0, 100") == 1


def test_referential_orphans_counts_and_null_fks(spark):
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk INT"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk INT")
    out = referential_orphans([("edge", child, "fk", parent, "pk")]).collect()
    assert [(r["relation"], r["orphans"]) for r in out] == [("edge", 1)]


def test_freshness_lag_hours(spark):
    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:00:00"),
            ("a", "2024-01-01 06:00:00"),
            ("b", "2024-01-01 12:00:00"),
        ],
        "g STRING, ts STRING",
    ).select("g", F.col("ts").cast("timestamp").alias("ts"))
    out = {r["grp"]: r["lag_hours"] for r in freshness_lag(df, "ts", "g").collect()}
    assert out == {"a": 6.0, "b": 0.0}


def test_names_with_quotes_are_escaped(spark):
    # rule and column names are user data interpolated into stack()
    # SQL: quotes (and odd identifier chars) must survive
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        Check,
        constraint_audit,
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], ["id", "it's"]
    )
    prof = {r["column"]: r["n_nulls"] for r in profile_columns(df, ["it's"]).collect()}
    assert prof == {"it's": 1}
    audit = constraint_audit(
        df, [Check("o'brien's rule", F.col("id") > 1)]
    ).collect()
    assert [(r["rule"], r["checked"], r["violations"]) for r in audit] == [
        ("o'brien's rule", 3, 1)
    ]


def test_quote_escaping_survives_escapedStringLiterals(spark):
    # round-12/13 ADVICE low: the stack() sites must not be sensitive
    # to spark.sql.parser.escapedStringLiterals.  They use the column
    # API (F.stack + F.lit, no SQL text at all); the _sql_str helper
    # was deleted in r13 (caller-less, and backslash-before-quote is
    # ambiguous across the two parser modes) — names with quotes AND
    # backslashes must round-trip through the audit regardless of the
    # parser flag.
    from pymongo_change_stream_reader_spark.operators.dataquality import (
        Check,
        constraint_audit,
    )

    df = spark.createDataFrame([(1,), (2,)], ["id"])
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try:
        audit = constraint_audit(
            df, [Check(r"path\'d rule", F.col("id") > 0)]
        ).collect()
        assert [(r["rule"], r["violations"]) for r in audit] == [
            (r"path\'d rule", 0)
        ]
    finally:
        spark.conf.unset("spark.sql.parser.escapedStringLiterals")
