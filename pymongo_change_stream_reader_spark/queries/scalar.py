"""Scalar function surface (SURVEY.md §2.C): string / date / math /
array / map / JSON expressions, plus conditional logic.

All expressions are JVM-side built-ins (whole-stage codegen; zero
Python on the executor path).  Oracle SQL uses the DuckDB spelling of
the same semantics; where the engines' return types differ (DuckDB
widens lengths/extracts to BIGINT, floor to DOUBLE) the oracle casts
to Spark's type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_type)                                        AS type_upper,
           LOWER(p_brand)                                       AS brand_lower,
           SUBSTRING(p_name, 1, 8)                              AS name_prefix,
           CAST(LENGTH(p_name) AS INT)                          AS name_len,
           CONCAT(p_brand, ':', p_type)                         AS brand_type,
           TRIM(CONCAT('  ', p_brand, '  '))                    AS trimmed,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')                AS size_padded,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')          AS devoweled,
           CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END     AS is_promo
    FROM part
    ORDER BY p_partkey
    """,
    doc="String functions: case, substring, concat, trim, pad, regex, LIKE.",
    tags=("scalar",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("is_promo"),
    ).orderBy("p_partkey")


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate)  AS INT)                     AS order_year,
           CAST(quarter(o_orderdate) AS INT)                   AS order_quarter,
           CAST(month(o_orderdate) AS INT)                     AS order_month,
           CAST(day(o_orderdate)   AS INT)                     AS order_day,
           CAST(isodow(o_orderdate) AS INT)                    AS iso_weekday,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE)         AS due_date,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                         o_orderdate) AS INT)                  AS days_since_epoch0,
           strftime(o_orderdate, '%Y-%m')                      AS year_month,
           CAST(epoch(o_orderdate) AS BIGINT)                  AS unix_ts
    FROM orders
    WHERE o_orderkey < 1000
    ORDER BY o_orderkey
    """,
    doc="Date/time functions: extract, trunc, arithmetic, format, epoch.",
    tags=("scalar",),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_weekday"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).alias("days_since_epoch0"),
        F.date_format("o_orderdate", "yyyy-MM").alias("year_month"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4)       AS net_price,
           ROUND(ABS(l_extendedprice - 50000.0), 2)           AS abs_dev,
           ROUND(POW(l_quantity, 2), 2)                       AS qty_sq,
           ROUND(SQRT(l_extendedprice), 2)                    AS price_sqrt,
           ROUND(LN(l_extendedprice), 4)                      AS price_ln,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT)      AS price_bucket,
           CAST(CEIL(l_quantity / 7.0) AS BIGINT)             AS qty_ceil7,
           CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT)         AS key_mod7,
           GREATEST(l_quantity, 25.0)                         AS qty_floor25,
           LEAST(l_quantity, 25.0)                            AS qty_cap25,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE)            AS disc_sign
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math functions: abs/pow/sqrt/ln/floor/ceil/pmod/greatest/least/sign.",
    tags=("scalar",),
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round-4 recovers the exact 4-decimal product (2dp * 2dp) on
        # both engines; round-2 would sit on the half boundary.
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
        F.round(F.abs(F.col("l_extendedprice") - 50000.0), 2).alias("abs_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 2).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7.0).alias("qty_ceil7"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
        F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("qty_floor25"),
        F.least(F.col("l_quantity"), F.lit(25.0)).alias("qty_cap25"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_case_conditional",
    oracle="""
    SELECT price_tier,
           COUNT(*)                            AS n_orders,
           ROUND(SUM(o_totalprice), 2)         AS tier_total
    FROM (
        SELECT CASE
                 WHEN o_totalprice < 50000  THEN 'small'
                 WHEN o_totalprice < 150000 THEN 'medium'
                 WHEN o_totalprice < 300000 THEN 'large'
                 ELSE 'jumbo'
               END AS price_tier,
               o_totalprice
        FROM orders
    )
    GROUP BY price_tier
    ORDER BY price_tier
    """,
    doc="CASE WHEN tiering + aggregation.",
    tags=("scalar",),
)
def scalar_case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.select(tier.alias("price_tier"), "o_totalprice")
        .groupBy("price_tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("tier_total"),
        )
        .orderBy("price_tier")
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(COALESCE(NULLIF(l_discount, 0.0), -1.0), 2) AS disc_or_flag,
           CAST(NULLIF(l_tax, 0.0) IS NULL AS BOOLEAN)       AS tax_free,
           ROUND(IFNULL(NULLIF(l_discount, 0.0),
                        l_tax), 2)                           AS disc_else_tax
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="NULL combinators: nullif / coalesce / ifnull / IS NULL.",
    tags=("scalar",),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    disc_nz = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.coalesce(disc_nz, F.lit(-1.0)), 2).alias("disc_or_flag"),
        F.nullif(F.col("l_tax"), F.lit(0.0)).isNull().alias("tax_free"),
        F.round(F.ifnull(disc_nz, F.col("l_tax")), 2).alias("disc_else_tax"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT)                       AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)        AS n_distinct_words,
           list_contains(string_split(text, ' '), 'spark')                 AS has_spark,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], '-')
                                                                           AS first3_sorted
    FROM documents
    ORDER BY doc_id
    """,
    doc="Array higher-order surface: split/size/distinct/contains/sort/slice/join.",
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array(F.array_distinct(words)), 1, 3), "-").alias(
            "first3_sorted"
        ),
    ).orderBy("doc_id")


@query(
    "scalar_explode_wordcount",
    oracle="""
    SELECT word, COUNT(*) AS freq
    FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 20
    """,
    doc="explode (UNNEST) + word-frequency aggregation, top-20.",
    tags=("scalar", "array"),
)
def scalar_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: explode is row-multiplying — the follow-up agg does a
    map-side partial count so the shuffle carries distinct words, not
    every token occurrence."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(20)
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*)                                                  AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                                                                     AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4)
                                                                     AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="JSON extraction (get_json_object) + aggregation over parsed values.",
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "scalar_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_typed
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="from_json with an explicit schema -> typed struct projection "
    "(the engine's schema-on-read path for dynamic payloads, SURVEY §1.2).",
    tags=("scalar", "json"),
)
def scalar_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select("event_id", parsed.getField("k").alias("k_typed")).orderBy("event_id")


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT c_nationkey,
           list_sort(list(c_mktsegment)) AS segments
    FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    doc="collect_list + sort_array: deterministic array-valued aggregate.",
    tags=("agg", "array"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .distinct()
        .groupBy("c_nationkey")
        .agg(F.sort_array(F.collect_list("c_mktsegment")).alias("segments"))
        .orderBy("c_nationkey")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS BIGINT) AS f_cnt,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS BIGINT) AS o_cnt,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS BIGINT) AS p_cnt
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Pivot (explicit value list) == conditional-sum fan-out.",
    tags=("agg",),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pivot with an explicit value list is a single-pass hash
    agg (no second job to discover values)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
            F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
            F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
        )
        .orderBy("o_orderpriority")
    )
