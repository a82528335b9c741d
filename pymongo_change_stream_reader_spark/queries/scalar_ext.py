"""Remaining §2.C scalar/relational surface: map functions, unpivot,
posexplode, and the array higher-order-function family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "map_funcs_explode",
    oracle="""
    SELECT event_id, key, ROUND(val, 4) AS val FROM (
        SELECT event_id, 'value' AS key, value AS val FROM events
        UNION ALL
        SELECT event_id, 'k' AS key,
               CAST(json_extract_string(props, '$.k') AS DOUBLE) AS val
        FROM events
    )
    WHERE event_id < 2000
    ORDER BY event_id, key
    """,
    doc="Map surface: create_map -> explode into (key, value) rows "
    "(map_keys/map_values/element_at covered by construction).",
    tags=("scalar", "map"),
)
def map_funcs_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    m = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("double"),
    )
    return (
        e.select("event_id", F.explode(m).alias("key", "val"))
        .select("event_id", "key", F.round("val", 4).alias("val"))
        .orderBy("event_id", "key")
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, ROUND(val, 2) AS val FROM (
        SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM lineitem
    )
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber, metric
    """,
    doc="Unpivot (wide -> long): df.unpivot == stacked UNION ALL.",
    tags=("scalar",),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_discount").alias("disc"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"], ["qty", "price", "disc"], "metric", "val"
        )
        .select(
            "l_orderkey", "l_linenumber", "metric", F.round("val", 2).alias("val")
        )
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@query(
    "posexplode_words",
    oracle="""
    WITH w AS (
        SELECT p_partkey, string_split(p_name, ' ') AS ws
        FROM part WHERE p_partkey < 100
    )
    SELECT p_partkey,
           CAST(unnest(range(0, len(ws))) AS INT) AS pos,
           unnest(ws)                             AS word
    FROM w
    ORDER BY p_partkey, pos
    """,
    doc="posexplode: array element + ordinal position.",
    tags=("scalar", "array"),
)
def posexplode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 100)
    return (
        p.select(
            "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
        )
        .orderBy("p_partkey", "pos")
    )


@query(
    "array_hof_family",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')
                   AS ws
        FROM documents
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS total_chars,
           CAST(len(list_filter(ws, w -> length(w) > 4)) AS INT)        AS n_long,
           len(list_filter(ws, w -> w = 'spark')) > 0                   AS has_spark,
           len(list_filter(ws, w -> length(w) >= 1)) = len(ws)          AS all_nonempty,
           CAST(list_sum(list_transform(ws, w -> CASE WHEN length(w) > 4
                THEN 1 ELSE 0 END)) AS BIGINT)                          AS n_long_agg
    FROM t
    ORDER BY doc_id
    """,
    doc="Array HOF family: transform / filter / exists / forall / "
    "aggregate over token arrays.",
    tags=("scalar", "array"),
)
def array_hof_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.text import tokens

    d = load_table(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.aggregate(
            F.transform(ws, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(ws, lambda w: F.length(w) > 4)).alias("n_long"),
        F.exists(ws, lambda w: w == "spark").alias("has_spark"),
        F.forall(ws, lambda w: F.length(w) >= 1).alias("all_nonempty"),
        F.aggregate(
            F.transform(
                ws, lambda w: F.when(F.length(w) > 4, 1).otherwise(0).cast("long")
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_long_agg"),
    ).orderBy("doc_id")


@query(
    "array_setops_sequence",
    oracle="""
    WITH t AS (
        SELECT p_partkey,
               string_split(p_name, ' ')  AS words,
               string_split(p_type, ' ')  AS type_words
        FROM part WHERE p_partkey < 200
    )
    SELECT p_partkey,
           CAST(len(list_distinct(list_concat(words, type_words))) AS INT) AS union_ct,
           CAST(len(list_intersect(words, type_words)) AS INT)             AS inter_ct,
           CAST(len(list_filter(list_distinct(words),
                                w -> NOT list_contains(type_words, w))) AS INT)
                                                                           AS except_ct,
           list_transform(range(1, 4), i -> i * 2)                         AS even_seq
    FROM t
    ORDER BY p_partkey
    """,
    doc="Array set algebra (union/intersect/except) + sequence "
    "generation.",
    tags=("scalar", "array"),
)
def array_setops_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    words = F.split("p_name", " ")
    type_words = F.split("p_type", " ")
    return p.select(
        "p_partkey",
        F.size(F.array_union(words, type_words)).alias("union_ct"),
        F.size(F.array_intersect(words, type_words)).alias("inter_ct"),
        F.size(F.array_except(words, type_words)).alias("except_ct"),
        F.transform(
            F.sequence(F.lit(1), F.lit(3)), lambda i: (i * 2).cast("long")
        ).alias("even_seq"),
    ).orderBy("p_partkey")


@query(
    "explode_outer_preserves_rows",
    oracle="""
    WITH t AS (
        SELECT event_id,
               CASE WHEN event_type = 'error'
                    THEN NULL
                    ELSE string_split(event_type, '') END AS letters
        FROM events WHERE event_id < 1000
    )
    SELECT event_id, unnest(COALESCE(letters, [NULL])) AS letter
    FROM t
    ORDER BY event_id, letter NULLS FIRST
    """,
    doc="explode_outer: null/empty arrays keep their parent row "
    "(LEFT-join explode semantics).",
    tags=("scalar", "array"),
)
def explode_outer_preserves_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    letters = F.when(
        F.col("event_type") != "error", F.split("event_type", "")
    )
    return (
        e.select("event_id", F.explode_outer(letters).alias("letter"))
        .orderBy("event_id", F.col("letter").asc_nulls_first())
    )


@query(
    "scalar_hash_string_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                                        AS name_md5,
           sha256(c_name)                                     AS name_sha256,
           base64(encode(c_name))                             AS name_b64,
           CAST(levenshtein(left(c_name, 8), right(c_name, 8)) AS INT)
                                                              AS name_lev,
           repeat(left(c_name, 2), 3)                         AS name_rep,
           reverse(c_name)                                    AS name_rev,
           CAST(ascii(c_name) AS INT)                         AS first_code,
           CAST(strpos(c_name, '#') AS INT)                   AS hash_pos
    FROM customer
    ORDER BY c_custkey
    """,
    doc="Hash digests (md5/sha256/base64) and string-distance/"
    "manipulation functions (levenshtein, repeat, reverse, ascii, "
    "instr) — fingerprinting primitives for dedup keys.",
    tags=("scalar",),
)
def scalar_hash_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: narrow codegen'd projection; md5/sha2 are the hash-key
    primitives the exact-dedup operator shuffles on."""
    n = F.col("c_name")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.md5(n).alias("name_md5"),
            F.sha2(n, 256).alias("name_sha256"),
            F.base64(n.cast("binary")).alias("name_b64"),
            F.levenshtein(F.left(n, F.lit(8)), F.right(n, F.lit(8))).alias(
                "name_lev"
            ),
            F.repeat(F.left(n, F.lit(2)), 3).alias("name_rep"),
            F.reverse(n).alias("name_rev"),
            F.ascii(n).alias("first_code"),
            F.instr(n, "#").alias("hash_pos"),
        )
        .orderBy("c_custkey")
    )


@query(
    "agg_bool_argminmax",
    oracle="""
    SELECT o_custkey,
           bool_and(o_totalprice > 1000)              AS all_big,
           bool_or(o_orderpriority = '1-URGENT')      AS any_urgent,
           arg_min(o_orderkey, o_totalprice)          AS cheapest_order,
           arg_max(o_orderkey, o_totalprice)          AS priciest_order
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    doc="bool_and/bool_or and min_by/max_by (argmin/argmax) aggregates "
    "(o_totalprice is tie-free per customer in this data, so the "
    "argmin/argmax picks are deterministic on both engines).",
    tags=("agg",),
)
def agg_bool_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_big"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        )
        .orderBy("o_custkey")
    )


@query(
    "scalar_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*)                                              AS n,
           SUM(CAST(json_extract_string(props, '$.k') AS INT))   AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT))   AS max_k,
           SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 7 = 0
                    THEN 1 ELSE 0 END)                           AS n_sevens
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured JSON via Spark 4 VariantType: parse_json "
    "once into a variant column, typed try_variant_get extraction, "
    "aggregation over the extracted values — the engine-native path "
    "for schemaless event payloads (vs string json_extract per "
    "field, which re-parses the document for every access).",
    tags=("scalar", "json"),
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: parse_json runs once per row in the scan projection;
    every field access reads the binary variant encoding (no
    re-parse).  The aggregation is an ordinary hash-shuffle with
    map-side partials."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("props").isNotNull()
    )
    k = F.try_variant_get(
        F.parse_json(F.col("props")), "$.k", "int"
    )
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.sum(
                F.when(F.col("k") % 7 == 0, 1).otherwise(0)
            ).alias("n_sevens"),
        )
        .orderBy("event_type")
    )


@query(
    "io_format_roundtrip",
    oracle="""
    SELECT fmt,
           COUNT(*)                        AS n_docs,
           CAST(SUM(n_chars) AS BIGINT)    AS total_chars,
           CAST(SUM(doc_id) AS BIGINT)     AS id_checksum
    FROM documents
    CROSS JOIN (VALUES ('csv'), ('orc'), ('parquet')) AS f(fmt)
    GROUP BY fmt
    ORDER BY fmt
    """,
    doc="Source/sink format breadth: the documents table rides "
    "through an ORC write/read and a CSV write/read (header + "
    "escaped quoting) and every format must reproduce identical "
    "counts and checksums — the oracle is the parquet truth fanned "
    "out per format, so any row lost or mangled in a roundtrip "
    "breaks the hash match.",
    tags=("io", "scalar"),
)
def io_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale note: both writes are one narrow pass; the CSV path only
    carries scalar columns (CSV has no nested types — schema is
    declared on read, no inference scan)."""
    import tempfile

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    )
    base = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    d.write.mode("overwrite").orc(f"{base}/orc")
    d.write.mode("overwrite").option("header", True).csv(f"{base}/csv")
    frames = {
        "parquet": d,
        "orc": spark.read.orc(f"{base}/orc"),
        "csv": spark.read.option("header", True)
        .schema("doc_id BIGINT, n_chars BIGINT, text STRING")
        .csv(f"{base}/csv"),
    }
    out = None
    for fmt, df in frames.items():
        agg = df.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        ).select(F.lit(fmt).alias("fmt"), "n_docs", "total_chars", "id_checksum")
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("fmt")


@query(
    "scalar_try_functions",
    oracle="""
    SELECT l_orderkey,
           l_quantity / NULLIF(l_linenumber - 1, 0)          AS div_maybe,
           try_cast(l_returnflag AS INT)                     AS flag_int,
           try_cast(CAST(l_shipdate AS VARCHAR) AS INT)      AS date_int,
           CAST(floor(l_extendedprice) AS BIGINT) + l_orderkey AS sum_ok
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Error-safe expression family under ANSI mode: try_divide / "
    "try_cast / try_add fold would-be runtime errors (divide-by-zero, "
    "malformed casts) into NULL instead of failing the job — the "
    "posture a 100 TB batch needs, where one poisoned row must not "
    "kill a 6-hour query.  The oracle replays DuckDB's NULL-on-error "
    "forms (NULLIF guard, try_cast).",
    tags=("scalar",),
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        F.try_divide(
            F.col("l_quantity"), F.col("l_linenumber") - 1
        ).alias("div_maybe"),
        F.col("l_returnflag").try_cast("int").alias("flag_int"),
        F.col("l_shipdate").cast("string").try_cast("int").alias("date_int"),
        F.try_add(
            F.floor(F.col("l_extendedprice")).cast("bigint"), F.col("l_orderkey")
        ).alias("sum_ok"),
    ).orderBy("l_orderkey", "l_linenumber")
