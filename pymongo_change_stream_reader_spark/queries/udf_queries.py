"""UDF surface (SURVEY §2.C): vectorized pandas_udf (scalar +
grouped-agg), grouped-map applyInPandas, and a UDTF — the engine's
extension points replacing the reference's "edit the handler class"
model.

Every UDF here is Arrow-batched (never row-at-a-time Python) and
deterministic so the DuckDB oracle can verify the full path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT event_id,
           ROUND(value * 1.1 + CAST(json_extract_string(props, '$.k') AS INT), 4)
               AS boosted
    FROM events
    WHERE event_id < 3000
    ORDER BY event_id
    """,
    doc="Vectorized scalar pandas_udf (Arrow batches, NumPy math) — "
    "~10-100x over row-at-a-time Python UDFs.",
    tags=("udf",),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def boost(value: pd.Series, k: pd.Series) -> pd.Series:
        return (value * 1.1 + k).round(4)

    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 3000)
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id", boost(F.col("value"), k).alias("boosted")
    ).orderBy("event_id")


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT event_type,
           ROUND(SUM(value * CAST(json_extract_string(props, '$.k') AS INT))
                 / greatest(SUM(CAST(json_extract_string(props, '$.k') AS INT)), 1),
                 4) AS weighted_avg
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Grouped-aggregate pandas_udf: weighted mean per group "
    "(whole-group Series -> scalar, Arrow transfer).",
    tags=("udf",),
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("double")
    def weighted_avg(value: pd.Series, weight: pd.Series) -> float:
        return round(float((value * weight).sum() / max(weight.sum(), 1)), 4)

    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_type", F.col("value"), k.alias("k"))
        .groupBy("event_type")
        .agg(weighted_avg(F.col("value"), F.col("k")).alias("weighted_avg"))
        .orderBy("event_type")
    )


@query(
    "udf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           ROUND(value - AVG(value) OVER (PARTITION BY user_id), 4) AS value_centered
    FROM events
    WHERE user_id < 20
    ORDER BY event_id
    """,
    doc="Grouped-map applyInPandas: per-user mean-centering (whole "
    "group as a pandas DataFrame in/out).",
    tags=("udf",),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["event_id", "user_id"]].copy()
        out["value_centered"] = (pdf["value"] - pdf["value"].mean()).round(4)
        return out

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return (
        e.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(center, "event_id LONG, user_id LONG, value_centered DOUBLE")
        .orderBy("event_id")
    )


@query(
    "udtf_word_positions",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')
                   AS ws
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           CAST(unnest(range(0, len(ws))) AS INT) AS pos,
           unnest(ws)                             AS word
    FROM w
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF: one input row -> many output rows (tokenizer "
    "with positions), the table-function extension point.",
    tags=("udf", "udtf"),
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id BIGINT, pos INT, word STRING")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for pos, word in enumerate(w for w in text.strip().split() if w):
                yield doc_id, pos, word

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT t.doc_id, t.pos, t.word
        FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t
        ORDER BY t.doc_id, t.pos
        """
    )
