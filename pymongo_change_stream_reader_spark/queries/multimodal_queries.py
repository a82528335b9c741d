"""Multimodal-column queries: binary payload plumbing (oracle-checked)
and the Arrow-batched feature-extraction path (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    with_binary_payload,
)
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
           'text/plain'                          AS mime,
           md5(text)                             AS content_md5
    FROM documents
    ORDER BY doc_id
    """,
    doc="Binary payload column + typed metadata struct: the "
    "image/audio/video carrier pattern (payload BINARY, meta STRUCT).",
    tags=("multimodal",),
)
def multimodal_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(
        load_table(spark, sf_dir, "documents"), "text", mime="text/plain"
    )
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.md5("text").alias("content_md5"),
    ).orderBy("doc_id")


@query(
    "multimodal_frame_plan",
    oracle="""
    SELECT doc_id,
           CAST(unnest(generate_series(0,
                greatest(CAST(FLOOR(octet_length(text::BLOB) / 100) AS INT) - 1, 0),
                10)) AS INT) AS frame_idx
    FROM documents
    ORDER BY doc_id, frame_idx
    """,
    doc="Frame-sampling plan (every 10th frame) computed from metadata "
    "only — prunes decode work before the expensive stage.",
    tags=("multimodal",),
)
def multimodal_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(
        load_table(spark, sf_dir, "documents"), "text", mime="video/fake"
    )
    return frame_sample_plan(d, every_n=10).orderBy("doc_id", "frame_idx")


@query(
    "multimodal_feature_extract",
    oracle=None,  # mapInPandas path; byte-level semantics covered in pytest
    doc="Arrow-batched feature extraction over binary payloads "
    "(mapInPandas byte-histogram stand-in for an embedding model), "
    "aggregated per source.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(load_table(spark, sf_dir, "documents"), "text")
    feats = extract_features(d, "payload", "doc_id")
    return (
        feats.join(
            load_table(spark, sf_dir, "documents").select("doc_id", "source"),
            "doc_id",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.element_at("features", 1)), 6).alias("avg_f0"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_audio_windows",
    oracle=None,  # mapInPandas path; waveform semantics covered in pytest
    doc="Arrow-batched windowed audio features (int8-waveform RMS + "
    "zero-crossing-rate proxy for a PCM decode), aggregated per "
    "source.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.multimodal import (
        audio_window_features,
    )

    d = with_binary_payload(
        load_table(spark, sf_dir, "documents"), "text", mime="audio/fake"
    )
    feats = audio_window_features(d, "payload", "doc_id")
    return (
        feats.join(
            load_table(spark, sf_dir, "documents").select("doc_id", "source"),
            "doc_id",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_windows"), 4).alias("avg_windows"),
            # try_element_at: zero-window docs (payload < one window) carry
            # empty arrays, and ANSI element_at would throw on them
            F.round(F.avg(F.try_element_at("rms", F.lit(1))), 6).alias("avg_rms0"),
            F.round(F.avg(F.try_element_at("zcr", F.lit(1))), 6).alias("avg_zcr0"),
        )
        .orderBy("source")
    )
