"""SQ8 scalar quantization (operators/similarity.py): code range,
reconstruction error bound, recall against the exact ranking, and
the pretrained-bounds serving path."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.similarity import (
    brute_force_topk,
    sq8_decode,
    sq8_encode,
    sq8_minmax,
    sq8_topk,
)


def _vecs(spark, n=80, d=8, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_sq8_codes_in_range_and_extremes(spark):
    df = _vecs(spark)
    los, his = sq8_minmax(df)
    codes = df.select(
        sq8_encode(F.col("embedding"), los, his).alias("c")
    )
    stats = codes.select(
        F.min(F.array_min("c")).alias("lo"),
        F.max(F.array_max("c")).alias("hi"),
    ).first()
    assert stats["lo"] == 0
    assert stats["hi"] == 255  # the per-dim max clamps down to 255


def test_sq8_reconstruction_error_bounded_by_half_cell(spark):
    df = _vecs(spark)
    los, his = sq8_minmax(df)
    dec = df.select(
        "embedding",
        sq8_decode(
            sq8_encode(F.col("embedding"), los, his), los, his
        ).alias("r"),
    )
    max_err = dec.select(
        F.array_max(
            F.zip_with("embedding", "r", lambda x, y: F.abs(x - y))
        ).alias("e")
    ).agg(F.max("e")).first()[0]
    cell = max(
        (hi - lo) / 256 for lo, hi in zip(los, his)
    )
    assert max_err <= cell / 2 + 1e-12


def test_sq8_constant_dimension_decodes_to_midpoint_of_nothing(spark):
    df = spark.createDataFrame(
        [(1, [5.0, 0.1]), (2, [5.0, 0.9])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    los, his = sq8_minmax(df)
    assert los[0] == his[0] == 5.0
    row = df.select(
        sq8_decode(
            sq8_encode(F.col("embedding"), los, his), los, his
        ).alias("r")
    ).first()
    assert row["r"][0] == 5.0  # hi == lo: code 0, reconstruct lo


def test_sq8_topk_recall_vs_exact(spark):
    df = _vecs(spark, n=120, d=8)
    queries = df.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(df, queries, k=10)
    approx = sq8_topk(df, queries, k=10)
    e = {
        (r["query_id"], r["neighbor_id"]) for r in exact.collect()
    }
    a = {
        (r["query_id"], r["neighbor_id"]) for r in approx.collect()
    }
    assert len(e & a) / len(e) >= 0.8  # 8-bit cells: near-exact ranking


def test_sq8_pretrained_bounds_reused(spark):
    df = _vecs(spark)
    bounds = sq8_minmax(df)
    newcomers = _vecs(spark, n=10, seed=99).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    # serving path: bounds trained on the corpus, applied to a batch
    # that may exceed them — codes clamp, nothing raises
    out = sq8_topk(
        df.unionByName(newcomers),
        newcomers.limit(2),
        k=5,
        bounds=bounds,
    )
    assert out.count() == 10
