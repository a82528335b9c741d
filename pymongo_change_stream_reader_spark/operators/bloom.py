"""Bloom-filter membership for corpus decontamination at scale.

The exact decontamination check (queries/corpus_queries.py:
corpus_decontamination) joins every training n-gram against the
distinct benchmark-gram set.  At 100 TB that join is the wrong shape:
the benchmark index is static and small in information content but
large as a join side (hundreds of millions of grams), and the join
shuffles or broadcasts the full string set.  The standard production
answer is a Bloom filter: an m-bit array with k hashes per key is a
few hundred MB for billions of keys at ~1% false-positive rate, ships
to every executor once as broadcast BYTES, and turns the join into a
narrow per-row bit test with zero shuffle.

Design for Spark:

- All hashing stays JVM-side: positions come from ``F.xxhash64`` via
  Kirsch-Mitzenmacher double hashing (h1 + i*h2 mod m), computed as
  column expressions BEFORE any Python boundary.  The Arrow-batched
  pandas stage only tests bits in a broadcast numpy array — it never
  sees strings and never hashes.
- The build is executor-side: each partition folds its keys' bit
  positions into a local m-bit numpy bitmap inside ``mapInPandas``;
  the driver ORs one m/8-byte blob per partition.  Driver traffic is
  n_partitions * m/8 bytes, independent of key count.  (For very
  large m on very wide clusters, insert one ``groupBy(pid % g)``
  OR-combine level first; the testdata scale never needs it.)
- No false negatives, by construction: every key inserted sets all k
  bits it later probes.  The false-positive rate follows the textbook
  (1 - e^{-kn/m})^k, verified against a disjoint probe set in
  tests/test_bloom.py.

Reference parity: the reference engine has no decontamination surface
(it is a CDC relay, change_stream_reading/watch.py); this operator
family belongs to the training-data-pipeline extension the engine
adds on top.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """``array<bigint>`` of the k bit positions for one key.

    Kirsch-Mitzenmacher: positions_i = (h1 + i*h2) mod m need only
    two base hashes for asymptotically the same FP rate as k
    independent hashes.  Both hashes are ``xxhash64`` (JVM, codegen);
    the second salts the key with a marker column so h2 is
    independent of h1.
    """
    # Reduce both base hashes mod m BEFORE combining: ANSI mode makes
    # raw h1 + i*h2 a long-overflow error, and i*h2mod stays far from
    # the long boundary for any practical m and k.
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom-h2")), F.lit(m_bits))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def bloom_build(
    df: DataFrame, key: Column, m_bits: int = 1 << 20, k: int = 5
) -> bytes:
    """Build the m-bit Bloom bitmap over every value of ``key``.

    Executor-side: each partition emits one m/8-byte bitmap from its
    local keys' positions; the driver ORs the blobs.  The returned
    bytes are the *model* (like IVF centroids) — broadcast them back
    out for probing, never the key set itself.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    n_bytes = m_bits // 8

    pos_df = df.select(bloom_positions(key, m_bits, k).alias("pos"))

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for positions in pdf["pos"]:
                arr = np.asarray(positions, dtype=np.int64)
                np.bitwise_or.at(
                    bitmap, arr >> 3, np.uint8(1) << (arr & 7).astype(np.uint8)
                )
                seen = True
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    blobs = pos_df.mapInPandas(fold, schema="bitmap binary").collect()
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in blobs:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out.tobytes()


def bloom_hit_counts(
    df: DataFrame,
    id_col: str,
    grams: Column,
    bitmap: bytes,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Per-row count of DISTINCT grams whose k bits are all set.

    Input column expression ``grams`` is an ``array<string>``;
    position computation happens in the JVM projection, so the pandas
    stage receives ``array<array<bigint>>`` and the broadcast numpy
    bitmap does pure vectorized bit tests.  Returns (id_col,
    bloom_hits).
    """
    spark = SparkSession.getActiveSession()
    bc = spark.sparkContext.broadcast(bitmap)

    # null grams (null text upstream) must become [] here: a null
    # propagates through array_distinct/transform into the pandas
    # stage where len(None) would kill the task.
    safe_grams = F.coalesce(grams, F.array().cast("array<string>"))
    prepared = df.select(
        F.col(id_col),
        F.transform(
            F.array_distinct(safe_grams),
            lambda g: bloom_positions(g, m_bits, k),
        ).alias("gram_pos"),
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            # Vectorized over the whole Arrow batch: every gram has
            # exactly k positions, so the batch flattens to one (G, k)
            # int matrix -> one gather + bit-test -> per-row counts by
            # bincount on repeated row indices.  No per-row Python.
            n_rows = len(pdf)
            n_grams = np.fromiter(
                (len(g) for g in pdf["gram_pos"]), dtype=np.int64, count=n_rows
            )
            flat = [plist for row in pdf["gram_pos"] for plist in row]
            if flat:
                arr = np.asarray(flat, dtype=np.int64)  # (G, k)
                hit = np.all(
                    bits[arr >> 3]
                    & (np.uint8(1) << (arr & 7).astype(np.uint8)),
                    axis=1,
                )
                row_idx = np.repeat(np.arange(n_rows), n_grams)
                counts = np.bincount(
                    row_idx, weights=hit, minlength=n_rows
                ).astype(np.int64)
            else:
                counts = np.zeros(n_rows, dtype=np.int64)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bloom_hits": counts}
            )

    id_type = dict(df.dtypes)[id_col]
    return prepared.mapInPandas(
        probe, schema=f"{id_col} {id_type}, bloom_hits bigint"
    )
