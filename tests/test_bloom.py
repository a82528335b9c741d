"""Bloom-filter decontamination: no false negatives, bounded FP rate.

The bloom path must be a drop-in scale replacement for the exact
semi-join decontamination, so the contract under test is exactly the
one a pipeline relies on: every document the exact check flags is
flagged by the bloom check (superset / zero false negatives), extra
flags are rare (FP-rate bound vs the textbook estimate), and the
bitmap is a deterministic pure function of the key set.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.bloom import (
    bloom_build,
    bloom_hit_counts,
    bloom_positions,
)

M_BITS = 1 << 16
K = 5


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("gram")
    )


@pytest.fixture(scope="module")
def bitmap(keys):
    return bloom_build(keys, F.col("gram"), m_bits=M_BITS, k=K)


def test_bloom_no_false_negatives(spark, keys, bitmap):
    """Every inserted key probes positive — bit-level containment."""
    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.col("id") * 50, F.col("id") * 50 + 49),
            lambda i: F.concat(F.lit("key-"), i),
        ).alias("grams"),
    )
    got = bloom_hit_counts(
        docs, "doc_id", F.col("grams"), bitmap, m_bits=M_BITS, k=K
    ).collect()
    assert len(got) == 40
    assert all(r["bloom_hits"] == 50 for r in got)


def test_bloom_false_positive_rate(spark, bitmap):
    """Probing 4000 keys DISJOINT from the inserted set stays near
    the textbook rate (1 - e^{-kn/m})^k — generous 3x headroom
    absorbs double-hashing variance at this small m."""
    probe = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.array(F.concat(F.lit("other-"), F.col("id"))).alias("grams"),
    )
    got = bloom_hit_counts(
        probe, "doc_id", F.col("grams"), bitmap, m_bits=M_BITS, k=K
    )
    fp = got.filter(F.col("bloom_hits") > 0).count()
    theory = (1 - math.exp(-K * 2000 / M_BITS)) ** K
    assert fp / 4000 < max(3 * theory, 0.01)


def test_bloom_deterministic_and_pure(spark, keys, bitmap):
    """Same key set -> byte-identical bitmap, regardless of
    partitioning (OR-fold is commutative)."""
    again = bloom_build(
        keys.repartition(7), F.col("gram"), m_bits=M_BITS, k=K
    )
    assert again == bitmap


def test_bloom_positions_shape(spark):
    row = (
        spark.range(1)
        .select(bloom_positions(F.lit("x"), M_BITS, K).alias("p"))
        .first()
    )
    assert len(row["p"]) == K
    assert all(0 <= p < M_BITS for p in row["p"])


def test_bloom_superset_of_exact_decontamination(spark):
    """On the real documents table, the bloom-flagged set contains
    the exact-flagged set with identical counts for true hits: a
    bloom FP can only ADD shared-gram count, never remove."""
    from pymongo_change_stream_reader_spark.queries import load_all

    reg = load_all()
    sf_dir = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: r["shared_grams"]
        for r in reg["corpus_decontamination"].spark(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: r["shared_grams"]
        for r in reg["corpus_decontamination_bloom"].spark(spark, sf_dir).collect()
    }
    assert set(exact) <= set(bloom)
    for doc_id, n in exact.items():
        assert bloom[doc_id] >= n


def test_bloom_null_grams_row_is_zero_hits(spark, bitmap):
    """A null grams array (null text upstream) counts as zero hits
    instead of killing the executor task."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, ["key-1"]), (2, None), (3, [])],
        "doc_id INT, grams ARRAY<STRING>",
    )
    got = {
        r["doc_id"]: r["bloom_hits"]
        for r in bloom_hit_counts(
            df, "doc_id", F.col("grams"), bitmap, m_bits=M_BITS, k=K
        ).collect()
    }
    assert got == {1: 1, 2: 0, 3: 0}
