"""Sketched skew join (operators/skew.py): MG-detected hot keys fan
out, cold keys join plain, output identical to the direct join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.skew import (
    sketched_salted_join,
)


def _skewed(spark, hot_rows=800, cold_keys=60, cold_each=3):
    rows = [(0, i) for i in range(hot_rows)]  # key 0: hot
    rows += [
        (k, 10_000 + k * 10 + j)
        for k in range(1, cold_keys + 1)
        for j in range(cold_each)
    ]
    big = spark.createDataFrame(rows, "k INT, payload INT").repartition(8)
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, cold_keys + 1)], "k INT, name STRING"
    )
    return big.localCheckpoint(eager=True), small


def test_sketched_join_matches_plain_join(spark):
    big, small = _skewed(spark)
    stats: dict = {}
    out = sketched_salted_join(
        big, small, ["k"], threshold=100, salt_buckets=8, stats=stats
    )
    plain = big.join(small, ["k"])
    key = ["k", "payload"]
    assert out.select(*key).exceptAll(plain.select(*key)).count() == 0
    assert plain.select(*key).exceptAll(out.select(*key)).count() == 0
    assert out.count() == plain.count()


def test_only_hot_keys_fan_out(spark):
    """The point of sketching the hot set: the small side replicates
    ONLY for detected-hot keys — cold dimension rows never multiply."""
    big, small = _skewed(spark)
    stats: dict = {}
    sketched_salted_join(
        big, small, ["k"], threshold=100, salt_buckets=8, stats=stats
    )
    hot = set(stats["hot_keys"])
    assert "0" in hot  # the planted hot key is always detected
    # MG guarantees a SUPERSET of keys with freq >= threshold; with
    # cold keys at freq 3 << threshold - D they must not be flagged
    assert len(hot) < 10, hot
    # replication bound: the salted small side is |hot| * buckets rows
    small_is_hot = F.concat_ws("\x1f", F.col("k").cast("string")).isin(
        list(hot)
    )
    n_hot_small = small.filter(small_is_hot).count()
    assert n_hot_small <= len(hot)  # cold dims replicate zero times


def test_no_hot_keys_returns_plain_plan(spark):
    big = spark.createDataFrame(
        [(k, k) for k in range(100)], "k INT, payload INT"
    )
    small = spark.createDataFrame(
        [(k, f"d{k}") for k in range(100)], "k INT, name STRING"
    )
    stats: dict = {}
    out = sketched_salted_join(
        big, small, ["k"], threshold=50, salt_buckets=8, stats=stats
    )
    assert stats["hot_keys"] == []
    # plain path: no salt machinery in the plan at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" not in plan
    assert out.count() == 100


def test_guard_refuses_void_guarantee(spark):
    big = spark.createDataFrame(
        [(k % 500, k) for k in range(5000)], "k INT, payload INT"
    ).repartition(8).localCheckpoint(eager=True)
    small = spark.createDataFrame([(0, "d")], "k INT, name STRING")
    with pytest.raises(ValueError, match="decrement bound"):
        sketched_salted_join(big, small, ["k"], threshold=3, k=2)
