"""Mergeable quantile sketch (operators/quantiles.py): exactness below
k, rank-error bounds on adversarial layouts, union mergeability."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from pymongo_change_stream_reader_spark.operators.quantiles import (
    _sketch_partition,
    quantile_estimate,
    quantile_sketch,
)

PROBS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_err(values, est, p):
    n = len(values)
    rank = sum(1 for v in values if v <= est)
    return abs(rank - p * n) / n


def _levels(n, k):
    return max(1, math.ceil(math.log2(max(2, n / k))) + 1)


def test_exact_when_under_k(spark):
    vals = [float(x) for x in range(100)]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE").coalesce(1)
    s = quantile_sketch(df, "x", k=256)
    est = {r["p"]: r["value"] for r in quantile_estimate(s, PROBS).collect()}
    for p in PROBS:
        # no compaction fired: the estimate IS the discrete quantile
        assert _rank_err(vals, est[p], p) <= 1 / len(vals) + 1e-12, p


@pytest.mark.parametrize("layout", ["sorted", "reversed", "dups", "shuffled"])
def test_rank_error_bounded_adversarial(spark, layout):
    n, k = 20000, 256
    base = [float(x) for x in range(n)]
    if layout == "reversed":
        vals = base[::-1]
    elif layout == "dups":
        vals = [float(x % 37) for x in range(n)]
    elif layout == "shuffled":
        rng = random.Random(7)
        vals = base[:]
        rng.shuffle(vals)
    else:
        vals = base
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE").repartition(8)
    s = quantile_sketch(df, "x", k=k).localCheckpoint(eager=True)
    # summary stays summary-sized: <= k * levels rows per partition
    assert s.count() <= 8 * k * _levels(n, k)
    est = {r["p"]: r["value"] for r in quantile_estimate(s, PROBS).collect()}
    bound = 2 * _levels(n, k) / k + 8 * k / n  # compaction + merge slack
    for p in PROBS:
        assert _rank_err(vals, est[p], p) <= bound, (layout, p)


def test_union_merge_is_a_valid_sketch(spark):
    n = 10000
    a = spark.createDataFrame(
        [(float(x),) for x in range(n // 2)], "x DOUBLE"
    )
    b = spark.createDataFrame(
        [(float(x),) for x in range(n // 2, n)], "x DOUBLE"
    )
    merged = quantile_sketch(a, "x", k=256).unionByName(
        quantile_sketch(b, "x", k=256)
    )
    est = {
        r["p"]: r["value"]
        for r in quantile_estimate(merged, PROBS).collect()
    }
    vals = [float(x) for x in range(n)]
    for p in PROBS:
        assert _rank_err(vals, est[p], p) <= 0.05, p


def test_kernel_deterministic_and_weight_preserving():
    k = 64
    vals = [float(x % 101) for x in range(5000)]
    out1 = next(
        _sketch_partition(k)(iter([pd.DataFrame({"v": vals})]))
    )
    out2 = next(
        _sketch_partition(k)(iter([pd.DataFrame({"v": vals})]))
    )
    pd.testing.assert_frame_equal(out1, out2)  # no RNG anywhere
    # compaction halves items at doubled weight: total weight within
    # one buffer of the input count (the last promotion may drop the
    # odd remainder's worth of weight, bounded by k at the top level)
    assert abs(int(out1["weight"].sum()) - len(vals)) <= k * 2


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "x DOUBLE"
    ).coalesce(1)
    s = quantile_sketch(df, "x", k=16)
    est = {r["p"]: r["value"] for r in quantile_estimate(s, [0.5]).collect()}
    assert est[0.5] == 2.0


def test_grouped_sketch_exact_when_uncompacted(spark):
    from pymongo_change_stream_reader_spark.operators.quantiles import (
        grouped_quantile_cuts,
        grouped_quantile_sketch,
    )

    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(10 * i)) for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    from pyspark.sql import functions as F

    sk = grouped_quantile_sketch(df, ["g"], "x", k=256)
    # n <= k per group: every value survives at weight 1
    w = {r["g"]: r["n"] for r in sk.groupBy("g").agg(
        F.sum("weight").alias("n")).collect()}
    assert w == {"a": 100, "b": 20}
    cuts = {
        r["g"]: r["cuts"]
        for r in grouped_quantile_cuts(sk, ["g"], [0.25, 0.5, 0.75]).collect()
    }
    assert cuts["a"] == [25.0, 50.0, 75.0]
    assert cuts["b"] == [50.0, 100.0, 150.0]


def test_approx_ntile_by_group_is_per_group_and_collectless(spark):
    from pymongo_change_stream_reader_spark.operators.ranking import (
        approx_ntile_by_group,
    )

    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(1000 + i)) for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE")
    out = approx_ntile_by_group(df, ["g"], "x", tiles=4)
    sizes = {
        (r["g"], r["tile"]): r["count"]
        for r in out.groupBy("g", "tile").count().collect()
    }
    # per-group quartiles: group b's values all exceed group a's max,
    # yet each group still splits 4 ways on ITS OWN distribution
    assert sizes == {
        ("a", 1): 25, ("a", 2): 25, ("a", 3): 25, ("a", 4): 25,
        ("b", 1): 10, ("b", 2): 10, ("b", 3): 10, ("b", 4): 10,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" not in plan.lower()
