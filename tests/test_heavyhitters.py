"""Misra-Gries heavy hitters (operators/heavyhitters.py): the MG
algebra's guarantees under forced decrements, skew, and multi-partition
merge."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.heavyhitters import (
    heavy_hitter_candidates,
    misra_gries_summary,
)


def _exact(df):
    return {
        r["key"]: r["c"]
        for r in df.groupBy(F.col("key")).agg(F.count("*").alias("c"))
        .collect()
    }


def _zipfish(n_heavy=5, heavy_each=400, n_tail=2000):
    rng = random.Random(11)
    rows = [(f"heavy{i}",) for i in range(n_heavy) for _ in range(heavy_each)]
    rows += [(f"tail{rng.randrange(n_tail)}",) for _ in range(4000)]
    rng.shuffle(rows)
    return rows


def test_bounds_hold_under_tiny_k(spark):
    # k=8 over thousands of distinct keys: decrements fire constantly;
    # every surviving estimate must still bracket the truth
    df = spark.createDataFrame(_zipfish(), "key STRING").repartition(8)
    df = df.localCheckpoint(eager=True)
    truth = _exact(df)
    n = sum(truth.values())
    s = misra_gries_summary(df, "key", k=8).collect()
    assert s, "summary must not be empty"
    bound = s[0]["bound"]
    assert all(r["bound"] == bound for r in s)
    assert 0 < bound <= n  # decrements definitely fired at k=8
    for r in s:
        t = truth[r["key"]]
        assert r["est"] <= t <= r["est"] + bound, (r, t)


def test_no_false_negatives_above_threshold(spark):
    df = spark.createDataFrame(_zipfish(), "key STRING").repartition(8)
    df = df.localCheckpoint(eager=True)
    truth = _exact(df)
    thr = 400  # the planted heavies sit exactly at the threshold
    cand = {
        r["key"]
        for r in heavy_hitter_candidates(df, "key", thr, k=128).collect()
    }
    missing = {k for k, c in truth.items() if c >= thr} - cand
    assert not missing, f"guarantee violated: {missing}"


def test_candidates_raise_when_bound_swamps_threshold(spark):
    # k far too small for the threshold: D >= threshold voids the
    # no-false-negative guarantee for keys absent from every summary,
    # so the candidate call must refuse instead of silently dropping
    import pytest

    df = spark.createDataFrame(_zipfish(), "key STRING").repartition(8)
    df = df.localCheckpoint(eager=True)
    with pytest.raises(ValueError, match="decrement bound"):
        heavy_hitter_candidates(df, "key", threshold=5, k=2)


def test_exact_when_k_exceeds_cardinality(spark):
    # with k > |keys| no decrement ever fires: est == true, bound == 0
    rows = [(k,) for k in ["a"] * 7 + ["b"] * 3 + ["c"] * 5]
    df = spark.createDataFrame(rows, "key STRING").repartition(2)
    s = {r["key"]: (r["est"], r["bound"]) for r in
         misra_gries_summary(df, "key", k=16).collect()}
    assert s == {"a": (7, 0), "b": (3, 0), "c": (5, 0)}


def test_merge_bound_is_sum_of_partition_decrements(spark):
    # the documented bound: D <= n / (k+1) after the merge
    df = spark.createDataFrame(_zipfish(), "key STRING").repartition(4)
    df = df.localCheckpoint(eager=True)
    n = df.count()
    k = 64
    s = misra_gries_summary(df, "key", k=k).collect()
    assert s[0]["bound"] <= n / (k + 1) * 4  # one n_p/(k+1) term per partition
    # tighter: each partition's decrement <= n_p/(k+1), so D <= n/(k+1)
    assert s[0]["bound"] <= n / (k + 1)


def test_mg_partition_bounds_hypothesis():
    """Single-partition MG kernel (pure pandas, no Spark): for ANY
    input multiset and slot count, est <= true <= est + decr and
    decr <= n/(k+1)."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        _mg_partition,
    )

    @given(
        keys=st.lists(st.integers(0, 12), min_size=1, max_size=120),
        k=st.integers(1, 6),
        split=st.integers(1, 5),
    )
    @settings(max_examples=300, deadline=None)
    def check(keys, k, split):
        # feed as `split` Arrow-style batches to exercise the
        # batch-arrival decrement path
        step = max(1, len(keys) // split)
        batches = [
            pd.DataFrame({"key": [str(x) for x in keys[i : i + step]]})
            for i in range(0, len(keys), step)
        ]
        out = next(_mg_partition(k)(iter(batches)))
        decr = int(out[out["is_decr"]]["cnt"].iloc[0])
        est = {
            r.key: int(r.cnt)
            for r in out[~out["is_decr"]].itertuples(index=False)
        }
        truth = pd.Series([str(x) for x in keys]).value_counts().to_dict()
        n = len(keys)
        assert decr <= n / (k + 1)
        assert len(est) <= k
        for key, e in est.items():
            assert e <= truth[key] <= e + decr, (keys, k, key)
        # no false negatives above the error bound
        for key, t in truth.items():
            if t > decr:
                assert key in est, (keys, k, key, t, decr)

    check()


def test_count_min_guarantees_and_mergeability(spark):
    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        count_min_estimate,
        count_min_sketch,
    )
    from pyspark.sql import functions as F

    rows = _zipfish(n_heavy=3, heavy_each=200, n_tail=500)
    df = spark.createDataFrame(rows, "key STRING").localCheckpoint(eager=True)
    truth = _exact(df)
    n = sum(truth.values())
    width, depth = 256, 4  # narrow width: collisions guaranteed
    sketch = count_min_sketch(df, "key", width, depth).localCheckpoint(
        eager=True
    )
    probes = df.select("key").distinct()
    est = {
        r["key"]: r["est"]
        for r in count_min_estimate(sketch, probes, "key", width, depth)
        .collect()
    }
    for k, t in truth.items():
        assert est[k] >= t, (k, est[k], t)  # one-sided, always
    # the sketch holds exactly the total mass per row
    per_row = {
        r["row"]: r["s"]
        for r in sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    }
    assert all(v == n for v in per_row.values())

    # mergeability: sketch(A) + sketch(B) == sketch(A union B)
    half = len(rows) // 2
    a = spark.createDataFrame(rows[:half], "key STRING")
    b = spark.createDataFrame(rows[half:], "key STRING")
    merged = (
        count_min_sketch(a, "key", width, depth)
        .unionByName(count_min_sketch(b, "key", width, depth))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(df, "key", width, depth)
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_count_min_never_undercounts_hypothesis(spark):
    """Pure guarantee check across arbitrary multisets at a tiny width
    (maximal collisions): est >= true for every key, always."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        count_min_estimate,
        count_min_sketch,
    )

    @given(keys=st.lists(st.integers(0, 20), min_size=1, max_size=60))
    @settings(max_examples=6, deadline=None)
    def check(keys):
        df = spark.createDataFrame(
            [(str(k),) for k in keys], "key STRING"
        ).localCheckpoint(eager=True)
        truth = _exact(df)
        sketch = count_min_sketch(df, "key", width=4, depth=2)
        est = {
            r["key"]: r["est"]
            for r in count_min_estimate(
                sketch, df.select("key").distinct(), "key", 4, 2
            ).collect()
        }
        assert all(est[k] >= t for k, t in truth.items()), (keys, est, truth)

    check()
