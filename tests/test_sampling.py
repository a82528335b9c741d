"""UniMax allocation invariants (operators/sampling.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pymongo_change_stream_reader_spark.operators.sampling import unimax_quotas


def test_unimax_textbook_walk():
    # budget 100 over sizes 10/30/200: smallest first takes
    # min(10, 100//3)=10, then min(30, 90//2)=30, then min(200, 60)=60.
    q = unimax_quotas([("big", 200), ("small", 10), ("mid", 30)], 100)
    assert q == {"small": 10, "mid": 30, "big": 60}


def test_unimax_epoch_cap():
    # epochs=2 doubles every cap; the leftover budget moves up-chain.
    q = unimax_quotas([("a", 10), ("b", 100)], 100, epochs=2)
    assert q == {"a": 20, "b": 80}


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.text("ab", min_size=1, max_size=3), st.integers(0, 10**6)),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.integers(0, 10**7),
    st.integers(1, 3),
)
def test_unimax_invariants(per, budget, epochs):
    q = unimax_quotas(per, budget, epochs)
    sizes = dict(per)
    # caps respected, nothing negative, budget never exceeded
    assert all(0 <= q[lang] <= sizes[lang] * epochs for lang in q)
    assert sum(q.values()) <= budget
    # if no cap binds, the split is equal up to floor rounding and the
    # budget is exhausted up to < n_langs rounding loss
    if all(q[lang] < sizes[lang] * epochs for lang in q):
        lo, hi = min(q.values()), max(q.values())
        assert hi - lo <= 1
        assert budget - sum(q.values()) < len(per)


def test_hll_merge_equals_direct_and_is_accurate(spark):
    """The sketch-union path: union of per-group sketches estimates the
    SAME value as one direct global sketch (mergeability), and both
    land within HLL's error envelope of the exact count."""
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        (F.col("id") % 5).alias("g"),
        (F.col("id") % 3_000).cast("string").alias("v"),
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("e")
    ).first()["e"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert merged == direct  # mergeability: identical sketch state
    assert abs(merged - 3_000) / 3_000 < 0.05
    # partition-layout invariance: same sketch after a reshuffle
    reshuffled = (
        df.repartition(17, "v")
        .groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()["e"]
    )
    assert reshuffled == merged


def test_unimax_select_matches_python_replay(spark):
    """Distributed selection == a pure-Python replay of the same hash
    order and quota walk, across random corpora."""
    import random

    from pymongo_change_stream_reader_spark.operators.sampling import (
        unimax_quotas,
        unimax_select,
    )

    rng = random.Random(5)
    for trial in range(3):
        docs = [
            (i, rng.choice(["aa", "bb", "cc"]), rng.randint(1, 40))
            for i in range(rng.randint(10, 60))
        ]
        per = {}
        for _, lang, n in docs:
            per[lang] = per.get(lang, 0) + n
        budget = sum(per.values()) * 2 // 3
        quotas = unimax_quotas(sorted(per.items()), budget)
        # python replay
        key = lambda d: (((d % 2147483648) * 2654435761) % 4294967296, d)
        # PREFIX rule (matches the one-window-pass operator): walk in
        # hash order accumulating EVERY doc's tokens; keep while the
        # inclusive cumulative stays within quota.  (A greedy skip-and-
        # continue would need per-row state, not a window cumsum.)
        expect = set()
        for lang in per:
            cum = 0
            for doc_id, _, n in sorted(
                (d for d in docs if d[1] == lang), key=lambda d: key(d[0])
            ):
                cum += n
                if cum <= quotas[lang]:
                    expect.add(doc_id)
        df = spark.createDataFrame(docs, "doc_id LONG, lang STRING, n_tok LONG")
        got = {
            r["doc_id"]
            for r in unimax_select(df, quotas).collect()
        }
        assert got == expect, trial


def test_weighted_sample_oversamples_heavy_items(spark):
    from pymongo_change_stream_reader_spark.operators.sampling import (
        weighted_sample,
    )

    # weights 1 vs 100: the heavy tenth must dominate a 50-draw
    rows = [(i, 100 if i % 10 == 0 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    picked = weighted_sample(df, "doc_id", "w", k=50).collect()
    heavy = sum(1 for r in picked if r["w"] == 100)
    # heavy mass fraction = 100*100/(100*100+900) ~ 0.917; allow slack
    assert heavy >= 35, heavy
    # without replacement: all distinct
    assert len({r["doc_id"] for r in picked}) == 50


def test_weighted_sample_is_deterministic_and_sortless(spark):
    from pymongo_change_stream_reader_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, i % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    a = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", 40).collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(8), "doc_id", "w", 40
        ).collect()
    }
    assert a == b, "draw must be partitioning-invariant"
    plan = (
        weighted_sample(df, "doc_id", "w", 40)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort
