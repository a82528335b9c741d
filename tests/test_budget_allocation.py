"""Token-budget allocation: largest-remainder invariants on synthetic
source mixes."""

from __future__ import annotations

from pymongo_change_stream_reader_spark.queries import spark_queries


def test_allocations_sum_exactly_to_budget(spark):
    rows = spark_queries()["corpus_token_budget_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "expected at least one source"
    assert sum(r["alloc_tokens"] for r in rows) == 100000
    assert all(r["alloc_tokens"] >= 0 for r in rows)
    # largest-remainder preserves share order: more tokens never gets
    # a smaller allocation
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    for a, z in zip(by_tokens, by_tokens[1:]):
        assert a["alloc_tokens"] <= z["alloc_tokens"] + 1


def test_allocator_invariants_hypothesis(spark):
    """Largest-remainder allocation vs a pure-python reference for ANY
    weight mix: exact budget sum, per-key quota ordering, and equality
    with the arithmetic spec (floor share + rank-ordered remainders)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pymongo_change_stream_reader_spark.queries.corpus_queries import (
        _BUDGET,
        _largest_remainder_alloc,
    )

    @given(
        weights=st.lists(
            st.integers(1, 10**7), min_size=1, max_size=8, unique=True
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(weights):
        rows = [(f"s{i}", w) for i, w in enumerate(weights)]
        per = spark.createDataFrame(rows, "source STRING, n_tokens LONG")
        got = {
            r["source"]: r["alloc_tokens"]
            for r in _largest_remainder_alloc(
                per, "source", "n_tokens"
            ).collect()
        }
        total = sum(weights)
        base = {k: _BUDGET * w // total for k, w in rows}
        frac = sorted(
            rows, key=lambda kv: (-(_BUDGET * kv[1] % total), kv[0])
        )
        leftover = _BUDGET - sum(base.values())
        want = dict(base)
        for k, _ in frac[:leftover]:
            want[k] += 1
        assert got == want, (weights, got, want)
        assert sum(got.values()) == _BUDGET

    check()
