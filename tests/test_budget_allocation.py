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
