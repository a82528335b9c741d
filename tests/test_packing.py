"""Invariant tests for sequence packing (operators/packing.py): the
properties a training dataloader relies on, checked independently of
the DuckDB oracle queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.packing import (
    pack_greedy,
    pack_offsets,
    shuffle_key,
)

BUDGET = 100


def _docs(spark):
    # token sizes chosen to exercise: exact fits, overflow resets, and
    # one oversized doc (150 > budget) that must sit alone
    rows = [(i, t) for i, t in enumerate([40, 30, 30, 10, 150, 60, 50, 50, 99, 1])]
    return spark.createDataFrame(rows, "doc_id LONG, toks LONG")


def test_greedy_budget_and_oversize(spark):
    packed = pack_greedy(_docs(spark), budget=BUDGET, n_shards=1)
    per_seq = (
        packed.groupBy("seq")
        .agg(
            F.sum("toks").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.collect_list("doc_id").alias("ids"),
        )
        .collect()
    )
    by_seq = {r["seq"]: r for r in per_seq}
    # every multi-doc sequence respects the budget
    for r in per_seq:
        if r["n"] > 1:
            assert r["total"] <= BUDGET
    # the oversized doc (150 tokens) sits alone in its sequence
    oversize_seq = [r for r in per_seq if 4 in r["ids"]]
    assert len(oversize_seq) == 1 and oversize_seq[0]["n"] == 1
    # greedy first-fit on [40,30,30,10,...]: 40+30+30 = 100 exactly fits
    assert sorted(by_seq[0]["ids"]) == [0, 1, 2]


def test_greedy_deterministic_across_shardings(spark):
    # same doc set packs identically run-to-run (and the per-shard
    # assignment is a pure function of doc_id)
    a = pack_greedy(_docs(spark), budget=BUDGET, n_shards=4).collect()
    b = pack_greedy(_docs(spark), budget=BUDGET, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_offsets_contiguous_and_exact(spark):
    packed = pack_offsets(_docs(spark), budget=BUDGET, n_shards=1).collect()
    rows = sorted(packed, key=lambda r: r["doc_id"])
    # offsets are the exact prefix sums: contiguous token stream
    expect = 0
    for r in rows:
        assert r["tok_offset"] == expect
        expect += r["toks"]
        assert r["start_seq"] == r["tok_offset"] // BUDGET
        assert r["end_seq"] == (r["tok_offset"] + r["toks"] - 1) // BUDGET
        assert r["spans"] == r["end_seq"] - r["start_seq"] + 1
    # total sequences cover the whole stream
    assert max(r["end_seq"] for r in rows) == (expect - 1) // BUDGET


def test_shuffle_key_is_permutation_like(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), shuffle_key(F.col("id"), seed=7).alias("k")
    )
    n, nk = df.select(
        F.count(F.lit(1)), F.countDistinct("k")
    ).first()
    assert n == nk == 1000  # no collisions on this domain
    # seed changes the order
    df2 = spark.range(1000).select(shuffle_key(F.col("id"), seed=8).alias("k"))
    assert df2.orderBy("k").first() != df.orderBy("k").first()
