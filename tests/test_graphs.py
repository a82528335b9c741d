"""PageRank (operators/graphs.py): invariants the oracle cannot see —
mass conservation, sink rejection, damping-free uniformity."""

from __future__ import annotations

import pytest

from pymongo_change_stream_reader_spark.operators.graphs import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def test_rank_mass_conserved(spark):
    # bidirected triangle + pendant: total rank stays 1 every round
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    for iters in (1, 3, 7):
        ranks = pagerank(_edges(spark, pairs), iters=iters).collect()
        assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-9
        assert len(ranks) == 4


def test_hub_outranks_pendant(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    r = {x["v"]: x["rank"] for x in
         pagerank(_edges(spark, pairs), iters=5).collect()}
    # c has degree 3 (a, b, d), d has degree 1 — c must dominate
    assert r["c"] > r["a"] > r["d"]
    assert r["c"] > r["b"] > r["d"]


def test_sink_rejected(spark):
    with pytest.raises(ValueError, match="outgoing"):
        pagerank(_edges(spark, [("a", "b")]), iters=1)


def test_symmetric_pair_is_uniform(spark):
    # two vertices exchanging all mass: uniform is the fixed point
    r = {x["v"]: x["rank"] for x in
         pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=4)
         .collect()}
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)
