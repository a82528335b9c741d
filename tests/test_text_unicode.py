"""Unicode-mode text operators over non-Latin fixtures (CJK, accented
Latin, Cyrillic, unicode whitespace/punctuation).  The ASCII forms
remain the oracle-parity default; these tests pin the unicode variants'
behavior where the ASCII classes misread real corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

import pymongo_change_stream_reader_spark.operators.text as tx


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t STRING").select(
        col.alias("v")
    ).collect()[0]["v"]


def test_bpe_pieces_accented(spark):
    t = F.col("t")
    # ASCII mode fractures every accented codepoint: caf|é na|ï|ve
    assert _one(spark, "café naïve", tx.bpe_ish_token_count(t)) == 5
    # unicode mode keeps each word whole
    assert _one(spark, "café naïve", tx.bpe_ish_token_count(t, unicode=True)) == 2


def test_bpe_pieces_cjk_and_cyrillic(spark):
    t = F.col("t")
    # every CJK ideograph is non-word in ASCII -> one piece per char
    assert _one(spark, "你好 世界", tx.bpe_ish_token_count(t)) == 4
    assert _one(spark, "你好 世界", tx.bpe_ish_token_count(t, unicode=True)) == 2
    assert _one(spark, "мир труд", tx.bpe_ish_token_count(t, unicode=True)) == 2
    # ASCII/unicode agree on pure-ASCII input (oracle-parity contract)
    for s in ("hello, world 42", "a.b.c"):
        assert _one(spark, s, tx.bpe_ish_token_count(t)) == _one(
            spark, s, tx.bpe_ish_token_count(t, unicode=True)
        )


def test_tokens_unicode_whitespace(spark):
    t = F.col("t")
    nbsp = "hello world"  # NBSP: unicode whitespace, not ASCII \s
    assert _one(spark, nbsp, tx.token_count(t)) == 1
    assert _one(spark, nbsp, tx.token_count(t, unicode=True)) == 2
    ideographic = "你好　世界"  # U+3000 ideographic space
    assert _one(spark, ideographic, tx.token_count(t, unicode=True)) == 2


def test_punct_ratio_unicode(spark):
    t = F.col("t")
    s = "«hola»。"
    # ASCII ranges see none of guillemets / CJK fullwidth stop
    assert _one(spark, s, tx.punct_ratio(t)) == 0.0
    got = _one(spark, s, tx.punct_ratio(t, unicode=True))
    assert abs(got - 3 / len(s)) < 1e-9
    # ASCII text scores identically in both modes
    s2 = "a,b.c!"
    assert _one(spark, s2, tx.punct_ratio(t)) == _one(
        spark, s2, tx.punct_ratio(t, unicode=True)
    )


# ---------------------------------------------------------------------------
# BPE merge training.
# ---------------------------------------------------------------------------
def test_bpe_train_golden_example(spark):
    """The textbook corpus (low/lower/newest/widest) yields the
    canonical first merges and segmentations."""
    from pymongo_change_stream_reader_spark.operators.text import (
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [
            (
                "low low low low low lower lower "
                "newest newest newest newest newest newest "
                "widest widest widest",
            )
        ],
        "text STRING",
    )
    merges, vocab = bpe_train_merges(df, "text", n_merges=10)
    # ('e','s') wins round 1: 6 newest + 3 widest = 9 occurrences
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    segs = {r["w"]: list(r["syms"]) for r in vocab.collect()}
    assert segs["low"] == ["low</w>"]
    assert segs["newest"] == ["newest</w>"]
    assert segs["lower"] == ["low", "e", "r", "</w>"]


def test_bpe_train_deterministic_across_partitioning(spark):
    from pymongo_change_stream_reader_spark.operators.text import (
        bpe_train_merges,
    )
    from pymongo_change_stream_reader_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    m1, _ = bpe_train_merges(d, "text", n_merges=8, max_vocab_words=300)
    m2, _ = bpe_train_merges(
        d.repartition(7), "text", n_merges=8, max_vocab_words=300
    )
    assert m1 == m2 and len(m1) == 8


def test_bpe_job_count_linear_in_merges(spark):
    """r3 verdict ask #3: V merges must cost a BOUNDED number of Spark
    jobs per round (<=3: pair-count+argmax collect, checkpoint
    materialization, and slack for the rewrite) plus a constant setup —
    the scheduler cost a driver-coordinated train pays, asserted so a
    regression to corpus-sized or quadratic job counts surfaces here."""
    from pymongo_change_stream_reader_spark.operators.text import (
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [("aa bb aa bb cc dd aa bb cc",)] * 4, "text STRING"
    )
    sc = spark.sparkContext
    group = "bpe-job-count-test"
    sc.setJobGroup(group, "count BPE jobs")
    try:
        merges, _ = bpe_train_merges(df, "text", n_merges=6)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    v = max(1, len(merges))
    assert len(jobs) <= 3 * v + 4, (len(jobs), v)


def test_bpe_merge_count_gate(spark):
    """n_merges beyond the documented MAX_BPE_MERGES bound raises
    instead of launching an unbounded scheduler loop."""
    import pytest

    from pymongo_change_stream_reader_spark.operators.text import (
        MAX_BPE_MERGES,
        bpe_train_merges,
    )

    df = spark.createDataFrame([("a b",)], "text STRING")
    with pytest.raises(ValueError, match="bounded"):
        bpe_train_merges(df, "text", n_merges=MAX_BPE_MERGES + 1)
