"""SemDeDup operator invariants (no SQL oracle: the k-means
assignment is not SQL-expressible; these pytest invariants are the
declared correctness check, mirroring the LSH/IVF recall tests)."""

from __future__ import annotations

from pyspark.sql import functions as F

# --- SemDeDup --------------------------------------------------------------


def _semdedup_frame(spark):
    # two well-separated directions; planted near-dup group {1,2,3}
    # (pairwise cosine ~1) and a distinct singleton 4 in the same
    # cluster; 10/11 near-dups in the opposite cluster
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.998, 0.02, 0.0]),
        (4, [0.7, 0.7, 0.1]),
        (10, [-1.0, 0.0, 0.0]),
        (11, [-0.999, -0.01, 0.0]),
        (12, [-0.6, -0.8, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_semdedup_removes_planted_near_dups(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import semdedup

    out = semdedup(
        _semdedup_frame(spark), nlist=2, iters=2, threshold=0.99
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    # the {1,2,3} chain collapses to one component, one keeper
    comps = {by_id[i]["component"] for i in (1, 2, 3)}
    assert len(comps) == 1
    assert sum(by_id[i]["keep"] for i in (1, 2, 3)) == 1
    # the keeper is the member least similar to its centroid
    kept = next(i for i in (1, 2, 3) if by_id[i]["keep"])
    assert by_id[kept]["centroid_sim"] == min(
        by_id[i]["centroid_sim"] for i in (1, 2, 3)
    )
    # distinct vectors survive
    for i in (4, 12):
        assert by_id[i]["keep"]
    assert sum(by_id[i]["keep"] for i in (10, 11)) == 1
    # every input row is accounted for
    assert len(out) == 7


def test_semdedup_deterministic_across_runs(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import semdedup

    df = _semdedup_frame(spark)
    a = sorted(map(tuple, semdedup(df, nlist=2, iters=2, threshold=0.99).collect()))
    b = sorted(map(tuple, semdedup(df, nlist=2, iters=2, threshold=0.99).collect()))
    assert a == b


def test_semdedup_high_threshold_keeps_everything(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import semdedup

    df = _semdedup_frame(spark).filter(F.col("vec_id").isin(1, 4, 12))
    out = semdedup(df, nlist=2, iters=1, threshold=0.999999).collect()
    assert all(r["keep"] for r in out)


def test_semdedup_model_roundtrip(spark, tmp_path):
    """semdedup_from_model == semdedup trained in-query with the same
    parameters (deterministic Lloyd training -> identical centroids ->
    identical keep decisions)."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        semdedup,
        semdedup_from_model,
        write_semdedup_model,
    )
    from pymongo_change_stream_reader_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "semdedup_model")
    write_semdedup_model(emb, path, nlist=8, iters=1)
    direct = semdedup(emb, nlist=8, iters=1, threshold=0.9).orderBy("vec_id")
    stored = semdedup_from_model(emb, path, threshold=0.9).orderBy("vec_id")
    assert direct.collect() == stored.collect()


def test_band_table_batch_matches_streaming_form(spark):
    """The codegen'd batch band table must be value-identical to the
    streaming-legal projection form — same seeded hashes, same band
    buckets, including shingle-less docs (all-null signature)."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        lsh_band_table,
        lsh_band_table_batch,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),
        (3, "completely different text about query engines at scale"),
        (4, "too short"),  # < n tokens: empty shingle set
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    old = {
        (r["doc"], r["band"]): r["bucket"]
        for r in lsh_band_table(df, "text", "doc_id").collect()
    }
    new = {
        (r["doc"], r["band"]): r["bucket"]
        for r in lsh_band_table_batch(df, "text", "doc_id").collect()
    }
    assert old == new
    assert len(new) == 5 * 8  # every doc gets all 8 bands


def test_band_table_batch_duplicate_ids_stay_per_row(spark):
    """Two rows SHARING an id must each emit their own band set (the
    per-row semantics of lsh_band_table), not one signature over the
    union of their shingles — callers may hand query_lsh_index frames
    with repeated ids (r9 advice)."""
    from collections import Counter

    from pymongo_change_stream_reader_spark.operators.dedup import (
        lsh_band_table,
        lsh_band_table_batch,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely different text about query engines at scale"),
        (2, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    old = Counter(
        (r["doc"], r["band"], r["bucket"])
        for r in lsh_band_table(df, "text", "doc_id").collect()
    )
    new = Counter(
        (r["doc"], r["band"], r["bucket"])
        for r in lsh_band_table_batch(df, "text", "doc_id").collect()
    )
    assert old == new
    assert sum(new.values()) == 3 * 8  # one band set PER ROW


def test_band_table_batch_plan_has_no_interpreted_minhash(spark):
    """Regression guard for the relay hot path: the batch band table
    must keep its hash-aggregate shape (shingles exploded once, seeded
    hashes as codegen'd columns) and never regress to the expression
    form whose 32 `transform(...)` HOFs re-evaluate the shingling per
    seed (PERF.md round 9: 6.8x on the append write)."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        lsh_band_table_batch,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id INT, text STRING")
    plan = (
        lsh_band_table_batch(df, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    # the seeded minhash HOFs of the expression form (case-sensitive:
    # 'transform(' is the interpreted HOF; 'Transform' appears nowhere)
    assert "transform(" not in plan


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (AllPairs/PPJoin)
# ---------------------------------------------------------------------------
def _pf_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, base),
        (2, base + " again"),                      # near-dup of 1
        (3, base.replace("quick", "rapid")),       # near-dup of 1
        (4, "completely different words entirely here nothing shared"),
        (5, "completely different words entirely here nothing shared ok"),
    ]
    # plus unique chaff so shingle frequencies vary
    rows += [
        (10 + i, f"chaff doc number {i} filler text {i} unique body {i} end")
        for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_prefix_filter_matches_bruteforce(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import (
        exact_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    docs = _pf_corpus(spark)
    for t in (0.5, 0.7):
        fast = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filtered_jaccard_pairs(
                docs, "text", "doc_id", t
            ).collect()
        }
        brute = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in exact_jaccard_pairs(docs, "text", "doc_id", t).collect()
        }
        assert fast == brute
        assert fast  # the fixture plants real near-dup pairs


def test_prefix_filter_prunes_the_index(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    docs = _pf_corpus(spark)
    stats: dict = {}
    out = prefix_filtered_jaccard_pairs(
        docs, "text", "doc_id", 0.8, stats=stats
    )
    out.collect()
    # at t=0.8 the prefix keeps ~20% of each doc's shingles
    assert stats["prefix_rows"] < 0.5 * stats["inv_rows"]
    # candidates stay near the true pair count, not all-pairs
    assert stats["candidates"] <= 10


def test_prefix_filter_integer_threshold_boundary(spark):
    from pymongo_change_stream_reader_spark.operators.dedup import (
        exact_jaccard_pairs,
        prefix_filtered_jaccard_pairs,
    )

    # sz=10 docs at t=0.5: ceil(t*sz) hits an exact integer — the
    # -1e-9 slack must not narrow the prefix and drop this pair
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  # 10 shingles
    b = "w1 w2 w3 w4 w5 w6 w7 w8 x9 x10 x11 x12"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id LONG, text STRING"
    )
    fast = prefix_filtered_jaccard_pairs(docs, "text", "doc_id", 0.5).collect()
    brute = exact_jaccard_pairs(docs, "text", "doc_id", 0.5).collect()
    assert [tuple(r) for r in fast] == [tuple(r) for r in brute]
