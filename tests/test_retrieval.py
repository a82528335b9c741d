"""BM25 and RRF hybrid retrieval: pinned against a pure-Python
reference implementation on a hand-built corpus, plus the fusion
algebra invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.retrieval import (
    bm25_scores,
    rrf_fuse,
    topk_ranked,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick red fox"),
    (2, "lazy dogs sleep all day"),
    (3, "quick brown foxes are quick"),
    (4, "an unrelated document about spark engines"),
    (5, "spark engines process the quick data"),
]


def _py_bm25(probe_ids, k1=1.2, b=0.75):
    """Reference BM25 in plain Python (independent of the Spark op)."""
    toks = {i: [w.lower() for w in t.split()] for i, t in DOCS}
    tf = {
        i: {w: ws.count(w) for w in set(ws)} for i, ws in toks.items()
    }
    dl = {i: len(ws) for i, ws in toks.items()}
    n = float(len(DOCS))
    avgdl = sum(dl.values()) / n
    df = {}
    for ws in tf.values():
        for w in ws:
            df[w] = df.get(w, 0) + 1
    out = {}
    for q in probe_ids:
        for d, ws in tf.items():
            if d == q:
                continue
            s = 0.0
            for w in tf[q]:
                if w not in ws:
                    continue
                idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s += (
                    idf
                    * ws[w]
                    * (k1 + 1)
                    / (ws[w] + k1 * (1 - b + b * dl[d] / avgdl))
                )
            if s > 0.0:
                out[(q, d)] = round(s, 4)
    return out


def test_bm25_matches_python_reference(spark):
    d = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(d, probe_ids=[0, 4]).collect()
    }
    assert got == _py_bm25([0, 4])


def test_bm25_self_excluded_and_rank_deterministic(spark):
    d = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    ranked = topk_ranked(bm25_scores(d, probe_ids=[1]), k=10).collect()
    assert all(r["doc_id"] != 1 for r in ranked)
    # ranks are 1..n with score non-increasing, doc_id tie-break
    ranked.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in ranked] == list(range(1, len(ranked) + 1))
    for a, z in zip(ranked, ranked[1:]):
        assert (a["score"], -a["doc_id"]) >= (z["score"], -z["doc_id"])


def test_rrf_fusion_algebra(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id LONG, doc_id LONG, rank INT",
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id LONG, doc_id LONG, rank INT",
    )
    got = {
        r["doc_id"]: (r["bm25_rank"], r["vec_rank"], r["rrf"])
        for r in rrf_fuse(a, b, k=60).collect()
    }
    # doc in both lists sums both reciprocal terms
    assert got[11] == (2, 1, round(1 / 62 + 1 / 61, 6))
    # doc in exactly one list keeps a null rank for the other leg
    assert got[10] == (1, None, round(1 / 61, 6))
    assert got[13] == (None, 2, round(1 / 62, 6))
    assert set(got) == {10, 11, 12, 13}


def test_bm25_randomized_corpora_match_python(spark):
    """Three seeded pseudo-random corpora (varying vocab sizes and doc
    lengths, incl. repeated terms and an empty-ish doc) must agree
    with the pure-Python scorer exactly at the rounded width."""
    import random

    for seed in (11, 29, 47):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(rng.randint(5, 30))]
        corpus = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
            for i in range(rng.randint(4, 12))
        ]
        probes = [0, len(corpus) - 1]

        global DOCS
        saved = DOCS
        try:
            DOCS = corpus  # reuse the reference impl over this corpus
            expect = _py_bm25(probes)
        finally:
            DOCS = saved

        d = spark.createDataFrame(corpus, "doc_id LONG, text STRING")
        got = {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in bm25_scores(d, probe_ids=probes).collect()
        }
        assert got == expect, f"seed {seed}"


def test_bm25_stored_index_roundtrip_equals_in_memory(spark, tmp_path):
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        bm25_scores_from_index,
        write_bm25_index,
    )

    d = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    expect = sorted(
        map(tuple, bm25_scores(d, probe_ids=[0, 4]).collect())
    )
    path = str(tmp_path / "bm25_index")
    write_bm25_index(d, path)
    spark.catalog.clearCache()
    got = sorted(
        map(
            tuple,
            bm25_scores_from_index(spark, path, probe_ids=[0, 4]).collect(),
        )
    )
    assert got == expect


def test_mmr_demotes_redundant_candidates(spark):
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        mmr_rerank,
    )

    # c1 best rel; c2 slightly lower rel but nearly identical to c1;
    # c3 lower rel but orthogonal — MMR must pick c1, c3 before c2
    rows = [
        (0, 1, 0.95, [1.0, 0.0, 0.0]),
        (0, 2, 0.94, [0.999, 0.04, 0.0]),
        (0, 3, 0.80, [0.0, 1.0, 0.0]),
    ]
    cand = spark.createDataFrame(
        rows, "q_id INT, cand_id INT, rel DOUBLE, embedding ARRAY<DOUBLE>"
    )
    out = [
        (r["cand_id"], r["pos"])
        for r in mmr_rerank(cand, k=3, lam=0.7)
        .orderBy("pos")
        .collect()
    ]
    assert out == [(1, 1), (3, 2), (2, 3)]


def test_mmr_lambda_one_is_pure_relevance(spark):
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [
        (0, i, 1.0 - i / 10.0, [float(i), 1.0, 0.0]) for i in range(1, 5)
    ]
    cand = spark.createDataFrame(
        rows, "q_id INT, cand_id INT, rel DOUBLE, embedding ARRAY<DOUBLE>"
    )
    out = [
        r["cand_id"]
        for r in mmr_rerank(cand, k=4, lam=1.0).orderBy("pos").collect()
    ]
    assert out == [1, 2, 3, 4]


def test_mmr_k_exceeding_candidates_returns_all(spark):
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [(7, 1, 0.9, [1.0, 0.0]), (7, 2, 0.8, [0.0, 1.0])]
    cand = spark.createDataFrame(
        rows, "q_id INT, cand_id INT, rel DOUBLE, embedding ARRAY<DOUBLE>"
    )
    out = mmr_rerank(cand, k=10, lam=0.7).collect()
    assert len(out) == 2


def test_mmr_plan_has_no_pair_join(spark):
    """r10 shape contract: the kernel receives k' candidate rows per
    query, never a k'^2 pair table — the plan must contain no join
    (r9 built a self-join of candidates on q)."""
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        mmr_rerank,
    )
    from pyspark.sql import functions as F

    cand = spark.createDataFrame(
        [(1, i, 1.0 / (i + 1), [float(i), 1.0]) for i in range(20)],
        "q_id INT, cand_id INT, rel DOUBLE, embedding ARRAY<DOUBLE>",
    )
    out = mmr_rerank(cand, k=5, lam=0.7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for j in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
              "BroadcastNestedLoopJoin"):
        assert j not in plan, j
    assert out.count() == 5
