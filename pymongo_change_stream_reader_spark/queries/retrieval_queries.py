"""Retrieval queries: BM25 keyword search and hybrid BM25+vector
reciprocal-rank fusion over the documents/embeddings tables.

The north-star serving surface of a curated corpus (SURVEY.md §2.C):
keyword top-k, vector top-k (``similarity_queries``), and their RRF
fusion — the standard hybrid-search shape used by RAG stacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.retrieval import (
    bm25_scores,
    rrf_fuse,
    topk_ranked,
)
from pymongo_change_stream_reader_spark.operators.similarity import (
    brute_force_topk,
)
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')"

# Shared oracle CTE chain: BM25 postings/stats + per-probe-doc scores
# (k1=1.2, b=0.75, Robertson idf ln(1+(N-df+.5)/(df+.5))), score
# rounded to 4 BEFORE ranking so rank order is reproducible across
# engines/summation orders (same convention as ann_cosine_topk).
_BM25_CTES = f"""
    toks AS (
        SELECT doc_id, lower(unnest({_TOKS})) AS term FROM documents
    ),
    post AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM post GROUP BY doc_id),
    consts AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               AVG(CAST(dl AS DOUBLE))  AS avgdl
        FROM dl
    ),
    dfreq AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY term
    ),
    qt AS (
        SELECT p.doc_id AS query_id, p.term,
               ln(1 + (c.n - d.df + 0.5) / (d.df + 0.5)) AS idf
        FROM post p JOIN dfreq d USING (term) CROSS JOIN consts c
        WHERE p.doc_id < 5
    ),
    bm25 AS (
        SELECT qt.query_id, p.doc_id,
               ROUND(SUM(qt.idf * p.tf * 2.2
                     / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / c.avgdl))),
                     4) AS score
        FROM qt JOIN post p USING (term)
        JOIN dl ON dl.doc_id = p.doc_id
        CROSS JOIN consts c
        WHERE p.doc_id <> qt.query_id
        GROUP BY qt.query_id, p.doc_id
    )
"""


@query(
    "text_bm25_topk",
    oracle=f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT query_id, doc_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM bm25
    )
    SELECT * FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
    doc="BM25 more-like-this top-10 for 5 probe documents (k1=1.2, "
    "b=0.75, Robertson idf) — lexical retrieval over the corpus.  "
    "Postings shuffle once on term; the df lookup happens on the "
    "tiny query-term side so the vocabulary never broadcasts.",
    tags=("text", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: postings = one explode + hash agg (map-side partials);
    per-term candidate lookup is a broadcast of |probe terms| rows
    against the postings, shuffled on the same term key the postings
    aggregation already produced; top-k is one window on query_id."""
    d = load_table(spark, sf_dir, "documents")
    scored = bm25_scores(d, probe_ids=[0, 1, 2, 3, 4])
    return (
        topk_ranked(scored, k=10)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


def _bm25_scored_serving(spark, sf_dir: str, probe_ids: list[int]):
    """BM25 scores through the stored serving index (built once per
    sf_dir on first use — the ann_pq_index / semdedup_indexed
    contract).  Bit-identical to bm25_scores (shared scoring core,
    roundtrip pytest), so every consumer keeps its oracle."""
    import getpass
    import hashlib
    import os
    import tempfile

    from pymongo_change_stream_reader_spark.operators.retrieval import (
        bm25_scores_from_index,
        write_bm25_index,
    )

    # Cache key = content fingerprint of the source parquet (paths +
    # sizes + mtimes), inside a per-user directory (0700) — a changed
    # documents table gets a fresh index, and on multi-user hosts no
    # other user can pre-create/poison a predictable world-shared path
    # (ADVICE r3).
    src = os.path.join(sf_dir, "documents.parquet")
    h = hashlib.sha256(os.path.abspath(src).encode())
    stats = []
    if os.path.isdir(src):
        for root, dirs, files in os.walk(src):
            dirs.sort()  # os.walk order is otherwise arbitrary —
            # the fingerprint must be deterministic across runs
            rel_root = os.path.relpath(root, src)
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                # root-relative path (not basename): same-named files
                # in different partitions must not collide
                stats.append(
                    f"{rel_root}/{f}:{st.st_size}:{st.st_mtime_ns}"
                )
    elif os.path.exists(src):
        st = os.stat(src)
        stats.append(f"{os.path.basename(src)}:{st.st_size}:{st.st_mtime_ns}")
    h.update("\n".join(stats).encode())
    base = os.path.join(
        tempfile.gettempdir(), f"spark_bm25_cache_{getpass.getuser()}"
    )
    os.makedirs(base, mode=0o700, exist_ok=True)
    # lstat + symlink rejection: os.stat follows links, so a
    # pre-created symlink pointing at a victim-owned world-writable dir
    # would pass a stat-based owner check while redirecting the index
    # to attacker-controlled storage
    st = os.lstat(base)
    import stat as _stat

    if not _stat.S_ISDIR(st.st_mode) or st.st_uid != os.getuid():
        raise RuntimeError(
            f"BM25 index cache dir {base!r} is a symlink/non-dir or "
            "owned by another user — remove it or set a different TMPDIR"
        )
    path = os.path.join(base, h.hexdigest()[:24])
    if not os.path.exists(os.path.join(path, "_consts.json")):
        write_bm25_index(load_table(spark, sf_dir, "documents"), path)
    return bm25_scores_from_index(spark, path, probe_ids=probe_ids)


@query(
    "retrieval_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    bm25_ranked AS (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS bm25_rank
        FROM bm25
        QUALIFY bm25_rank <= 50
    ),
    qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE vec_id < 5),
    cos AS (
        SELECT q.query_id, c.vec_id AS doc_id,
               ROUND(list_cosine_similarity(q.v, c.embedding::DOUBLE[]),
                     6) AS score
        FROM qv q JOIN embeddings c ON c.vec_id <> q.query_id
    ),
    vec_ranked AS (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS vec_rank
        FROM cos
        QUALIFY vec_rank <= 50
    ),
    fused AS (
        SELECT query_id, doc_id, bm25_rank, vec_rank,
               ROUND(COALESCE(1.0 / (60 + bm25_rank), 0.0)
                     + COALESCE(1.0 / (60 + vec_rank), 0.0), 6) AS rrf
        FROM bm25_ranked FULL JOIN vec_ranked USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, bm25_rank, vec_rank, rrf,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS rnk
        FROM fused
    )
    WHERE rnk <= 5
    ORDER BY query_id, rank
    """,
    doc="Hybrid retrieval: BM25 top-50 and exact-cosine top-50 per "
    "probe fused by reciprocal rank (k=60), top-5 kept.  RRF sums "
    "exact small rationals over integer ranks — hash-stable across "
    "engines by construction.  doc_id <-> vec_id pairs the two "
    "modalities of the same item.",
    tags=("retrieval", "similarity"),
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both legs are per-query top-k lists (tiny); the fusion
    full-outer join is |queries| x 50 rows a side — driver-free,
    broadcast-sized regardless of corpus size.  The BM25 leg serves
    from the stored index (a serving stack scores many requests
    against one ingest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bm25 = topk_ranked(
        _bm25_scored_serving(spark, sf_dir, [0, 1, 2, 3, 4]), k=50
    )
    vec = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=50
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse(bm25, vec, k=60)
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id", "doc_id", "bm25_rank", "vec_rank", "rrf", "rank"
        )
        .orderBy("query_id", "rank")
    )


@query(
    "retrieval_context_assembly",
    oracle=f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT query_id, doc_id,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM bm25
        QUALIFY rank <= 3
    )
    SELECT r.query_id,
           CAST(COUNT(*) AS INT) AS n_ctx,
           string_agg('[' || r.rank || '] doc ' || r.doc_id || ': '
                      || substr(d.text, 1, 80),
                      chr(10) || '---' || chr(10)
                      ORDER BY r.rank) AS context
    FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
    GROUP BY r.query_id
    ORDER BY r.query_id
    """,
    doc="RAG context assembly: the BM25 top-3 passages per probe "
    "query rendered into one ordered context block ('[rank] doc id: "
    "snippet' separated by ---) — the retrieve-then-assemble step a "
    "RAG stack runs per request.  Spark has no ordered string_agg, "
    "so blocks collect as (rank, part) structs, array_sort orders "
    "them inside each group, and one array_join renders the context "
    "(the conversation-assembly pattern: a single hash aggregation, "
    "no window pass).",
    tags=("retrieval", "text"),
)
def retrieval_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the rank lists are |queries| x 3 rows; the text join
    fetches only those docs (broadcast of the tiny ranked side
    against the corpus scan); assembly is one hash aggregation over
    |queries| groups."""
    d = load_table(spark, sf_dir, "documents")
    ranked = topk_ranked(
        _bm25_scored_serving(spark, sf_dir, [0, 1, 2, 3, 4]), k=3
    )
    part = F.concat(
        F.lit("["), F.col("rank").cast("string"),
        F.lit("] doc "), F.col("doc_id").cast("string"),
        F.lit(": "), F.substring(F.col("text"), 1, 80),
    )
    blocks = ranked.join(d.select("doc_id", "text"), "doc_id").select(
        "query_id", F.struct("rank", part.alias("part")).alias("t")
    )
    return (
        blocks.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_ctx"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("t")), lambda s: s["part"]
                ),
                "\n---\n",
            ).alias("context"),
        )
        .select("query_id", "n_ctx", "context")
        .orderBy("query_id")
    )


@query(
    "text_bm25_indexed",
    oracle=f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT query_id, doc_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM bm25
    )
    SELECT * FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
    doc="BM25 top-10 served from a STORED index (postings/doclen/df "
    "parquet + consts JSON, written once by write_bm25_index): the "
    "query-many path scores against the stored tables without "
    "touching raw text — same contract as ann_pq_index / "
    "dedup_semdedup_indexed, and bit-identical output to "
    "text_bm25_topk (shared scoring core), so the same oracle "
    "applies.  Rep 1 of the bench builds the index; rep 2 measures "
    "the amortized serving cost.",
    tags=("text", "retrieval", "indexed"),
)
def text_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored_serving(spark, sf_dir, [0, 1, 2, 3, 4])
    return (
        topk_ranked(scored, k=10)
        .select("query_id", "doc_id", "score", "rank")
        .orderBy("query_id", "rank")
    )


@query(
    "text_bm25_incremental",
    oracle=f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT query_id, doc_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM bm25
    )
    SELECT * FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
    doc="BM25 top-10 served from an index grown INCREMENTALLY "
    "(write the even-doc half, then fold the odd half via "
    "append_bm25_index's LSM path: postings/doclen appends + df "
    "SEGMENT rows + exact integer consts advance).  The same oracle "
    "as text_bm25_topk applies because the append path is "
    "score-bit-identical to a from-scratch build — the driver gate "
    "now proves the incremental-indexing contract, not just pytest.",
    tags=("text", "retrieval", "indexed", "incremental"),
)
def text_bm25_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the append cost is the batch's tokenize + tiny metadata;
    the serving scan is identical to text_bm25_indexed (segment df
    rows merge per queried term only)."""
    import os
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.retrieval import (
        append_bm25_index,
        bm25_scores_from_index,
        write_bm25_index,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = tempfile.mkdtemp(prefix="spark_bm25_incr_")
    try:
        write_bm25_index(d.filter(F.col("doc_id") % 2 == 0), path)
        append_bm25_index(d.filter(F.col("doc_id") % 2 == 1), path)
        scored = bm25_scores_from_index(
            spark, path, probe_ids=[0, 1, 2, 3, 4]
        )
        return (
            topk_ranked(scored, k=10)
            .select("query_id", "doc_id", "score", "rank")
            .orderBy("query_id", "rank")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "text_bm25_upserted",
    oracle=f"""
    WITH {_BM25_CTES},
    ranked AS (
        SELECT query_id, doc_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS INT) AS rank
        FROM bm25
    )
    SELECT * FROM ranked WHERE rank <= 10 ORDER BY query_id, rank
    """,
    doc="BM25 top-10 served from an index that absorbed UPDATES and "
    "DELETES through the generation-tagged LSM path: the index is "
    "first built WRONG (every doc_id%7==0 text replaced by a stale "
    "placeholder, plus extra documents that don't belong), then "
    "upsert_bm25_index re-ingests the true texts and "
    "delete_from_bm25_index removes the extras — the reference's "
    "insert/update/replace/delete loop (change_handler.py:11,43-48). "
    "The standard corpus oracle applies because the post-change index "
    "must equal a from-scratch build over the live corpus, score for "
    "score.",
    tags=("text", "retrieval", "indexed", "incremental"),
)
def text_bm25_upserted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each change batch costs its own tokenize + batch-sized
    metadata (tombstones, consts); the serving scan filters dead
    generations with one broadcast anti-join, and df for the probe
    terms comes from the same filtered postings scan the candidate
    join makes anyway."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.retrieval import (
        bm25_scores_from_index,
        delete_from_bm25_index,
        upsert_bm25_index,
        write_bm25_index,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stale = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.lit("stale placeholder text")
        ).otherwise(F.col("text")),
    )
    # doc_id < 20, not limit(20): limit without an order is not
    # deterministic across separate Spark actions, and the SAME rows
    # must be indexed and later deleted
    extras = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    path = tempfile.mkdtemp(prefix="spark_bm25_ups_")
    try:
        write_bm25_index(stale.unionByName(extras), path)
        upsert_bm25_index(d.filter(F.col("doc_id") % 7 == 0), path)
        delete_from_bm25_index(extras.select("doc_id"), path)
        scored = bm25_scores_from_index(
            spark, path, probe_ids=[0, 1, 2, 3, 4]
        )
        return (
            topk_ranked(scored, k=10)
            .select("query_id", "doc_id", "score", "rank")
            .orderBy("query_id", "rank")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "retrieval_mmr_rerank",
    oracle="""
    WITH q AS (
        SELECT vec_id AS q_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 3
    ),
    c AS (
        SELECT vec_id AS cand_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id >= 3
    ),
    rels AS (
        SELECT q_id, cand_id, cv,
               list_cosine_similarity(qv, cv) AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id
                   ORDER BY list_cosine_similarity(qv, cv) DESC, cand_id
               ) AS rn
        FROM q, c
    ),
    cand AS (SELECT q_id, cand_id, cv, rel FROM rels WHERE rn <= 5),
    s1 AS (
        SELECT q_id, cand_id, cv FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY rel DESC, cand_id) AS rn
            FROM cand) WHERE rn = 1
    ),
    m2 AS (
        SELECT c.q_id, c.cand_id, c.cv,
               0.7 * c.rel
               - (1 - 0.7) * list_cosine_similarity(c.cv, s1.cv) AS s
        FROM cand c JOIN s1
          ON s1.q_id = c.q_id AND s1.cand_id <> c.cand_id
    ),
    s2 AS (
        SELECT q_id, cand_id, cv FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY s DESC, cand_id) AS rn
            FROM m2) WHERE rn = 1
    ),
    m3 AS (
        SELECT c.q_id, c.cand_id,
               0.7 * c.rel
               - (1 - 0.7) * GREATEST(
                     list_cosine_similarity(c.cv, s1.cv),
                     list_cosine_similarity(c.cv, s2.cv)) AS s
        FROM cand c
        JOIN s1 ON s1.q_id = c.q_id
        JOIN s2 ON s2.q_id = c.q_id
        WHERE c.cand_id <> s1.cand_id AND c.cand_id <> s2.cand_id
    ),
    s3 AS (
        SELECT q_id, cand_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY q_id ORDER BY s DESC, cand_id) AS rn
            FROM m3) WHERE rn = 1
    )
    SELECT q_id, cand_id, pos FROM (
        SELECT q_id, cand_id, 1 AS pos FROM s1
        UNION ALL SELECT q_id, cand_id, 2 FROM s2
        UNION ALL SELECT q_id, cand_id, 3 FROM s3
    ) ORDER BY q_id, pos
    """,
    doc="MMR diversity rerank (Carbonell-Goldstein, lambda 0.7): three "
    "query vectors retrieve their top-5 cosine candidates, then the "
    "greedy marginal-relevance loop picks 3 diverse passages each — "
    "the standard anti-redundancy final stage of a RAG retrieval.  "
    "The oracle UNROLLS the greedy loop one CTE per step with the "
    "same (1 - 0.7) IEEE multiplier and smaller-id tie-break; only "
    "the integer selection (q_id, cand_id, pos) is emitted, so the "
    "hash is float-free.",
    tags=("retrieval", "topk"),
)
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: candidate sets are top-k'-sized per query, the pairwise
    sims k'^2 JVM rows per query, the greedy an applyInPandas over
    those precomputed doubles (operators/retrieval.py:mmr_rerank)."""
    from pymongo_change_stream_reader_spark.operators.retrieval import (
        mmr_rerank,
    )
    from pymongo_change_stream_reader_spark.operators.similarity import (
        cosine,
    )
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 3).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    rels = q.crossJoin(c).select(
        "q_id", "cand_id", "cv",
        cosine(F.col("qv"), F.col("cv")).alias("rel"),
    )
    w = W.partitionBy("q_id").orderBy(F.desc("rel"), F.col("cand_id"))
    cand = (
        rels.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "cand_id", F.col("cv").alias("embedding"), "rel")
    )
    return mmr_rerank(cand, k=3, lam=0.7).orderBy("q_id", "pos")
