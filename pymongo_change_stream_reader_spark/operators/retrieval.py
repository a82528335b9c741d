"""Lexical and hybrid retrieval operators over the documents table.

BM25 ranking (Robertson/Okapi) and reciprocal-rank fusion — the
retrieval counterpart of the embedding ANN family in
``operators/similarity.py``.  The reference
(`/root/reference/pymongo_change_stream_reader`) has no query engine of
its own; these extend the north-star corpus/retrieval surface
(SURVEY.md §2.C) the way a RAG / training-data pipeline uses the
engine: keyword search, vector search, and their fusion.

Scale design (100 TB corpus):

- The **postings table** (doc_id, term, tf) is one explode + one hash
  aggregation with map-side partials; it shuffles on term, the same
  key the per-term lookups join on.
- The **query side is tiny** (a handful of probe documents' distinct
  terms).  Document frequencies are joined onto the query terms FIRST
  — so the vocabulary-sized df table is reduced to |query terms| rows
  before it broadcasts against the postings.  The full df table is
  never broadcast (real vocabularies exceed broadcast size).
- Corpus constants (N, avgdl) are scalars — the model-state pattern
  used by the TF-IDF and IVF operators.
- Per-query top-k is one window partitioned by query_id, ranked on the
  ROUNDED score with a deterministic doc_id tie-break so ranking is
  reproducible across engines and float summation orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators import text as tx


def _postings(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, term, tf) — lower-cased whitespace terms.

    Materialized eagerly: four consumers scan it (doclen, df, query
    terms, the candidate join), which without the barrier each re-run
    the explode over the full corpus — 4 corpus passes instead of 1.
    At cluster scale this is the inverted index you write to storage
    once; released by the harness's release_caches() (the
    _grams_table contract)."""
    # Repartition first: a single-file source would serialize the
    # tokenize explode on one core (the _grams_table lesson).
    toks = (
        docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(tx.tokens(F.col(text_col))).alias("term"),
        )
        .withColumn("term", F.lower("term"))
    )
    post = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf")).persist()
    post.count()  # eager: lazy persists race across join branches
    return post


def bm25_scores(
    docs: DataFrame,
    probe_ids: list[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 "more-like-this": each probe document's distinct terms are
    a query; every OTHER document sharing at least one term is scored.

    score(q, d) = sum over t in q of
        idf(t) * tf(t,d) * (k1+1) / (tf(t,d) + k1*(1 - b + b*|d|/avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Output: (query_id, doc_id, score) — score rounded to 4 (the sum
    over query terms is order-sensitive in the last ulps; 4 decimals
    is ~10 orders above that noise).
    """
    post = _postings(docs, text_col, id_col)
    doclen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # Corpus constants: scalars, not broadcast-join state.
    n_docs, avgdl = (
        doclen.agg(
            F.count("*").cast("double"), F.avg(F.col("dl").cast("double"))
        ).collect()[0]
    )
    dfreq = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return _score_from_tables(
        post, doclen, dfreq, n_docs, avgdl, probe_ids, k1, b
    )


def _score_from_tables(
    post: DataFrame,
    doclen: DataFrame,
    dfreq: DataFrame,
    n_docs: float,
    avgdl: float,
    probe_ids: list[int],
    k1: float,
    b: float,
) -> DataFrame:
    """Shared scoring core — identical math for the in-memory and the
    stored-index paths (roundtrip equality is pytest-pinned)."""
    # Query terms (tiny) pick up their df — vocabulary never broadcasts.
    # The df table may hold SEGMENT rows (one per append batch, the
    # LSM contract of append_bm25_index): join-then-aggregate keeps the
    # segment merge at |query terms| x segments rows, never a
    # vocabulary-wide aggregation.
    qterms = (
        post.filter(F.col("doc_id").isin(probe_ids))
        .select(F.col("doc_id").alias("query_id"), "term")
        .join(dfreq, "term")
        .groupBy("query_id", "term")
        .agg(F.sum("df").alias("df"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .select("query_id", "term", "idf")
    )
    scored = (
        post.join(F.broadcast(qterms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(doclen, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
                )
            ).alias("s"),
        )
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("s"), 4).alias("score")
    )


def write_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Materialize the BM25 serving index: postings / doclen / df
    parquet tables plus ``_consts.json`` (N, avgdl — the only
    driver-sized artifact).  Ingest-once, query-many: later sessions
    score against the stored tables without touching raw text (the
    write_pq_index / write_semdedup_model contract).  At scale the
    postings table would be bucketed on term so the query-term join
    is exchange-free."""
    import json
    import os

    post = _postings(docs, text_col, id_col)
    post.write.mode("overwrite").parquet(os.path.join(path, "postings"))
    doclen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    doclen.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    ).write.mode("overwrite").parquet(os.path.join(path, "dfreq"))
    n_docs, total_len = doclen.agg(
        F.count("*").cast("double"), F.sum("dl").cast("long")
    ).collect()[0]
    post.unpersist()
    _write_consts(path, n_docs, int(total_len or 0))


def _write_consts(path: str, n_docs: float, total_len: int) -> None:
    """Durable consts write (tmp + os.replace).  ``total_len`` (an
    exact integer) is stored alongside avgdl so incremental appends
    recompute avgdl EXACTLY as a from-scratch build would — doc
    lengths are ints, their double sum is exact below 2^53, so
    total_len / n_docs == F.avg(dl) bit-for-bit."""
    import json
    import os

    tmp = os.path.join(path, "_consts.json.tmp")
    avgdl = (total_len / n_docs) if n_docs else 0.0
    with open(tmp, "w") as fh:
        json.dump(
            {"n_docs": n_docs, "avgdl": avgdl, "total_len": total_len}, fh
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, "_consts.json"))


_BM25_TABLES = ("postings", "doclen", "dfreq")


def _list_table_files(path: str, table: str) -> list[str]:
    import os

    root = os.path.join(path, table)
    out = []
    for r, _dirs, files in os.walk(root):
        rel = os.path.relpath(r, root)
        out.extend(
            f if rel == "." else os.path.join(rel, f) for f in files
        )
    return sorted(out)


def recover_bm25_append(path: str) -> bool:
    """Roll back a crashed append_bm25_index: the append journal
    records each table's file listing and the consts BEFORE the
    append, so recovery deletes any file not in the listing and
    restores the consts — the index returns to its exact pre-append
    state and the batch can be re-applied cleanly (the streaming
    consumer does this automatically; its epoch marker commits only
    after a full append).  Returns True if a rollback happened."""
    import json
    import os

    jpath = os.path.join(path, "_append_journal.json")
    if not os.path.exists(jpath):
        return False
    with open(jpath) as fh:
        journal = json.load(fh)
    for table in _BM25_TABLES:
        keep = set(journal["files"][table])
        root = os.path.join(path, table)
        for rel in _list_table_files(path, table):
            if rel not in keep:
                os.unlink(os.path.join(root, rel))
    c = journal["consts"]
    _write_consts(path, c["n_docs"], c["total_len"])
    os.unlink(jpath)
    return True


def append_bm25_index(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    check_new_ids: bool = True,
) -> int:
    """Fold a batch of NEW documents into a stored BM25 index — the
    LSM append path (the lsh append_lsh_index contract applied to
    lexical retrieval):

    - postings/doclen: plain parquet appends (new files, no rewrite);
    - dfreq: appends SEGMENT rows (term, df-of-this-batch); readers
      merge segments per queried term only (join-then-aggregate in
      _score_from_tables — never a vocabulary-wide compaction);
    - _consts.json: n_docs/total_len advance exactly (integer sums),
      so avgdl equals the from-scratch build bit-for-bit and the
      append path stays score-identical to write_bm25_index
      (pytest-pinned).

    CRASH SAFETY: the append spans four durable writes, so before the
    first one a JOURNAL (per-table file listings + consts) is written;
    a crash at any point leaves the journal in place, further appends
    refuse until ``recover_bm25_append`` rolls the partial append
    back, and the batch then re-applies cleanly — without this, a
    replay after a mid-append crash would either double-append
    postings or permanently skip the batch's dfreq/consts (both
    silent score corruption).  The whole append holds the index write
    lock (mutually exclusive with compaction — see
    operators/maintenance.py).

    Append-ONLY: re-ingesting an existing doc_id would double-count
    its terms; with ``check_new_ids`` (default) a collision raises
    before anything is written (one broadcast anti-join of the
    batch's ids against the stored doclen).  Returns the number of
    documents appended."""
    import json
    import os

    from pymongo_change_stream_reader_spark.operators.maintenance import (
        bm25_lock,
    )

    spark = new_docs.sparkSession
    if os.path.exists(os.path.join(path, "_append_journal.json")):
        raise RuntimeError(
            f"BM25 index at {path!r} has a crashed-append journal — "
            "run recover_bm25_append() first"
        )
    with bm25_lock(path):
        with open(os.path.join(path, "_consts.json")) as fh:
            consts = json.load(fh)
        if "total_len" not in consts:
            # index written before the append path existed: derive the
            # exact total once from the stored doclen
            consts["total_len"] = int(
                spark.read.parquet(os.path.join(path, "doclen"))
                .agg(F.sum("dl"))
                .collect()[0][0]
                or 0
            )
        post = _postings(new_docs, text_col, id_col)
        try:
            doclen = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            doclen = doclen.localCheckpoint(eager=True)  # appended + counted
            if check_new_ids:
                stored = spark.read.parquet(
                    os.path.join(path, "doclen")
                ).select("doc_id")
                n_dup = doclen.join(stored, "doc_id", "left_semi").count()
                if n_dup:
                    raise ValueError(
                        f"append_bm25_index: {n_dup} doc_id(s) already in "
                        "the index — the BM25 index is append-only "
                        "(re-ingesting double-counts terms); dedupe "
                        "upstream or rebuild"
                    )
            n_new, new_len = doclen.agg(
                F.count("*").cast("double"), F.sum("dl").cast("long")
            ).collect()[0]
            if not n_new:
                return 0
            # journal BEFORE the first durable write (tmp+fsync+replace)
            journal = {
                "files": {
                    t: _list_table_files(path, t) for t in _BM25_TABLES
                },
                "consts": {
                    "n_docs": consts["n_docs"],
                    "total_len": consts["total_len"],
                },
            }
            jpath = os.path.join(path, "_append_journal.json")
            jtmp = jpath + ".tmp"
            with open(jtmp, "w") as fh:
                json.dump(journal, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(jtmp, jpath)
            post.write.mode("append").parquet(os.path.join(path, "postings"))
            doclen.write.mode("append").parquet(os.path.join(path, "doclen"))
            post.groupBy("term").agg(
                F.countDistinct("doc_id").alias("df")
            ).write.mode("append").parquet(os.path.join(path, "dfreq"))
            _write_consts(
                path,
                consts["n_docs"] + n_new,
                consts["total_len"] + int(new_len or 0),
            )
            os.unlink(jpath)  # commit point: the append is complete
            return int(n_new)
        finally:
            post.unpersist()


def bm25_scores_from_index(
    spark,
    path: str,
    probe_ids: list[int],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score probe queries against a stored BM25 index — reads only
    the postings/doclen/df tables; raw text never loads."""
    import json
    import os

    with open(os.path.join(path, "_consts.json")) as fh:
        consts = json.load(fh)
    post = spark.read.parquet(os.path.join(path, "postings"))
    doclen = spark.read.parquet(os.path.join(path, "doclen"))
    dfreq = spark.read.parquet(os.path.join(path, "dfreq"))
    return _score_from_tables(
        post, doclen, dfreq, consts["n_docs"], consts["avgdl"],
        probe_ids, k1, b,
    )


def topk_ranked(
    scored: DataFrame, k: int, score_col: str = "score"
) -> DataFrame:
    """Per-query top-k on the rounded score, doc_id tie-break."""
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.desc(score_col), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 60,
    names: tuple[str, str] = ("bm25_rank", "vec_rank"),
) -> DataFrame:
    """Reciprocal-rank fusion of two (query_id, doc_id, rank) lists:

        rrf(d) = sum over lists of 1 / (k + rank_list(d))

    A document absent from one list contributes only the other term
    (standard RRF).  The fused score is a sum of exact small rationals
    evaluated identically in any IEEE engine — the most hash-stable
    fusion there is.  Output keeps both source ranks (nullable).
    """
    a = ranked_a.select("query_id", "doc_id", F.col("rank").alias(names[0]))
    b = ranked_b.select("query_id", "doc_id", F.col("rank").alias(names[1]))
    fused = a.join(b, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        names[0],
        names[1],
        F.round(
            F.coalesce(1.0 / (F.lit(k) + F.col(names[0])), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col(names[1])), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return fused
