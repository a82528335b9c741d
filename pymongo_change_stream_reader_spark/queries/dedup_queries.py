"""Dedup queries: exact, n-gram Jaccard (oracle-checked), MinHash-LSH
and SimHash (deterministic sketches; rows-only for the driver, with
recall/precision covered by pytest against the exact pairs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.dedup import (
    exact_dedup,
    exact_jaccard_pairs,
    minhash_dedup_pairs,
    simhash_near_pairs,
)
from pymongo_change_stream_reader_spark.operators.similarity import cosine_dedup_pairs
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')"
_GRAMS = f"""
    CASE WHEN len({_TOKS}) >= 3 THEN
        list_distinct(list_transform(range(1, len({_TOKS}) - 1),
            i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1] || ' ' || {_TOKS}[i+2]))
    ELSE [] END
"""


@query(
    "dedup_exact_hash",
    oracle="""
    SELECT sha256(text)               AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*)                    AS n_copies
    FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 5 = 0
    )
    GROUP BY content_hash
    ORDER BY keep_id
    """,
    doc="Exact dedup via sha-256 content hash (hash-groupBy, keep min "
    "id) over a corpus with planted exact duplicates.",
    tags=("dedup",),
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: single shuffle on the 32-byte hash; partial agg shrinks
    duplicate-heavy inputs map-side."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dups)
    return (
        corpus.groupBy(F.sha2("text", 256).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .orderBy("keep_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(len(list_intersect(ga.grams, gb.grams))::DOUBLE
                 / greatest(len(ga.grams) + len(gb.grams)
                            - len(list_intersect(ga.grams, gb.grams)), 1),
                 6) AS jaccard
    FROM cand
    JOIN g ga ON ga.doc_id = id_a
    JOIN g gb ON gb.doc_id = id_b
    WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE
          / greatest(len(ga.grams) + len(gb.grams)
                     - len(list_intersect(ga.grams, gb.grams)), 1) >= 0.5
    ORDER BY id_a, id_b
    """,
    doc="Exact word-3-gram Jaccard near-dup pairs (>= 0.5) via an "
    "inverted shingle index — the verifier semantics for LSH.",
    tags=("dedup",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", 0.5
    ).orderBy("id_a", "id_b")


@query(
    "dedup_ngram_containment",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT id_a, id_b,
               ROUND(inter / len(ga.grams), 6) AS c_ab,
               ROUND(inter / len(gb.grams), 6) AS c_ba
        FROM cand
        JOIN g ga ON ga.doc_id = id_a
        JOIN g gb ON gb.doc_id = id_b
    )
    SELECT * FROM scored WHERE greatest(c_ab, c_ba) >= 0.9
    ORDER BY id_a, id_b
    """,
    doc="Asymmetric n-gram containment pairs (either direction >= "
    "0.9): |Sa cap Sb|/|Sa| — catches excerpt/superset duplication "
    "that symmetric Jaccard under-scores.  Same one-shuffle "
    "inverted-index pair-count plan as dedup_ngram_jaccard.",
    tags=("dedup",),
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        containment_pairs,
    )

    return containment_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", 0.9
    ).orderBy("id_a", "id_b")


@query(
    "dedup_minhash_lsh",
    oracle=None,  # sketch/banding composition; verified vs exact pairs in pytest
    doc="MinHash(32)+LSH(8 bands) near-dup pairs verified by exact "
    "Jaccard >= 0.5 — the 100 TB-scale dedup path "
    "(shingle -> minhash -> band -> bucket-join -> verify). "
    "Rows-only by design: LSH is probabilistic-recall (a >=0.5 pair "
    "the bands miss is a correct LSH answer, not a bug); on this "
    "corpus the planted near-dups sit far above the threshold where "
    "band-collision probability ~1, so pytest can pin recall exactly.",
    tags=("dedup", "approx"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", threshold=0.5
    ).orderBy("id_a", "id_b")


@query(
    "dedup_simhash",
    oracle=None,  # 64-bit sketch banding; semantics covered in pytest
    doc="SimHash-64 near-dup pairs (Hamming <= 8) via bit-band "
    "bucketing + bit_count verification.",
    tags=("dedup", "approx"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", max_hamming=3
    ).orderBy("id_a", "id_b")


@query(
    "dedup_embedding_cosine",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS score
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.3
    ORDER BY id_a, id_b
    """,
    doc="Embedding near-dup pairs: cosine >= 0.3 over all pairs "
    "(exact form; LSH bucketing is the scale path).",
    tags=("dedup", "similarity"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_dedup_pairs(emb, 0.3).orderBy("id_a", "id_b")


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE
    g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN g ga ON ga.doc_id = id_a
        JOIN g gb ON gb.doc_id = id_b
        WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE
              / greatest(len(ga.grams) + len(gb.grams)
                         - len(list_intersect(ga.grams, gb.grams)), 1) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(v, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.v
    )
    SELECT CAST(v AS BIGINT) AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
    FROM reach GROUP BY v ORDER BY doc_id
    """,
    doc="Near-dup clustering: exact-Jaccard pairs -> connected "
    "components via min-label propagation (each component keeps one "
    "canonical doc); oracle computes the same transitive closure with "
    "a recursive CTE.",
    tags=("dedup",),
)
def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_jaccard_pairs(docs, "text", "doc_id", 0.5)
    return connected_components(pairs, docs.select("doc_id")).orderBy("doc_id")


@query(
    "dedup_survivor_selection",
    oracle=f"""
    WITH RECURSIVE
    g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN g ga ON ga.doc_id = id_a
        JOIN g gb ON gb.doc_id = id_b
        WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE
              / greatest(len(ga.grams) + len(gb.grams)
                         - len(list_intersect(ga.grams, gb.grams)), 1) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(v, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.v
    ),
    comp AS (
        SELECT CAST(v AS BIGINT) AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component
        FROM reach GROUP BY v
    ),
    scored AS (
        SELECT comp.component, comp.doc_id,
               CAST(len({_TOKS}) AS INT) AS n_tokens
        FROM comp JOIN documents USING (doc_id)
    ),
    sized AS (
        SELECT component, COUNT(*) AS n_members FROM scored GROUP BY component
    )
    SELECT s.component, s.doc_id AS survivor_id, s.n_tokens, z.n_members
    FROM scored s JOIN sized z USING (component)
    WHERE z.n_members >= 2
      AND (s.n_tokens, -s.doc_id) = (
          SELECT MAX((t.n_tokens, -t.doc_id)) FROM scored t
          WHERE t.component = s.component)
    ORDER BY component
    """,
    doc="Dedup survivor selection — the end-step of corpus dedup: "
    "near-dup clusters (exact-Jaccard >= 0.5 components) each keep "
    "ONE representative, the longest member with doc_id tie-break; "
    "singleton components pass through untouched (filtered here to "
    "show only the real dup clusters).",
    tags=("dedup", "corpus"),
)
def dedup_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: components via the same min-label propagation as
    dedup_cluster_components; the argmax-per-component is one window
    over the component key — no extra shuffle beyond the clustering
    itself."""
    from pyspark.sql import Window as W

    from pymongo_change_stream_reader_spark.operators import text as tx
    from pymongo_change_stream_reader_spark.operators.dedup import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_jaccard_pairs(docs, "text", "doc_id", 0.5)
    comp = connected_components(pairs, docs.select("doc_id"))
    scored = comp.join(
        docs.select(
            "doc_id", tx.token_count(F.col("text")).alias("n_tokens")
        ),
        "doc_id",
    )
    w = W.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.col("doc_id")
    )
    cw = W.partitionBy("component")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(cw))
        .filter((F.col("rn") == 1) & (F.col("n_members") >= 2))
        .select(
            "component",
            F.col("doc_id").alias("survivor_id"),
            "n_tokens",
            "n_members",
        )
        .orderBy("component")
    )


@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    newg AS (SELECT * FROM g WHERE doc_id % 10 = 0),
    oldg AS (SELECT * FROM g WHERE doc_id % 10 <> 0),
    inv_new AS (SELECT doc_id, unnest(grams) AS gram FROM newg),
    inv_old AS (SELECT doc_id, unnest(grams) AS gram FROM oldg),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
        FROM inv_new n JOIN inv_old o ON n.gram = o.gram
    )
    SELECT new_id, corpus_id,
           ROUND(len(list_intersect(gn.grams, go.grams))::DOUBLE
                 / greatest(len(gn.grams) + len(go.grams)
                            - len(list_intersect(gn.grams, go.grams)), 1),
                 6) AS jaccard
    FROM cand
    JOIN newg gn ON gn.doc_id = new_id
    JOIN oldg go ON go.doc_id = corpus_id
    WHERE len(list_intersect(gn.grams, go.grams))::DOUBLE
          / greatest(len(gn.grams) + len(go.grams)
                     - len(list_intersect(gn.grams, go.grams)), 1) >= 0.5
    ORDER BY new_id, corpus_id
    """,
    doc="Incremental dedup: an arriving batch is checked against the "
    "corpus's ON-DISK LSH band index (written once, band-partitioned; "
    "no corpus self-join), then verified by exact Jaccard — the "
    "append-path dedup a growing 100 TB corpus runs per ingest batch. "
    "ORACLE CAVEAT: the DuckDB side enumerates candidates from the "
    "FULL inverted shingle index while Spark enumerates LSH band "
    "collisions; equality holds because this corpus's planted "
    "near-dups sit far above the 0.5 threshold, where band-collision "
    "probability is ~1 (recall-complete on THIS corpus — a fixture "
    "with borderline pairs would legitimately diverge).",
    tags=("dedup",),
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the corpus band index is write-once storage; per batch
    the new side computes sketches narrowly and joins index buckets —
    cost scales with the BATCH, not the corpus."""
    import tempfile

    from pymongo_change_stream_reader_spark.operators.dedup import (
        _grams_table,
        jaccard,
        query_lsh_index,
        read_lsh_index,
        write_lsh_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    # the real storage round-trip: corpus bands -> parquet -> probe
    safe = sf_dir.strip("/").replace("/", "_")
    index_path = f"{tempfile.gettempdir()}/spark_lsh_index_{safe}"
    write_lsh_index(corpus, index_path, "text", "doc_id")
    cand = query_lsh_index(new, read_lsh_index(spark, index_path), "text", "doc_id")
    # verify with exact Jaccard over the shingle tables
    gn = _grams_table(new, "text", "doc_id", 3).select(
        F.col("doc").alias("new_id"), F.col("grams").alias("grams_n")
    )
    go = _grams_table(corpus, "text", "doc_id", 3).select(
        F.col("doc").alias("corpus_id"), F.col("grams").alias("grams_o")
    )
    return (
        cand.join(gn, "new_id")
        .join(go, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            F.round(jaccard(F.col("grams_n"), F.col("grams_o")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .orderBy("new_id", "corpus_id")
    )


@query(
    "dedup_repeated_ngram_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, j,
               t[j] || ' ' || t[j+1] || ' ' || t[j+2] || ' ' ||
               t[j+3] || ' ' || t[j+4] AS gram
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 4)) AS u(j)
        WHERE len(t) >= 5
    ),
    banned AS (
        SELECT gram
        FROM (SELECT DISTINCT doc_id, gram FROM grams)
        GROUP BY gram HAVING COUNT(*) >= 3
    ),
    covered AS (
        SELECT DISTINCT g.doc_id, p
        FROM grams g JOIN banned b USING (gram),
             LATERAL unnest(generate_series(g.j, g.j + 4)) AS c(p)
    ),
    isl AS (
        SELECT doc_id, p,
               CASE WHEN p - lag(p) OVER (
                   PARTITION BY doc_id ORDER BY p) = 1
                    THEN 0 ELSE 1 END AS brk
        FROM covered
    ),
    stats AS (
        SELECT doc_id, COUNT(*) AS removed, SUM(brk) AS spans
        FROM isl GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(t) AS INT)                     AS n_tokens,
           CAST(COALESCE(spans, 0) AS INT)         AS n_spans,
           CAST(COALESCE(removed, 0) AS INT)       AS removed_tokens,
           CAST(len(t) - COALESCE(removed, 0) AS INT) AS kept_tokens
    FROM toks d LEFT JOIN stats USING (doc_id)
    ORDER BY doc_id
    """,
    doc="Exact-substring dedup at token level: cut every span covered "
    "by a word-5-gram occurring in >= 3 distinct documents "
    "(boilerplate, licenses, templated headers) and report per-doc "
    "span statistics; the DuckDB oracle replays the gram frequency, "
    "interval union, and gaps-and-islands span count in SQL.",
    tags=("dedup", "text", "corpus"),
)
def dedup_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one narrow gram projection, one hash-shuffle count with
    map-side partials, one equi-join on the gram key (both sides
    shuffle-partitioned — the banned set need not fit broadcast), and
    per-row JVM HOFs for the interval algebra; the cleaned text never
    leaves the JVM.  See operators.dedup.remove_repeated_ngrams."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        remove_repeated_ngrams,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        remove_repeated_ngrams(d, "text", "doc_id", n=5, min_docs=3)
        .drop("cleaned_text")
        .orderBy("doc_id")
    )


@query(
    "corpus_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE
    g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM cand
        JOIN g ga ON ga.doc_id = id_a
        JOIN g gb ON gb.doc_id = id_b
        WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE
              / greatest(len(ga.grams) + len(gb.grams)
                         - len(list_intersect(ga.grams, gb.grams)), 1) >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(v, lbl) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.v
    ),
    comp AS (
        SELECT CAST(v AS BIGINT) AS doc_id,
               CAST(MIN(lbl) AS BIGINT) AS component
        FROM reach GROUP BY v
    )
    SELECT doc_id, component,
           CASE WHEN (((component % 2147483648) * 2654435761 + 13) % 4294967296) % 100 < 90
                     THEN 'train'
                WHEN (((component % 2147483648) * 2654435761 + 13) % 4294967296) % 100 < 95
                     THEN 'val'
                ELSE 'test' END AS split
    FROM comp
    ORDER BY doc_id
    """,
    doc="Leakage-safe train/val/test split: documents are first "
    "grouped into near-dup components (exact-Jaccard edges -> "
    "connected components) and the SPLIT IS DECIDED PER COMPONENT by "
    "a seeded multiplicative hash — a near-duplicate can never "
    "straddle train and eval, the invariant that makes held-out "
    "numbers honest.  90/5/5 permille-style buckets; singleton docs "
    "are their own component.",
    tags=("corpus", "dedup", "sampling"),
)
def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the clustering cost is the pair graph's, not the
    corpus's (singletons bypass the loop — operators.dedup.
    connected_components); the split column is a narrow hash
    expression on the component id, so re-splitting with a new seed
    is a literal change over the stored component table."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = exact_jaccard_pairs(docs, "text", "doc_id", 0.5)
    comp = connected_components(pairs, docs.select("doc_id"))
    bucket = (
        (F.col("component") % F.lit(2147483648)) * F.lit(2654435761) + 13
    ) % F.lit(4294967296) % 100
    return comp.select(
        "doc_id",
        "component",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@query(
    "dedup_semdedup",
    oracle=None,  # k-means assignment is not SQL-expressible; invariants in pytest
    doc="SemDeDup semantic deduplication (Abbas et al. 2023): "
    "spherical k-means clusters the embedding corpus, near-duplicate "
    "pairs are enumerated only within a cluster (cell-bounded "
    "quadratic work), components above the cosine threshold keep the "
    "member least similar to its cluster centroid.",
    tags=("dedup", "similarity", "approx"),
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: see operators.dedup.semdedup — model-sized k-means "
    "driver state, cell-keyed self-join, bucketed component "
    "propagation; raise nlist to bound the largest cell."""
    from pymongo_change_stream_reader_spark.operators.dedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, nlist=16, iters=1, threshold=0.9).orderBy("vec_id")


@query(
    "dedup_semdedup_indexed",
    oracle=None,  # approximate family; equality to the in-query-trained path in pytest
    doc="SemDeDup against a STORED quantizer model: the spherical "
    "k-means centroids are trained once (write_semdedup_model) and "
    "reused for every subsequent dedup pass — the ingest-once path "
    "that amortizes the Lloyd-iteration driver collects which "
    "dominate the in-query-trained variant's cost (PERF.md).  Output "
    "identical to dedup_semdedup given the same training parameters "
    "(pytest test_semdedup_model_roundtrip).",
    tags=("dedup", "similarity", "approx"),
)
def dedup_semdedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pymongo_change_stream_reader_spark.operators.dedup import (
        semdedup_from_model,
        write_semdedup_model,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    safe = sf_dir.strip("/").replace("/", "_")
    path = f"{tempfile.gettempdir()}/spark_semdedup_model_{safe}"
    if not os.path.exists(os.path.join(path, "_centroids.json")):
        write_semdedup_model(emb, path, nlist=16, iters=1)
    return semdedup_from_model(emb, path, threshold=0.9).orderBy("vec_id")


_BUCKET = "(((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000"


@query(
    "corpus_fuzzy_decontamination",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    ev AS (SELECT doc_id, grams FROM g WHERE {_BUCKET} < 50),
    tr AS (SELECT doc_id, grams FROM g WHERE {_BUCKET} >= 50),
    ev_inv AS (SELECT doc_id, unnest(grams) AS gram FROM ev),
    tr_inv AS (SELECT doc_id, unnest(grams) AS gram FROM tr),
    cand AS (
        SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
        FROM tr_inv t JOIN ev_inv e ON t.gram = e.gram
    ),
    verified AS (
        SELECT train_id, eval_id,
               round(len(list_intersect(gt.grams, ge.grams))::DOUBLE
                     / greatest(len(gt.grams) + len(ge.grams)
                                - len(list_intersect(gt.grams, ge.grams)),
                                1), 6) AS jacc
        FROM cand
        JOIN tr gt ON gt.doc_id = train_id
        JOIN ev ge ON ge.doc_id = eval_id
    )
    SELECT train_id AS doc_id,
           COUNT(*) AS n_eval_matches,
           MAX(jacc) AS max_jaccard
    FROM verified
    WHERE jacc >= 0.5
    GROUP BY train_id
    ORDER BY doc_id
    """,
    doc="FUZZY benchmark decontamination: training documents whose "
    "word-3-gram Jaccard similarity to any (hash-held-out) benchmark "
    "document reaches 0.5 — the near-duplicate eval-leakage check "
    "that catches paraphrased/lightly-edited contamination the exact "
    "n-gram collision check (corpus_decontamination) misses.  Spark "
    "enumerates candidates by LSH band collision between the train "
    "sketches and the benchmark band index, then verifies with exact "
    "Jaccard; the oracle enumerates from the full inverted shingle "
    "index.  Equality is recall-dependent: at threshold 0.5 with "
    "32 hashes x 8 bands the collision probability is ~1 on this "
    "corpus's planted near-dups (same data-domain caveat as "
    "dedup_minhash_lsh — a fixture change that plants borderline-"
    "similarity pairs could legitimately diverge).",
    tags=("corpus", "dedup", "text"),
)
def corpus_fuzzy_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the benchmark side is small by construction — its band
    table broadcasts; the train side is one narrow sketch projection
    + the band equi-join; exact-Jaccard verification touches only the
    collided pairs, never train x eval."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        _band_table_from_grams,
        _grams_table,
        jaccard,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % 1000
    ev = d.filter(bucket < 50)
    tr = d.filter(bucket >= 50)
    # Both sides are BATCH frames: shingle each side ONCE into a
    # materialized grams table, then derive the band sketches via the
    # exploded-aggregation form and verify from the same cached grams
    # (r14, guide §4/§1.2).  The per-row expression form
    # (lsh_band_table) re-evaluated the interpreted shingle expression
    # inside each of the 32 seeded transforms — 32 shingle passes per
    # row — and the verify leg shingled both sides AGAIN; band values
    # are pytest-pinned identical, so the collided candidate set — and
    # therefore the verified output — is unchanged.
    g_tr = _grams_table(tr, "text", "doc_id", 3)
    g_ev = _grams_table(ev, "text", "doc_id", 3)
    # No forced broadcast on the eval side (r15, VERDICT r14 #3): the
    # eval partition is 5% of the CORPUS — corpus-proportional, a
    # guaranteed OOM as a broadcast hint at 100 TB.  At bench scale AQE
    # converts both joins to broadcast at runtime from the REAL post-
    # aggregation sizes (plans/r15/corpus_fuzzy_decontamination_after
    # .txt: both joins remain BroadcastHashJoin); at corpus scale the
    # same joins degrade gracefully to shuffles instead of OOMing the
    # driver.  Guide §3.1: broadcast only when the small side FITS.
    cand = (
        _band_table_from_grams(g_tr, 32, 8)
        .withColumnRenamed("doc", "train_id")
        .join(
            _band_table_from_grams(g_ev, 32, 8).withColumnRenamed(
                "doc", "eval_id"
            ),
            ["band", "bucket"],
        )
        .select("train_id", "eval_id")
        .distinct()
    )
    gt = g_tr.select(
        F.col("doc").alias("train_id"), F.col("grams").alias("g_t")
    )
    ge = g_ev.select(
        F.col("doc").alias("eval_id"), F.col("grams").alias("g_e")
    )
    verified = (
        cand.join(gt, "train_id")
        .join(ge, "eval_id")
        .select(
            "train_id",
            "eval_id",
            F.round(jaccard(F.col("g_t"), F.col("g_e")), 6).alias("jacc"),
        )
        .filter(F.col("jacc") >= 0.5)
    )
    return (
        verified.groupBy(F.col("train_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("jacc").alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


@query(
    "dedup_ngram_novelty",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    first_seen AS (SELECT gram, MIN(doc_id) AS first_doc FROM inv GROUP BY gram)
    SELECT inv.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           ROUND(SUM(CAST(first_doc = inv.doc_id AS INT))::DOUBLE
                 / COUNT(*), 6) AS novel_frac
    FROM inv JOIN first_seen USING (gram)
    GROUP BY inv.doc_id
    ORDER BY inv.doc_id
    """,
    doc="N-gram novelty per document in ingest order: the fraction of "
    "a doc's distinct 3-grams first seen in THAT doc (first-seen = "
    "min doc_id over the corpus).  The redundancy-growth signal a "
    "streaming-ingest pipeline tracks — near-dups of earlier docs "
    "score ~0, fresh content ~1.  One inverted index, one min "
    "aggregation on the gram key, one join back on the same key.",
    tags=("dedup", "corpus"),
)
def dedup_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: both aggregations and the join shuffle on the gram key
    (AQE reuses the partitioning); no pairwise work anywhere —
    cost is linear in total distinct grams."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        _grams_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    inv = _grams_table(docs, "text", "doc_id", 3).select(
        F.col("doc").alias("doc_id"), F.explode("grams").alias("gram")
    )
    first_seen = inv.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    return (
        inv.join(first_seen, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count("*"),
                6,
            ).alias("novel_frac"),
        )
        .orderBy("doc_id")
    )


_CHURN_TEXT = (
    "churn placeholder text shared by every updated corpus document"
)


@query(
    "dedup_lsh_churn",
    oracle=f"""
    WITH live AS (
        SELECT doc_id,
               CASE WHEN doc_id % 9 = 0 THEN '{_CHURN_TEXT}'
                    ELSE text END AS text
        FROM documents
        WHERE doc_id % 10 <> 0 AND doc_id % 7 <> 1
    ),
    newg AS (
        SELECT doc_id, {_GRAMS} AS grams FROM documents
        WHERE doc_id % 10 = 0
    ),
    oldg AS (SELECT doc_id, {_GRAMS} AS grams FROM live),
    inv_new AS (SELECT doc_id, unnest(grams) AS gram FROM newg),
    inv_old AS (SELECT doc_id, unnest(grams) AS gram FROM oldg),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS corpus_id
        FROM inv_new n JOIN inv_old o ON n.gram = o.gram
    )
    SELECT new_id, corpus_id,
           ROUND(len(list_intersect(gn.grams, go.grams))::DOUBLE
                 / greatest(len(gn.grams) + len(go.grams)
                            - len(list_intersect(gn.grams, go.grams)), 1),
                 6) AS jaccard
    FROM cand
    JOIN newg gn ON gn.doc_id = new_id
    JOIN oldg go ON go.doc_id = corpus_id
    WHERE len(list_intersect(gn.grams, go.grams))::DOUBLE
          / greatest(len(gn.grams) + len(go.grams)
                     - len(list_intersect(gn.grams, go.grams)), 1) >= 0.5
    ORDER BY new_id, corpus_id
    """,
    doc="Incremental dedup against an index that has CHURNED: the "
    "corpus index is built through the generation-tracked relay path, "
    "then every doc_id%7==1 document is DELETED (tombstone_lsh_docs) "
    "and every remaining doc_id%9==0 document is UPDATED to an "
    "unrelated placeholder (tombstone + next-generation re-ingest) — "
    "the reference's insert/update/replace/delete loop "
    "(change_handler.py:11,43-48) applied to the dedup index.  The "
    "arriving batch (doc_id%10==0) probes the LIVE index; the oracle "
    "enumerates exact-Jaccard pairs against the post-churn corpus, so "
    "a flag surviving against a deleted document or a superseded text "
    "is a driver-gate FAILURE, not just a pytest one.  Same "
    "recall-completeness caveat as dedup_incremental_lsh (planted "
    "near-dups sit far above the 0.5 threshold).",
    tags=("dedup", "incremental"),
)
def dedup_lsh_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: churn cost is batch-sized (registry lookups + tombstone
    appends + next-generation sketch appends); the probe is the same
    band-pruned index join as the append-only path, now minus one
    broadcast anti-join against the (bounded, compaction-cleared)
    tombstone set."""
    import os
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.dedup import (
        _grams_table,
        append_lsh_index,
        jaccard,
        query_lsh_index,
        read_lsh_index,
        tombstone_lsh_docs,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus0 = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    path = tempfile.mkdtemp(prefix="spark_lsh_churn_") + "/idx"
    try:
        # build through the generation-tracked path (registry sidecar)
        append_lsh_index(
            corpus0, path, "text", "doc_id", track_generations=True
        )
        # DELETE every %7==1 document
        tombstone_lsh_docs(
            corpus0.filter(F.col("doc_id") % 7 == 1).select(
                F.col("doc_id").alias("doc")
            ),
            path,
        )
        # UPDATE every remaining %9==0 document to the placeholder
        upd = corpus0.filter(
            (F.col("doc_id") % 9 == 0) & (F.col("doc_id") % 7 != 1)
        ).select("doc_id", F.lit(_CHURN_TEXT).alias("text"))
        tombstone_lsh_docs(
            upd.select(F.col("doc_id").alias("doc")), path
        )
        append_lsh_index(upd, path, "text", "doc_id",
                         track_generations=True)
        cand = query_lsh_index(
            new, read_lsh_index(spark, path), "text", "doc_id"
        )
        # verify with exact Jaccard against the POST-CHURN live corpus
        live = corpus0.filter(F.col("doc_id") % 7 != 1).select(
            "doc_id",
            F.when(
                F.col("doc_id") % 9 == 0, F.lit(_CHURN_TEXT)
            ).otherwise(F.col("text")).alias("text"),
        )
        gn = _grams_table(new, "text", "doc_id", 3).select(
            F.col("doc").alias("new_id"), F.col("grams").alias("grams_n")
        )
        go = _grams_table(live, "text", "doc_id", 3).select(
            F.col("doc").alias("corpus_id"), F.col("grams").alias("grams_o")
        )
        return (
            cand.join(gn, "new_id")
            .join(go, "corpus_id")
            .select(
                "new_id",
                "corpus_id",
                F.round(
                    jaccard(F.col("grams_n"), F.col("grams_o")), 6
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.5)
            .orderBy("new_id", "corpus_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@query(
    "dedup_jaccard_prefix_filter",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    inv AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.gram = b.gram AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(len(list_intersect(ga.grams, gb.grams))::DOUBLE
                 / greatest(len(ga.grams) + len(gb.grams)
                            - len(list_intersect(ga.grams, gb.grams)), 1),
                 6) AS jaccard
    FROM cand
    JOIN g ga ON ga.doc_id = id_a
    JOIN g gb ON gb.doc_id = id_b
    WHERE len(list_intersect(ga.grams, gb.grams))::DOUBLE
          / greatest(len(ga.grams) + len(gb.grams)
                     - len(list_intersect(ga.grams, gb.grams)), 1) >= 0.6
    ORDER BY id_a, id_b
    """,
    doc="Exact word-3-gram Jaccard pairs (>= 0.6) via the AllPairs/"
    "PPJoin PREFIX FILTER (operators/dedup.py:"
    "prefix_filtered_jaccard_pairs): only each document's rarest "
    "~(1-t)*sz shingles enter the candidate join (global-frequency "
    "order + length filter), survivors verified exactly — "
    "hash-equal to the full-inverted-index oracle because the prefix "
    "theorem guarantees no false negatives.  The head posting lists "
    "that blow the naive index up at corpus scale never join.",
    tags=("dedup",),
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
    )

    return prefix_filtered_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", 0.6
    ).orderBy("id_a", "id_b")


_TOKS5 = _TOKS
_G5 = f"""
    CASE WHEN len({_TOKS5}) >= 5 THEN
        list_distinct(list_transform(range(1, len({_TOKS5}) - 3),
            i -> {_TOKS5}[i] || ' ' || {_TOKS5}[i+1] || ' ' || {_TOKS5}[i+2]
                 || ' ' || {_TOKS5}[i+3] || ' ' || {_TOKS5}[i+4]))
    ELSE [] END
"""


@query(
    "dedup_entity_resolution",
    oracle=f"""
    WITH RECURSIVE recs AS (
        SELECT doc_id, list_distinct({_TOKS5}) AS toks, lang, n_chars,
               {_G5} AS bks
        FROM documents
    ),
    inv AS (SELECT DISTINCT doc_id, unnest(bks) AS bk FROM recs),
    keep AS (SELECT bk FROM inv GROUP BY bk HAVING COUNT(*) <= 20),
    i2 AS (SELECT doc_id, bk FROM inv WHERE bk IN (SELECT bk FROM keep)),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM i2 a JOIN i2 b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CAST(len(list_intersect(ra.toks, rb.toks)) AS DOUBLE)
                   / CAST(greatest(len(ra.toks) + len(rb.toks)
                          - len(list_intersect(ra.toks, rb.toks)), 1)
                          AS DOUBLE))
            + 0.25 * (CASE WHEN ra.lang = rb.lang THEN 1.0 ELSE 0.0 END)
            + 0.25 * (1.0 - CAST(abs(ra.n_chars - rb.n_chars) AS DOUBLE)
                      / CAST(greatest(ra.n_chars, rb.n_chars, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.doc_id = id_a
        JOIN recs rb ON rb.doc_id = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.7),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT doc_id AS v FROM documents),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lbl) AS entity FROM cc GROUP BY v),
    ranked AS (
        SELECT c.doc_id, c.entity,
               ROW_NUMBER() OVER (PARTITION BY c.entity
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, entity, rn = 1 AS is_canonical
    FROM ranked ORDER BY doc_id
    """,
    doc="Record linkage / entity resolution over documents treated as "
    "multi-field records (operators/linkage.py): word-5-gram BLOCKING "
    "with stop-key removal (posting lists > 20 dropped), weighted "
    "field scoring (0.5 token-set Jaccard + 0.25 lang exact + 0.25 "
    "n_chars closeness, folded left for IEEE identity), match "
    "threshold 0.7, transitive closure through the shared "
    "connected-components loop, canonical survivor = longest doc "
    "(ties to min id).  The oracle mirrors every stage and closes "
    "matches with a recursive min-label CTE.  Every input doc gets a "
    "row (singletons are their own entity).",
    tags=("dedup",),
)
def dedup_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        ngrams_from_tokens,
    )
    from pymongo_change_stream_reader_spark.operators.linkage import (
        MatchField,
        entity_resolution,
        sim_exact,
        sim_numeric_closeness,
        sim_token_jaccard,
    )
    from pymongo_change_stream_reader_spark.operators.text import tokens

    recs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        "lang",
        "n_chars",
        ngrams_from_tokens(tokens(F.col("text")), 5).alias("bks"),
    )
    fields = [
        MatchField("toks", 0.5, sim_token_jaccard),
        MatchField("lang", 0.25, sim_exact),
        MatchField("n_chars", 0.25, sim_numeric_closeness),
    ]
    out = entity_resolution(
        recs,
        "doc_id",
        F.col("bks"),
        fields,
        threshold=0.7,
        canonical_order=[F.col("n_chars")],
        max_block_size=20,
    )
    return out.orderBy("doc_id")


@query(
    "dedup_entity_resolution_incremental",
    oracle=f"""
    WITH RECURSIVE recs AS (
        SELECT doc_id, list_distinct({_TOKS5}) AS toks, lang, n_chars,
               {_G5} AS bks
        FROM documents
    ),
    inv AS (SELECT DISTINCT doc_id, unnest(bks) AS bk FROM recs),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CAST(len(list_intersect(ra.toks, rb.toks)) AS DOUBLE)
                   / CAST(greatest(len(ra.toks) + len(rb.toks)
                          - len(list_intersect(ra.toks, rb.toks)), 1)
                          AS DOUBLE))
            + 0.25 * (CASE WHEN ra.lang = rb.lang THEN 1.0 ELSE 0.0 END)
            + 0.25 * (1.0 - CAST(abs(ra.n_chars - rb.n_chars) AS DOUBLE)
                      / CAST(greatest(ra.n_chars, rb.n_chars, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.doc_id = id_a
        JOIN recs rb ON rb.doc_id = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.7),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT doc_id AS v FROM documents),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    )
    SELECT v AS doc_id, MIN(lbl) AS entity
    FROM cc GROUP BY v ORDER BY doc_id
    """,
    doc="INCREMENTAL entity resolution (operators/linkage.py:"
    "entity_resolution_incremental): the documents corpus arrives in "
    "THREE batches (doc_id % 3); each batch matches only against the "
    "prior corpus + itself through the inverted blocking-key index, "
    "prior entities contract to supernodes for the merge, and the "
    "returned DELTAS (new assignments + relabels of merged prior "
    "entities) fold LWW into the assignment table.  Matches are "
    "symmetric and deterministic, so the incremental fold must equal "
    "the one-shot closure — the oracle recomputes the full recursive "
    "min-label closure over all documents at once.  Same weighted "
    "scoring as dedup_entity_resolution, no stop-key bound (blocking "
    "must be growth-stable for incremental/one-shot parity).",
    tags=("dedup",),
)
def dedup_entity_resolution_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        ngrams_from_tokens,
    )
    from pymongo_change_stream_reader_spark.operators.linkage import (
        MatchField,
        entity_resolution_incremental,
        sim_exact,
        sim_numeric_closeness,
        sim_token_jaccard,
    )
    from pymongo_change_stream_reader_spark.operators.text import tokens

    recs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        "lang",
        "n_chars",
        ngrams_from_tokens(tokens(F.col("text")), 5).alias("bks"),
    )
    fields = [
        MatchField("toks", 0.5, sim_token_jaccard),
        MatchField("lang", 0.25, sim_exact),
        MatchField("n_chars", 0.25, sim_numeric_closeness),
    ]
    assign = None
    prior = None
    for i in range(3):
        batch = recs.filter(F.col("doc_id") % 3 == i).localCheckpoint(
            eager=True
        )
        delta = entity_resolution_incremental(
            batch, prior, assign, "doc_id", F.col("bks"), fields,
            threshold=0.7,
        ).localCheckpoint(eager=True)
        assign = (
            delta
            if assign is None
            else assign.join(delta.select("doc_id"), "doc_id", "anti")
            .unionByName(delta)
            .localCheckpoint(eager=True)
        )
        prior = (
            batch
            if prior is None
            else prior.unionByName(batch).localCheckpoint(eager=True)
        )
    return assign.orderBy("doc_id")


@query(
    "dedup_entity_resolution_registry",
    oracle=f"""
    WITH RECURSIVE recs AS (
        SELECT doc_id, list_distinct({_TOKS5}) AS toks, lang, n_chars,
               {_G5} AS bks
        FROM documents
    ),
    inv AS (SELECT DISTINCT doc_id, unnest(bks) AS bk FROM recs),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CAST(len(list_intersect(ra.toks, rb.toks)) AS DOUBLE)
                   / CAST(greatest(len(ra.toks) + len(rb.toks)
                          - len(list_intersect(ra.toks, rb.toks)), 1)
                          AS DOUBLE))
            + 0.25 * (CASE WHEN ra.lang = rb.lang THEN 1.0 ELSE 0.0 END)
            + 0.25 * (1.0 - CAST(abs(ra.n_chars - rb.n_chars) AS DOUBLE)
                      / CAST(greatest(ra.n_chars, rb.n_chars, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.doc_id = id_a
        JOIN recs rb ON rb.doc_id = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.7),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT doc_id AS v FROM documents),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lbl) AS entity FROM cc GROUP BY v),
    ranked AS (
        SELECT c.doc_id, c.entity,
               ROW_NUMBER() OVER (PARTITION BY c.entity
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, entity, rn = 1 AS is_canonical
    FROM ranked ORDER BY doc_id
    """,
    doc="PERSISTED entity-resolution registry (streaming/er_registry"
    ".py): the documents corpus folds through er_registry_batch in "
    "THREE epochs (doc_id % 3) against a freshly-created on-disk "
    "registry — inverted blocking-key index, record fields, "
    "assignment table and per-entity member index all live in "
    "bucketed LWW stores, so each epoch probes only its own key/"
    "record/member buckets instead of recomputing the prior corpus's "
    "blocking keys (the in-memory operator's documented 100 TB "
    "debt).  The final assignments plus the per-entity CANONICAL "
    "survivor (read_er_entities: longest doc, ties to min id — the "
    "one-shot operator's contract computed from the registry's "
    "stores at read time) must equal the one-shot recursive "
    "min-label closure + ranked-survivor the oracle computes over "
    "all documents at once.  Same weighted scoring as "
    "dedup_entity_resolution, no stop-key bound (blocking must be "
    "growth-stable for incremental/one-shot parity).",
    tags=("dedup",),
)
def dedup_entity_resolution_registry(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.dedup import (
        ngrams_from_tokens,
    )
    from pymongo_change_stream_reader_spark.operators.linkage import (
        MatchField,
        sim_exact,
        sim_numeric_closeness,
        sim_token_jaccard,
    )
    from pymongo_change_stream_reader_spark.operators.text import tokens
    from pymongo_change_stream_reader_spark.streaming.er_registry import (
        ERSpec,
        er_registry_batch,
    )

    recs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        "lang",
        "n_chars",
        "text",
    )
    spec = ERSpec(
        "doc_id",
        [
            MatchField("toks", 0.5, sim_token_jaccard),
            MatchField("lang", 0.25, sim_exact),
            MatchField("n_chars", 0.25, sim_numeric_closeness),
        ],
        # blocking shingles the RAW token sequence (oracle parity) —
        # stored via extra_cols so updates can re-derive old postings
        ngrams_from_tokens(tokens(F.col("text")), 5),
        threshold=0.7,
        extra_cols=("text",),
    )
    path = tempfile.mkdtemp(prefix="spark_er_registry_q_")
    shutil.rmtree(path, ignore_errors=True)
    for i in range(3):
        batch = recs.filter(F.col("doc_id") % 3 == i).withColumn(
            "live", F.lit(True)
        )
        er_registry_batch(batch, path, i + 1, spec, n_buckets=16)
    from pymongo_change_stream_reader_spark.streaming.er_registry import (
        read_er_entities,
    )

    out = (
        read_er_entities(
            spark, path, canonical_order=[F.col("n_chars")]
        )
        .select(
            F.col("rid").alias("doc_id"), "entity", "is_canonical"
        )
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "dedup_er_registry_rebuild",
    oracle=f"""
    WITH RECURSIVE recs AS (
        SELECT doc_id, list_distinct({_TOKS5}) AS toks, lang, n_chars,
               {_G5} AS bks
        FROM documents WHERE doc_id % 7 <> 0
    ),
    inv AS (SELECT DISTINCT doc_id, unnest(bks) AS bk FROM recs),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM inv a JOIN inv b ON a.bk = b.bk AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CAST(len(list_intersect(ra.toks, rb.toks)) AS DOUBLE)
                   / CAST(greatest(len(ra.toks) + len(rb.toks)
                          - len(list_intersect(ra.toks, rb.toks)), 1)
                          AS DOUBLE))
            + 0.25 * (CASE WHEN ra.lang = rb.lang THEN 1.0 ELSE 0.0 END)
            + 0.25 * (1.0 - CAST(abs(ra.n_chars - rb.n_chars) AS DOUBLE)
                      / CAST(greatest(ra.n_chars, rb.n_chars, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.doc_id = id_a
        JOIN recs rb ON rb.doc_id = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.7),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT doc_id AS v FROM documents WHERE doc_id % 7 <> 0),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    ),
    comp AS (SELECT v AS doc_id, MIN(lbl) AS entity FROM cc GROUP BY v),
    ranked AS (
        SELECT c.doc_id, c.entity,
               ROW_NUMBER() OVER (PARTITION BY c.entity
                                  ORDER BY d.n_chars DESC, c.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, entity, rn = 1 AS is_canonical
    FROM ranked ORDER BY doc_id
    """,
    doc="The registry's SPLIT-CORRECT maintenance op "
    "(streaming/er_registry.py:rebuild_er_registry): fold the "
    "documents corpus in three insert epochs, DELETE every doc_id % "
    "7 == 0 in a fourth — streaming no-retraction semantics keep any "
    "entities those records bridged merged — then rebuild: a one-shot "
    "re-resolution over the surviving live records rewrites keys/"
    "members/view in place and re-points the view at the same "
    "applied epoch.  The result must equal the one-shot closure + "
    "ranked survivor computed over ONLY the surviving documents, "
    "which is exactly what the oracle does (doc_id % 7 <> 0) — any "
    "stale bridge-merge the rebuild failed to split would diverge.",
    tags=("dedup",),
)
def dedup_er_registry_rebuild(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.dedup import (
        ngrams_from_tokens,
    )
    from pymongo_change_stream_reader_spark.operators.linkage import (
        MatchField,
        sim_exact,
        sim_numeric_closeness,
        sim_token_jaccard,
    )
    from pymongo_change_stream_reader_spark.operators.text import tokens
    from pymongo_change_stream_reader_spark.streaming.er_registry import (
        ERSpec,
        er_registry_batch,
        read_er_entities,
        rebuild_er_registry,
    )

    recs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_distinct(tokens(F.col("text"))).alias("toks"),
        "lang",
        "n_chars",
        "text",
    )
    spec = ERSpec(
        "doc_id",
        [
            MatchField("toks", 0.5, sim_token_jaccard),
            MatchField("lang", 0.25, sim_exact),
            MatchField("n_chars", 0.25, sim_numeric_closeness),
        ],
        ngrams_from_tokens(tokens(F.col("text")), 5),
        threshold=0.7,
        extra_cols=("text",),
    )
    path = tempfile.mkdtemp(prefix="spark_er_rebuild_q_")
    shutil.rmtree(path, ignore_errors=True)
    for i in range(3):
        batch = recs.filter(F.col("doc_id") % 3 == i).withColumn(
            "live", F.lit(True)
        )
        er_registry_batch(batch, path, i + 1, spec, n_buckets=16)
    dels = recs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "live", F.lit(False)
    )
    er_registry_batch(dels, path, 4, spec, n_buckets=16)
    rebuild_er_registry(spark, path, spec)
    out = (
        read_er_entities(
            spark, path, canonical_order=[F.col("n_chars")]
        )
        .select(
            F.col("rid").alias("doc_id"), "entity", "is_canonical"
        )
        .orderBy("doc_id")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


