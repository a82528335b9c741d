"""Oracle-checked text-analysis queries over the documents table
(SURVEY north-star extensions: token counting, quality scoring,
language ID, fingerprinting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators import text as tx
from pymongo_change_stream_reader_spark.operators.dedup import exact_dedup
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

# DuckDB fragments mirroring operators/text.py
_TOKS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')"
_STOP = {
    "en": "['the','a','and','of','to']",
    "de": "['der','die','das','und','ist']",
    "es": "['el','la','los','es','y']",
    "fr": "['le','la','les','est','et']",
}
_HITS = {
    lang: f"len(list_filter({_TOKS}, w -> list_contains({words}, lower(w))))"
    for lang, words in _STOP.items()
}


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOKS}) AS INT)                          AS n_tokens,
           CAST(length(text) AS INT)                          AS n_chars,
           ROUND(list_sum(list_transform({_TOKS}, w -> length(w)))
                 / greatest(len({_TOKS}), 1), 4)              AS mean_token_len
    FROM documents
    ORDER BY doc_id
    """,
    doc="Whitespace token counting + char stats per document.",
    tags=("text",),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(tx.mean_token_len(t), 4).alias("mean_token_len"),
    ).orderBy("doc_id")


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           ROUND(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
                 / greatest(length(text), 1), 6)                    AS punct_ratio,
           ROUND({_HITS['en']} / greatest(len({_TOKS}), 1), 6)      AS stopword_ratio,
           ROUND(least(length(text) / 200.0, 1.0) * 0.4
                 + least({_HITS['en']} / greatest(len({_TOKS}), 1) * 5, 1.0) * 0.4
                 + (1 - least(len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
                              / greatest(length(text), 1) * 10, 1.0)) * 0.2,
                 6)                                                 AS quality
    FROM documents
    ORDER BY doc_id
    """,
    doc="Quality heuristics: punctuation density, stopword ratio, "
    "composite score.",
    tags=("text",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.round(tx.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(tx.stopword_ratio(t, "en"), 6).alias("stopword_ratio"),
        F.round(tx.quality_score(t), 6).alias("quality"),
    ).orderBy("doc_id")


@query(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT lang AS label,
               {_HITS['en']} AS s_en, {_HITS['de']} AS s_de,
               {_HITS['es']} AS s_es, {_HITS['fr']} AS s_fr
        FROM documents
    ), pred AS (
        SELECT label,
               CASE
                 WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                 WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                 WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                 WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                 ELSE 'fr'
               END AS predicted
        FROM scored
    )
    SELECT label, predicted, COUNT(*) AS n
    FROM pred
    GROUP BY label, predicted
    ORDER BY label, predicted
    """,
    doc="Stopword-argmax language ID vs the labeled lang column "
    "(deterministic tie-break in language-code order).",
    tags=("text",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # CollapseProject hygiene WITHOUT leaked caches (the old form left
    # two never-released persists resident for the session): tokenize
    # once behind an EAGER persist barrier (released by the harness —
    # see release_caches in queries/__init__), compute the 4 score
    # columns once each, then put an AGGREGATE between the scores and
    # the argmax CASE — projections don't collapse through a groupBy,
    # so the ~12 score references in the CASE read plain ints instead
    # of re-inlining the interpreted HOF filters (~3x; PERF.md).
    toksed = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("lang").alias("label"),
            F.transform(tx.tokens(F.col("text")), F.lower).alias("toks"),
        )
        .persist()
    )
    toksed.count()  # eager: lazy persists race across scan branches

    def _in_words(words: tuple[str, ...]):
        # 1-arg closure: PySpark derives HOF arity from the signature
        return lambda t: t.isin(*words)

    score_cols = [f"s_{lang}" for lang in tx.STOPWORDS]
    hits = (
        toksed.select(
            "label",
            *[
                F.size(
                    F.filter(F.col("toks"), _in_words(tx.STOPWORDS[lang]))
                ).alias(f"s_{lang}")
                for lang in tx.STOPWORDS
            ],
        )
        .groupBy("label", *score_cols)
        .agg(F.count(F.lit(1)).alias("m"))
    )
    best = F.greatest(*[F.col(c) for c in score_cols])
    predicted = F.lit("unknown")
    for lang in sorted(tx.STOPWORDS, reverse=True):
        predicted = F.when(
            (F.col(f"s_{lang}") > 0) & (F.col(f"s_{lang}") == best), lang
        ).otherwise(predicted)
    return (
        hits.select("label", predicted.alias("predicted"), "m")
        .groupBy("label", "predicted")
        .agg(F.sum("m").alias("n"))
        .orderBy("label", "predicted")
    )


@query(
    "text_fingerprint_dedup",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           COUNT(*) AS n_copies
    FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, upper(text) FROM documents WHERE doc_id % 3 = 0
    )
    GROUP BY fingerprint
    ORDER BY keep_id
    """,
    doc="Exact dedup on the md5 content fingerprint over a corpus with "
    "planted case-variant duplicates (normalization folds them).",
    tags=("text", "dedup"),
)
def text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), F.upper("text").alias("text"))
    )
    corpus = d.unionByName(dups)
    return exact_dedup(corpus, "text", "doc_id").orderBy("keep_id")


@query(
    "text_bpe_token_count",
    oracle=None,  # lookaround regex not expressible in DuckDB's RE2
    doc="BPE-ish sub-word token counting (word-boundary split regex); "
    "rows-only — the oracle's RE2 lacks lookarounds.",
    tags=("text",),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        tx.token_count(F.col("text")).alias("n_ws_tokens"),
    ).orderBy("doc_id")


@query(
    "text_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lower(unnest({_TOKS})) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                   AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rnk
        FROM scored
    )
    SELECT doc_id, term, score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk
    """,
    doc="TF-IDF top-3 terms per document (smoothed idf, deterministic "
    "tie-break) — keyword extraction / quality signal for corpus "
    "curation.",
    tags=("text", "corpus"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one explode + two hash aggregations (doc-term TF, term
    DF); the DF side is term-cardinality-sized and broadcasts; the
    corpus count is a scalar. The only wide exchange is the per-doc
    top-k window, partitioned on doc_id."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("term")
    ).withColumn("term", F.lower("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = d.count()  # scalar (the model-state pattern)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0),
            6,
        ).alias("score"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
        .orderBy("doc_id", "rnk")
    )


@query(
    "text_repetition_scores",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i+1])) AS gram
        FROM toks WHERE len(t) >= 2
    ),
    counts AS (
        SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY doc_id, gram
    ),
    rep AS (
        SELECT doc_id,
               ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_bigram_frac
        FROM counts GROUP BY doc_id
    )
    SELECT toks.doc_id,
           ROUND(len(list_distinct(t))::DOUBLE / greatest(len(t), 1), 6)
               AS distinct_token_ratio,
           COALESCE(rep.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM toks LEFT JOIN rep ON toks.doc_id = rep.doc_id
    ORDER BY toks.doc_id
    """,
    doc="Repetition quality signals (Gopher-style): most-frequent-"
    "bigram fraction and distinct-token ratio per document — the "
    "filters that catch boilerplate/spam in pretraining corpora.",
    tags=("text", "corpus"),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenization is one narrow pass; the bigram counts are
    one explode + (doc, gram) aggregation with map-side partials; the
    per-doc max/sum is a second small aggregation on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tx.tokens(F.col("text")).alias("t"))
    # raw (non-distinct) word bigrams via zipped slices
    length = F.size("t") - 1
    bigrams = F.zip_with(
        F.slice("t", 1, length),
        F.slice("t", 2, length),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    g2 = toks.filter(F.size("t") >= 2).select(
        "doc_id", F.explode(bigrams).alias("gram")
    )
    rep = (
        g2.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac")
        )
    )
    base = toks.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct("t")) / F.greatest(F.size("t"), F.lit(1)),
            6,
        ).alias("distinct_token_ratio"),
    )
    return (
        base.join(rep, "doc_id", "left")
        .select(
            "doc_id",
            "distinct_token_ratio",
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_unicode_stats",
    oracle=None,  # JVM \p{L}/\p{N}/(?U)\s classes are not bit-reproducible
    # in DuckDB's RE2 (no lookarounds, (?U) means ungreedy there);
    # semantics pinned on CJK/accented fixtures in test_text_unicode.py
    doc="Unicode-mode token/piece/punctuation stats (\\p{L}\\p{N} word "
    "classes, unicode whitespace): the variant a non-ASCII pretraining "
    "corpus needs — CJK ideographs and accented words count as word "
    "characters instead of fracturing per codepoint.",
    tags=("text",),
)
def text_unicode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        tx.token_count(t, unicode=True).alias("n_tokens"),
        tx.bpe_ish_token_count(t, unicode=True).alias("n_pieces"),
        F.round(tx.punct_ratio(t, unicode=True), 6).alias("punct_ratio"),
    ).orderBy("doc_id")


@query(
    "text_bpe_trained_segmentation",
    doc="Real BPE training (iterative most-frequent-pair merges over "
    "the word-frequency table — vocabulary-sized state, never the "
    "corpus; driver-coordinated rounds like $graphLookup's BFS with "
    "a localCheckpoint per round) followed by vocabulary "
    "segmentation.  Rows-only: the merge recursion is not "
    "SQL-expressible; the canonical textbook example and "
    "partitioning-invariance are pytest-golden in "
    "tests/test_text_unicode.py.",
    tags=("text", "tokenizer"),
)
def text_bpe_trained_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.text import (
        bpe_train_merges,
    )

    d = load_table(spark, sf_dir, "documents")
    merges, vocab = bpe_train_merges(
        d, "text", n_merges=20, max_vocab_words=500
    )
    return vocab.select(
        "w",
        "cnt",
        F.size("syms").alias("n_pieces"),
        F.array_join("syms", " ").alias("pieces"),
    ).orderBy(F.col("cnt").desc(), F.col("w"))


@query(
    "text_chunk_sliding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 500
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk,
               CAST(least(32, len(t) - i * 24) AS BIGINT) AS n_tokens
        FROM toks,
             LATERAL unnest(range(0, greatest(1,
                 CAST(ceil((len(t) - 8)::DOUBLE / 24) AS BIGINT)))) u(i)
        WHERE len(t) > 0
    )
    SELECT doc_id, chunk_id, chunk, n_tokens
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
    doc="Sliding-window chunking (size 32 tokens, stride 24 = 8-token "
    "overlap) — the retrieval/embedding prep step that splits long "
    "documents into overlapping passages.  Chunk boundaries are pure "
    "arithmetic over the token array (slice + stride), computed as "
    "one JVM-HOF projection + posexplode: no UDF, no shuffle beyond "
    "the explode, deterministic chunk ids.",
    tags=("text",),
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    size, stride = 32, 24
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    toks = tx.tokens(F.col("text"))
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((F.size(toks) - (size - stride)).cast("double") / stride).cast(
            "long"
        ),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(toks, i.cast("int") * stride + 1, size), " "
            ).alias("chunk"),
            F.least(
                F.lit(size).cast("long"),
                (F.size(toks) - i.cast("int") * stride).cast("long"),
            ).alias("n_tokens"),
        ),
    )
    return (
        d.filter(F.size(toks) > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.chunk", "c.n_tokens")
        .orderBy("doc_id", "chunk_id")
    )


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len({_TOKS}) >= 3 THEN
                   list_transform(range(1, len({_TOKS}) - 1),
                       i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]
                            || ' ' || {_TOKS}[i+2])
               ELSE [] END AS grams
        FROM documents WHERE doc_id < 300
    ),
    fp AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, greatest(0, len(grams) - 3)),
                   i -> list_min(list_transform(grams[i+1:i+4],
                        x -> ('0x' || substr(md5(x), 1, 8))::UBIGINT))
               ))) AS fingerprint
        FROM g
    )
    SELECT doc_id, CAST(fingerprint AS BIGINT) AS fingerprint
    FROM fp ORDER BY doc_id, fingerprint
    """,
    doc="Winnowing document fingerprints (Schleimer et al. 2003, the "
    "MOSS local-fingerprinting algorithm): hash every word-3-gram, "
    "slide a window of 4 consecutive hashes, select each window's "
    "minimum — guaranteeing any match of >= 6 consecutive tokens "
    "shares a fingerprint, with a bounded fraction of hashes kept.  "
    "Pure JVM expressions (md5-prefix hash shared bit-identically "
    "with the oracle); positions are omitted — the selected-value "
    "SET is the dedup/overlap index.  One narrow projection + "
    "explode; fingerprint-equality joins then find cross-document "
    "overlaps without any pairwise scan.",
    tags=("text", "dedup"),
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import word_ngrams

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    # positional grams (word_ngrams dedupes — winnowing needs the
    # positional sequence, so build the gram list without distinct)
    toks = tx.tokens(F.col("text"))
    length = F.size(toks) - 2
    grams = F.slice(toks, 1, length)
    for j in range(1, 3):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, length),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(F.size(toks) >= 3, grams).otherwise(
        F.array().cast("array<string>")
    )
    h = lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")
    # guard: Spark's sequence(0, hi) runs DESCENDING when hi < 0, so a
    # doc with < 4 grams must short-circuit to no windows explicitly
    fps = F.when(
        F.size("grams") >= 4,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size("grams") - 4),
                lambda i: F.array_min(
                    F.transform(F.slice("grams", i.cast("int") + 1, 4), h)
                ),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return (
        d.select("doc_id", grams.alias("grams"))
        .select("doc_id", F.explode(fps).alias("fingerprint"))
        .orderBy("doc_id", "fingerprint")
    )


@query(
    "text_winnowing_overlap_pairs",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               CASE WHEN len({_TOKS}) >= 3 THEN
                   list_transform(range(1, len({_TOKS}) - 1),
                       i -> {_TOKS}[i] || ' ' || {_TOKS}[i+1]
                            || ' ' || {_TOKS}[i+2])
               ELSE [] END AS grams
        FROM documents WHERE doc_id < 300
    ),
    fp AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(0, greatest(0, len(grams) - 3)),
                   i -> list_min(list_transform(grams[i+1:i+4],
                        x -> ('0x' || substr(md5(x), 1, 8))::UBIGINT))
               ))) AS fingerprint
        FROM g WHERE len(grams) >= 4
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           COUNT(*) AS shared_fingerprints
    FROM fp a JOIN fp b
      ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY id_a, id_b
    HAVING COUNT(*) >= 3
    ORDER BY id_a, id_b
    """,
    doc="MOSS-style overlap detection: document pairs sharing >= 3 "
    "winnowing fingerprints — localized-copy detection (a >= 6-token "
    "verbatim span is guaranteed to collide) through one fingerprint "
    "equi-join + pair count, never a pairwise text scan.  The "
    "fingerprint index is what a plagiarism/license-contamination "
    "sweep stores; the join cost scales with collisions, not with "
    "corpus-squared.",
    tags=("text", "dedup"),
)
def text_winnowing_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = text_winnowing_fingerprints(spark, sf_dir)
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= 3)
        .orderBy("id_a", "id_b")
    )


@query(
    "text_sparse_cosine_pairs",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest({_TOKS}) AS tok
              FROM documents WHERE doc_id < 120)
        GROUP BY doc_id, tok
    ),
    norms AS (
        SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS nsq FROM tf GROUP BY doc_id
    ),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
        FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY id_a, id_b
    )
    SELECT id_a, id_b,
           ROUND(dot / (sqrt(na.nsq::DOUBLE) * sqrt(nb.nsq::DOUBLE)), 6)
               AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = id_a
    JOIN norms nb ON nb.doc_id = id_b
    WHERE dot / (sqrt(na.nsq::DOUBLE) * sqrt(nb.nsq::DOUBLE)) >= 0.6
    ORDER BY id_a, id_b
    """,
    doc="Sparse bag-of-words cosine similarity pairs: term-frequency "
    "vectors compared through one token equi-join (dot products and "
    "norms are INTEGER sums — exact in any aggregation order; the "
    "single sqrt/divide at the end is IEEE-deterministic, so the "
    "score is bit-stable cross-engine).  The sparse counterpart to "
    "the dense embedding-cosine path: no embedding model needed, "
    "cost scales with shared-term collisions (inverted index), not "
    "docs-squared.",
    tags=("text", "dedup"),
)
def text_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    tf = (
        d.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tf.count()  # eager: four consumers (a/b sides, two norm joins) —
    # without the barrier each re-runs the explode + count shuffle
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("nsq")
    )
    a, b = tf.alias("a"), tf.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.tf") * F.col("b.tf")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("nsq").alias("nsq_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("nsq").alias("nsq_b"))
    cos = F.col("dot") / (
        F.sqrt(F.col("nsq_a").cast("double"))
        * F.sqrt(F.col("nsq_b").cast("double"))
    )
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= 0.6)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .orderBy("id_a", "id_b")
    )


@query(
    "text_script_detection",
    oracle="""
    WITH counts AS (
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '[A-Za-z]')) AS latin_n,
               len(regexp_extract_all(text, '[一-鿿]'))   AS cjk_n,
               len(regexp_extract_all(text, '[À-ÿ]'))    AS accented_n
        FROM documents
    ),
    dom AS (
        SELECT lang,
               CASE
                   WHEN cjk_n > latin_n + accented_n THEN 'cjk'
                   WHEN latin_n + accented_n > 0 THEN 'latin'
                   ELSE 'other'
               END AS script,
               latin_n + accented_n + cjk_n AS letters
        FROM counts
    )
    SELECT lang, script,
           COUNT(*) AS n_docs,
           CAST(SUM(letters) AS BIGINT) AS letters
    FROM dom
    GROUP BY lang, script
    ORDER BY lang, script
    """,
    doc="Unicode script detection: per-document Latin / accented-Latin "
    "/ CJK codepoint counts via plain codepoint-range regex classes "
    "(identical semantics in Java regex and RE2) -> dominant script "
    "per document, aggregated per labeled language — the script-"
    "consistency screen a multilingual corpus runs before language-"
    "specific processing (mislabeled or transliterated docs show up "
    "as script/label disagreement).  One narrow JVM regexp_count "
    "projection; no tokenization needed.",
    tags=("text",),
)
def text_script_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    latin = F.regexp_count(F.col("text"), F.lit("[A-Za-z]"))
    cjk = F.regexp_count(F.col("text"), F.lit("[一-鿿]"))
    accented = F.regexp_count(F.col("text"), F.lit("[À-ÿ]"))
    script = (
        F.when(cjk > latin + accented, "cjk")
        .when(latin + accented > 0, "latin")
        .otherwise("other")
    )
    return (
        d.select(
            "lang",
            script.alias("script"),
            (latin + accented + cjk).alias("letters"),
        )
        .groupBy("lang", "script")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("letters").cast("bigint").alias("letters"),
        )
        .orderBy("lang", "script")
    )


_PRETOK = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^A-Za-zÀ-ÿ0-9\s]+"


@query(
    "text_tokenizer_efficiency",
    oracle=f"""
    WITH per AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(regexp_extract_all(text, '{_PRETOK}')) AS BIGINT)
                   AS n_pieces
        FROM documents
    )
    SELECT lang,
           CAST(SUM(n_chars) AS BIGINT)  AS total_chars,
           CAST(SUM(n_pieces) AS BIGINT) AS total_pieces,
           ROUND(SUM(n_chars)::DOUBLE / greatest(SUM(n_pieces), 1), 4)
               AS chars_per_piece
    FROM per
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Tokenizer-efficiency profile: characters per pre-token piece "
    "per language, using a lookaround-free GPT-2-style pre-tokenizer "
    "(letter runs | digit runs | punctuation runs - identical "
    "semantics in Java regex and RE2).  The fertility metric that "
    "decides per-language token budgets and surfaces scripts a "
    "tokenizer handles poorly (CJK shows ~1 char/piece under a "
    "Latin-centric pre-tokenizer).  One narrow regexp projection + "
    "one aggregation; exact integer sums, single terminal division.",
    tags=("text",),
)
def text_tokenizer_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_pieces = F.regexp_count(F.col("text"), F.lit(_PRETOK))
    per = d.select(
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        n_pieces.cast("bigint").alias("n_pieces"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_pieces").cast("bigint").alias("total_pieces"),
            F.round(
                F.sum("n_chars").cast("double")
                / F.greatest(F.sum("n_pieces"), F.lit(1)),
                4,
            ).alias("chars_per_piece"),
        )
        .orderBy("lang")
    )


@query(
    "text_heavy_hitters",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM t),
    freqs AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok)
    SELECT tok,
           freq,
           TRUE AS sketch_found,
           TRUE AS bound_holds
    FROM freqs, tot
    WHERE freq >= GREATEST(1, n // 50)
    ORDER BY tok
    """,
    doc="Heavy hitters (mergeable Misra-Gries, operators/"
    "heavyhitters.py) under the property-boolean oracle pattern "
    "(agg_approx precedent): the EXACT frequencies of every token "
    "above the 2%-of-mass threshold are hash-verified against DuckDB, "
    "and the booleans — computed Spark-side against those same exact "
    "values — certify that the k=512 sketch surfaced every true heavy "
    "hitter (the MG no-false-negative guarantee: the merged decrement "
    "total D <= n/513 sits far below the n/50 threshold) and that "
    "each estimate obeys est <= true <= est + D.  The exact "
    "vocabulary-sized pass exists only for this verification; the "
    "sketch itself holds k counters per partition and merges "
    "(k+1)*partitions rows — the 100 TB path.",
    tags=("text", "approx"),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        heavy_hitter_candidates,
    )

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    n = toks.count()
    thr = max(1, n // 50)
    cand = heavy_hitter_candidates(toks, "tok", thr, k=512)
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= thr)
    )
    c = lambda name: F.col(f"__c.{name}")
    return (
        exact.alias("__e")
        .join(cand.alias("__c"), F.col("__e.tok") == c("key"), "left")
        .select(
            F.col("__e.tok").alias("tok"),
            F.col("__e.freq").alias("freq"),
            c("key").isNotNull().alias("sketch_found"),
            (
                c("key").isNotNull()
                & (c("est") <= F.col("__e.freq"))
                & (F.col("__e.freq") <= c("est") + c("bound"))
            ).alias("bound_holds"),
        )
        .orderBy("tok")
    )


@query(
    "text_countmin_probe",
    oracle=f"""
    WITH t AS (
        SELECT unnest({_TOKS}) AS tok FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM t),
    freqs AS (SELECT tok, COUNT(*) AS freq FROM t GROUP BY tok)
    SELECT tok,
           freq,
           TRUE AS cm_never_undercounts,
           TRUE AS cm_within_bound
    FROM freqs, tot
    WHERE freq >= GREATEST(1, n // 100)
    ORDER BY tok
    """,
    doc="Count-Min point queries (operators/heavyhitters.py — the "
    "point-query complement to the Misra-Gries summary) under the "
    "property-boolean oracle: exact frequencies of the tokens above "
    "1% of mass are hash-verified vs DuckDB; the booleans certify "
    "that every CM estimate (width 2048, depth 4, fixed seeds) is "
    ">= the true count (the sketch's one-sided guarantee — counters "
    "only over-count) and within 8*n/width of it (the e*n/width CM "
    "bound with generous slack; deterministic for fixed data and "
    "seeds).  The sketch is depth*width counters at any corpus size "
    "and merges by addition — the 100 TB path for per-key frequency "
    "estimates without a vocabulary-sized aggregation.",
    tags=("text", "approx"),
)
def text_countmin_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        count_min_estimate,
        count_min_sketch,
    )

    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    n = toks.count()
    thr = max(1, n // 100)
    width, depth = 2048, 4
    sketch = count_min_sketch(toks, "tok", width, depth).localCheckpoint(
        eager=True
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= thr)
    )
    est = count_min_estimate(sketch, exact.select("tok"), "tok", width, depth)
    bound = 8.0 * n / width
    e = lambda c: F.col(f"__e.{c}")
    return (
        exact.alias("__e")
        .join(est.alias("__c"), e("tok") == F.col("__c.key"))
        .select(
            e("tok").alias("tok"),
            e("freq").alias("freq"),
            (F.col("__c.est") >= e("freq")).alias("cm_never_undercounts"),
            (F.col("__c.est") - e("freq") <= bound).alias("cm_within_bound"),
        )
        .orderBy("tok")
    )
