"""Corpus-curation queries for training-data pipelines: stratified
sampling, PII scrubbing, quality-gate filtering, mix reporting.

North-star extensions beyond the reference surface (SURVEY §2.C) — the
operations a 100 TB pretraining-data pipeline runs between ingest and
tokenization.  All pure JVM expressions (regexp / string / integer
arithmetic), no Python on the executor path; every query is
oracle-checked against DuckDB.

Cross-engine discipline:
- Sampling decisions use an explicit multiplicative hash on integer
  ids (exact in both engines) — never engine-native rand()/hash().
- Regexes are RE2-safe (no lookarounds); DuckDB regexp_replace gets
  the 'g' flag to match Spark's replace-all.
- The synthetic corpus contains no PII-shaped strings, so the scrub
  query deterministically plants email/URL/phone tokens derived from
  doc_id before redacting — the assertion is end-to-end non-vacuous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators import text as tx
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.queries.dedup_queries import _GRAMS
from pymongo_change_stream_reader_spark.queries.text_queries import _HITS, _TOKS
from pymongo_change_stream_reader_spark.sources.tables import load_table

# Deterministic permille bucket: Knuth multiplicative hash on doc_id.
# Integer-exact in both engines — the sample is reproducible anywhere.
_BUCKET_SQL = "(((doc_id % 2147483648) * 2654435761) % 4294967296) % 1000"

# Per-language keep rates (permille) — the mix-rebalancing knob.
_RATES = {"en": 100, "de": 500, "es": 300, "fr": 200, "zh": 1000}
_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lang}' THEN {r}" for lang, r in _RATES.items())
    + " ELSE 0 END"
)


@query(
    "sample_stratified_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_BUCKET_SQL} < {_RATE_SQL}
    ORDER BY doc_id
    """,
    doc="Stratified deterministic sampling: per-language keep rates via "
    "a multiplicative hash bucket on doc_id — reproducible across "
    "engines and runs, no rand().",
    tags=("corpus", "sampling"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: a narrow stateless filter — no shuffle, no state; the
    hash-bucket predicate evaluates inside whole-stage codegen per
    split. Changing the mix is a literal change, not a re-shard."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(1000)
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r)).otherwise(F.lit(None))
            for lang, r in _RATES.items()
        ],
        F.lit(0),
    )
    return d.filter(bucket < rate).select("doc_id", "lang", "source").orderBy("doc_id")


# RE2-safe redaction patterns (no lookarounds; identical Java/RE2
# semantics for these character classes).
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[A-Za-z0-9./_-]+"
_PHONE_RE = r"[0-9]{3}-[0-9]{4}-[0-9]{4}"

# Deterministic PII planting: every engine renders CAST(bigint AS
# string) and lpad identically, so both sides scrub the same input.
_PLANT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com via https://ex.org/d/' || CAST(doc_id AS VARCHAR)"
    " || ' tel 010-1234-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "text_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
               {_PLANT_SQL},
               '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_URL_RE}', '<URL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
           CAST(len(regexp_extract_all({_PLANT_SQL}, '{_EMAIL_RE}')) AS INT)
               AS n_emails
    FROM documents
    ORDER BY doc_id
    """,
    doc="PII redaction: email/URL/phone patterns replaced with typed "
    "placeholders (patterns planted deterministically from doc_id — "
    "the corpus itself is PII-free).",
    tags=("corpus", "text"),
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: narrow per-row regexp projection, codegen'd JVM regex —
    no shuffle, no UDF. Three sequential regexp_replace passes keep
    each pattern simple enough for RE2-class engines (no alternation
    blowup)."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com via https://ex.org/d/"),
        F.col("doc_id").cast("string"),
        F.lit(" tel 010-1234-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"),
            _URL_RE,
            "<URL>",
        ),
        _PHONE_RE,
        "<PHONE>",
    )
    n_emails = F.size(F.regexp_extract_all(planted, F.lit(f"({_EMAIL_RE})"), 1))
    return d.select(
        "doc_id", scrubbed.alias("scrubbed"), n_emails.alias("n_emails")
    ).orderBy("doc_id")


@query(
    "quality_filter_pipeline",
    oracle=f"""
    SELECT doc_id, lang,
           CAST(len({_TOKS}) AS INT) AS n_tokens
    FROM documents
    WHERE n_chars BETWEEN 100 AND 400
      AND list_sum(list_transform({_TOKS}, w -> length(w)))
          / greatest(len({_TOKS}), 1) BETWEEN 2 AND 12
      AND len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
          / greatest(length(text), 1) < 0.05
      AND (lang <> 'en' OR {_HITS['en']} >= 1)
    ORDER BY doc_id
    """,
    doc="Gopher-style quality gate: length bounds, mean-token-length "
    "bounds, punctuation-density cap, and stopword-presence check for "
    "English — the conjunctive pre-training document filter.",
    tags=("corpus", "text"),
)
def quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenize ONCE behind a persist barrier, then every gate
    predicate scans the token array — without the barrier
    CollapseProject inlines the split() into each of the three
    token-consuming predicates (interpreted HOFs, no CSE: measured
    1.5x cold at sf0.1, and the win grows with the number of
    token-consuming predicates; see PERF.md).  The n_chars bound
    still prunes via parquet column statistics in the persisted
    scan."""
    d = load_table(spark, sf_dir, "documents")
    toksed = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "text",
            tx.tokens(F.col("text")).alias("toks"),
        )
        .persist()
    )
    ntok = F.size(F.col("toks"))
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_len = sum_len / F.greatest(ntok, F.lit(1))
    hits = F.size(
        F.filter(F.col("toks"), lambda w: F.lower(w).isin(*tx.STOPWORDS["en"]))
    )
    keep = (
        F.col("n_chars").between(100, 400)
        & mean_len.between(2, 12)
        & (tx.punct_ratio(F.col("text")) < 0.05)
        & ((F.col("lang") != "en") | (hits >= 1))
    )
    return (
        toksed.filter(keep)
        .select("doc_id", "lang", ntok.alias("n_tokens"))
        .orderBy("doc_id")
    )


@query(
    "token_count_histogram",
    oracle=f"""
    SELECT CAST(least(len({_TOKS}) // 10, 10) AS INT) AS bucket,
           COUNT(*)                                   AS n_docs,
           CAST(SUM(len({_TOKS})) AS BIGINT)          AS total_tokens
    FROM documents
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="Token-count distribution: fixed-width histogram (10-token "
    "buckets, capped) with per-bucket token mass — the corpus-sizing "
    "report before tokenizer runs.",
    tags=("corpus", "text", "agg"),
)
def token_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenize once per row, aggregate on ~11 buckets — the
    shuffle carries bucket partials only. Integer floor-div bucketing
    is engine-exact (no float binning drift)."""
    d = load_table(spark, sf_dir, "documents")
    n = tx.token_count(F.col("text"))
    return (
        d.select(F.least(F.floor(n / 10), F.lit(10)).cast("int").alias("bucket"), n.alias("n"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n").cast("bigint").alias("total_tokens"))
        .orderBy("bucket")
    )


@query(
    "corpus_source_mix",
    oracle=f"""
    WITH per AS (
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE)
                 / (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM per), 6)
               AS token_share
    FROM per
    ORDER BY lang, source
    """,
    doc="Training-mix report: per-(lang, source) document and token "
    "counts with each cell's share of total corpus tokens.",
    tags=("corpus", "agg"),
)
def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one aggregation over ~(langs x sources) groups; the
    global total is a 1-row scalar broadcast joined back — the per-cell
    table never re-scans the corpus."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("lang", "source", tx.token_count(F.col("text")).alias("n"))
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n").cast("bigint").alias("n_tokens"))
    )
    total = per.agg(F.sum("n_tokens").cast("double").alias("total"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens").cast("double") / F.col("total"), 6).alias(
                "token_share"
            ),
        )
        .orderBy("lang", "source")
    )


@query(
    "corpus_e2e_curation",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, lang, text, CAST(len({_TOKS}) AS INT) AS n_tokens
        FROM documents
        WHERE n_chars BETWEEN 100 AND 400
          AND list_sum(list_transform({_TOKS}, w -> length(w)))
              / greatest(len({_TOKS}), 1) BETWEEN 2 AND 12
          AND len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
              / greatest(length(text), 1) < 0.05
          AND (lang <> 'en' OR {_HITS['en']} >= 1)
    ),
    canon AS (
        SELECT MIN(doc_id)           AS doc_id,
               min_by(lang, doc_id)  AS lang,
               min_by(n_tokens, doc_id) AS n_tokens
        FROM gated GROUP BY text
    ),
    sampled AS (
        SELECT * FROM canon WHERE {_BUCKET_SQL} < 500
    )
    SELECT lang,
           COUNT(*)                        AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT)   AS total_tokens
    FROM sampled GROUP BY lang ORDER BY lang
    """,
    doc="End-to-end curation chain: quality gate -> exact dedup "
    "(min-id canonical per content) -> deterministic hash sample "
    "(500 permille) -> per-language mix report. The composition a "
    "pretraining pipeline runs between ingest and tokenization.",
    tags=("corpus", "dedup", "text"),
)
def corpus_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: tokenize once behind the persist barrier; dedup is one
    shuffle on content; the sample is a stateless hash predicate; the
    report is a tiny aggregate.  Same plan family at 100 TB with the
    persisted stage written to storage instead."""
    d = load_table(spark, sf_dir, "documents")
    toksed = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id", "lang", "n_chars", "text",
            tx.tokens(F.col("text")).alias("toks"),
        )
        .persist()
    )
    ntok = F.size(F.col("toks"))
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_len = sum_len / F.greatest(ntok, F.lit(1))
    hits = F.size(
        F.filter(F.col("toks"), lambda w: F.lower(w).isin(*tx.STOPWORDS["en"]))
    )
    keep = (
        F.col("n_chars").between(100, 400)
        & mean_len.between(2, 12)
        & (tx.punct_ratio(F.col("text")) < 0.05)
        & ((F.col("lang") != "en") | (hits >= 1))
    )
    gated = toksed.filter(keep).select(
        "doc_id", "lang", "text", ntok.alias("n_tokens")
    )
    canon = gated.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", F.col("doc_id")).alias("lang"),
        F.min_by("n_tokens", F.col("doc_id")).alias("n_tokens"),
    )
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)) % 1000
    sampled = canon.filter(bucket < 500)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_decontamination",
    oracle=f"""
    WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
    bench AS (
        SELECT doc_id, grams FROM g WHERE {_BUCKET_SQL} < 50
    ),
    bench_grams AS (
        SELECT DISTINCT unnest(grams) AS gram FROM bench
    ),
    train_hits AS (
        SELECT t.doc_id,
               COUNT(DISTINCT i.gram) AS shared_grams
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g
              WHERE {_BUCKET_SQL} >= 50) t
        JOIN bench_grams i ON t.gram = i.gram
        GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(shared_grams AS BIGINT) AS shared_grams
    FROM train_hits
    WHERE shared_grams >= 3
    ORDER BY doc_id
    """,
    doc="Benchmark decontamination: flag training documents sharing "
    ">= 3 distinct word-3-grams with a (hash-held-out) benchmark set "
    "— the n-gram-collision eval-leakage check a pretraining "
    "pipeline runs before training.",
    tags=("corpus", "dedup", "text"),
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: benchmark shingles are a broadcast-sized distinct set
    (the held-out corpus is small by construction); the train side is
    one explode + semi-style hash join + per-doc count — no quadratic
    pair work."""
    from pymongo_change_stream_reader_spark.operators.dedup import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)) % 1000
    grams = d.select(
        "doc_id", bucket.alias("bucket"), word_ngrams(F.col("text"), 3).alias("grams")
    )
    bench_grams = (
        grams.filter(F.col("bucket") < 50)
        .select(F.explode("grams").alias("gram"))
        .distinct()
    )
    train = grams.filter(F.col("bucket") >= 50).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return (
        train.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("shared_grams"))
        .filter(F.col("shared_grams") >= 3)
        .orderBy("doc_id")
    )


@query(
    "corpus_decontamination_bloom",
    doc="Bloom-filter benchmark decontamination: the benchmark-gram "
    "set is compressed into a broadcast m-bit Bloom bitmap (built "
    "executor-side, OR-folded on the driver) and training documents "
    "count distinct grams hitting it — the zero-shuffle, O(MB)-index "
    "form of corpus_decontamination for 100 TB corpora.  No false "
    "negatives by construction (every exact hit is a bloom hit; "
    "superset property pytest-asserted with FP-rate bound in "
    "tests/test_bloom.py); rows-only because bloom membership is not "
    "SQL-expressible in the oracle engine.",
    tags=("corpus", "dedup", "text"),
)
def corpus_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the bitmap replaces the broadcast string set of the
    exact form — a few hundred MB covers billions of benchmark grams
    at ~1% FP, and the probe is a narrow per-document bit test with
    JVM-side hashing (no shuffle, no string transfer to Python)."""
    from pymongo_change_stream_reader_spark.operators.bloom import (
        bloom_build,
        bloom_hit_counts,
    )
    from pymongo_change_stream_reader_spark.operators.dedup import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(4294967296)) % 1000
    grams = d.select(
        "doc_id", bucket.alias("bucket"), word_ngrams(F.col("text"), 3).alias("grams")
    )
    bench = grams.filter(F.col("bucket") < 50).select(
        F.explode("grams").alias("gram")
    )
    bitmap = bloom_build(bench, F.col("gram"))
    train = grams.filter(F.col("bucket") >= 50)
    return (
        bloom_hit_counts(train, "doc_id", F.col("grams"), bitmap)
        .filter(F.col("bloom_hits") >= 3)
        .withColumnRenamed("bloom_hits", "shared_grams")
        .orderBy("doc_id")
    )


@query(
    "corpus_global_shuffle",
    oracle="""
    SELECT doc_id,
           ((doc_id % 2147483648) * 2654435761 + 17) % 4294967296         AS skey,
           (((doc_id % 2147483648) * 2654435761 + 17) % 4294967296) % 64  AS shard
    FROM documents
    ORDER BY skey, doc_id
    """,
    doc="Deterministic global shuffle: a seeded multiplicative-hash "
    "key gives every document a reproducible pseudorandom position "
    "and output shard — the dataloader-order primitive.  Scale: the "
    "key is a narrow projection; the total order is realized as "
    "repartitionByRange + sortWithinPartitions (a distributed range "
    "sort), never a single-node window.",
    tags=("corpus", "shuffle"),
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.packing import (
        shard_of,
        shuffle_key,
    )

    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            shuffle_key(F.col("doc_id"), seed=17).alias("skey"),
            shard_of(F.col("doc_id"), 64, seed=17).alias("shard"),
        )
        .orderBy("skey", "doc_id")
    )


@query(
    "corpus_pack_offsets",
    oracle="""
    WITH docs AS (
        SELECT doc_id,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks,
               (((doc_id % 2147483648) * 2654435761) % 4294967296) % 16 AS shard
        FROM documents
    )
    SELECT doc_id, shard, toks,
           SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks
               AS tok_offset,
           CAST(FLOOR((SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - toks)
               / 512.0) AS BIGINT) AS start_seq,
           CAST(FLOOR((SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
               / 512.0) AS BIGINT) AS end_seq
    FROM docs
    ORDER BY doc_id
    """,
    doc="GPT-style concat-and-cut sequence packing: per shard the "
    "token stream (chars/4 heuristic) is laid out in doc order and "
    "cut every 512 tokens; start_seq/end_seq locate each document's "
    "context windows, straddling allowed.  Pure prefix-sum window "
    "arithmetic — integer-exact, wholly JVM-side, one shuffle on the "
    "shard key.",
    tags=("corpus", "packing"),
)
def corpus_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.packing import pack_offsets

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("toks")
    )
    packed = pack_offsets(d, budget=512, n_shards=16)
    return packed.select(
        "doc_id", "shard", "toks", "tok_offset", "start_seq", "end_seq"
    ).orderBy("doc_id")


@query(
    "corpus_pack_greedy",
    oracle="""
    WITH RECURSIVE docs AS (
        SELECT doc_id,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks,
               (((doc_id % 2147483648) * 2654435761) % 4294967296) % 16 AS shard,
               row_number() OVER (PARTITION BY
                   (((doc_id % 2147483648) * 2654435761) % 4294967296) % 16
                   ORDER BY doc_id) AS rn
        FROM documents
    ),
    rec AS (
        SELECT shard, rn, doc_id, toks, toks AS running, CAST(0 AS BIGINT) AS seq
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.shard, d.rn, d.doc_id, d.toks,
               CASE WHEN r.running + d.toks <= 512
                    THEN r.running + d.toks ELSE d.toks END,
               CASE WHEN r.running + d.toks <= 512
                    THEN r.seq ELSE r.seq + 1 END
        FROM rec r JOIN docs d ON d.shard = r.shard AND d.rn = r.rn + 1
    )
    SELECT shard, seq,
           COUNT(*)  AS n_docs,
           SUM(toks) AS seq_tokens
    FROM rec
    GROUP BY shard, seq
    ORDER BY shard, seq
    """,
    doc="First-fit greedy sequence packing (documents never split): "
    "per shard in doc order a document joins the open sequence unless "
    "it would overflow the 512-token budget.  The fill recursion is "
    "sequential by nature, so it runs as one Arrow applyInPandas "
    "kernel per shard — O(shard) each, parallel across shards; the "
    "DuckDB oracle replays the same recursion as a recursive CTE.",
    tags=("corpus", "packing"),
)
def corpus_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.packing import pack_greedy

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("toks")
    )
    packed = pack_greedy(d, budget=512, n_shards=16)
    return (
        packed.groupBy("shard", "seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("seq_tokens"),
        )
        .orderBy("shard", "seq")
    )


@query(
    "text_line_dedup",
    oracle="""
    WITH planted AS (
        SELECT doc_id,
               string_split(
                   text || ' | footer copyright example corp | id line '
                        || CAST(doc_id AS VARCHAR),
                   ' | ') AS segs
        FROM documents
    ),
    seg AS (
        SELECT doc_id,
               unnest(segs)               AS seg,
               generate_subscripts(segs, 1) AS pos
        FROM planted
    ),
    counts AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS dc FROM seg GROUP BY seg
    ),
    total AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
    SELECT s.doc_id,
           string_agg(s.seg, ' | ' ORDER BY s.pos) AS clean_text,
           COUNT(*)                                AS n_kept
    FROM seg s
    JOIN counts c USING (seg)
    CROSS JOIN total t
    WHERE c.dc * 2 <= t.n
    GROUP BY s.doc_id
    ORDER BY s.doc_id
    """,
    doc="Boilerplate line removal (RefinedWeb-style): segments "
    "occurring in more than half the corpus are dropped, surviving "
    "segments reassemble in document order.  The corpus has no "
    "newlines, so a common footer and a unique id line are planted "
    "deterministically — the footer must vanish, the id line must "
    "survive, making the check non-vacuous.  Scale: segment counting "
    "is one hash-shuffle with map-side partial aggregation; the "
    "corpus-size threshold rides a broadcast 1-row aggregate; "
    "reassembly groups once on doc_id.",
    tags=("corpus", "dedup"),
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" | footer copyright example corp | id line "),
        F.col("doc_id").cast("string"),
    )
    seg = d.select(
        "doc_id", F.posexplode(F.split(planted, r" \| ")).alias("pos", "seg")
    )
    counts = seg.groupBy("seg").agg(
        F.count_distinct("doc_id").alias("dc")
    )
    total = d.agg(F.count_distinct("doc_id").alias("n"))
    kept = (
        seg.join(counts, "seg")
        .crossJoin(F.broadcast(total))
        .where(F.col("dc") * 2 <= F.col("n"))
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("pos"), F.col("seg").alias("s"))
                        )
                    ),
                    lambda x: x["s"],
                ),
                " | ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "quality_linear_scorer",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
    ),
    f AS (
        SELECT doc_id,
               ('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096 AS idx,
               COUNT(*) AS cnt
        FROM toks GROUP BY doc_id, idx
    ),
    w AS (
        SELECT i AS idx, (i * 2654435761 + 97) % 2001 - 1000 AS w
        FROM generate_series(0, 4095) t(i)
    ),
    z AS (
        SELECT doc_id,
               SUM(w * cnt)  AS z_milli,
               SUM(cnt)      AS n
        FROM f JOIN w ON f.idx = w.idx
        GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT)                            AS n_tokens,
           CAST(z_milli AS DOUBLE) / (1000.0 * n)       AS logit,
           z_milli > 0                                  AS keep
    FROM z
    ORDER BY doc_id
    """,
    doc="Hashed linear quality classifier (fasttext-style inference "
    "at corpus scale): tokens hash into a 4096-bin feature space "
    "(engine-portable md5-prefix hash), a deterministic integer "
    "milli-weight vector scores each document as the count-weighted "
    "mean weight, and the sign gates keep/drop.  Integer weights "
    "keep the aggregation exact in any summation order, so the "
    "cross-engine comparison is bit-stable; the single terminal "
    "division produces the float logit identically in both engines.",
    tags=("corpus", "text", "quality"),
)
def quality_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one explode + one hash-shuffle feature count with
    map-side partials, then a BROADCAST join against the weight
    vector (the model is O(D) rows — a few MB even at D=2^20) and a
    second map-side-partial sum per doc.  The model never exists
    driver-side as anything but a tiny deterministic DataFrame; a
    trained model would load from parquet into the same shape."""
    D = 4096
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    idx = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
        F.lit(D),
    )
    feats = (
        toks.select("doc_id", idx.alias("idx"))
        .groupBy("doc_id", "idx")
        .agg(F.count("*").alias("cnt"))
    )
    weights = spark.range(D).select(
        F.col("id").alias("idx"),
        ((F.col("id") * 2654435761 + 97) % 2001 - 1000).alias("w"),
    )
    z = (
        feats.join(F.broadcast(weights), "idx")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("w") * F.col("cnt")).alias("z_milli"),
            F.sum("cnt").alias("n"),
        )
    )
    return z.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        (F.col("z_milli").cast("double") / (1000.0 * F.col("n"))).alias(
            "logit"
        ),
        (F.col("z_milli") > 0).alias("keep"),
    ).orderBy("doc_id")


@query(
    "quality_bigram_lm_counts",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    bi AS (
        SELECT doc_id, t[j] || ' ' || t[j+1] AS bigram, t[j] AS w1
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(j)
        WHERE len(t) >= 2
    ),
    cb AS (SELECT bigram, COUNT(*) AS c_bi FROM bi GROUP BY bigram),
    cu AS (SELECT w1, COUNT(*) AS c_uni FROM bi GROUP BY w1)
    SELECT bi.doc_id,
           COUNT(*)        AS n_bigrams,
           SUM(cb.c_bi)    AS sum_bigram_freq,
           SUM(cu.c_uni)   AS sum_prefix_freq
    FROM bi JOIN cb USING (bigram) JOIN cu USING (w1)
    GROUP BY bi.doc_id
    ORDER BY bi.doc_id
    """,
    doc="Bigram-LM quality scoring, integer core: per document the "
    "bigram-position count and the exact corpus-frequency sums of its "
    "bigrams and their prefix words — the inputs of the CCNet-style "
    "smoothed log-probability score.  Counts are integers so the "
    "cross-engine comparison is exact; the float log score over the "
    "same tables is operators.text.bigram_lm_doc_scores, "
    "pytest-verified (log-sum order sensitivity keeps it out of the "
    "hash oracle).",
    tags=("corpus", "text", "quality"),
)
def quality_bigram_lm_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: model build = two explode -> hash-shuffle counts with
    map-side partials; scoring joins shuffle on the same keys (no
    broadcast assumption — real vocabularies exceed broadcast size);
    one final per-doc aggregation."""
    d = load_table(spark, sf_dir, "documents")
    doc_bigrams, bigram_counts, prefix_counts = tx.bigram_lm_tables(
        d, "text", "doc_id"
    )
    return (
        doc_bigrams.join(bigram_counts, "bigram")
        .join(prefix_counts, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("c_bi").alias("sum_bigram_freq"),
            F.sum("c_uni").alias("sum_prefix_freq"),
        )
        .orderBy("doc_id")
    )


@query(
    "corpus_temperature_mix",
    oracle=f"""
    WITH per AS (
        SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               CAST(floor(1000 * sqrt(
                   CAST(n_tokens AS DOUBLE)
                   / (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM per)
               )) AS BIGINT) AS rate_permille
        FROM per
    )
    SELECT d.doc_id, d.source, r.rate_permille
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {_BUCKET_SQL} < r.rate_permille
    ORDER BY d.doc_id
    """,
    doc="Temperature-weighted source rebalancing (T=2): each source's "
    "keep rate is sqrt(token_share), flattening the mixture toward "
    "uniform the way multilingual/multi-domain pretraining mixes are "
    "rebalanced; the keep decision is the deterministic permille "
    "hash bucket.  Exactness across engines: counts are integers, "
    "the share is one division of two exact doubles, and sqrt/floor "
    "are IEEE-identical — no transcendental drift, no float-sum "
    "order dependence.",
    tags=("corpus", "sampling"),
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one aggregation over the handful of sources, the rate
    table broadcast back, then a narrow stateless filter — changing
    the temperature is a literal change, not a re-shard (same
    contract as sample_stratified_hash)."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("source", tx.token_count(F.col("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )
    total = per.agg(F.sum("n_tokens").cast("double").alias("total"))
    rates = per.crossJoin(F.broadcast(total)).select(
        "source",
        F.floor(
            1000
            * F.sqrt(F.col("n_tokens").cast("double") / F.col("total"))
        )
        .cast("bigint")
        .alias("rate_permille"),
    )
    bucket = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % F.lit(4294967296) % 1000
    return (
        d.join(F.broadcast(rates), "source")
        .filter(bucket < F.col("rate_permille"))
        .select("doc_id", "source", "rate_permille")
        .orderBy("doc_id")
    )


# DSIR hashed-ngram feature space (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): unigrams hash into
# D bins; target/raw bag-of-bins models with Laplace smoothing give a
# per-document importance log-weight.  The log-weight is held in
# integer milli-nats so the per-document aggregation is exact in any
# summation order — the only float ops are one division and one ln per
# BIN (deterministic given identical integer operands in both engines).
_DSIR_D = 4096
_DSIR_IDX = "('0x' || substr(md5(tok), 1, 8))::UBIGINT % 4096"


@query(
    "corpus_dsir_select",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({_TOKS}) AS tok FROM documents
    ),
    b AS (
        SELECT doc_id, lang, {_DSIR_IDX} AS idx FROM toks
    ),
    ct AS (SELECT idx, COUNT(*) AS ct FROM b WHERE lang = 'en' GROUP BY idx),
    cq AS (SELECT idx, COUNT(*) AS cq FROM b WHERE lang <> 'en' GROUP BY idx),
    tot AS (SELECT (SELECT COUNT(*) FROM b WHERE lang = 'en')  AS nt,
                   (SELECT COUNT(*) FROM b WHERE lang <> 'en') AS nq),
    w AS (
        SELECT i AS idx,
               CAST(ROUND(1000 * ln(
                   ((COALESCE(ct.ct, 0) + 1) * (tot.nq + {_DSIR_D}))::DOUBLE
                 / ((COALESCE(cq.cq, 0) + 1) * (tot.nt + {_DSIR_D}))::DOUBLE
               )) AS BIGINT) AS w
        FROM generate_series(0, {_DSIR_D - 1}) t(i)
        LEFT JOIN ct ON ct.idx = i
        LEFT JOIN cq ON cq.idx = i
        CROSS JOIN tot
    ),
    f AS (
        SELECT doc_id, idx, COUNT(*) AS cnt
        FROM b WHERE lang <> 'en' GROUP BY doc_id, idx
    ),
    z AS (
        SELECT doc_id, SUM(cnt * w) AS z_milli, SUM(cnt) AS n
        FROM f JOIN w USING (idx) GROUP BY doc_id
    )
    SELECT z.doc_id, d.lang,
           CAST(n AS BIGINT)               AS n_tokens,
           CAST(z_milli AS BIGINT)         AS z_milli,
           CAST(z_milli AS DOUBLE) / 1000.0 AS log_weight
    FROM z JOIN documents d ON d.doc_id = z.doc_id
    ORDER BY z_milli DESC, z.doc_id
    LIMIT 40
    """,
    doc="DSIR data selection (hashed-unigram importance resampling): "
    "fit smoothed bag-of-hashed-ngram models over the target slice "
    "(en) and the raw pool, score every raw document with the summed "
    "per-bin log-likelihood ratio in integer milli-nats, and take the "
    "top-40 — the documents whose token distribution looks most like "
    "the target.  Engine-portable md5-prefix hashing; integer weights "
    "keep the aggregation bit-stable across engines.",
    tags=("corpus", "text", "selection"),
)
def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two hash-shuffle bin-count aggs (map-side partials) fit
    the models; the model is O(D) rows and BROADCAST to score — one
    explode + per-doc integer sum per raw document, no quadratic or
    driver-side work.  At 100 TB the target slice is typically small
    (curated corpus) and the raw pool dominates: the scoring pass is
    one narrow scan of the pool, and the bin space D grows to 2^20
    without changing any shuffle shape (the model stays a few MB)."""
    D = _DSIR_D
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    idx = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
        F.lit(D),
    )
    b = toks.select("doc_id", "lang", idx.alias("idx"))
    tgt = b.filter(F.col("lang") == "en").groupBy("idx").agg(
        F.count("*").alias("ct")
    )
    raw = b.filter(F.col("lang") != "en").groupBy("idx").agg(
        F.count("*").alias("cq")
    )
    tot = b.groupBy().agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
        F.sum(F.when(F.col("lang") != "en", 1).otherwise(0)).alias("nq"),
    )
    # integer products stay exact in doubles (counts << 2^26), so the
    # single division + ln sees identical operands in both engines
    weights = (
        spark.range(D)
        .select(F.col("id").alias("idx"))
        .join(tgt, "idx", "left")
        .join(raw, "idx", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "idx",
            F.round(
                F.lit(1000)
                * F.log(
                    (
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        * (F.col("nq") + D)
                    ).cast("double")
                    / (
                        (F.coalesce(F.col("cq"), F.lit(0)) + 1)
                        * (F.col("nt") + D)
                    ).cast("double")
                )
            )
            .cast("long")
            .alias("w"),
        )
    )
    feats = (
        b.filter(F.col("lang") != "en")
        .groupBy("doc_id", "idx")
        .agg(F.count("*").alias("cnt"))
    )
    z = (
        feats.join(F.broadcast(weights), "idx")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("w")).alias("z_milli"),
            F.sum("cnt").alias("n_tokens"),
        )
    )
    return (
        z.join(d.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "z_milli",
            (F.col("z_milli").cast("double") / 1000.0).alias("log_weight"),
        )
        .orderBy(F.desc("z_milli"), "doc_id")
        .limit(40)
    )


@query(
    "quality_ccnet_buckets",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    bi AS (
        SELECT doc_id, t[j] || ' ' || t[j+1] AS bigram, t[j] AS w1
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(j)
        WHERE len(t) >= 2
    ),
    cb AS (SELECT bigram, COUNT(*) AS c_bi FROM bi GROUP BY bigram),
    cu AS (SELECT w1, COUNT(*) AS c_uni FROM bi GROUP BY w1),
    z AS (
        SELECT bi.doc_id,
               SUM(cb.c_bi) AS sbf,
               SUM(cu.c_uni) AS spf
        FROM bi JOIN cb USING (bigram) JOIN cu USING (w1)
        GROUP BY bi.doc_id
    ),
    ranked AS (
        SELECT doc_id,
               ROUND(sbf::DOUBLE / spf, 6) AS fluency,
               NTILE(3) OVER (ORDER BY sbf::DOUBLE / spf DESC, doc_id)
                   AS tercile
        FROM z
    )
    SELECT doc_id, fluency,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
    FROM ranked
    ORDER BY doc_id
    """,
    doc="CCNet-style head/middle/tail quality bucketing: documents "
    "rank by corpus-fluency (exact integer bigram/prefix frequency "
    "sums; one IEEE division per doc — identical operands cross-"
    "engine), NTILE terciles with doc_id tie-break label head/middle/"
    "tail.  CCNet keeps 'head' for pretraining and drops or "
    "downsamples 'tail'.",
    tags=("corpus", "text", "quality"),
)
def quality_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the model build and per-doc sums shuffle on token keys
    (map-side partials); the tercile split runs on the DOC-level
    aggregate table through the DISTRIBUTED rank (range exchange +
    per-partition counts + prefix-sum offsets, operators/ranking.py) —
    no unpartitioned window, so no single-task global sort even on a
    billion-document corpus (r3 verdict ask #1).  Bit-identical to
    NTILE(3) by the SQL-standard bucket arithmetic."""
    from pymongo_change_stream_reader_spark.operators.ranking import (
        ntile_from_rank,
        with_global_rank,
    )

    d = load_table(spark, sf_dir, "documents")
    doc_bigrams, bigram_counts, prefix_counts = tx.bigram_lm_tables(
        d, "text", "doc_id"
    )
    z = (
        doc_bigrams.join(bigram_counts, "bigram")
        .join(prefix_counts, "w1")
        .groupBy("doc_id")
        .agg(F.sum("c_bi").alias("sbf"), F.sum("c_uni").alias("spf"))
    )
    key = F.col("sbf").cast("double") / F.col("spf")
    ranked_df, n_rows = with_global_rank(
        z.select("doc_id", F.round(key, 6).alias("fluency"), key.alias("__k")),
        [F.col("__k").desc(), F.col("doc_id")],
    )
    ranked = ranked_df.select(
        "doc_id",
        "fluency",
        ntile_from_rank(F.col("__rank"), n_rows, 3).alias("tercile"),
    )
    return ranked.select(
        "doc_id",
        "fluency",
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).orderBy("doc_id")


@query(
    "corpus_unimax_mix",
    oracle=f"""
    WITH RECURSIVE per AS (
        SELECT lang, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tok
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT CAST(SUM(n_tok) AS BIGINT) * 6 // 10 AS budget FROM per
    ),
    ordered AS (
        SELECT lang, n_tok,
               CAST(ROW_NUMBER() OVER (ORDER BY n_tok, lang) AS BIGINT) AS rn,
               CAST((SELECT COUNT(*) FROM per) AS BIGINT) AS k
        FROM per
    ),
    alloc(rn, lang, quota, remaining) AS (
        SELECT CAST(0 AS BIGINT), CAST(NULL AS VARCHAR), CAST(0 AS BIGINT),
               (SELECT budget FROM tot)
        UNION ALL
        SELECT o.rn, o.lang,
               LEAST(o.n_tok, a.remaining // (o.k - a.rn)),
               a.remaining - LEAST(o.n_tok, a.remaining // (o.k - a.rn))
        FROM alloc a JOIN ordered o ON o.rn = a.rn + 1
    ),
    scored AS (
        SELECT lang, doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tok,
               SUM(CAST(len({_TOKS}) AS BIGINT)) OVER (
                   PARTITION BY lang
                   ORDER BY (((doc_id % 2147483648) * 2654435761) % 4294967296),
                            doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM documents
    )
    SELECT a.lang, a.quota,
           COUNT(*) AS docs_kept,
           CAST(SUM(s.n_tok) AS BIGINT) AS tokens_kept
    FROM scored s JOIN alloc a ON s.lang = a.lang
    WHERE s.cum <= a.quota
    GROUP BY a.lang, a.quota
    ORDER BY a.lang
    """,
    doc="UniMax language-balanced sampling (Chung et al. 2023): the "
    "budget (60% of corpus tokens, 1 epoch cap) is allocated smallest "
    "language first — each takes min(cap, remaining // langs_left) — "
    "then documents are kept per language in deterministic hash order "
    "until the quota fills.  The allocation walk is pure integer "
    "arithmetic on the driver over one row per language (model-sized, "
    "same contract as the IVF centroid table); the oracle replays it "
    "with a recursive CTE.  Selection is one window pass partitioned "
    "by language.",
    tags=("corpus", "sampling"),
)
def corpus_unimax_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the per-language totals are a handful of rows; the
    selection is one hash-ordered cumulative-sum window per language
    — a single shuffle on the language key.  Changing budget/epochs
    re-runs only the driver-side walk."""
    from pymongo_change_stream_reader_spark.operators.sampling import (
        unimax_quotas,
        unimax_select,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", tx.token_count(F.col("text")).cast("bigint").alias("n_tok")
    )
    per = [
        (r["lang"], r["n_tok"])
        for r in d.groupBy("lang").agg(F.sum("n_tok").cast("bigint").alias("n_tok")).collect()
    ]
    budget = sum(n for _, n in per) * 6 // 10
    kept = unimax_select(d, unimax_quotas(per, budget, epochs=1))
    return (
        kept.groupBy("lang", "quota")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        )
        .orderBy("lang")
    )


@query(
    "sample_stratified_exact_n",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY (((doc_id % 2147483648) * 2654435761)
                             % 4294967296), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, CAST(rn AS BIGINT) AS rn
    FROM ranked WHERE rn <= 20
    ORDER BY doc_id
    """,
    doc="Exact-n stratified sampling: exactly min(20, stratum size) "
    "documents per language, drawn in deterministic hash order — the "
    "fixed-budget counterpart to the rate-based "
    "sample_stratified_hash (eval-set construction, per-language "
    "probes).  One window pass partitioned by the stratum key; no "
    "rand(), reproducible across runs/partitionings/engines.",
    tags=("corpus", "sampling"),
)
def sample_stratified_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pymongo_change_stream_reader_spark.operators.sampling import (
        hash_order_key,
    )

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        hash_order_key(F.col("doc_id")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .withColumn("rn", F.col("rn").cast("bigint"))
        .orderBy("doc_id")
    )


@query(
    "quality_adaptive_length_gate",
    oracle="""
    WITH bounds AS (
        SELECT lang,
               quantile_cont(n_chars, 0.05) AS lo,
               quantile_cont(n_chars, 0.95) AS hi
        FROM documents GROUP BY lang
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS kept,
           ROUND(b.lo, 4) AS lo,
           ROUND(b.hi, 4) AS hi
    FROM documents d JOIN bounds b ON d.lang = b.lang
    WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi
    GROUP BY d.lang, b.lo, b.hi
    ORDER BY d.lang
    """,
    doc="Per-language adaptive length gate: keep documents inside the "
    "language's own [P5, P95] character-length band — the "
    "distribution-aware counterpart to fixed length thresholds "
    "(Gopher-style absolute cutoffs misfire across languages whose "
    "natural lengths differ).  Exact interpolated percentiles per "
    "group (one small aggregate, broadcast back), then a narrow "
    "filter join — no window over the full corpus.",
    tags=("corpus", "text"),
)
def quality_adaptive_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # EXACT percentile is safe at 100 TB here because its aggregation
    # state is a counts-map over DISTINCT values, not a buffer of all
    # rows — and n_chars is a bounded-cardinality integer (distinct
    # values <= the max document length in characters, ~10^5-10^6
    # entries per lang group regardless of corpus row count).  For an
    # UNBOUNDED-cardinality column (raw doubles, timestamps) swap in
    # approx_percentile(col, p, accuracy) — 1/accuracy relative rank
    # error, default 10^-4 — and accept that the DuckDB oracle's exact
    # interpolation no longer hash-matches.
    bounds = d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        d.join(F.broadcast(bounds), "lang")
        .filter(
            (F.col("n_chars") >= F.col("lo"))
            & (F.col("n_chars") <= F.col("hi"))
        )
        .groupBy("lang", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("kept"))
        .select(
            "lang",
            "kept",
            F.round("lo", 4).alias("lo"),
            F.round("hi", 4).alias("hi"),
        )
        .orderBy("lang")
    )


@query(
    "corpus_conversation_assembly",
    oracle="""
    WITH turns AS (
        SELECT user_id, event_id,
               event_type || '|' || CAST(CAST(round(value * 100, 0)
                   AS BIGINT) AS VARCHAR) AS line
        FROM events WHERE user_id < 200
    )
    SELECT user_id,
           string_agg(line, CHR(10) ORDER BY event_id) AS convo,
           COUNT(*) AS n_turns
    FROM turns
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Conversation/document assembly: per-entity turns gathered in "
    "event order and rendered into one training document — the SFT/"
    "chat-transcript prep step (group -> order -> template -> "
    "concat).  Spark has no ordered string_agg, so the turns collect "
    "as (order_key, line) structs, array_sort puts them in event "
    "order inside each group, and one array_join renders the "
    "document — a single hash aggregation, no window pass.",
    tags=("corpus", "text"),
)
def corpus_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    line = F.concat(
        F.col("event_type"),
        F.lit("|"),
        F.round(F.col("value") * 100, 0).cast("long").cast("string"),
    )
    turns = e.select(
        "user_id",
        F.struct(F.col("event_id"), line.alias("line")).alias("t"),
    )
    return (
        turns.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("t")), lambda s: s["line"]
                ),
                "\n",
            ).alias("convo"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .orderBy("user_id")
    )


_DTR = f"round(len(list_distinct({_TOKS}))::DOUBLE / greatest(len({_TOKS}), 1), 6)"


@query(
    "corpus_curriculum_order",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, {_DTR} AS score FROM documents
    ),
    cuts AS (
        SELECT quantile_cont(score, 0.25) AS c1,
               quantile_cont(score, 0.50) AS c2,
               quantile_cont(score, 0.75) AS c3
        FROM scored
    ),
    phased AS (
        SELECT doc_id, score,
               CAST(1 + CAST(score < c3 AS INT) + CAST(score < c2 AS INT)
                    + CAST(score < c1 AS INT) AS INT) AS phase
        FROM scored CROSS JOIN cuts
    )
    SELECT doc_id, score, phase,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY phase
               ORDER BY ((doc_id % 2147483648) * 2654435761 + 23)
                        % 4294967296, doc_id) AS INT) AS order_in_phase
    FROM phased
    ORDER BY phase, order_in_phase
    """,
    doc="Curriculum data ordering: 4 quality phases (distinct-token "
    "ratio quartiles, cleanest first) with a deterministic seeded "
    "shuffle inside each phase — the anneal-by-quality dataloader "
    "order.  Phase boundaries come from ONE percentile aggregation "
    "and assignment is a comparison against the broadcast cutoffs — "
    "never a global ntile window (single-partition at scale); the "
    "intra-phase order is the shuffle_key primitive, realized at "
    "scale as repartitionByRange within phase.",
    tags=("corpus", "sampling"),
)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from pymongo_change_stream_reader_spark.operators.packing import (
        shuffle_key,
    )

    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    scored = d.select(
        "doc_id",
        F.round(
            F.size(F.array_distinct(toks))
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("score"),
    )
    cuts = scored.agg(
        F.expr("percentile(score, 0.25)").alias("c1"),
        F.expr("percentile(score, 0.50)").alias("c2"),
        F.expr("percentile(score, 0.75)").alias("c3"),
    )
    phased = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "score",
        (
            F.lit(1)
            + (F.col("score") < F.col("c3")).cast("int")
            + (F.col("score") < F.col("c2")).cast("int")
            + (F.col("score") < F.col("c1")).cast("int")
        ).alias("phase"),
    )
    w = W.partitionBy("phase").orderBy(
        shuffle_key(F.col("doc_id"), seed=23), F.col("doc_id")
    )
    return (
        phased.withColumn("order_in_phase", F.row_number().over(w))
        .orderBy("phase", "order_in_phase")
    )


# ---------------------------------------------------------------------------
# Largest-remainder budget allocation — shared by the standalone
# token-budget query and the composed curation pipeline so the
# rounding contract (bigint floor-div, remainder rank with key
# tie-break, allocations summing EXACTLY to the budget) lives in one
# place on both engines.
# ---------------------------------------------------------------------------
_BUDGET = 100000


def _alloc_sql(key: str, amount: str, keep: str = "") -> str:
    """DuckDB CTE tail: assumes a prior CTE ``per`` with columns
    (key, [keep,] amount); emits tot/base/ranked and the final select
    producing (key, [keep,] amount, alloc_tokens) ordered by key."""
    return f"""
    tot AS (SELECT SUM({amount}) AS total FROM per),
    base AS (
        SELECT {key}, {keep}{amount},
               ({_BUDGET} * {amount}) // total AS base_alloc,
               ({_BUDGET} * {amount}) % total  AS frac
        FROM per CROSS JOIN tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY frac DESC, {key}) AS rnk,
               {_BUDGET} - SUM(base_alloc) OVER ()           AS leftover
        FROM base
    )
    SELECT {key}, {keep}{amount},
           CAST(base_alloc + CAST(rnk <= leftover AS INT) AS BIGINT)
               AS alloc_tokens
    FROM ranked ORDER BY {key}
    """


def _largest_remainder_alloc(
    per: DataFrame, key_col: str, amount_col: str, keep_cols: tuple = ()
) -> DataFrame:
    """Spark side of _alloc_sql: integer-exact proportional allocation
    with largest-remainder rounding.  `div`/`%` on bigint — no float
    round-trip, so budget*amount stays exact past 2^53.  The global
    remainder rank comes from the distributed TeraSort-style rank
    (operators/ranking.py) — no unpartitioned window anywhere in the
    plan — and the leftover is one scalar aggregate broadcast back;
    both run over |keys| rows (sources/languages), never
    document-sized data, but the plan would survive a million keys."""
    from pymongo_change_stream_reader_spark.operators.ranking import (
        with_global_rank,
    )

    tot = per.agg(F.sum(amount_col).alias("total"))
    base = per.crossJoin(F.broadcast(tot)).select(
        key_col,
        *keep_cols,
        amount_col,
        F.expr(f"(CAST({_BUDGET} AS BIGINT) * {amount_col}) div total")
        .cast("bigint")
        .alias("base_alloc"),
        F.expr(f"(CAST({_BUDGET} AS BIGINT) * {amount_col}) % total").alias(
            "frac"
        ),
    )
    ranked, _ = with_global_rank(
        base, [F.desc("frac"), F.col(key_col)], rank_col="rnk"
    )
    left = ranked.agg(
        (F.lit(_BUDGET) - F.sum("base_alloc")).alias("leftover")
    )
    return (
        ranked.crossJoin(F.broadcast(left))
        .select(
            key_col,
            *keep_cols,
            amount_col,
            (
                F.col("base_alloc")
                + (F.col("rnk") <= F.col("leftover")).cast("int")
            )
            .cast("bigint")
            .alias("alloc_tokens"),
        )
        .orderBy(key_col)
    )


@query(
    "corpus_token_budget_allocation",
    oracle=f"""
    WITH per AS (
        SELECT source, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    {_alloc_sql("source", "n_tokens")}
    """,
    doc="Token-budget allocation across sources (budget 100k): "
    "proportional share with largest-remainder rounding, so the "
    "allocations are integers that sum EXACTLY to the budget — the "
    "sampling-quota step of a budgeted pretraining mix.  All integer "
    "arithmetic (floor-div + remainder rank), bit-stable across "
    "engines; the remainder rank breaks ties by source name.",
    tags=("corpus", "sampling"),
)
def corpus_token_budget_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scale: one aggregation over the handful of sources; the window
    runs over |sources| rows — never document-sized data."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("source", tx.token_count(F.col("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
    )
    return _largest_remainder_alloc(per, "source", "n_tokens")


@query(
    "corpus_curation_e2e",
    oracle=f"""
    WITH gated AS (
        SELECT doc_id, source, text, {_TOKS} AS toks
        FROM documents
        WHERE n_chars BETWEEN 100 AND 400
          AND list_sum(list_transform({_TOKS}, w -> length(w)))
              / greatest(len({_TOKS}), 1) BETWEEN 2 AND 12
          AND len(regexp_extract_all(text, '[!-/:-@\\[-`{{-~]'))
              / greatest(length(text), 1) < 0.05
          AND (lang <> 'en' OR {_HITS['en']} >= 1)
          AND {_BUCKET_SQL} >= 50
    ),
    surv AS (
        SELECT doc_id, source, text, toks FROM gated
        QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
    ),
    bench_grams AS (
        SELECT DISTINCT unnest({_GRAMS}) AS gram
        FROM documents WHERE {_BUCKET_SQL} < 50
    ),
    cont AS (
        SELECT s.doc_id
        FROM (SELECT doc_id, unnest({_GRAMS}) AS gram FROM surv) s
        JOIN bench_grams b USING (gram)
        GROUP BY s.doc_id
        HAVING COUNT(DISTINCT s.gram) >= 3
    ),
    clean AS (
        SELECT * FROM surv
        WHERE doc_id NOT IN (SELECT doc_id FROM cont)
    ),
    per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT)        AS kept_docs,
               CAST(SUM(len(toks)) AS BIGINT)  AS kept_tokens
        FROM clean GROUP BY source
    ),
    {_alloc_sql("source", "kept_tokens", keep="kept_docs, ")}
    """,
    doc="The COMPOSED curation pipeline, end to end in one plan: "
    "Gopher-style quality gate -> train-split selection (hash "
    "permille) -> exact-dup survivor (min doc_id per sha256) -> "
    "benchmark decontamination (drop docs sharing >=3 distinct "
    "3-grams with the held-out split) -> per-source token report "
    "with largest-remainder budget allocation.  Every stage exists "
    "as a standalone oracle query; this one proves they COMPOSE "
    "into the single pass a real pretraining-data pipeline runs.",
    tags=("corpus", "dedup", "text", "sampling"),
)
def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one tokenize behind the persist barrier feeds the gates
    AND the decontamination grams; exact-dup shuffle is on the 32-byte
    hash; bench grams broadcast (held-out split is small by
    construction); the budget rank runs over |sources| rows."""
    per = _curation_kept_per(spark, sf_dir)
    return _largest_remainder_alloc(
        per, "source", "kept_tokens", keep_cols=("kept_docs",)
    )


def _curation_kept_per(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The heavy stage of corpus_curation_e2e — everything up to the
    per-source (kept_docs, kept_tokens) frame, BEFORE the allocator
    (whose distributed global rank localCheckpoints and so truncates
    the visible lineage).  Split out so the plan-shape test can pin
    the broadcast-join/persist-barrier properties of the corpus-sized
    computation (tests/test_partition_pruning.py)."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        ngrams_from_tokens,
    )

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) % 1000
    toksed = (
        d.repartition(spark.sparkContext.defaultParallelism)
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            "text",
            tx.tokens(F.col("text")).alias("toks"),
            bucket.alias("bucket"),
        )
        .persist()
    )
    ntok = F.size("toks")
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_len = sum_len / F.greatest(ntok, F.lit(1))
    hits = F.size(
        F.filter(F.col("toks"), lambda w: F.lower(w).isin(*tx.STOPWORDS["en"]))
    )
    gated = toksed.filter(
        F.col("n_chars").between(100, 400)
        & mean_len.between(2, 12)
        & (tx.punct_ratio(F.col("text")) < 0.05)
        & ((F.col("lang") != "en") | (hits >= 1))
        & (F.col("bucket") >= 50)
    )
    # Exact-dup survivor as ONE hash aggregation (r14, guide §2.3):
    # min_by keeps the min-doc_id row's payload per sha256 group with
    # map-side partial aggregation, so only one winner row per hash
    # per map partition crosses the exchange and the raw text column
    # never shuffles at all — the window form exchanged every gated
    # row (text + toks) by sha256 and then sorted, to compute the same
    # winner.  Equivalent by doc_id uniqueness (min_by's winner is
    # exactly the row the `doc_id == min(doc_id) over (partition by
    # sha)` filter kept); downstream needs only (doc_id, source, toks).
    surv = (
        gated.groupBy(F.sha2(F.col("text"), 256).alias("__h"))
        .agg(
            F.min_by(
                F.struct("doc_id", "source", "toks"), F.col("doc_id")
            ).alias("__w")
        )
        .select("__w.doc_id", "__w.source", "__w.toks")
    )
    # grams from the PERSISTED token array — no second regex-split
    # pass over the corpus (the docstring's one-tokenize contract)
    bench = (
        toksed.filter(F.col("bucket") < 50)
        .select(F.explode(ngrams_from_tokens(F.col("toks"), 3)).alias("gram"))
        .distinct()
    )
    cont = (
        surv.select(
            "doc_id",
            F.explode(ngrams_from_tokens(F.col("toks"), 3)).alias("gram"),
        )
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("sg"))
        .filter(F.col("sg") >= 3)
        .select("doc_id")
    )
    clean = surv.join(cont, "doc_id", "left_anti")
    return clean.groupBy("source").agg(
        F.count("*").cast("bigint").alias("kept_docs"),
        F.sum(F.size("toks")).cast("bigint").alias("kept_tokens"),
    )


@query(
    "sample_weighted_priority",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    ORDER BY ln((((doc_id % 2147483648) * 2654435761) % 4294967296
                 + 0.5) / 4294967296.0) / n_chars DESC,
             doc_id
    LIMIT 100
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-ES, weight = n_chars, k = 100): priority ln(u)/w with the "
    "deterministic multiplicative hash standing in for rand() — "
    "order-equivalent to the paper's u**(1/w), reproducible across "
    "engines/runs/partitionings like the other no-rand() samplers.  "
    "Longer documents are proportionally likelier to be drawn; the "
    "draw is without replacement by construction (top-k of distinct "
    "priorities).",
    tags=("corpus", "sampling"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: narrow stateless priority projection +
    TakeOrderedAndProject (per-partition top-k, k-sized driver merge)
    — no global sort, no shuffle of the corpus."""
    from pymongo_change_stream_reader_spark.operators.sampling import (
        weighted_sample,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    # the priority only decides WHICH k rows survive (inside
    # weighted_sample); emitted order is immaterial to the
    # order-insensitive value hash, so order by the key for readability
    return weighted_sample(d, "doc_id", "n_chars", k=100).orderBy("doc_id")
