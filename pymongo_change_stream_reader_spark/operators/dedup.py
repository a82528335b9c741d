"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the scale path for training-data cleanup.

Scale design (100 TB):
- Exact dedup is one hash-shuffle on the fingerprint (map-side
  partial distinct first); never a sort.
- N-gram Jaccard is quadratic — it exists as the *verifier* for LSH
  candidates and as the small-scale oracle semantics, never as the
  primary scan.
- MinHash/LSH replaces the quadratic join with (a) one narrow
  projection computing signatures (no shuffle), (b) an explode to
  b bands, (c) a shuffle on (band, band_hash) whose buckets are tiny,
  (d) exact verification only within buckets.  This is the standard
  shingle->minhash->band->bucket-join pipeline.
- SimHash gives a single 64-bit sketch per doc; candidate pairs via
  band-of-bits buckets, verified by Hamming distance (bit_count(xor)).

All hashing is xxhash64 (JVM built-in) with string-prefix seeds, so
signatures are deterministic across runs and partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.text import fingerprint, tokens


# ---------------------------------------------------------------------------
# Exact dedup.
# ---------------------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id representative per exact (normalized) content.

    One shuffle on the md5 fingerprint; the min-by runs as partial
    aggregate map-side so duplicate-heavy corpora shrink before the
    exchange."""
    return (
        df.withColumn("__fp", fingerprint(F.col(text_col)))
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .withColumnRenamed("__fp", "fingerprint")
    )


# ---------------------------------------------------------------------------
# Shingling + exact Jaccard (the verifier / oracle semantics).
# ---------------------------------------------------------------------------
def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (empty array for short docs —
    Spark's sequence(1, 0) would count *down*, so guard explicitly)."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def exact_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, threshold: float, n: int = 3
) -> DataFrame:
    """All pairs with n-gram Jaccard >= threshold, via an inverted
    index on shingles (join only docs sharing a shingle — still
    worst-case quadratic; the LSH path below is the scale version)."""
    grams = df.select(
        F.col(id_col).alias("doc"), word_ngrams(F.col(text_col), n).alias("grams")
    )
    inv = grams.select("doc", F.explode("grams").alias("gram"))
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.gram") == F.col("b.gram"))
              & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    ga = grams.select(F.col("doc").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("doc").alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH.
# ---------------------------------------------------------------------------
def minhash_signature(grams: Column, num_hashes: int = 32) -> Column:
    """num_hashes-long signature: min over shingles of seeded
    xxhash64.  Pure expression — computed in one projection pass."""
    sig = [
        F.array_min(
            F.transform(grams, lambda g, i=i: F.xxhash64(F.concat(F.lit(f"mh{i}:"), g)))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Candidate pairs: docs colliding in >=1 LSH band
    (bands x rows = num_hashes).  Returns (id_a, id_b) distinct."""
    rows = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("doc"),
        minhash_signature(word_ngrams(F.col(text_col), n), num_hashes).alias("sig"),
    )
    banded = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * rows + 1, rows)).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
) -> DataFrame:
    """Full LSH dedup: candidates from band collisions, then exact
    Jaccard verification within candidates only (the scale-safe
    near-dup pipeline)."""
    cand = lsh_candidate_pairs(df, text_col, id_col, num_hashes, bands, n)
    grams = df.select(
        F.col(id_col).alias("doc"), word_ngrams(F.col(text_col), n).alias("grams")
    )
    ga = grams.select(F.col("doc").alias("id_a"), F.col("grams").alias("grams_a"))
    gb = grams.select(F.col("doc").alias("id_b"), F.col("grams").alias("grams_b"))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("grams_a"), F.col("grams_b")), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash.
# ---------------------------------------------------------------------------
def simhash64(text_col: str) -> Column:
    """64-bit SimHash of the token set, entirely in one aggregate
    higher-order expression (no shuffle, no UDF): per token, xxhash64
    contributes +1/-1 to each bit counter; sign of each counter forms
    the sketch.

    Written as a SQL expression because the PySpark shiftleft/
    shiftright wrappers only take Python-int shift amounts, while the
    SQL functions accept any expression (here the lambda variable j).
    """
    toks = rf"filter(split(trim({text_col}), '\\s+'), t -> t != '')"
    counters = f"""
        aggregate(
            {toks},
            array_repeat(cast(0 as long), 64),
            (acc, t) -> zip_with(
                acc,
                transform(sequence(0, 63),
                          j -> IF((shiftright(xxhash64(t), j) & 1) = 1,
                                  cast(1 as long), cast(-1 as long))),
                (x, y) -> x + y)
        )
    """
    return F.expr(
        f"""
        aggregate(
          zip_with({counters}, sequence(0, 63),
                   (c, j) -> IF(c > 0, shiftleft(cast(1 as long), j),
                                cast(0 as long))),
          cast(0 as long),
          (a, x) -> a + x
        )
        """
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 8, bands: int = 4
) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on byte-bands of the sketch
    (a pair within Hamming distance d < bands collides in >=1 band by
    pigeonhole when d < bands), verify with bit_count(xor)."""
    width = 64 // bands
    sk = df.select(
        F.col(id_col).alias("doc"), simhash64(text_col).alias("sketch")
    )
    banded = sk.select(
        "doc",
        "sketch",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sketch"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "sketch", "bb.band", "bb.bucket")
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.bit_count(
                F.col("a.sketch").bitwiseXOR(F.col("b.sketch"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
