"""Sequence packing and deterministic global shuffle for training-data
pipelines.

Pretraining dataloaders consume fixed-length token sequences, not
documents; the two standard layouts are implemented here:

- **Offset packing** (GPT-style concat-and-cut): documents are
  concatenated in a deterministic order and the token stream is cut
  every `budget` tokens; a document can straddle a sequence boundary.
  This is pure prefix-sum arithmetic — one window pass per shard, no
  Python (see `pack_offsets`).
- **Greedy packing** (first-fit, no splitting): documents fill a
  sequence until the next one would overflow, then a new sequence
  starts; oversized documents get their own.  The fill recursion is
  inherently sequential per shard, so it runs as one Arrow
  `applyInPandas` kernel per shard (`pack_greedy`) — the same
  hash-shuffle any groupBy pays, with the sequential part bounded by
  shard size, never corpus size.

Both use a deterministic multiplicative-hash shard assignment, so the
layout is reproducible across engines and runs — no `rand()`.

Scale: shards are the parallelism unit.  At 100 TB pick `n_shards` ≈
executor-cores × a small factor; each shard's greedy scan is O(shard)
and the offset variant is wholly JVM-side window arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Knuth multiplicative hash — identical integer semantics in Spark and
# DuckDB (see corpus_queries._BUCKET_SQL).  Ids are masked to 2^31
# BEFORE the multiply: (2^31-1) * 2654435761 ~ 5.7e18 stays inside
# int64 in both engines, whereas the unmasked product overflows for
# ids above ~3.5e9 (ANSI error in Spark, HUGEINT promotion in DuckDB
# — either way the cross-engine contract breaks at corpus scale).
_HASH_MULT = 2654435761
_HASH_MOD = 4294967296
_HASH_MASK = 2147483648


def shard_of(col, n_shards: int, seed: int = 0):
    """Deterministic shard id of an integer id column."""
    return (
        ((col % F.lit(_HASH_MASK)) * F.lit(_HASH_MULT) + F.lit(seed))
        % F.lit(_HASH_MOD)
    ) % F.lit(n_shards)


def shuffle_key(col, seed: int = 0):
    """Deterministic pseudorandom total-order key for an integer id.

    A global shuffle at scale is `repartitionByRange(N, key)` +
    `sortWithinPartitions(key)` — a distributed range sort, never a
    single-node window."""
    return (
        (col % F.lit(_HASH_MASK)) * F.lit(_HASH_MULT) + F.lit(seed)
    ) % F.lit(_HASH_MOD)


def pack_offsets(
    docs: DataFrame,
    token_col: str = "toks",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """Concat-and-cut packing: per shard, documents are laid out in
    id order and the token stream is cut every `budget` tokens.
    Returns the input plus shard / tok_offset / start_seq / end_seq /
    spans columns.  Pure prefix-sum window arithmetic — integer-exact
    and fully JVM-side."""
    shard = shard_of(F.col(id_col), n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(token_col)
    out = docs.withColumn("shard", shard).withColumn(
        "tok_offset", F.sum(token_col).over(w) - toks
    )
    start = F.floor(F.col("tok_offset") / budget).cast("long")
    end = F.floor((F.col("tok_offset") + toks - 1) / budget).cast("long")
    return (
        out.withColumn("start_seq", start)
        .withColumn("end_seq", end)
        .withColumn("spans", end - start + F.lit(1))
    )


def _make_greedy_fn(budget: int, id_col: str, token_col: str):
    def fill(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seqs = []
        running = 0
        seq = -1
        for t in pdf[token_col]:
            if seq < 0 or running + t > budget:
                seq += 1
                running = int(t)
            else:
                running += int(t)
            seqs.append(seq)
        pdf["seq"] = seqs
        return pdf

    return fill


def pack_greedy(
    docs: DataFrame,
    token_col: str = "toks",
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """First-fit greedy packing (documents never split): per shard, in
    id order, a document joins the current sequence unless it would
    overflow `budget`; oversized documents occupy their own sequence.
    Returns the input plus shard / seq columns (seq is per-shard).

    The scan is sequential per shard by nature (each decision depends
    on the running total), so it runs as one Arrow batch per shard —
    cost O(shard size), parallel across shards."""
    with_shard = docs.withColumn("shard", shard_of(F.col(id_col), n_shards))
    schema = T.StructType(
        list(with_shard.schema.fields) + [T.StructField("seq", T.LongType())]
    )
    return with_shard.groupBy("shard").applyInPandas(
        _make_greedy_fn(budget, id_col, token_col), schema
    )
