"""Heavy hitters — a mergeable Misra-Gries summary with COUNTS and a
deterministic error bound.

Why not just ``groupBy(key).count()``: exact counting shuffles one
state per DISTINCT key; at 100 TB with an open vocabulary (tokens,
URLs, user ids) the distinct count can exceed what an aggregation
should hold.  Why not ``df.stat.freqItems``: Spark's built-in is the
same family but returns only the ITEM SET — no counts, no bound — and
a vocabulary/statistics pipeline needs both.

Shape (the classic mergeable decomposition):

1. each input partition builds its own k-slot Misra-Gries summary in
   one Arrow-batched pass (``mapInPandas`` — bounded memory per task:
   k counters regardless of input size), emitting its surviving
   (key, count) pairs plus one per-partition row carrying the
   DECREMENT total ``d_p``;
2. the summaries are tiny (<= k rows + 1 per partition), so one hash
   aggregation merges them: ``est(key) = sum_p count_p(key)`` and the
   global error ``D = sum_p d_p``.

Guarantees (standard MG algebra, and what the tests pin):

- ``est(key) <= true(key) <= est(key) + D``;
- ``D <= (n - m) / (k + 1)`` where n is the total count and m the
  mass retained in the summaries — so every key with
  ``true(key) > D`` SURVIVES in at least one partition summary: no
  false negatives above the reported threshold.

The returned frame carries (key, est, est_plus_bound) and the caller
reads ``D`` from one driver-side scalar; filtering ``est + D >=
threshold`` yields a candidate set that provably contains every key
with true frequency >= threshold (verify exactly with one
semi-join-counted pass if exact counts of the candidates are needed —
candidate-set-sized, not vocabulary-sized).

Reference parity: the reference engine has no sketch surface; this
extends the mergeable-sketch family (HLL, bitmap segments) the way a
training-data pipeline needs for vocabulary/frequency statistics.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "misra_gries_summary",
    "heavy_hitter_candidates",
    "count_min_sketch",
    "count_min_estimate",
]

_SUMMARY_SCHEMA = "key STRING, cnt BIGINT, is_decr BOOLEAN"


def _mg_partition(k: int):
    """Per-partition Misra-Gries over an Arrow batch iterator: k
    counter slots; a key missing from a full table decrements every
    counter (implemented batch-wise: subtract the evictions' mass).
    Emits surviving (key, count) rows plus ONE row with the
    partition's total decrement (is_decr=true, key NULL)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        decr = 0
        for pdf in batches:
            for key, c in pdf["key"].value_counts().items():
                c = int(c)
                if key in counters:
                    counters[key] += c
                elif len(counters) < k:
                    counters[key] = c
                else:
                    # decrement-by-min generalized to a c-sized arrival:
                    # remove min(c, current minimum) from EVERY slot
                    # and from the arrival, repeating while the
                    # arrival survives and the table is full — each
                    # round evicts at least one slot, so it terminates
                    while c > 0 and len(counters) >= k:
                        m = min(counters.values())
                        step = min(c, m)
                        decr += step
                        c -= step
                        for kk in list(counters):
                            counters[kk] -= step
                            if counters[kk] == 0:
                                del counters[kk]
                    if c > 0:
                        counters[key] = c
        out = pd.DataFrame(
            {
                "key": list(counters) + [None],
                "cnt": list(counters.values()) + [decr],
                "is_decr": [False] * len(counters) + [True],
            }
        )
        yield out

    return run


def _mg_summary_parts(
    df: DataFrame, col: str | Column, k: int
) -> tuple[DataFrame, DataFrame]:
    """(per-key estimate frame, 1-row decrement-bound frame) — the
    shared core of the summary/candidate entry points."""
    keyed = df.select(F.col(col).cast("string").alias("key") if isinstance(
        col, str
    ) else col.cast("string").alias("key"))
    parts = keyed.mapInPandas(_mg_partition(k), _SUMMARY_SCHEMA)
    # one pass over the tiny summary frame: per-key sums + the global
    # decrement, joined back as a literal-free broadcast (1 row)
    parts = parts.localCheckpoint(eager=True)  # summaries are not
    # deterministic across recomputations (partition layout + dict
    # order); pin them so est/bound/candidates come from ONE run
    sums = parts.filter(~F.col("is_decr")).groupBy("key").agg(
        F.sum("cnt").alias("est")
    )
    d = parts.filter(F.col("is_decr")).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("bound")
    )
    return sums, d


def misra_gries_summary(
    df: DataFrame, col: str | Column, k: int = 256
) -> DataFrame:
    """Merged Misra-Gries summary of ``col``: one row per surviving
    key — (key, est, bound) with ``est <= true <= est + bound`` —
    where ``bound`` is the merged decrement total D (one global
    scalar, repeated per row for self-containment).  Partials are
    per-partition (bounded memory); the merge aggregates
    <= (k+1) * n_partitions rows."""
    sums, d = _mg_summary_parts(df, col, k)
    return sums.crossJoin(F.broadcast(d))


def heavy_hitter_candidates(
    df: DataFrame, col: str | Column, threshold: int, k: int = 256
) -> DataFrame:
    """Keys whose true frequency MAY reach ``threshold`` — provably a
    superset of the keys with ``true >= threshold`` (no false
    negatives: est + D >= true for every SURVIVING key, and a key
    absent from every partition summary has true <= D).  That second
    leg only holds when ``D < threshold`` — otherwise an absent key
    could have true frequency in [threshold, D] and be silently
    missing — so this RAISES when the merged bound reaches the
    threshold instead of returning a set whose guarantee is void:
    retry with a larger ``k`` (``k >= 2 * n / threshold`` keeps D
    comfortably under).  Reading the bound costs one driver scalar off
    the already-materialized summary.  Returns (key, est, bound)."""
    sums, d = _mg_summary_parts(df, col, k)
    bound = d.first()["bound"]
    if bound >= threshold:
        raise ValueError(
            f"heavy_hitter_candidates: merged decrement bound D={bound} "
            f">= threshold={threshold} — the no-false-negative guarantee "
            f"does not hold at k={k}; choose k >= 2 * n / threshold"
        )
    return sums.crossJoin(F.broadcast(d)).filter(
        F.col("est") + F.col("bound") >= threshold
    )


def count_min_sketch(
    df: DataFrame, col: str | Column, width: int = 2048, depth: int = 4
) -> DataFrame:
    """Count-Min sketch of ``col`` as a (row, bucket, cnt) table —
    ``depth * width`` counters regardless of input size, mergeable by
    plain addition (union + re-aggregate), the point-query complement
    to the Misra-Gries summary (MG answers "which keys are heavy";
    CM answers "roughly how often is THIS key" for any key).

    One narrow pass: every value explodes into its ``depth``
    (row, bucket) cells (seeded xxhash64 mod width — fixed seeds, so
    sketches are stable across runs/engines/partitions and remain
    mergeable), then ONE hash aggregation with map-side partials.
    Guarantees: ``estimate >= true`` always (counters only
    over-count); overcount per row is the key's collision mass, so
    ``min`` over rows is within ``e * n / width`` with probability
    ``1 - e^-depth`` (standard CM bound)."""
    key = (F.col(col) if isinstance(col, str) else col).cast("string")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(F.concat(F.lit(f"cm{i}:"), key)),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"),
                      F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str | Column,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for every probe key: est = min over the
    ``depth`` rows of the key's cell counter (0 when a cell is empty).
    Returns (key, est).  ``width``/``depth`` must match the sketch's.
    The probe plan is |probes| x depth rows joined against the
    depth x width sketch — broadcast-sized on both sides at any corpus
    scale."""
    key = (F.col(col) if isinstance(col, str) else col).cast("string")
    cells = probes.select(key.alias("key")).distinct().select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        F.pmod(
                            F.xxhash64(
                                F.concat(F.lit(f"cm{i}:"), F.col("key"))
                            ),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    )
    return (
        cells.join(
            F.broadcast(sketch),
            (F.col("c.row") == F.col("row"))
            & (F.col("c.bucket") == F.col("bucket")),
            "left",
        )
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
