"""Skew-mitigation operators: salted two-phase aggregation.

At 100 TB a handful of hot keys (one customer with 10^9 rows) stall a
shuffle: every row of the hot key lands on one reducer.  AQE's skew
handling splits oversized *join* partitions, but a skewed
*aggregation* key still funnels into one task — salting fixes it by
aggregating (key, salt) first (the hot key spreads over
``salt_buckets`` tasks), then combining the partials per key.
Results are identical to the direct aggregation (verified by the
oracle-checked query ``agg_salted_two_phase``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# combinators that re-aggregate partials associatively
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a possibly-skewed key.

    ``aggs`` maps output name -> (partial aggregate expression,
    combinator) where combinator ∈ {sum, count, min, max}.  Only
    associative aggregates qualify — that is the salting contract
    (avg = sum/count composed by the caller).

    The salt varies per row *within* a key (row id modulo buckets), so
    a hot key's rows really do spread across reducers.
    """
    for _, comb in aggs.values():
        if comb not in _COMBINE:
            raise ValueError(
                f"salted_agg supports {sorted(_COMBINE)} combinators, got {comb!r}"
            )
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            _COMBINE[comb](f"__p_{name}").alias(name)
            for name, (_, comb) in aggs.items()
        ]
    )


def sketched_salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    threshold: int,
    salt_buckets: int = 16,
    k: int = 512,
    stats: dict | None = None,
) -> DataFrame:
    """The classic two-phase skew join with SKETCHED hot-key
    detection: one Misra-Gries pass over the big side
    (operators/heavyhitters.py — k counters per partition, merge of
    <= (k+1)*partitions rows, never a vocabulary-sized shuffle) finds
    every key whose frequency MAY reach ``threshold`` (a provable
    superset — no hot key can be missed), and ONLY those keys fan out:

    - hot rows salt ``salt_buckets`` ways, the small side's hot rows
      replicate per bucket (the salted_join treatment, paid only by
      the skewed keys);
    - cold rows join plain — no replication, no salt column.

    Replacing a fixed hot-key list with the sketch makes the split
    self-tuning: at 100 TB nobody knows today's hot keys ahead of the
    batch.  Output rows are identical to ``big.join(small, key_cols)``
    (oracle-checked by ``join_salted_sketched``).  ``stats``, when
    given, receives ``{"hot_keys": [...]}`` — the detected candidate
    set (bounded by the summary size, a driver-safe collect).

    Raises (via heavy_hitter_candidates) when the sketch's error
    bound reaches ``threshold`` — a silent incomplete hot set would
    leave a hot key on the cold path's single reducer."""
    from pymongo_change_stream_reader_spark.operators.heavyhitters import (
        heavy_hitter_candidates,
    )

    # one composite string key for the sketch; the same expression
    # filters both sides, so hot/cold membership is consistent
    def skey(cols: list[str]) -> Column:
        parts = [F.col(c).cast("string") for c in cols]
        return F.concat_ws("\x1f", *parts)

    cand = heavy_hitter_candidates(
        big.select(skey(key_cols).alias("key")), "key", threshold, k
    )
    hot = [r["key"] for r in cand.select("key").collect()]
    if stats is not None:
        stats["hot_keys"] = hot
    if not hot:
        return big.join(small, key_cols)
    big_is_hot = skey(key_cols).isin(hot)
    small_is_hot = skey(key_cols).isin(hot)
    cold = big.filter(~big_is_hot).join(small.filter(~small_is_hot),
                                        key_cols)
    hot_big = big.filter(big_is_hot).withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    hot_small = small.filter(small_is_hot).withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hot_joined = hot_big.join(hot_small, [*key_cols, "__salt"]).drop(
        "__salt"
    )
    return cold.unionByName(hot_joined)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-tolerant inner equi-join: salt the big side per row and
    replicate the small side across every salt bucket, so a hot join
    key's rows spread over ``salt_buckets`` reducers instead of
    funneling into one.

    Output rows are identical to ``big.join(small, key_cols)`` —
    verified by the oracle-checked query ``join_salted_skew``.  Cost:
    the small side shuffles ``salt_buckets``× (still far below the
    big side); prefer ``F.broadcast`` when the small side fits in
    memory, and this rewrite when it does not but a few keys are
    hot.  (AQE's skew-join splitting covers sort-merge plans; the
    salted form also works where AQE cannot, e.g. under a
    user-forced shuffle layout.)"""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    )
    replicated_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_big.join(
        replicated_small, [*key_cols, "__salt"]
    ).drop("__salt")
