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
