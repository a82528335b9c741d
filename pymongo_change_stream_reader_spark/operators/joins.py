"""Join operators Spark lacks natively: bucketed range (interval)
join.

A naive point-in-interval theta join (`p.x BETWEEN i.lo AND i.hi`)
has no equality key, so Spark plans a BroadcastNestedLoopJoin /
CartesianProduct — O(points x intervals) comparisons, the classic
100 TB cliff.  The standard rewrite buckets the value axis: points
land in one bucket, intervals explode to every bucket they cover,
and the join becomes an EQUI-join on the bucket id followed by an
exact refinement filter.  Work drops to O(points + intervals x
avg_span/width + true_matches), and the equi-join shuffles/broadcasts
like any other.

Pick ``bucket_width`` near the typical interval length: much smaller
multiplies the interval explode; much larger multiplies false
candidates per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of points to half-open intervals [lo, hi) via
    bucket equi-join + exact refinement.  Output columns: all point
    columns then all interval columns (names must not collide).

    Scale: one shuffle (or broadcast, if the exploded interval side is
    small) keyed on the bucket id; no nested-loop join appears in the
    plan — asserted by the pytest."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )
