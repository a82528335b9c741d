"""Distributed total-order ranking — the scale-safe replacement for
``row_number()/ntile()`` over an UNPARTITIONED window.

Spark executes an empty-partition-spec window by moving EVERY row into
one partition ("WARN WindowExec: No Partition Defined — this can cause
serious performance degradation"): at corpus scale that serializes a
billion-row sort into a single task.  The classic fix (TeraSort-style)
is:

1. ``repartitionByRange`` on the order keys — a sampled range exchange,
   every partition p holds keys <= every key of partition p+1;
2. count rows per partition (a tiny driver-side list, one int per
   partition);
3. prefix-sum those counts into per-partition OFFSETS (broadcast back);
4. rank = offset + local ``row_number`` within the partition.

The result is bit-identical to the global window (the order keys must
form a total order — pass a unique tiebreaker) while every stage stays
parallel: the sort is per-partition, the only driver state is one int
per partition, and the offset join broadcasts.

``ntile_from_rank`` converts the global rank into SQL-standard NTILE
buckets (first ``n_rows % tiles`` buckets get the extra row) without
any window at all — it is pure arithmetic on (rank, n_rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID = "__rank_pid"


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add ``rank_col`` = the 1-based global row number of each row in
    the total order ``order_cols`` (which MUST be a total order — give
    a unique tiebreaker, or equal rows get an arbitrary stable order).
    Returns ``(ranked_df, n_rows)``.

    The input is localCheckpointed once (the sampled range exchange is
    nondeterministic across jobs, so the partition layout the counts
    were taken from must be the layout the ranks are computed on).
    No unpartitioned window appears in the plan — pytest-asserted via
    explain in tests/test_ranking.py.
    """
    from pyspark.sql import Window as W

    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(max(1, num_partitions), *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r[_PID]: r["c"]
        for r in parts.groupBy(_PID).agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.withColumn(rank_col, F.lit(None).cast("long")), 0
    off_df = spark.createDataFrame(offsets, f"{_PID} INT, __rank_off LONG")
    w = W.partitionBy(_PID).orderBy(*order_cols)
    ranked = (
        parts.join(F.broadcast(off_df), _PID)
        .withColumn(
            rank_col,
            (F.row_number().over(w) + F.col("__rank_off")).cast("long"),
        )
        .drop(_PID, "__rank_off")
    )
    return ranked, acc


def ntile_from_rank(rank: Column, n_rows: int, tiles: int) -> Column:
    """SQL-standard NTILE(tiles) bucket (1-based) of a row whose global
    rank (1-based) is ``rank``, over ``n_rows`` total rows: the first
    ``n_rows % tiles`` buckets hold ``n_rows // tiles + 1`` rows, the
    rest ``n_rows // tiles``.  Pure arithmetic — no window, no shuffle;
    bit-identical to Spark's and DuckDB's NTILE given the same order."""
    q, r = divmod(n_rows, tiles)
    if q == 0:
        # fewer rows than tiles: row k lands in bucket k
        return rank.cast("int")
    big = r * (q + 1)  # rows covered by the (q+1)-sized head buckets
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / q))
        .cast("int")
    )
