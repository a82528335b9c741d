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


def approx_ntile(
    df: DataFrame,
    col: str | Column,
    tiles: int,
    k: int = 256,
    tile_col: str = "tile",
    stats: dict | None = None,
) -> DataFrame:
    """Approximate NTILE: bucket every row by sketch-derived quantile
    cut points instead of an exact global rank — the 100 TB path for
    rank-INSENSITIVE bucketing (DSIR/CCNet-style quality buckets,
    length-stratified sampling), where :func:`with_global_rank`'s
    range exchange + per-partition sort is overkill and a +-eps
    boundary error changes nothing.

    ONE sketch pass (mergeable KLL/MRL compactors per partition —
    operators/quantiles.py), ``tiles - 1`` cut points probed from the
    summary-sized sketch, then a codegen'd projection assigns
    ``bucket = 1 + |{cuts < x}|`` via an array-literal filter — no
    range exchange, no sort, no window anywhere in the plan
    (pytest-asserted).  Driver state is the cut list (tiles-1
    doubles).  Rows whose value is NULL get a NULL bucket.

    Unlike exact NTILE the buckets are only approximately equal
    (each boundary's rank error is the sketch's, O(n*levels/k)), and
    heavy duplicate values can leave buckets empty (every duplicate
    of a cut value lands below it).  ``stats`` receives
    ``{"cuts": [...]}``."""
    from pymongo_change_stream_reader_spark.operators.quantiles import (
        quantile_estimate,
        quantile_sketch,
    )

    if tiles < 2:
        raise ValueError("approx_ntile needs tiles >= 2")
    c = F.col(col) if isinstance(col, str) else col
    sk = quantile_sketch(df, c, k=k).localCheckpoint(eager=True)
    probs = [i / tiles for i in range(1, tiles)]
    est = {
        r["p"]: r["value"] for r in quantile_estimate(sk, probs).collect()
    }
    cuts = [est[p] for p in sorted(est) if est[p] is not None]
    if stats is not None:
        stats["cuts"] = list(cuts)
    if not cuts:
        return df.withColumn(
            tile_col,
            F.when(c.isNotNull(), F.lit(1)).cast("int"),
        )
    x = c.cast("double")
    bucket = F.lit(1) + F.size(
        F.filter(
            F.array(*[F.lit(v) for v in cuts]), lambda cut: cut < x
        )
    )
    return df.withColumn(
        tile_col, F.when(x.isNotNull(), bucket).cast("int")
    )


def approx_ntile_by_group(
    df: DataFrame,
    group_cols: list[str],
    col: str | Column,
    tiles: int,
    k: int = 256,
    tile_col: str = "tile",
) -> DataFrame:
    """STRATIFIED approximate NTILE: per-group quantile buckets from
    per-group mergeable sketches — e.g. per-language quality deciles,
    where one global cut list would let a verbose language crowd out
    the rest.  Fully distributed end to end: per-partition grouped
    compactors (mapInPandas), grouped summary probes (applyInPandas
    over summary rows), then a join of the (group, cuts) frame back
    onto the data (AQE broadcasts it when small) and the same
    codegen'd array-filter bucket assignment as :func:`approx_ntile`.
    NOTHING is collected to the driver, so the group count can scale
    with the data."""
    from pymongo_change_stream_reader_spark.operators.quantiles import (
        grouped_quantile_cuts,
        grouped_quantile_sketch,
    )

    if tiles < 2:
        raise ValueError("approx_ntile_by_group needs tiles >= 2")
    c = F.col(col) if isinstance(col, str) else col
    sk = grouped_quantile_sketch(df, group_cols, c, k=k)
    cuts = grouped_quantile_cuts(
        sk, group_cols, [i / tiles for i in range(1, tiles)]
    )
    x = c.cast("double")
    bucket = F.lit(1) + F.size(
        F.filter(F.col("__cuts"), lambda cut: cut < x)
    )
    return (
        df.join(
            cuts.withColumnRenamed("cuts", "__cuts"), group_cols, "left"
        )
        .withColumn(
            tile_col,
            F.when(
                x.isNotNull() & F.col("__cuts").isNotNull(), bucket
            ).cast("int"),
        )
        .drop("__cuts")
    )
