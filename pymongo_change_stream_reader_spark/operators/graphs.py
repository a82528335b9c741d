"""Iterative graph algorithms — PageRank by synchronous power
iteration on DataFrames.

The companion to the label-propagation connected components in
operators/dedup.py: both follow the same driver-coordinated iteration
pattern (a fixed or convergence-bounded number of rounds, each round a
JOIN + hash aggregation, a localCheckpoint per round to cut the
growing lineage).  At 100 TB the per-round cost is one shuffle of the
EDGE table co-partitioned with a vertex-sized rank table — the same
plan GraphX/Pregel lowers to — and the driver holds nothing but the
round counter.

Reference parity: the reference engine has no graph surface; this is
training-data-pipeline extension surface (rank-based corpus weighting
— the "quality by link structure" signal web-scale curation uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ranks after ``iters`` synchronous power-iteration rounds over
    the DISTINCT directed edge set: uniform start 1/n, then

        rank'(v) = (1 - d)/n + d * sum_{u->v} rank(u) / outdeg(u)

    Every vertex must have at least one outgoing edge (feed an
    undirected graph as both edge directions) — dangling-mass
    redistribution is deliberately out of scope and asserted against.
    Returns (v, rank).  The edge table is persisted once (it is reused
    every round); ranks are localCheckpointed per round so the plan
    stays one-join deep at any iteration count."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.distinct().persist()
    verts = e.select(F.col("src").alias("v")).distinct()
    out_only = e.select(F.col("dst").alias("v")).distinct().exceptAll(verts)
    if not out_only.isEmpty():
        raise ValueError(
            "pagerank: every vertex needs an outgoing edge (got a "
            "sink); pass an undirected graph as both directions or "
            "add self-loops"
        )
    n = verts.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["v"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("v"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        ranks = (
            contrib.groupBy("v")
            .agg((F.lit(base) + damping * F.sum("c")).alias("rank"))
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks
