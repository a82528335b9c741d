"""Iterative graph algorithms — PageRank by synchronous power
iteration on DataFrames.

The companion to the label-propagation connected components in
operators/dedup.py: both follow the same driver-coordinated iteration
pattern (a fixed or convergence-bounded number of rounds, each round a
JOIN + hash aggregation, a localCheckpoint per round to cut the
growing lineage).  At 100 TB the per-round cost is one shuffle of the
EDGE table co-partitioned with a vertex-sized rank table — the same
plan GraphX/Pregel lowers to — and the driver holds nothing but the
round counter plus (at most) two scalars per round: the dangling mass
and the convergence delta.

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
    tol: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Ranks after up to ``iters`` synchronous power-iteration rounds
    over the DISTINCT directed edge set: uniform start 1/n, then

        rank'(v) = (1 - d)/n + d * (sum_{u->v} rank(u)/outdeg(u)
                                    + dangling_mass/n)

    The vertex set is the union of sources and destinations, and every
    vertex keeps a row every round — a vertex with out-edges but no
    in-edges retains its teleport share ``(1-d)/n`` (contributions are
    LEFT-joined onto the full vertex set; an inner rebuild would drop
    it after round 1 and lose its outgoing mass in later rounds).
    DANGLING vertices (no out-edges) donate their whole rank uniformly
    each round (``dangling_mass`` is one scalar aggregate per round),
    the standard PageRank completion — total rank mass stays exactly 1
    for any directed graph.

    ``tol`` enables early stopping: iteration ends once
    ``max_v |rank'(v) - rank(v)| < tol`` (one scalar join-aggregate
    per round).  ``stats``, when given, receives ``{"rounds": r}`` —
    the number of rounds actually run.

    Returns (v, rank).  The edge table is persisted once (it is reused
    every round); ranks are localCheckpointed per round so the plan
    stays one-join deep at any iteration count."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.distinct().persist()
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .persist()
    )
    n = verts.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    dangling = verts.join(
        deg.select(F.col("src").alias("v")), "v", "left_anti"
    ).persist()
    has_dangling = not dangling.isEmpty()
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    rounds = 0
    for _ in range(iters):
        if has_dangling:
            dm = dangling.join(ranks, "v").agg(F.sum("rank")).first()[0]
            dshare = (dm or 0.0) / n
        contrib = (
            e.join(ranks, e["src"] == ranks["v"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("v"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        incoming = F.coalesce(F.col("s"), F.lit(0.0))
        if has_dangling:
            # only dangling graphs pay the extra addend — the
            # no-dangling arithmetic stays bit-identical to the plain
            # `base + d * sum` form (oracle parity)
            incoming = incoming + F.lit(dshare)
        new_ranks = (
            verts.join(
                contrib.groupBy("v").agg(F.sum("c").alias("s")), "v", "left"
            )
            .select(
                "v", (F.lit(base) + damping * incoming).alias("rank")
            )
            .localCheckpoint(eager=True)
        )
        rounds += 1
        if tol is not None:
            delta = (
                new_ranks.join(
                    ranks.select("v", F.col("rank").alias("__prev")), "v"
                )
                .agg(F.max(F.abs(F.col("rank") - F.col("__prev"))))
                .first()[0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    e.unpersist()
    verts.unpersist()
    dangling.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return ranks
