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

__all__ = ["pagerank", "triangle_count", "k_core", "label_propagation"]


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count of the UNDIRECTED graph under ``edges``
    (directions/duplicates/self-loops are normalized away) by the
    degree-oriented join — the shape that survives hub vertices at
    100 TB:

    1. canonicalize each edge to (a, b) with a < b, distinct;
    2. orient every edge from its LOWER endpoint to its HIGHER under
       the (degree, id) total order — an acyclic orientation, so each
       triangle has exactly one vertex with two out-edges and is
       counted exactly once;
    3. join out-edges on the middle vertex, then semi-check the
       closing edge: count(o1(u,v) ⋈ o2(v,w) ⋈ o3(u,w)).

    Why (degree, id) and not plain id order: under id order a hub
    vertex with d neighbors of higher id contributes d^2 join
    candidates; degree orientation caps every vertex's out-degree at
    O(sqrt(|E|)) (a classic bound), so the candidate fan-out is
    O(|E|^1.5) worst case with no single straggler task — plus AQE's
    skew-join splitting on the remaining heavy keys.  Three hash
    joins + one hash aggregation; no windows, no driver state.
    Returns one row (n_triangles)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
    )
    o1 = oriented.alias("__o1")
    o2 = oriented.alias("__o2")
    o3 = oriented.alias("__o3")
    return (
        o1.join(o2, F.col("__o2.u") == F.col("__o1.v"))
        .join(
            o3,
            (F.col("__o3.u") == F.col("__o1.u"))
            & (F.col("__o3.v") == F.col("__o2.v")),
            "semi",
        )
        .agg(F.count("*").alias("n_triangles"))
    )


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


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """The k-core of the UNDIRECTED graph under ``edges``: the maximal
    induced subgraph where every vertex has degree >= k, by iterative
    peeling — drop vertices with degree < k, recompute degrees on the
    induced subgraph, repeat to fixpoint (the standard algorithm; the
    fixpoint is unique, so ANY peeling order converges to it).

    Per round: one degree aggregation + two semi joins restricting the
    edge set to surviving endpoints, localCheckpointed (a persisted
    chain re-analyzes every prior round's plan — the lineage lesson
    connected_components learned), with fixpoint detected by the edge
    count (strictly decreasing until stable; the count also
    materializes the checkpoint).  Rounds are bounded by |V| but
    real graphs peel in a handful; at 100 TB each round is two
    key-partitioned shuffles over a shrinking edge table and one
    scalar to the driver.

    ``stats`` receives ``{"rounds": r, "converged": bool}``.  Exhausting
    ``max_iters`` before the fixpoint raises (a partial peel is NOT a
    k-core — some surviving vertex still has degree < k; chain-like
    graphs need O(|V|) rounds, so callers on such shapes must size
    ``max_iters``); passing ``stats`` suppresses the raise and records
    ``converged=False`` for callers that handle partial peels
    themselves.  Returns (v, deg) — the core's vertices with their
    IN-CORE degrees (empty when the k-core is empty)."""
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_edges = cur.count()
    rounds = 0
    converged = False
    for _ in range(max_iters):
        deg = (
            cur.select(F.col("a").alias("v"))
            .unionByName(cur.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count("*").alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("v")
        nxt = (
            cur.join(keep.withColumnRenamed("v", "a"), "a", "semi")
            .join(keep.withColumnRenamed("v", "b"), "b", "semi")
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:  # peeling is monotone -> fixpoint
            converged = True
            break
        n_edges = n_next
        rounds += 1
    # the empty graph is trivially its own fixpoint even when the
    # loop's last round did the emptying
    converged = converged or n_edges == 0
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    elif not converged:
        raise RuntimeError(
            f"k_core: max_iters={max_iters} exhausted before the "
            "peeling fixpoint — the result is NOT a k-core (some "
            "vertex still has degree < k); raise max_iters (chain-"
            "like graphs need O(|V|) rounds) or pass stats= to "
            "accept a partial peel with stats['converged']=False"
        )
    return (
        cur.select(F.col("a").alias("v"))
        .unionByName(cur.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )


def label_propagation(
    edges: DataFrame,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by SYNCHRONOUS label propagation (Raghavan
    et al. 2007) over the undirected graph under ``edges``, run for a
    FIXED ``rounds`` count with a deterministic tie-break: each round
    every vertex adopts the most frequent label among its neighbors'
    PREVIOUS-round labels, ties to the smallest label; labels start as
    each vertex's own id.  The fixed round count + total tie order
    make the result reproducible (and SQL-unrollable — asynchronous /
    randomized LPA is not), at the cost of the known synchronous
    oscillation on bipartite-ish structures: pick ``rounds`` odd/even
    deliberately when that matters.

    Per round: one edge-to-labels join + two hash aggregations
    ((v, lbl) counts, then per-v argmax via a (count, -label) struct
    max — all integer arithmetic, no window), localCheckpointed like
    every loop in this module.  At 100 TB each round shuffles the edge
    table against a vertex-sized label table on the same key.

    Labels must be numeric (the -label tie-break trick).  Returns
    (v, label) for every vertex incident to an edge; isolated
    vertices are the caller's to union (their label is their id)."""
    und = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    e = (
        und.unionByName(
            und.select(F.col("d").alias("s"), F.col("s").alias("d"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        e.select(F.col("s").alias("v"))
        .distinct()
        .select("v", F.col("v").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        nbr = e.join(labels, e["s"] == labels["v"]).select(
            F.col("d").alias("v"), "lbl"
        )
        counts = nbr.groupBy("v", "lbl").agg(F.count("*").alias("c"))
        labels = (
            counts.groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("c"), (-F.col("lbl")).alias("nl")
                    )
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lbl"))
            .localCheckpoint(eager=False)
        )
        labels.count()  # materialize; truncate lineage each round
    return labels.select("v", F.col("lbl").alias("label"))
