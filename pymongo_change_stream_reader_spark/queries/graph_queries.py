"""Graph queries: iterative algorithms over relationship tables
(operators/graphs.py — the family connected components opened in
operators/dedup.py).

The PageRank oracle is the power iteration UNROLLED as plain CTEs
(recursive CTEs cannot aggregate in the recursive term), one per
round — bit-for-bit the same arithmetic as the Spark loop: the same
``(1 - 0.85)`` IEEE expression for the teleport term (a literal 0.15
differs from computed 1-0.85 in the last ulp), the same uniform 1/n
start, ROUND(…, 8) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table

_PR_STEP = """
    SELECT e.dst AS v,
           (1 - 0.85) / MAX(nv.n) + 0.85 * SUM(p.rank / d.outdeg) AS rank
    FROM edges e
    JOIN {prev} p ON p.v = e.src
    JOIN deg d ON d.src = e.src, nv
    GROUP BY e.dst
"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM lineitem
        UNION
        SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR),
                        'p' || CAST(l_partkey AS VARCHAR)
        FROM lineitem
    ),
    verts AS (SELECT DISTINCT src AS v FROM edges),
    nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    pr0 AS (SELECT v, 1.0 / n AS rank FROM verts, nv),
    pr1 AS ({_PR_STEP.format(prev="pr0")}),
    pr2 AS ({_PR_STEP.format(prev="pr1")}),
    pr3 AS ({_PR_STEP.format(prev="pr2")})
    SELECT v, ROUND(rank, 8) AS rank FROM pr3 ORDER BY v
    """,
    doc="PageRank (3 synchronous power-iteration rounds, damping "
    "0.85) over the bidirected part<->supplier graph of lineitem — "
    "the rank-based corpus-weighting signal, exercised on the "
    "relational data.  Spark runs the driver-coordinated iteration "
    "(operators/graphs.py: one edge-join + hash aggregation per "
    "round, localCheckpoint cutting the lineage); the oracle unrolls "
    "the identical arithmetic as one CTE per round.",
    tags=("graph",),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.graphs import pagerank

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    fwd = pairs.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select(
        "v", F.round("rank", 8).alias("rank")
    ).orderBy("v")


_PRD_STEP = """
    SELECT vt.v,
           (1 - 0.85) / MAX(nv.n)
           + 0.85 * (COALESCE(MAX(c.s), 0)
                     + MAX({dm}.m) / MAX(nv.n)) AS rank
    FROM verts vt
    LEFT JOIN (
        SELECT e.dst AS v, SUM(p.rank / d.outdeg) AS s
        FROM edges e
        JOIN {prev} p ON p.v = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ) c ON c.v = vt.v, nv, {dm}
    GROUP BY vt.v
"""

_PRD_DM = """
    SELECT COALESCE(SUM(rank), 0) AS m FROM {prev}
    WHERE v NOT IN (SELECT src FROM edges)
"""


@query(
    "graph_pagerank_directed",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS src,
                        's' || CAST(l_suppkey AS VARCHAR) AS dst
        FROM lineitem
    ),
    verts AS (
        SELECT src AS v FROM edges UNION SELECT dst FROM edges
    ),
    nv AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    pr0 AS (SELECT v, 1.0 / n AS rank FROM verts, nv),
    dm0 AS ({_PRD_DM.format(prev="pr0")}),
    pr1 AS ({_PRD_STEP.format(prev="pr0", dm="dm0")}),
    dm1 AS ({_PRD_DM.format(prev="pr1")}),
    pr2 AS ({_PRD_STEP.format(prev="pr1", dm="dm1")}),
    dm2 AS ({_PRD_DM.format(prev="pr2")}),
    pr3 AS ({_PRD_STEP.format(prev="pr2", dm="dm2")})
    SELECT v, ROUND(rank, 8) AS rank FROM pr3 ORDER BY v
    """,
    doc="PageRank over the DIRECTED part->supplier graph — every "
    "part vertex has in-degree 0 (it must keep its teleport share "
    "and keep donating: the r9 inner-rebuild bug dropped such "
    "vertices after round 1), and every supplier vertex is DANGLING "
    "(its rank mass redistributes uniformly each round — one scalar "
    "aggregate; total mass stays exactly 1).  The oracle unrolls the "
    "same three rounds with an explicit dangling-mass CTE per round.",
    tags=("graph",),
)
def graph_pagerank_directed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.graphs import pagerank

    edges = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias(
                "src"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "dst"
            ),
        )
        .distinct()
    )
    ranks = pagerank(edges, iters=3, damping=0.85)
    return ranks.select(
        "v", F.round("rank", 8).alias("rank")
    ).orderBy("v")


@query(
    "graph_connected_components",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        FROM lineitem WHERE l_orderkey % 401 = 0
    ),
    edges AS (
        SELECT DISTINCT a.s AS src, b.s AS dst
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.s <> b.s
    ),
    verts AS (SELECT DISTINCT s_suppkey AS v FROM supplier),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    )
    SELECT v AS s_suppkey, MIN(lbl) AS component
    FROM cc GROUP BY v ORDER BY v
    """,
    doc="Connected components of a sparse supplier co-occurrence "
    "graph (suppliers sharing an order, 1-in-401 order sample: 25 "
    "components over 100 suppliers at sf0.01) — the generic exposure "
    "of operators/dedup.py:connected_components (iterative min-label "
    "propagation, one edge join + min-aggregate per round, fixpoint "
    "detected by a monotone scalar; driver_threshold=0 pins the "
    "DISTRIBUTED loop rather than the model-sized union-find "
    "shortcut).  Suppliers in no sampled order are singleton "
    "components.  The oracle reaches the same fixpoint by recursive "
    "min-label closure.",
    tags=("graph",),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.dedup import (
        connected_components,
    )

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 401 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.alias("__a")
    b = pairs.alias("__b")
    edge_pairs = a.join(
        b,
        (F.col("__a.o") == F.col("__b.o"))
        & (F.col("__a.s") < F.col("__b.s")),
    ).select(
        F.col("__a.s").alias("id_a"), F.col("__b.s").alias("id_b")
    ).distinct()
    suppliers = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey")
    )
    comps = connected_components(
        edge_pairs, suppliers, id_col="s_suppkey", driver_threshold=0
    )
    return comps.select("s_suppkey", "component").orderBy("s_suppkey")


@query(
    "graph_triangle_count",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        FROM lineitem WHERE l_orderkey < 30000
    ),
    edges AS (
        SELECT DISTINCT a.s AS a, b.s AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
    )
    SELECT COUNT(*) AS n_triangles
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
    doc="Triangle counting over the supplier co-occurrence graph "
    "(suppliers sharing an order) via operators/graphs.py:"
    "triangle_count — the DEGREE-ORIENTED wedge join (each edge "
    "points at its higher-(degree, id) endpoint; the orientation is "
    "acyclic, so each triangle is counted exactly once, and every "
    "vertex's out-degree is capped at O(sqrt(|E|)), the classic "
    "hub-fan-out bound).  The oracle counts the same triangles with "
    "the simple id-ordered 3-way join — any acyclic orientation "
    "yields the same count, so the two plans must agree exactly.",
    tags=("graph",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.graphs import (
        triangle_count,
    )

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 30000)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.alias("__a")
    b = pairs.alias("__b")
    edges = a.join(
        b,
        (F.col("__a.o") == F.col("__b.o"))
        & (F.col("__a.s") < F.col("__b.s")),
    ).select(F.col("__a.s").alias("src"), F.col("__b.s").alias("dst"))
    return triangle_count(edges)


_KCORE_STEP = """
    SELECT e.a, e.b FROM {cur} e
    JOIN (SELECT v FROM (SELECT a AS v FROM {cur}
                         UNION ALL SELECT b FROM {cur})
          GROUP BY v HAVING COUNT(*) >= 4) ka ON ka.v = e.a
    JOIN (SELECT v FROM (SELECT a AS v FROM {cur}
                         UNION ALL SELECT b FROM {cur})
          GROUP BY v HAVING COUNT(*) >= 4) kb ON kb.v = e.b
"""


@query(
    "graph_kcore",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        FROM lineitem WHERE l_orderkey % 197 = 0
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.s AS a, b.s AS b
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.s < b.s
    ),
    e1 AS MATERIALIZED ({_KCORE_STEP.format(cur="e0")}),
    e2 AS MATERIALIZED ({_KCORE_STEP.format(cur="e1")}),
    e3 AS MATERIALIZED ({_KCORE_STEP.format(cur="e2")}),
    e4 AS MATERIALIZED ({_KCORE_STEP.format(cur="e3")}),
    e5 AS MATERIALIZED ({_KCORE_STEP.format(cur="e4")}),
    e6 AS MATERIALIZED ({_KCORE_STEP.format(cur="e5")})
    SELECT v, COUNT(*) AS deg
    FROM (SELECT a AS v FROM e6 UNION ALL SELECT b FROM e6)
    GROUP BY v ORDER BY v
    """,
    doc="4-core of the supplier co-occurrence graph (1-in-197 order "
    "sample) via operators/graphs.py:k_core — iterative peeling to "
    "the unique fixpoint (per round: one degree aggregation + two "
    "semi joins over a shrinking localCheckpointed edge set, fixpoint "
    "by the strictly-decreasing edge count).  The oracle unrolls SIX "
    "peel rounds; the fixture converges in <= 4 at every SF "
    "(pytest-pinned via the stats hook) and post-fixpoint rounds are "
    "no-ops, so the unroll bound is slack, not load-bearing.  The "
    "CTEs are MATERIALIZED: each round references its predecessor 5x, "
    "so DuckDB's default inlining would expand 5^6 scans.  Output "
    "= (vertex, in-core degree).",
    tags=("graph",),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.graphs import k_core

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 197 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.alias("__a")
    b = pairs.alias("__b")
    edges = a.join(
        b,
        (F.col("__a.o") == F.col("__b.o"))
        & (F.col("__a.s") < F.col("__b.s")),
    ).select(F.col("__a.s").alias("src"), F.col("__b.s").alias("dst"))
    stats: dict = {}
    out = k_core(edges, k=4, stats=stats)
    if stats["rounds"] > 6:
        raise RuntimeError(
            f"graph_kcore: peeling took {stats['rounds']} rounds; the "
            "oracle unrolls 6 — raise the unroll instead of "
            "hash-mismatching"
        )
    return out.select("v", "deg").orderBy("v")


_LP_STEP = """
    SELECT v, lbl FROM (
        SELECT e.d AS v, p.lbl, COUNT(*) AS c
        FROM und e JOIN {prev} p ON p.v = e.s
        GROUP BY e.d, p.lbl
    ) QUALIFY ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lbl) = 1
"""


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
        FROM lineitem WHERE l_orderkey % 401 = 0
    ),
    und AS (
        SELECT DISTINCT a.s AS s, b.s AS d
        FROM pairs a JOIN pairs b ON a.o = b.o AND a.s <> b.s
    ),
    lp0 AS (SELECT DISTINCT s AS v, s AS lbl FROM und),
    lp1 AS ({_LP_STEP.format(prev="lp0")}),
    lp2 AS ({_LP_STEP.format(prev="lp1")}),
    lp3 AS ({_LP_STEP.format(prev="lp2")})
    SELECT v AS s_suppkey, lbl AS label FROM lp3 ORDER BY v
    """,
    doc="Community detection by SYNCHRONOUS label propagation "
    "(operators/graphs.py:label_propagation) over the supplier "
    "co-occurrence graph (same 1-in-401 order sample as "
    "graph_connected_components): 3 fixed rounds, each vertex adopts "
    "its neighbors' most frequent previous-round label with ties to "
    "the SMALLEST label — a deterministic, integer-only iteration "
    "(per round: one edge join + (v,label) count + per-v argmax via "
    "a (count,-label) struct max, localCheckpointed).  The oracle "
    "unrolls the identical three rounds as CTEs with a "
    "ROW_NUMBER-QUALIFY argmax.  Only edge-incident vertices are "
    "labeled (both engines derive vertices from the edge set).",
    tags=("graph",),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.graphs import (
        label_propagation,
    )

    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 401 == 0)
        .select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a = pairs.alias("__a")
    b = pairs.alias("__b")
    edges = a.join(
        b,
        (F.col("__a.o") == F.col("__b.o"))
        & (F.col("__a.s") < F.col("__b.s")),
    ).select(F.col("__a.s").alias("src"), F.col("__b.s").alias("dst"))
    out = label_propagation(edges, rounds=3)
    return out.select(
        F.col("v").alias("s_suppkey"), "label"
    ).orderBy("s_suppkey")
