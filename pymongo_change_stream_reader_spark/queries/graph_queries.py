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
