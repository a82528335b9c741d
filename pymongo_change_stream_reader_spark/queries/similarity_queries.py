"""Similarity-search queries over the embeddings table: exact cosine
top-k (oracle-checked) and the LSH-bucketed approximate path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id,
               c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qv, c.embedding::DOUBLE[]), 6) AS score
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    doc="Exact brute-force cosine top-10 for 5 query vectors "
    "(broadcast queries, one narrow corpus pass, per-query top-k).",
    tags=("similarity",),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=10)


@query(
    "ann_lsh_bucketed",
    oracle=None,  # approximate (bucket pruning); recall vs exact in pytest
    doc="Random-hyperplane LSH-bucketed ANN top-10 — the IVF-style "
    "scale path: bucket assignment is a projection, search touches "
    "only same-bucket candidates.",
    tags=("similarity", "approx"),
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_bucketed_topk(emb, queries, k=10, num_planes=4)


@query(
    "ann_ivf_coarse",
    oracle=None,  # approximate (cell pruning); recall vs exact in pytest
    doc="IVF coarse-quantized ANN top-10: corpus bucketed into "
    "inverted-file cells by nearest centroid, queries probe the 4 "
    "nearest of 16 cells — the data-adaptive counterpart to the LSH "
    "bucket path.",
    tags=("similarity", "approx"),
)
def ann_ivf_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=10, nlist=16, nprobe=4)


@query(
    "embedding_cosine_blas",
    oracle=None,  # numpy pairwise summation may differ in the last ulp
    doc="All-pairs cosine >= 0.3 via Arrow + NumPy block GEMM "
    "(mapInPandas) — the compute-optimal scale path; verified equal "
    "to the exact HOF form in pytest.",
    tags=("similarity", "pandas-udf"),
)
def embedding_cosine_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.similarity import (
        cosine_pairs_blas,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blas(emb, 0.3)


@query(
    "embedding_int8_quantize",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127
                   AS scale
        FROM e
    ),
    q AS (
        SELECT vec_id, v, scale,
               list_transform(v, x -> round(x / scale)) AS qv
        FROM s
    )
    SELECT vec_id,
           CAST(list_max(list_transform(qv, x -> abs(x))) AS INT) AS q_peak,
           ROUND(list_sum(list_transform(range(1, len(v) + 1),
                 i -> pow(v[i] - qv[i] * scale, 2))) / len(v), 10) AS mse
    FROM q ORDER BY vec_id
    """,
    doc="INT8 scalar quantization of embeddings (per-vector absmax "
    "scale): peak quantized magnitude and reconstruction MSE — the "
    "4x-compression storage path for 100 TB embedding stores; "
    "element order is identical on both engines so the float sums "
    "compare bit-for-bit.",
    tags=("similarity", "corpus"),
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one narrow projection — no shuffle, no UDF; at 100 TB
    this runs as the storage-rewrite pass with qv written out as
    array<tinyint> + one float scale per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    dv = F.col("embedding").cast("array<double>")
    d = emb.select(F.col("vec_id"), dv.alias("v")).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))),
            F.lit(1e-12),
        )
        / 127,
    )
    qv = F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")))
    d = d.withColumn("qv", qv)
    err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("qv"),
            lambda v, q: F.pow(v - q * F.col("scale"), F.lit(2.0)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "vec_id",
        F.array_max(F.transform(F.col("qv"), lambda x: F.abs(x)))
        .cast("int")
        .alias("q_peak"),
        F.round(err / F.size("v"), 10).alias("mse"),
    ).orderBy("vec_id")


@query(
    "ann_ivf_index",
    oracle=None,  # approximate (cell pruning); equality to in-memory IVF + explain-verified pruning in pytest
    doc="IVF ANN against a STORED cell-partitioned index: corpus "
    "written once partitioned by cell, the query batch's probed cells "
    "become a static partition predicate (PartitionFilters prunes "
    "non-probed directories) — the repeat-query-batch serving path; "
    "results identical to the in-memory IVF with the same training.",
    tags=("similarity", "approx"),
)
def ann_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pymongo_change_stream_reader_spark.operators.similarity import (
        ivf_topk_from_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    safe = sf_dir.strip("/").replace("/", "_")
    path = f"{tempfile.gettempdir()}/spark_ivf_index_{safe}"
    write_ivf_index(emb, path, nlist=16, train_iters=2)
    return ivf_topk_from_index(spark, path, queries, k=10, nprobe=4)


@query(
    "ann_ivf_churned",
    oracle=None,  # approximate family; frozen-rebuild equality after churn is pytest-pinned (tests/test_ann_update.py)
    doc="IVF ANN served from an index that has CHURNED: one atomic "
    "upsert_ivf_index batch DELETES every vec_id%5==3 vector "
    "(tombstones its live generation) and UPDATES every remaining "
    "%7==0 vector in place (tombstone + next-generation re-assign), "
    "under ONE crash journal — the reference's "
    "insert/update/replace/delete loop (change_handler.py:11,43-48) "
    "applied to the ANN serving index.  Results equal a "
    "frozen-quantizer rebuild over the live vectors; a deleted "
    "neighbor appearing in the top-k is a bug this query surfaces "
    "driver-side.",
    tags=("similarity", "approx", "incremental"),
)
def ann_ivf_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: churn cost is batch-sized (an (id, gen)-column scan +
    tombstone append + next-generation cell append); the serving scan
    keeps its PartitionFilters cell pruning — the tombstone anti-join
    broadcasts and the cell predicate pushes below it (plan-pinned in
    tests/test_ann_update.py)."""
    import os
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.similarity import (
        ivf_topk_from_index,
        upsert_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="spark_ivf_churn_") + "/idx"
    try:
        write_ivf_index(emb, path, nlist=16, train_iters=1)
        updated = emb.filter(
            (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 5 != 3)
        ).withColumn(
            "embedding", F.transform(F.col("embedding"), lambda x: -x)
        )
        upsert_ivf_index(
            updated,
            path,
            delete_ids=emb.filter(F.col("vec_id") % 5 == 3).select("vec_id"),
        )
        q = emb.filter(F.col("vec_id") < 5)
        return ivf_topk_from_index(
            spark, path, q, k=10, nprobe=4
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@query(
    "ann_pq_adc",
    oracle=None,  # approximate (quantized scores); recall vs exact in pytest
    doc="Product-quantization ANN top-10 with asymmetric-distance "
    "scoring and exact re-rank: the corpus is scanned as m_sub "
    "uint-codes per vector (16-32x smaller than the float "
    "embeddings), each query's ADC lookup table rides as one SQL "
    "literal, and only the k*rerank shortlist touches raw vectors — "
    "the compressed-index retrieval pipeline for 100 TB embedding "
    "stores.  Recall vs brute force asserted in tests/"
    "test_dedup_similarity.py.",
    tags=("similarity", "approx"),
)
def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.similarity import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    # iters=1: each Lloyd iteration re-codegens the codebook-literal
    # assignment expression (~2 s), and on this corpus one iteration
    # already reaches the recall plateau; the stored-index path
    # (write_pq_index) is where training cost amortizes anyway.
    return pq_topk(emb, queries, k=10, m_sub=8, k_codes=16, iters=1, rerank=8)


@query(
    "ann_lsh_multiprobe",
    oracle=None,  # approximate (bucket pruning); recall vs exact in pytest
    doc="Multi-probe LSH ANN top-10: each query also probes every "
    "Hamming-distance-1 bucket (one sign bit flipped), the standard "
    "recall lever that fans out only the broadcast query side — "
    "corpus scan cost and join shape are unchanged from "
    "ann_lsh_bucketed.  Dominance over single-bucket recall asserted "
    "in tests/test_dedup_similarity.py.",
    tags=("similarity", "approx"),
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.similarity import (
        lsh_multiprobe_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return lsh_multiprobe_topk(emb, queries, k=10, num_planes=4)


@query(
    "dedup_pq_code_blocking",
    oracle=None,  # blocking key comes from the trained quantizer
    doc="Embedding near-dup pairs by PQ-code blocking: identical "
    "m_sub-code arrays form candidate blocks (the data-adaptive "
    "analog of SimHash bands; exact copies always collide since "
    "encoding is deterministic) and only within-block pairs are "
    "verified with exact cosine.  Every 50th vector is planted as a "
    "copy (id + 2000000) so the check is non-vacuous on the organic "
    "corpus, mirroring dedup_exact_hash; planted-copy completeness "
    "and threshold precision pytest-asserted in "
    "tests/test_dedup_similarity.py.",
    tags=("similarity", "dedup", "approx"),
)
def dedup_pq_code_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.similarity import (
        pq_code_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 2000000).alias("vec_id"), "embedding", "label"
    )
    return pq_code_dedup_pairs(
        emb.unionByName(copies), threshold=0.9
    ).orderBy("id_a", "id_b")


@query(
    "ann_knn_classify",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 25),
    scored AS (
        SELECT q.query_id,
               c.vec_id AS neighbor_id,
               c.label,
               ROUND(list_cosine_similarity(q.qv, c.embedding::DOUBLE[]), 6) AS score
        FROM q JOIN embeddings c ON c.vec_id <> q.query_id
    ), ranked AS (
        SELECT query_id, label, score,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS rank
        FROM scored
    ), votes AS (
        SELECT query_id, label, COUNT(*) AS n
        FROM ranked WHERE rank <= 10 GROUP BY query_id, label
    ), best AS (
        SELECT query_id, label, n,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY n DESC, label) AS r
        FROM votes
    )
    SELECT b.query_id,
           CAST(b.label AS INT)   AS predicted,
           CAST(b.n AS BIGINT)    AS votes,
           CAST(q.true_label AS INT) AS true_label
    FROM best b JOIN q ON q.query_id = b.query_id
    WHERE b.r = 1
    ORDER BY b.query_id
    """,
    doc="kNN majority-vote classification over the embedding corpus: "
    "exact cosine top-10 neighbors per query vector, label vote with "
    "deterministic tie-break (highest count, then lowest label) — the "
    "retrieval-as-classifier pattern (quality tagging / weak labeling "
    "by nearest labeled examples) running on the same broadcast-query "
    "+ one-corpus-pass plan as ann_cosine_topk.",
    tags=("similarity",),
)
def ann_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 25)
    topk = brute_force_topk(emb, queries, k=10)
    votes = (
        topk.join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nbr_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("nbr_label")
    )
    best = votes.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") == 1
    )
    truth = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        best.join(truth, "query_id")
        .select(
            "query_id",
            F.col("nbr_label").cast("int").alias("predicted"),
            F.col("votes").cast("bigint").alias("votes"),
            F.col("true_label").cast("int").alias("true_label"),
        )
        .orderBy("query_id")
    )


# Johnson-Lindenstrauss sign matrix (Achlioptas 2003 database-friendly
# variant: entries ±1): sign(i, j) = parity of md5("i_j") — generated
# once here and embedded as literals in BOTH the Spark expression and
# the oracle SQL, so the two engines share bit-identical constants.
# The embedding quantizes to integer millis first, making every dot
# product a sum of int64 terms — exact in any summation order (and
# exactly representable in DuckDB's double arithmetic), so the sketch
# is hash-comparable with no float-order caveat.
_JL_IN_DIM = 64
_JL_OUT_DIM = 8


def _jl_signs() -> list[list[int]]:
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16) % 2
            else -1
            for i in range(_JL_IN_DIM)
        ]
        for j in range(_JL_OUT_DIM)
    ]


def _jl_oracle() -> str:
    cols = ",\n           ".join(
        f"CAST(list_sum(list_transform(range(1, {_JL_IN_DIM + 1}), "
        f"i -> (ARRAY{signs}::BIGINT[])[i] * m[i])) AS BIGINT) AS p{j}"
        for j, signs in enumerate(_jl_signs())
    )
    return f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000, 0) AS BIGINT)) AS m
        FROM embeddings WHERE vec_id < 50
    )
    SELECT vec_id, {cols}
    FROM q ORDER BY vec_id
    """


@query(
    "embedding_random_projection",
    oracle=_jl_oracle(),
    doc="Johnson-Lindenstrauss random projection (Achlioptas ±1 "
    "variant): 64-dim embeddings sketch down to 8 signed-sum "
    "components over a deterministic hash-derived sign matrix — the "
    "cheap-distance preprocessing for billion-vector ANN (project "
    "once, shortlist in the sketch space, verify in the original).  "
    "Integer-milli quantization makes the sketch order-independent "
    "and exactly hash-comparable cross-engine.",
    tags=("similarity",),
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    milli = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000, 0).cast("long"),
    )
    out = emb.select(F.col("vec_id"), milli.alias("m"))
    for j, signs in enumerate(_jl_signs()):
        sign_arr = F.array(*[F.lit(s).cast("long") for s in signs])
        out = out.withColumn(
            f"p{j}",
            F.aggregate(
                F.zip_with(F.col("m"), sign_arr, lambda x, s: x * s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
    return out.drop("m").orderBy("vec_id")


@query(
    "ann_pq_index",
    oracle=None,  # approximate family; roundtrip-equal to in-memory PQ in pytest
    doc="PQ ANN against the STORED compressed index "
    "(write_pq_index/pq_topk_from_index): codebooks trained once and "
    "persisted beside the code-only parquet; query time scans the "
    "16-32x-compressed codes with the ADC table as one literal and "
    "touches raw vectors only for the shortlist re-rank — the "
    "ingest-once serving path that amortizes away the Lloyd-training "
    "cost dominating ann_pq_adc's in-query timing (PERF.md).",
    tags=("similarity", "approx"),
)
def ann_pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from pymongo_change_stream_reader_spark.operators.similarity import (
        pq_topk_from_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    safe = sf_dir.strip("/").replace("/", "_")
    path = f"{tempfile.gettempdir()}/spark_pq_index_{safe}"
    if not os.path.exists(os.path.join(path, "_codebooks.json")):
        write_pq_index(emb, path, m_sub=8, k_codes=16, iters=1)
    return pq_topk_from_index(spark, path, queries, emb, k=10, rerank=8)


@query(
    "ann_pq_churned",
    oracle=None,  # approximate family; frozen-codebook rebuild equality after churn is pytest-pinned (tests/test_ann_relay.py)
    doc="PQ ANN served from a code table that has CHURNED: one atomic "
    "upsert_pq_index batch DELETES every vec_id%5==3 vector and "
    "UPDATES every remaining %7==0 vector in place (frozen-codebook "
    "re-encode under the next generation), all under ONE crash "
    "journal — ann_ivf_churned's sibling on the compressed serving "
    "path.  A deleted neighbor in the top-k or a stale code surviving "
    "the update surfaces driver-side.",
    tags=("similarity", "approx", "incremental"),
)
def ann_pq_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: churn cost is batch-sized (an (id, gen)-column scan +
    tombstone append + re-encoded code append); the serving scan stays
    the 16-32x-compressed code table with one broadcast tombstone
    anti-join."""
    import os
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.operators.similarity import (
        pq_topk_from_index,
        upsert_pq_index,
        write_pq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="spark_pq_churn_") + "/idx"
    try:
        write_pq_index(emb, path, m_sub=8, k_codes=16, iters=1)
        updated = emb.filter(
            (F.col("vec_id") % 7 == 0) & (F.col("vec_id") % 5 != 3)
        ).withColumn(
            "embedding", F.transform(F.col("embedding"), lambda x: -x)
        )
        live = emb.filter(F.col("vec_id") % 5 != 3).withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 7 == 0,
                F.transform(F.col("embedding"), lambda x: -x),
            ).otherwise(F.col("embedding")),
        )
        upsert_pq_index(
            updated,
            path,
            delete_ids=emb.filter(F.col("vec_id") % 5 == 3).select("vec_id"),
        )
        q = emb.filter(F.col("vec_id") < 5)
        return pq_topk_from_index(
            spark, path, q, live, k=10, rerank=8
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


@query(
    "similarity_recall_report",
    oracle=None,  # recall of approximate methods — not SQL-expressible
    doc="Recall@10 of every approximate ANN family vs brute_force_topk "
    "on the same 5 query vectors: (method, k, hits, truth_pairs, "
    "recall) — the four in-memory families PLUS the stored-index "
    "serving paths (IVF / PQ / composed IVF-PQ from persisted "
    "indexes) PLUS a retrain_ann_index round-trip row (r6 ask #3: "
    "copy the IVF index, retrain on its live rows, serve — the "
    "deterministic trainer makes it equal ivf_from_index, so any "
    "swap/model/gen regression in the retrain path surfaces here), "
    "so a regression in either the algorithms or the index "
    "read/write roundtrip surfaces in CORRECTNESS/bench, not "
    "only in tests (r3 verdict ask #6, completed per r5 #5); the "
    "per-method floors stay pytest-asserted in "
    "tests/test_dedup_similarity.py::test_similarity_recall_report_floors; "
    "drift-restoration floors in tests/test_ann_retrain.py.",
    tags=("similarity", "approx"),
)
def similarity_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: each method is the same distributed plan it has as a
    standalone query; the report adds one broadcast-sized join per
    method (truth is n_queries x k rows) and a 7-row driver result.
    The stored-index rows reuse the same persisted-index paths as
    their standalone queries (built once per sf_dir)."""
    import os
    import tempfile

    from pymongo_change_stream_reader_spark.operators.similarity import (
        ivf_topk_from_index,
        ivfpq_topk_from_index,
        lsh_multiprobe_topk,
        pq_topk,
        pq_topk_from_index,
        write_ivf_index,
        write_ivfpq_index,
        write_pq_index,
    )

    k = 10
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = (
        brute_force_topk(emb, queries, k=k)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)  # probed once per method
    )
    n_truth = truth.count()
    safe = sf_dir.strip("/").replace("/", "_")
    tmp = tempfile.gettempdir()
    ivf_path = f"{tmp}/spark_ivf_index_{safe}"
    pq_path = f"{tmp}/spark_pq_index_{safe}"
    ivfpq_path = f"{tmp}/spark_ivfpq_index_{safe}"
    # same paths + params as ann_ivf_index / ann_pq_index, so the
    # report piggybacks on an index those queries already built
    if not os.path.exists(os.path.join(ivf_path, "_centroids.json")):
        write_ivf_index(emb, ivf_path, nlist=16, train_iters=2)
    if not os.path.exists(os.path.join(pq_path, "_codebooks.json")):
        write_pq_index(emb, pq_path, m_sub=8, k_codes=16, iters=1)
    if not os.path.exists(os.path.join(ivfpq_path, "_model.json")):
        write_ivfpq_index(
            emb, ivfpq_path, nlist=16, m_sub=8, k_codes=16, iters=1
        )
    # the retrain round-trip row: a COPY of the IVF index retrained on
    # its own live rows — the deterministic trainer reproduces the
    # model, so this row equals ivf_from_index unless the retrain's
    # swap/gen/model plumbing regresses
    ivf_rt_path = f"{tmp}/spark_ivf_retrain_{safe}"
    if not os.path.exists(os.path.join(ivf_rt_path, "_centroids.json")):
        import shutil

        from pymongo_change_stream_reader_spark.operators.similarity import (
            retrain_ann_index,
        )

        for leftover in (ivf_rt_path, ivf_rt_path + ".old",
                         ivf_rt_path + ".compact-tmp"):
            shutil.rmtree(leftover, ignore_errors=True)
        shutil.copytree(ivf_path, ivf_rt_path)
        retrain_ann_index(spark, ivf_rt_path, kind="ivf")
    methods = {
        "lsh_bucketed": lsh_bucketed_topk(emb, queries, k=k, num_planes=4),
        "lsh_multiprobe": lsh_multiprobe_topk(
            emb, queries, k=k, num_planes=4
        ),
        "ivf_nlist16_nprobe4": ivf_topk(emb, queries, k=k, nlist=16, nprobe=4),
        "pq_m8_k16_rerank8": pq_topk(
            emb, queries, k=k, m_sub=8, k_codes=16, iters=1, rerank=8
        ),
        "ivf_from_index": ivf_topk_from_index(
            spark, ivf_path, queries, k=k, nprobe=4
        ),
        "ivf_from_index_retrained": ivf_topk_from_index(
            spark, ivf_rt_path, queries, k=k, nprobe=4
        ),
        "pq_from_index": pq_topk_from_index(
            spark, pq_path, queries, emb, k=k, rerank=8
        ),
        "ivfpq_from_index": ivfpq_topk_from_index(
            spark, ivfpq_path, queries, emb, k=k, nprobe=4, rerank=8
        ),
    }
    rows = []
    for name, df in methods.items():
        hits = (
            df.select("query_id", "neighbor_id")
            .join(F.broadcast(truth), ["query_id", "neighbor_id"])
            .count()
        )
        rows.append((name, k, hits, n_truth, round(hits / n_truth, 4)))
    return spark.createDataFrame(
        sorted(rows),
        "method STRING, k INT, hits LONG, truth_pairs LONG, recall DOUBLE",
    )


@query(
    "ann_sq8_topk",
    oracle="""
    WITH dims AS (
        SELECT i,
               MIN(embedding[i]::DOUBLE) AS lo,
               MAX(embedding[i]::DOUBLE) AS hi
        FROM embeddings, range(1, 65) t(i)
        GROUP BY i
    ),
    bounds AS (
        SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi
        FROM dims
    ),
    decoded AS (
        SELECT vec_id,
               list_transform(range(1, 65), i ->
                   lo[i] + (CASE WHEN hi[i] = lo[i] THEN 0
                                 ELSE LEAST(255, GREATEST(0,
                                     FLOOR((embedding[i]::DOUBLE - lo[i])
                                           / (hi[i] - lo[i]) * 256)))
                            END + 0.5) * (hi[i] - lo[i]) / 256
               ) AS dv
        FROM embeddings, bounds
    ),
    q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
          FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id,
               c.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(q.qv, c.dv), 6) AS score
        FROM q JOIN decoded c ON c.vec_id <> q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, score,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, neighbor_id) AS INT) AS rank
        FROM scored
    )
    SELECT * FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank
    """,
    doc="SQ8 scalar-quantized ANN (FAISS QT_8bit scheme): per-dim "
    "min/max training, uint8 encode, midpoint decode, asymmetric "
    "cosine of raw queries vs reconstructions — a 4x-compressed "
    "index whose whole pipeline is DETERMINISTIC, so unlike the "
    "LSH/IVF/PQ paths it carries an exact value oracle (the DuckDB "
    "side quantizes with the identical IEEE expression) instead of "
    "a recall bound.  operators/similarity.py:sq8_topk.",
    tags=("similarity",),
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.similarity import (
        sq8_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    return sq8_topk(emb, queries, k=10)
