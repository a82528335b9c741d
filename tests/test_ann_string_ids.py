"""String-keyed ANN serving indexes (round-7 verdict finding #2):
``ivf_topk_from_index`` hardcoded ``query_id LONG`` in the rebuilt
probe frame and ``_pq_adc_search`` emitted ``{id}L`` SQL literals, so
an index whose vec_ids are STRINGS ingested fine but could not be
queried with ids of its own type (``PySparkTypeError`` /
``ValueError``).  These tests pin: every stored-index serving path
(IVF, PQ, IVF-PQ) serves a string-keyed index identically to its
long-keyed twin, and a type MISMATCH between the query batch and the
index is refused loudly instead of silently implicit-cast."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.similarity import (
    ivf_topk_from_index,
    ivfpq_topk_from_index,
    pq_encode,
    pq_topk_from_index,
    write_ivf_index,
    write_ivfpq_index,
    write_pq_index,
)
from pymongo_change_stream_reader_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


@pytest.fixture(scope="module")
def semb(emb):
    # zero-padded so lexicographic order == numeric order: the
    # row_number tie-break (score desc, neighbor_id asc) then ranks
    # identically in both keyspaces and results compare 1:1
    return emb.select(
        F.format_string("doc-%04d", "vec_id").alias("vec_id"), "embedding"
    ).cache()


def _sid(n: int) -> str:
    return f"doc-{n:04d}"


def _rows(df, with_rank=False):
    cols = ["query_id", "neighbor_id", "score"] + (
        ["rank"] if with_rank else []
    )
    return sorted(map(tuple, df.select(*cols).collect()))


def _mapped(rows):
    return sorted((_sid(r[0]), _sid(r[1])) + tuple(r[2:]) for r in rows)


def test_ivf_string_keyed_index_serves(spark, tmp_path, emb, semb):
    lpath, spath = str(tmp_path / "l"), str(tmp_path / "s")
    cents = write_ivf_index(emb, lpath, nlist=8, train_iters=1)
    write_ivf_index(semb, spath, centroids=cents)
    ql = emb.filter(F.col("vec_id") < 3)
    qs = semb.filter(F.col("vec_id") < _sid(3))
    got = _rows(
        ivf_topk_from_index(spark, spath, qs, k=5, nprobe=4), with_rank=True
    )
    want = _mapped(
        _rows(
            ivf_topk_from_index(spark, lpath, ql, k=5, nprobe=4),
            with_rank=True,
        )
    )
    assert got == want and len(got) == 15


def test_pq_string_keyed_index_serves(spark, tmp_path, emb, semb):
    lpath, spath = str(tmp_path / "l"), str(tmp_path / "s")
    write_pq_index(emb, lpath, m_sub=8, k_codes=16, iters=1)
    # string twin re-encoded with the SAME codebooks
    books = json.load(open(os.path.join(lpath, "_codebooks.json")))
    pq_encode(semb, books).withColumn("gen", F.lit(0)).write.parquet(spath)
    shutil.copyfile(
        os.path.join(lpath, "_codebooks.json"),
        os.path.join(spath, "_codebooks.json"),
    )
    ql = emb.filter(F.col("vec_id") < 3)
    qs = semb.filter(F.col("vec_id") < _sid(3))
    got = _rows(pq_topk_from_index(spark, spath, qs, semb, k=5, rerank=4))
    want = _mapped(
        _rows(pq_topk_from_index(spark, lpath, ql, emb, k=5, rerank=4))
    )
    assert got == want and len(got) == 15


def test_ivfpq_string_keyed_index_serves(spark, tmp_path, emb, semb):
    lpath, spath = str(tmp_path / "l"), str(tmp_path / "s")
    model = write_ivfpq_index(emb, lpath, nlist=8, m_sub=8, k_codes=16)
    write_ivfpq_index(semb, spath, model=model)
    ql = emb.filter(F.col("vec_id") < 3)
    qs = semb.filter(F.col("vec_id") < _sid(3))
    got = _rows(
        ivfpq_topk_from_index(spark, spath, qs, semb, k=5, nprobe=4, rerank=4)
    )
    want = _mapped(
        _rows(
            ivfpq_topk_from_index(
                spark, lpath, ql, emb, k=5, nprobe=4, rerank=4
            )
        )
    )
    assert got == want and len(got) == 15


def test_id_type_mismatch_refused_on_all_three_paths(
    spark, tmp_path, emb, semb
):
    """LONG queries against a STRING-keyed index (and the reverse)
    must raise BEFORE any probe work — the implicit cast in the
    self-exclusion filter would otherwise silently misserve."""
    ivf_s = str(tmp_path / "ivf_s")
    cents = write_ivf_index(semb, ivf_s, nlist=4, train_iters=1)
    pq_l = str(tmp_path / "pq_l")
    write_pq_index(emb, pq_l, m_sub=8, k_codes=16, iters=1)
    ivfpq_s = str(tmp_path / "ivfpq_s")
    write_ivfpq_index(semb, ivfpq_s, nlist=4, m_sub=8, k_codes=16)

    ql = emb.filter(F.col("vec_id") < 2)
    qs = semb.filter(F.col("vec_id") < _sid(2))
    with pytest.raises(TypeError, match="stores string"):
        ivf_topk_from_index(spark, ivf_s, ql, k=3)
    with pytest.raises(TypeError, match="stores bigint"):
        pq_topk_from_index(spark, pq_l, qs, semb, k=3)
    with pytest.raises(TypeError, match="stores string"):
        ivfpq_topk_from_index(spark, ivfpq_s, ql, emb, k=3)


def test_rerank_corpus_id_type_mismatch_refused(
    spark, tmp_path, emb, semb
):
    """r8 ADVICE low: correctly-typed QUERIES but a mistyped rerank
    CORPUS — the shortlist join would implicit-cast and rerank against
    an empty/miscast match set.  Both rerank-enabled paths refuse
    loudly; rerank=0 never touches the corpus and still serves."""
    pq_s = str(tmp_path / "pq_s")
    write_pq_index(semb, pq_s, m_sub=8, k_codes=16, iters=1)
    ivfpq_s = str(tmp_path / "ivfpq_s")
    write_ivfpq_index(semb, ivfpq_s, nlist=4, m_sub=8, k_codes=16)

    qs = semb.filter(F.col("vec_id") < _sid(2))
    with pytest.raises(TypeError, match="rerank corpus.*stores string"):
        pq_topk_from_index(spark, pq_s, qs, emb, k=3)
    with pytest.raises(TypeError, match="rerank corpus.*stores string"):
        ivfpq_topk_from_index(spark, ivfpq_s, qs, emb, k=3)
    # the mistyped corpus is irrelevant when rerank is off
    assert pq_topk_from_index(spark, pq_s, qs, emb, k=3, rerank=0).count() == 6
    assert (
        ivfpq_topk_from_index(
            spark, ivfpq_s, qs, emb, k=3, nprobe=4, rerank=0
        ).count()
        == 6
    )
