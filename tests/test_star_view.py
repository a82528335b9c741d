"""Star view (streaming/star_view.py): multi-dim delta maintenance —
recompute-set correctness under multi-side batches, per-side fk
moves and index tombstones, LEFT NULL padding vs INNER drops, replay
stability, and definition pinning."""

from __future__ import annotations

import pytest

from pymongo_change_stream_reader_spark.plans.pipeline import PipelineError
from pymongo_change_stream_reader_spark.schema import CHANGE_EVENT_SCHEMA
from pymongo_change_stream_reader_spark.streaming.star_view import (
    DimSide,
    read_star_view,
    star_view_batch,
)

DIMS = [DimSide("a", "$.fka"), DimSide("b", "$.fkb")]


def _ev(data, op, t, i, key, doc=None):
    return ((data,), op, (t, i), None, ("db", "c"), key, doc, None, None)


def _frame(spark, rows):
    return spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)


def _fact(fka, fkb):
    return f'{{"side":"f","fka":"{fka}","fkb":"{fkb}"}}'


def _dim(side, p):
    return f'{{"side":"{side}","p":"{p}"}}'


def _view(spark, path):
    v = read_star_view(spark, path)
    if v is None:
        return {}
    return {
        r["key"]: (r["fk_a"], r["dim_a"], r["fk_b"], r["dim_b"])
        for r in v.collect()
    }


def _seed(spark, path, **kw):
    star_view_batch(
        _frame(
            spark,
            [
                _ev("a1", "insert", 10, 1, "A1", _dim("a", "alpha1")),
                _ev("a2", "insert", 10, 2, "A2", _dim("a", "alpha2")),
                _ev("a3", "insert", 10, 3, "B1", _dim("b", "beta1")),
                _ev("a4", "insert", 10, 4, "f1", _fact("A1", "B1")),
                _ev("a5", "insert", 10, 5, "f2", _fact("A2", "B9")),
            ],
        ),
        path,
        0,
        DIMS,
        n_buckets=4,
        **kw,
    )


def test_left_pads_missing_dims_inner_drops(spark, tmp_path):
    lp = str(tmp_path / "l")
    _seed(spark, lp)
    v = _view(spark, lp)
    assert v["f1"] == ("A1", _dim("a", "alpha1"), "B1", _dim("b", "beta1"))
    assert v["f2"] == ("A2", _dim("a", "alpha2"), "B9", None)

    ip = str(tmp_path / "i")
    _seed(spark, ip, join_type="inner")
    vi = _view(spark, ip)
    assert set(vi) == {"f1"}  # f2's B9 never existed


def test_one_batch_touching_both_sides_recomputes_once(spark, tmp_path):
    path = str(tmp_path / "s")
    _seed(spark, path)
    # BOTH of f1's dims change in ONE batch, plus f2 moves onto them:
    # branch-wise patching would emit conflicting rows; the recompute
    # set must produce one fully-updated row per fact
    star_view_batch(
        _frame(
            spark,
            [
                _ev("b1", "update", 11, 1, "A1", _dim("a", "ALPHA1v2")),
                _ev("b2", "update", 11, 2, "B1", _dim("b", "BETA1v2")),
                _ev("b3", "replace", 11, 3, "f2", _fact("A1", "B1")),
            ],
        ),
        path,
        1,
        DIMS,
        n_buckets=4,
    )
    v = _view(spark, path)
    row = ("A1", _dim("a", "ALPHA1v2"), "B1", _dim("b", "BETA1v2"))
    assert v["f1"] == row
    assert v["f2"] == row


def test_fk_move_tombstones_only_that_side(spark, tmp_path):
    path = str(tmp_path / "s")
    _seed(spark, path)
    star_view_batch(
        _frame(spark, [_ev("b1", "replace", 11, 1, "f2", _fact("A1", "B9"))]),
        path,
        1,
        DIMS,
        n_buckets=4,
    )
    # A2 changes must no longer reach f2 (its a-side index row moved);
    # B-side rows are untouched by the move
    star_view_batch(
        _frame(spark, [_ev("c1", "update", 12, 1, "A2", _dim("a", "X"))]),
        path,
        2,
        DIMS,
        n_buckets=4,
    )
    v = _view(spark, path)
    assert v["f2"] == ("A1", _dim("a", "alpha1"), "B9", None)


def test_dim_delete_left_pads_and_fact_delete_removes(spark, tmp_path):
    path = str(tmp_path / "s")
    _seed(spark, path)
    star_view_batch(
        _frame(
            spark,
            [
                _ev("b1", "delete", 11, 1, "B1"),
                _ev("b2", "delete", 11, 2, "f2"),
            ],
        ),
        path,
        1,
        DIMS,
        n_buckets=4,
    )
    v = _view(spark, path)
    assert set(v) == {"f1"}
    assert v["f1"] == ("A1", _dim("a", "alpha1"), "B1", None)
    # late dim re-arrival fills the NULL back in
    star_view_batch(
        _frame(spark, [_ev("c1", "insert", 12, 1, "B1", _dim("b", "back"))]),
        path,
        2,
        DIMS,
        n_buckets=4,
    )
    assert _view(spark, path)["f1"][3] == _dim("b", "back")


def test_replay_is_stable_and_definition_pinned(spark, tmp_path):
    path = str(tmp_path / "s")
    _seed(spark, path)
    b1 = _frame(
        spark, [_ev("b1", "update", 11, 1, "A1", _dim("a", "v2"))]
    )
    assert star_view_batch(b1, path, 1, DIMS, n_buckets=4) is True
    before = _view(spark, path)
    assert star_view_batch(b1, path, 1, DIMS, n_buckets=4) is False
    assert _view(spark, path) == before
    # a different definition on the same path refuses
    with pytest.raises(PipelineError):
        star_view_batch(
            b1, path, 2, [DimSide("a", "$.fka")], n_buckets=4
        )
    with pytest.raises(PipelineError):
        star_view_batch(
            b1, path, 2, DIMS, n_buckets=4, join_type="inner"
        )


def test_rejects_bad_definitions(spark, tmp_path):
    b = _frame(spark, [_ev("a1", "insert", 10, 1, "A1", _dim("a", "x"))])
    with pytest.raises(PipelineError):
        star_view_batch(b, str(tmp_path / "x1"), 0, [])
    with pytest.raises(PipelineError):
        star_view_batch(
            b, str(tmp_path / "x2"), 0,
            [DimSide("a", "$.x"), DimSide("a", "$.y")],
        )
    with pytest.raises(PipelineError):
        star_view_batch(
            b, str(tmp_path / "x3"), 0, [DimSide("bad-side!", "$.x")]
        )
    with pytest.raises(PipelineError):
        star_view_batch(
            b, str(tmp_path / "x4"), 0, DIMS, join_type="full"
        )


def test_compaction_preserves_view_and_caps_files(spark, tmp_path):
    import glob
    import os

    from pymongo_change_stream_reader_spark.streaming.star_view import (
        compact_star_view,
    )

    path = str(tmp_path / "s")
    _seed(spark, path)
    for e, rows in enumerate(
        [
            [_ev("b1", "update", 11, 1, "A1", _dim("a", "v2"))],
            [_ev("c1", "update", 12, 1, "B1", _dim("b", "w2"))],
            [_ev("d1", "delete", 13, 1, "f2")],
        ],
        start=1,
    ):
        star_view_batch(_frame(spark, rows), path, e, DIMS, n_buckets=4)
    before = _view(spark, path)
    counts = compact_star_view(spark, path, files_per_bucket=1)
    assert set(counts) >= {"facts", "dims_a", "dims_b", "view"}
    assert _view(spark, path) == before  # contents unchanged
    # further batches apply cleanly on the compacted stores
    star_view_batch(
        _frame(spark, [_ev("e1", "update", 14, 1, "A1", _dim("a", "v3"))]),
        path,
        4,
        DIMS,
        n_buckets=4,
    )
    assert _view(spark, path)["f1"][1] == _dim("a", "v3")
    # tombstone purge drops the dead fact rows from the stores
    n_before = counts["facts"]
    counts2 = compact_star_view(
        spark, path, files_per_bucket=1, purge_tombstones=True
    )
    assert counts2["facts"] < n_before
    assert _view(spark, path)["f1"][1] == _dim("a", "v3")
