"""Property-based tests (hypothesis) for the incremental aggregate
view: for ANY event sequence and ANY batch split, the maintained view
must equal a brute-force recompute over the last-writer-wins final
state.  Hand-written cases (test_agg_view.py) cover the known
orderings; hypothesis searches duplicate triples, reordered deltas,
group flapping, and delete/re-insert races."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

from pymongo_change_stream_reader_spark.schema import CHANGE_EVENT_SCHEMA
from pymongo_change_stream_reader_spark.streaming.agg_view import (
    agg_view_batch,
    read_agg_view,
)

# an event: (key 0..3, op, value 0..9, group a/b, t 1..6, i 1..4)
_EVENT = st.tuples(
    st.integers(0, 3),
    st.sampled_from(["insert", "update", "replace", "delete"]),
    st.integers(0, 9),
    st.sampled_from(["a", "b"]),
    st.integers(1, 6),
    st.integers(1, 4),
)


def _expected(events):
    """Brute-force LWW recompute: per key, the event with the max
    (t, i, d) triple decides the contribution."""
    best = {}
    for n, (key, op, v, g, t, i) in enumerate(events):
        trip = (t, i, f"d{n:03d}")
        if key not in best or trip >= best[key][0]:
            best[key] = (trip, op, v, g)
    groups = defaultdict(lambda: [0, 0])
    for _, op, v, g in best.values():
        if op != "delete":
            groups[g][0] += 1
            groups[g][1] += v
    return {g: tuple(c) for g, c in groups.items() if c[0] > 0}


def _frames(spark, events, cut):
    def rows(chunk, base):
        return [
            (
                (f"d{base + j:03d}",),
                op,
                (t, i),
                None,
                ("db", "c"),
                f"k{key}",
                None if op == "delete" else f'{{"v": {v}, "g": "{g}"}}',
                None,
                None,
            )
            for j, (key, op, v, g, t, i) in enumerate(chunk)
        ]

    a, b = events[:cut], events[cut:]
    return (
        spark.createDataFrame(rows(a, 0), CHANGE_EVENT_SCHEMA),
        spark.createDataFrame(rows(b, len(a)), CHANGE_EVENT_SCHEMA),
    )


@given(
    events=st.lists(_EVENT, min_size=1, max_size=10),
    cut=st.integers(0, 10),
)
@settings(max_examples=12, deadline=None)
def test_two_batch_view_equals_lww_recompute(spark, tmp_path_factory, events, cut):
    cut = min(cut, len(events))
    path = str(tmp_path_factory.mktemp("view") / "v")
    b0, b1 = _frames(spark, events, cut)
    if cut > 0:
        agg_view_batch(b0, path, 0, value_type="long", n_buckets=2)
    if len(events) - cut > 0:
        agg_view_batch(b1, path, 1, value_type="long", n_buckets=2)
    view = read_agg_view(spark, path)
    got = (
        {}
        if view is None
        else {
            r["grp"]: (r["n_docs"], r["sum_val"]) for r in view.collect()
        }
    )
    want = {
        g: (n, s) for g, (n, s) in _expected(events).items()
    }
    assert got == want, (events, cut)
