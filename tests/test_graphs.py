"""PageRank (operators/graphs.py): invariants the oracle cannot see —
mass conservation (including dangling redistribution), retention of
in-degree-0 vertices, early stopping, damping-free uniformity."""

from __future__ import annotations

import pytest

from pymongo_change_stream_reader_spark.operators.graphs import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def _pr_ref(pairs, iters, d=0.85):
    """Pure-Python unrolled power iteration with uniform dangling
    redistribution — the same arithmetic the operator claims."""
    edges = sorted(set(pairs))
    verts = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(verts)
    out: dict[str, list[str]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    r = {v: 1.0 / n for v in verts}
    base = (1.0 - d) / n
    for _ in range(iters):
        dshare = sum(r[v] for v in verts if v not in out) / n
        inc = {v: 0.0 for v in verts}
        for u, vs in out.items():
            for v in vs:
                inc[v] += r[u] / len(vs)
        r = {v: base + d * (inc[v] + dshare) for v in verts}
    return r


def test_rank_mass_conserved(spark):
    # bidirected triangle + pendant: total rank stays 1 every round
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    for iters in (1, 3, 7):
        ranks = pagerank(_edges(spark, pairs), iters=iters).collect()
        assert abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-9
        assert len(ranks) == 4


def test_hub_outranks_pendant(spark):
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    r = {x["v"]: x["rank"] for x in
         pagerank(_edges(spark, pairs), iters=5).collect()}
    # c has degree 3 (a, b, d), d has degree 1 — c must dominate
    assert r["c"] > r["a"] > r["d"]
    assert r["c"] > r["b"] > r["d"]


def test_indegree_zero_vertex_retained(spark):
    # x points into the a<->b pair but nothing points at x: it must
    # keep its row and its teleport share every round (an inner
    # rebuild of the rank table would drop it after round 1 AND lose
    # the mass it donates in later rounds)
    pairs = [("a", "b"), ("b", "a"), ("x", "a")]
    for iters in (1, 4):
        got = {r["v"]: r["rank"] for r in
               pagerank(_edges(spark, pairs), iters=iters).collect()}
        want = _pr_ref(pairs, iters)
        assert set(got) == {"a", "b", "x"}
        assert abs(sum(got.values()) - 1.0) < 1e-9
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
        # no incoming edges: exactly the teleport term
        assert got["x"] == pytest.approx((1 - 0.85) / 3, abs=1e-12)


def test_dangling_mass_redistributed(spark):
    # b is a pure sink: its rank is donated uniformly each round, so
    # total mass stays 1 and the ranks match the unrolled reference
    pairs = [("a", "b")]
    for iters in (1, 3):
        got = {r["v"]: r["rank"] for r in
               pagerank(_edges(spark, pairs), iters=iters).collect()}
        want = _pr_ref(pairs, iters)
        assert abs(sum(got.values()) - 1.0) < 1e-9
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # sanity: the sink accumulates more than the source
    assert got["b"] > got["a"]


def test_dangling_chain_matches_reference(spark):
    pairs = [("a", "b"), ("b", "c"), ("a", "c")]  # c dangles
    got = {r["v"]: r["rank"] for r in
           pagerank(_edges(spark, pairs), iters=4).collect()}
    want = _pr_ref(pairs, 4)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_convergence_early_stop(spark):
    # two vertices exchanging all mass: uniform is the fixed point, so
    # round 1 already moves nothing and tol stops the loop there
    stats: dict = {}
    r = {x["v"]: x["rank"] for x in
         pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=50,
                  tol=1e-9, stats=stats).collect()}
    assert stats["rounds"] == 1
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    # a slow fixture keeps iterating until the delta crosses tol
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
             ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")]
    stats2: dict = {}
    pagerank(_edges(spark, pairs), iters=50, tol=1e-6,
             stats=stats2).collect()
    assert 1 < stats2["rounds"] < 50


def test_symmetric_pair_is_uniform(spark):
    # two vertices exchanging all mass: uniform is the fixed point
    r = {x["v"]: x["rank"] for x in
         pagerank(_edges(spark, [("a", "b"), ("b", "a")]), iters=4)
         .collect()}
    assert r["a"] == pytest.approx(0.5, abs=1e-12)
    assert r["b"] == pytest.approx(0.5, abs=1e-12)


def test_triangle_count_known_graphs(spark):
    from itertools import combinations

    from pymongo_change_stream_reader_spark.operators.graphs import (
        triangle_count,
    )

    def count(pairs):
        return triangle_count(_edges(spark, pairs)).first()["n_triangles"]

    # K4: C(4,3) = 4 triangles; direction/duplicate/self-loop noise
    # must normalize away
    k4 = [(a, b) for a, b in combinations("abcd", 2)]
    noisy = k4 + [(b, a) for a, b in k4] + [("a", "a"), ("b", "b")]
    assert count(noisy) == 4
    # 5-cycle: no triangles
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "a")]
    assert count(cyc) == 0
    # hub star + one rim edge: exactly the hub triangle
    star = [("h", x) for x in "pqrstuv"] + [("p", "q")]
    assert count(star) == 1
    # two disjoint triangles sharing nothing
    two = [("a", "b"), ("b", "c"), ("c", "a"),
           ("x", "y"), ("y", "z"), ("z", "x")]
    assert count(two) == 2


def test_triangle_count_matches_bruteforce_random(spark):
    import random
    from itertools import combinations

    from pymongo_change_stream_reader_spark.operators.graphs import (
        triangle_count,
    )

    rng = random.Random(13)
    verts = [f"v{i}" for i in range(18)]
    pairs = [e for e in combinations(verts, 2) if rng.random() < 0.3]
    adj = set(pairs) | {(b, a) for a, b in pairs}
    brute = sum(
        1
        for t in combinations(verts, 3)
        if (t[0], t[1]) in adj and (t[1], t[2]) in adj and (t[0], t[2]) in adj
    )
    got = triangle_count(_edges(spark, pairs)).first()["n_triangles"]
    assert got == brute


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------
def test_kcore_peels_to_the_unique_fixpoint(spark):
    from pymongo_change_stream_reader_spark.operators.graphs import k_core

    # a 4-clique {1,2,3,4} with a pendant chain 4-5-6: the 2-core is
    # the clique alone (5 and 6 peel in two successive rounds)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    stats: dict = {}
    out = {r["v"]: r["deg"] for r in k_core(df, k=2, stats=stats).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert stats["rounds"] == 2  # 6 peels, then 5, then stable


def test_kcore_empty_when_k_exceeds_connectivity(spark):
    from pymongo_change_stream_reader_spark.operators.graphs import k_core

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src LONG, dst LONG"
    )
    assert k_core(df, k=3).count() == 0  # a triangle has no 3-core


def test_kcore_normalizes_directions_and_duplicates(spark):
    from pymongo_change_stream_reader_spark.operators.graphs import k_core

    # the same triangle given as duplicated, both-direction edges
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (1, 2)],
        "src LONG, dst LONG",
    )
    out = {r["v"]: r["deg"] for r in k_core(df, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_raises_on_max_iters_exhaustion(spark):
    # a 10-path with k=2 peels two endpoints per round -> needs more
    # than 2 rounds; without stats= the operator must refuse to hand
    # back a partial (non-)core
    import pytest
    from pymongo_change_stream_reader_spark.operators.graphs import k_core

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src LONG, dst LONG"
    )
    with pytest.raises(RuntimeError, match="max_iters"):
        k_core(df, k=2, max_iters=2)
    stats: dict = {}
    partial = k_core(df, k=2, max_iters=2, stats=stats)
    assert stats["converged"] is False
    assert partial.count() > 0  # the partial peel is handed back
    stats2: dict = {}
    assert k_core(df, k=2, stats=stats2).count() == 0  # no 2-core
    assert stats2["converged"] is True


def _lpa(spark, edges, rounds):
    from pymongo_change_stream_reader_spark.operators.graphs import (
        label_propagation,
    )

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    return {
        r["v"]: r["label"]
        for r in label_propagation(df, rounds=rounds).collect()
    }


def test_lpa_two_planted_communities(spark):
    clique = lambda vs: [(a, b) for a in vs for b in vs if a < b]
    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)]
    out = _lpa(spark, edges, rounds=3)
    assert {out[v] for v in (1, 2, 3, 4)} == {1}
    assert {out[v] for v in (10, 11, 12, 13)} == {10}


def test_lpa_synchronous_min_tie_break(spark):
    # triangle, ONE round: every vertex sees its two neighbors' INITIAL
    # labels (synchronous), all counts tie, min label wins
    out = _lpa(spark, [(1, 2), (2, 3), (1, 3)], rounds=1)
    assert out == {1: 2, 2: 1, 3: 1}
    # round 2 converges the triangle onto label 1
    assert _lpa(spark, [(1, 2), (2, 3), (1, 3)], rounds=2) == {1: 1, 2: 1, 3: 1}


def test_lpa_normalizes_directions_and_self_loops(spark):
    # duplicate reversed edges collapse to the single 1-2 edge (one
    # round swaps labels — the documented synchronous oscillation on
    # bipartite shapes) and a self-loop-only vertex is not edge-
    # incident after normalization, so it gets no row
    out = _lpa(spark, [(2, 1), (1, 2), (3, 3)], rounds=1)
    assert out == {1: 2, 2: 1}
