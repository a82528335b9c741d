"""Entity resolution (operators/linkage.py): blocking pruning,
weighted field scoring, transitive closure, canonical survivors."""

from __future__ import annotations

from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.linkage import (
    MatchField,
    blocked_entity_matches,
    blocking_candidates,
    entity_resolution,
    sim_edit_distance,
    sim_exact,
    sim_numeric_closeness,
)

ROWS = [
    (1, "jon smith", "nyc", 30),
    (2, "john smith", "nyc", 31),
    (3, "john smyth", "nyc", 30),
    (4, "alice jones", "sf", 25),
    (5, "alice jones", "sfo", 25),
    (6, "bob brown", "la", 40),
]

FIELDS = [
    MatchField("name", 0.6, sim_edit_distance),
    MatchField("city", 0.2, sim_edit_distance),
    MatchField("age", 0.2, sim_numeric_closeness),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "id LONG, name STRING, city STRING, age INT"
    )


def _keys():
    # token 3-prefixes: "jon smith" -> [jon, smi]; note jones -> jon
    # COLLIDES with the jon/john block — scoring must reject the
    # cross-cluster candidates blocking lets through
    return F.array_distinct(
        F.transform(F.split(F.col("name"), " "), lambda t: F.substring(t, 1, 3))
    )


def test_blocking_candidates_prune_and_stop_keys(spark):
    df = _df(spark)
    stats: dict = {}
    cand = blocking_candidates(df, "id", _keys(), stats=stats)
    pairs = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    # shared blocks: smi->(1,2), joh->(2,3), ali->(4,5), and the
    # jon-block collisions jon/jones->(1,4),(1,5) — NOT all 15 pairs,
    # and (1,3) is unreachable by blocking (smi vs smy): only the
    # transitive closure puts 1 and 3 in one entity
    assert pairs == {(1, 2), (2, 3), (4, 5), (1, 4), (1, 5)}
    assert stats["candidates"] == len(pairs) < 15
    assert (6, 6) not in pairs and all(a < b for a, b in pairs)

    # a hot key shared by everyone is dropped by stop-key removal
    hot = F.concat(_keys(), F.array(F.lit("zz")))
    stats2: dict = {}
    cand2 = blocking_candidates(
        df, "id", hot, max_block_size=3, stats=stats2
    )
    assert stats2["dropped_keys"] == 1
    assert {
        (r["id_a"], r["id_b"]) for r in cand2.collect()
    } == pairs  # zz contributed nothing beyond the real blocks


def test_scored_matches_reject_block_collisions(spark):
    matches = blocked_entity_matches(
        _df(spark), "id", _keys(), FIELDS, threshold=0.75
    )
    got = {(r["id_a"], r["id_b"]): r["score"] for r in matches.collect()}
    assert set(got) == {(1, 2), (2, 3), (4, 5)}
    # jon smith ~ john smith: 0.6*0.9 + 0.2*1.0 + 0.2*(1-1/31)
    expect = 0.6 * 0.9 + 0.2 * 1.0 + 0.2 * (1.0 - 1.0 / 31.0)
    assert abs(got[(1, 2)] - expect) < 1e-6


def test_entity_resolution_clusters_and_canonicals(spark):
    out = entity_resolution(
        _df(spark),
        "id",
        _keys(),
        FIELDS,
        threshold=0.75,
        canonical_order=[F.col("age")],
    )
    rows = {r["id"]: (r["entity"], r["is_canonical"]) for r in out.collect()}
    assert len(rows) == 6  # every record assigned
    assert rows[1][0] == rows[2][0] == rows[3][0] == 1  # min-id entity
    assert rows[4][0] == rows[5][0] == 4
    assert rows[6][0] == 6  # singleton keeps itself
    # canonical: max age in {1,2,3} is id 2 (31); tie in {4,5} -> min
    # id 4; singleton is its own canonical
    assert [i for i, (_, c) in rows.items() if c] == [2, 4, 6] or sorted(
        i for i, (_, c) in rows.items() if c
    ) == [2, 4, 6]


def test_exact_scorer_treats_null_as_nonmatch(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "id LONG, tag STRING"
    )
    pair = (
        df.alias("__a")
        .crossJoin(df.alias("__b"))
        .select(
            sim_exact(F.col("__a.tag"), F.col("__b.tag")).alias("s")
        )
        .collect()
    )
    assert all(r["s"] in (0.0, 1.0) for r in pair)
    # NULL = NULL scores 0, not NULL
    assert sum(r["s"] for r in pair) == 1.0  # only (3,3) matches


def test_incremental_matches_one_shot_with_cross_batch_merges(spark):
    from pymongo_change_stream_reader_spark.operators.linkage import (
        entity_resolution_incremental,
    )

    df = _df(spark)
    batches = [
        df.filter(F.col("id").isin(1, 4)),   # jon smith, alice jones
        df.filter(F.col("id").isin(3, 5)),   # john smyth, alice jones/sfo
        df.filter(F.col("id").isin(2, 6)),   # john smith (the BRIDGE), bob
    ]
    assign = None
    prior = None
    round_deltas = []
    for b in batches:
        stats: dict = {}
        delta = entity_resolution_incremental(
            b, prior, assign, "id", _keys(), FIELDS, threshold=0.75,
            stats=stats,
        ).localCheckpoint(eager=True)
        round_deltas.append(
            ({r["id"]: r["entity"] for r in delta.collect()}, stats)
        )
        assign = (
            delta
            if assign is None
            else assign.join(delta.select("id"), "id", "anti")
            .unionByName(delta)
            .localCheckpoint(eager=True)
        )
        prior = b if prior is None else prior.unionByName(b)

    # round 0: no matches — both records their own entity
    assert round_deltas[0][0] == {1: 1, 4: 4}
    # round 1: 5 joins alice's entity; 3 matches nothing YET (its only
    # links are to 2, which has not arrived)
    assert round_deltas[1][0] == {3: 3, 5: 4}
    # round 2: 2 bridges 1 and 3 — the delta must carry 3's RELABEL
    # (prior entity 3 merges into 1), plus the new records
    assert round_deltas[2][0] == {2: 1, 3: 1, 6: 6}
    assert round_deltas[2][1]["merged_entities"] >= 1
    final = {r["id"]: r["entity"] for r in assign.collect()}
    assert final == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_incremental_seeded_prior_without_assign_gets_delta_row(spark):
    # seeded-mid-corpus path: prior_records WITHOUT prior_assign rows
    # carry the implicit label entity=id.  When a NEW record with a
    # SMALLER id matches such a record, the cluster's min label is the
    # new id — the delta must carry an explicit relabel for the prior
    # record, else its implicit own-id label silently diverges
    # (round-12 ADVICE medium).
    from pymongo_change_stream_reader_spark.operators.linkage import (
        entity_resolution_incremental,
    )

    df = _df(spark)
    prior = df.filter(F.col("id").isin(2, 3))  # john smith, john smyth
    batch = df.filter(F.col("id") == 1)        # jon smith (smaller id)
    for thresh in (1_000_000, 0):  # driver union-find + distributed
        delta = entity_resolution_incremental(
            batch, prior, None, "id", _keys(), FIELDS, threshold=0.75,
            driver_threshold=thresh,
        )
        got = {r["id"]: r["entity"] for r in delta.collect()}
        # 1 matches 2 (new x prior); 2-3 is prior-prior, not re-matched
        # this batch, so 3 keeps its implicit own-id label (no row)
        assert got == {1: 1, 2: 1}


def test_incremental_distributed_closure_path_matches_driver(spark):
    # driver_threshold=0 forces the distributed min-label closure over
    # the contracted nodes; deltas must match the union-find path
    from pymongo_change_stream_reader_spark.operators.linkage import (
        entity_resolution_incremental,
    )

    df = _df(spark)
    prior = df.filter(F.col("id").isin(1, 3, 4, 5))
    prior_assign = spark.createDataFrame(
        [(1, 1), (3, 3), (4, 4), (5, 4)], "id LONG, entity LONG"
    )
    batch = df.filter(F.col("id").isin(2, 6))
    outs = []
    for thresh in (1_000_000, 0):
        stats: dict = {}
        delta = entity_resolution_incremental(
            batch, prior, prior_assign, "id", _keys(), FIELDS,
            threshold=0.75, driver_threshold=thresh, stats=stats,
        )
        outs.append(
            ({r["id"]: r["entity"] for r in delta.collect()}, stats)
        )
    assert outs[0][0] == outs[1][0] == {2: 1, 3: 1, 6: 6}
    assert outs[0][1]["merged_entities"] == outs[1][1]["merged_entities"] == 1
