"""Record linkage / entity resolution: cross-source duplicate
entities that exact or near-dup TEXT matching cannot catch (two
records describing the same thing with differently-phrased fields).

The classic Fellegi–Sunter-shaped pipeline, each stage the Spark
plan that survives 100 TB:

1. **Blocking** — every record emits a set of blocking keys (caller-
   chosen: shingles, sorted-neighborhood prefixes, phonetic codes);
   candidates are pairs sharing >= 1 key, via an inverted key index —
   ONE explode + ONE key-equality self-join, never an all-pairs
   product.  ``max_block_size`` drops keys whose posting list exceeds
   the bound (stop-key removal — the head keys that would explode
   quadratically at corpus scale carry no discriminating signal
   anyway), so per-key fan-out is <= B² by construction.
2. **Field scoring** — per-field similarity (exact / token-set
   Jaccard / numeric closeness / edit distance), all JVM expressions
   inside whole-stage codegen, combined by a caller-weighted sum
   folded IN FIELD ORDER (IEEE-reproducible for the oracle).
3. **Match threshold** → matched pairs.
4. **Transitive closure** — the dedup kit's
   :func:`~pymongo_change_stream_reader_spark.operators.dedup.
   connected_components` loop (driver union-find for model-sized
   match graphs, the distributed min-label loop beyond); entity id =
   min record id of the cluster.
5. **Canonical survivor** — one representative per entity by a
   caller-given preference order (entity-partitioned window, bounded
   state).

Reference parity: the reference relay (producing/change_event_handler
.py:34-77) forwards documents without cross-record analysis; entity
resolution is engine extension surface (SURVEY.md §2.D), semantics
per the standard record-linkage literature (Fellegi & Sunter 1969;
Papadakis et al. blocking surveys).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "MatchField",
    "sim_exact",
    "sim_token_jaccard",
    "sim_numeric_closeness",
    "sim_edit_distance",
    "blocking_candidates",
    "blocked_entity_matches",
    "closure_over_edges",
    "entity_resolution",
    "entity_resolution_incremental",
]


@dataclass(frozen=True)
class MatchField:
    """One scored field: ``name`` is the column on the input frame,
    ``scorer`` maps the pair's two column values to a similarity in
    [0, 1], ``weight`` scales it into the match score."""

    name: str
    weight: float
    scorer: Callable[[Column, Column], Column]


def sim_exact(a: Column, b: Column) -> Column:
    """1.0 on equality, else 0.0 (NULL never matches)."""
    return F.when(a == b, F.lit(1.0)).otherwise(F.lit(0.0))


def sim_token_jaccard(a: Column, b: Column) -> Column:
    """Jaccard over two distinct-element ARRAY columns."""
    from pymongo_change_stream_reader_spark.operators.dedup import jaccard

    return jaccard(a, b)


def sim_numeric_closeness(a: Column, b: Column) -> Column:
    """1 - |a-b| / max(a, b, 1) — relative closeness of two
    non-negative numerics (equal => 1, disjoint magnitudes => ~0)."""
    return F.lit(1.0) - F.abs(a - b).cast("double") / F.greatest(
        a, b, F.lit(1)
    ).cast("double")


def sim_edit_distance(a: Column, b: Column) -> Column:
    """1 - levenshtein(a, b) / max(len(a), len(b), 1) — normalized
    edit similarity of two strings."""
    return F.lit(1.0) - F.levenshtein(a, b).cast("double") / F.greatest(
        F.length(a), F.length(b), F.lit(1)
    ).cast("double")


def blocking_candidates(
    df: DataFrame,
    id_col: str,
    keys: Column,
    max_block_size: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) sharing at least one blocking
    key.  ``keys`` is an ARRAY<STRING> column expression over ``df``
    (shingles, phonetic codes, prefix keys ...).

    Plan: explode to the inverted (key, id) index, drop keys whose
    posting list exceeds ``max_block_size`` (stop-key removal — one
    count aggregation + one anti join), self-join on the key,
    distinct.  ``stats`` receives ``{"index_rows", "dropped_keys",
    "candidates"}`` for pruning assertions."""
    inv = (
        df.select(F.col(id_col).alias("rid"), F.explode(keys).alias("bk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if max_block_size is not None:
        hot = (
            inv.groupBy("bk")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("bk")
            .localCheckpoint(eager=False)
        )
        if stats is not None:
            stats["dropped_keys"] = hot.count()
        inv = inv.join(hot, "bk", "anti")
    cand = (
        inv.alias("__a")
        .join(
            inv.alias("__b"),
            (F.col("__a.bk") == F.col("__b.bk"))
            & (F.col("__a.rid") < F.col("__b.rid")),
        )
        .select(
            F.col("__a.rid").alias("id_a"), F.col("__b.rid").alias("id_b")
        )
        .distinct()
    )
    if stats is not None:
        stats["index_rows"] = inv.count()
        cand = cand.localCheckpoint(eager=True)
        stats["candidates"] = cand.count()
    return cand


def _score(fields: list[MatchField]) -> Column:
    """Weighted field-similarity sum over ``__a``/``__b``-aliased
    record sides, folded left in field order (the oracle mirrors the
    same association, so the IEEE result is identical)."""
    score: Column | None = None
    for f in fields:
        term = F.lit(f.weight) * f.scorer(
            F.col(f"__a.{f.name}"), F.col(f"__b.{f.name}")
        )
        score = term if score is None else score + term
    if score is None:
        raise ValueError("entity resolution needs at least one MatchField")
    return score


def blocked_entity_matches(
    df: DataFrame,
    id_col: str,
    keys: Column,
    fields: list[MatchField],
    threshold: float,
    max_block_size: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Matched pairs (id_a, id_b, score) with weighted field score >=
    ``threshold``, candidates restricted to blocking-key collisions.
    The threshold tests the UNROUNDED score; ``score`` is rounded to
    6 for stable comparison output."""
    recs = df.select(
        F.col(id_col).alias("rid"), *[F.col(f.name) for f in fields]
    )
    cand = blocking_candidates(
        df, id_col, keys, max_block_size=max_block_size, stats=stats
    )
    scored = (
        cand.join(
            recs.alias("__a"), cand["id_a"] == F.col("__a.rid")
        )
        .join(recs.alias("__b"), cand["id_b"] == F.col("__b.rid"))
        .select("id_a", "id_b", _score(fields).alias("__score"))
    )
    return scored.filter(F.col("__score") >= threshold).select(
        "id_a", "id_b", F.round("__score", 6).alias("score")
    )


def entity_resolution(
    df: DataFrame,
    id_col: str,
    keys: Column,
    fields: list[MatchField],
    threshold: float,
    canonical_order: list[Column] | None = None,
    max_block_size: int | None = None,
    max_iters: int = 25,
    driver_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """Full resolution: (id_col, entity, is_canonical) for EVERY input
    record — ``entity`` is the min record id of the transitive match
    cluster (singletons are their own entity), ``is_canonical`` marks
    the per-entity survivor under ``canonical_order`` (descending
    preference columns; ties and None fall back to ascending id).

    Record ids must be integral (the closure loop's contract —
    :func:`~pymongo_change_stream_reader_spark.operators.dedup.
    connected_components`)."""
    from pymongo_change_stream_reader_spark.operators.dedup import (
        connected_components,
    )

    matches = blocked_entity_matches(
        df,
        id_col,
        keys,
        fields,
        threshold,
        max_block_size=max_block_size,
        stats=stats,
    )
    comps = connected_components(
        matches.select("id_a", "id_b"),
        df.select(id_col),
        id_col=id_col,
        max_iters=max_iters,
        driver_threshold=driver_threshold,
    ).withColumnRenamed("component", "entity")
    order = [c.desc() for c in (canonical_order or [])]
    w = Window.partitionBy("entity").orderBy(*order, F.col(id_col).asc())
    return (
        df.join(comps, id_col)
        .select(
            id_col,
            "entity",
            (F.row_number().over(w) == 1).alias("is_canonical"),
        )
    )


def closure_over_edges(
    spark, mapped: DataFrame, driver_threshold: int
) -> tuple[DataFrame, bool, int]:
    """Transitive closure of a CONTRACTED edge set (columns ``na``,
    ``nb`` — supernode ids): returns (label frame (node, final),
    small-path flag, edge count).  Edge sets within
    ``driver_threshold`` run one union-find pass on the driver;
    beyond it the SAME min-label closure runs distributed
    (operators/dedup.py's connected_components loop) over the
    edge-incident nodes only — the node space is already contracted,
    so this is fan-out-sized, not corpus-sized.  Shared by
    :func:`entity_resolution_incremental` and the persisted ER
    registry (streaming/er_registry.py)."""
    # ONE job decides the path AND fetches the edges: collect at most
    # driver_threshold + 1 rows — fewer means the whole edge set is in
    # hand (no separate count() job), one more means overflow and the
    # distributed loop recomputes from the persisted frame
    head = mapped.limit(driver_threshold + 1).collect()
    small = len(head) <= driver_threshold
    if small:
        n_edges = len(head)
        # model-sized edge set: one union-find pass on the driver
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for row in head:
            a, b = int(row["na"]), int(row["nb"])
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        label = {v: find(v) for v in parent}
        if label:
            lmap = spark.createDataFrame(
                list(label.items()), "node LONG, final LONG"
            )
        else:
            lmap = spark.createDataFrame([], "node LONG, final LONG")
    else:
        # the contracted edge set outgrew the driver: run the SAME
        # min-label closure distributed
        from pymongo_change_stream_reader_spark.operators.dedup import (
            connected_components,
        )

        n_edges = mapped.count()
        nodes = (
            mapped.select(F.col("na").alias("rid"))
            .unionByName(mapped.select(F.col("nb").alias("rid")))
            .distinct()
        )
        lmap = connected_components(
            mapped.select(
                F.col("na").alias("id_a"), F.col("nb").alias("id_b")
            ),
            nodes,
            id_col="rid",
            driver_threshold=0,
        ).select(
            F.col("rid").alias("node"), F.col("component").alias("final")
        ).localCheckpoint(eager=True)
    return lmap, small, n_edges


def entity_resolution_incremental(
    new_df: DataFrame,
    prior_records: DataFrame | None,
    prior_assign: DataFrame | None,
    id_col: str,
    keys: Column,
    fields: list[MatchField],
    threshold: float,
    max_block_size: int | None = None,
    driver_threshold: int = 1_000_000,
    stats: dict | None = None,
) -> DataFrame:
    """INCREMENTAL entity resolution: fold a batch of NEW records into
    an existing resolution without re-matching the prior corpus
    against itself.  Returns the DELTA assignment frame (id_col,
    entity): one row per new record, plus one row per PRIOR record
    whose entity label changes because the batch merged entities
    (matches are symmetric and the match function is deterministic,
    so prior-vs-prior pairs cannot newly appear — the delta is exactly
    new-edge reachability).  Prior records seeded WITHOUT a
    ``prior_assign`` row carry the implicit label ``entity = id``;
    when a batch match folds such a record into a cluster whose final
    label differs from its own id, the delta includes an explicit row
    for it (otherwise its implicit own-id label would silently diverge
    from the cluster whenever a smaller new id wins the min).  The
    caller LWW-merges deltas into its assignment table and appends
    the batch to its record store.

    Work per batch: candidates are (new x prior) and (new x new)
    pairs sharing a blocking key — the prior side enters ONLY through
    the inverted key index join, never as an all-pairs scan; scoring
    joins fetch exactly the candidate rids' fields.  Component
    merging contracts every prior entity to ONE supernode (its
    entity id), so the closure sees edges + supernodes — bounded by
    the batch's match fan-out, not the corpus.  Edge sets within
    ``driver_threshold`` run one union-find pass on the driver;
    beyond it the SAME min-label closure runs distributed
    (operators/dedup.py's connected_components loop) over the
    contracted node space.  Unmatched new records never leave the
    executors (left-join => own-id entities).

    At 100 TB the caller persists the inverted key index and the
    per-entity member index as bucketed tables (the join-view store
    pattern) instead of recomputing ``keys`` over ``prior_records``
    each batch; this operator takes the frames and leaves storage to
    the pipeline.

    ``max_block_size`` drops keys whose COMBINED (prior + new)
    posting list exceeds the bound; note a key can cross the bound as
    the corpus grows, so incremental and one-shot runs only agree
    when blocking keys are stable (or the bound is None).
    ``stats`` receives ``{"edges", "merged_entities"}``."""
    spark = new_df.sparkSession
    empty_assign = spark.createDataFrame(
        [], f"{id_col} LONG, entity LONG"
    )
    if prior_records is None:
        prior_records = new_df.filter(F.lit(False))
    if prior_assign is None:
        prior_assign = empty_assign

    inv_new = (
        new_df.select(F.col(id_col).alias("rid"), F.explode(keys).alias("bk"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    inv_prior = prior_records.select(
        F.col(id_col).alias("rid"), F.explode(keys).alias("bk")
    ).distinct()
    if max_block_size is not None:
        hot = (
            inv_new.unionByName(inv_prior)
            .groupBy("bk")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_block_size)
            .select("bk")
            .localCheckpoint(eager=False)
        )
        inv_new = inv_new.join(hot, "bk", "anti")
        inv_prior = inv_prior.join(hot, "bk", "anti")

    # candidates touching >= 1 new record: (new x prior) + (new x new)
    np_pairs = (
        inv_new.alias("__a")
        .join(inv_prior.alias("__b"), F.col("__a.bk") == F.col("__b.bk"))
        .select(
            F.col("__a.rid").alias("id_a"), F.col("__b.rid").alias("id_b")
        )
    )
    nn_pairs = (
        inv_new.alias("__a")
        .join(
            inv_new.alias("__b"),
            (F.col("__a.bk") == F.col("__b.bk"))
            & (F.col("__a.rid") < F.col("__b.rid")),
        )
        .select(
            F.col("__a.rid").alias("id_a"), F.col("__b.rid").alias("id_b")
        )
    )
    cand = np_pairs.unionByName(nn_pairs).distinct()

    recs = new_df.unionByName(prior_records).select(
        F.col(id_col).alias("rid"), *[F.col(f.name) for f in fields]
    )
    scored = (
        cand.join(recs.alias("__a"), cand["id_a"] == F.col("__a.rid"))
        .join(recs.alias("__b"), cand["id_b"] == F.col("__b.rid"))
        .select("id_a", "id_b", _score(fields).alias("__score"))
    )
    matches = scored.filter(F.col("__score") >= threshold).select(
        "id_a", "id_b"
    )

    # contract prior rids to their entity supernodes; new rids are
    # their own nodes (a prior rid without an assignment row is
    # treated as its own entity — the caller seeded mid-corpus)
    pa = prior_assign.select(
        F.col(id_col).alias("rid"), F.col("entity").alias("__e")
    )
    mapped = (
        matches.alias("__m")
        .join(pa.alias("__ea"), F.col("__m.id_a") == F.col("__ea.rid"), "left")
        .join(pa.alias("__eb"), F.col("__m.id_b") == F.col("__eb.rid"), "left")
        .select(
            F.coalesce(F.col("__ea.__e"), F.col("__m.id_a")).alias("na"),
            F.coalesce(F.col("__eb.__e"), F.col("__m.id_b")).alias("nb"),
        )
        .distinct()
        .persist()
    )
    lmap, small, n_edges = closure_over_edges(
        spark, mapped, driver_threshold
    )
    mapped.unpersist()

    # relabels for prior entities whose supernode label changed
    changed_df = (
        lmap.join(
            prior_assign.select(
                F.col("entity").alias("node")
            ).distinct(),
            "node",
            "semi",
        )
        .filter(F.col("node") != F.col("final"))
        .select(F.col("node").alias("old_e"), F.col("final").alias("new_e"))
    )
    if stats is not None:
        stats["edges"] = n_edges
        stats["merged_entities"] = changed_df.count()
    # deltas for new records: matched -> their final label, unmatched
    # -> own id (computed distributed; unmatched ids never collect)
    new_ids = new_df.select(F.col(id_col).cast("long").alias("rid"))
    lmap_side = F.broadcast(lmap) if small else lmap
    new_delta = new_ids.join(
        lmap_side, new_ids["rid"] == lmap["node"], "left"
    ).select(
        F.col("rid").alias(id_col),
        F.coalesce(F.col("final"), F.col("rid")).alias("entity"),
    )
    relabel = prior_assign.join(
        changed_df if not small else F.broadcast(changed_df),
        prior_assign["entity"] == F.col("old_e"),
    ).select(F.col(id_col), F.col("new_e").alias("entity"))
    # prior records seeded WITHOUT an assignment row entered the
    # closure as their own supernode (coalesce above); if a batch
    # match moved their cluster to a different min label, emit an
    # explicit delta for them too — cost is bounded by the batch's
    # matched prior rids, never the corpus (semi on match ids first)
    match_prior = (
        prior_records.select(F.col(id_col).cast("long").alias("rid"))
        .join(
            matches.select(F.col("id_a").alias("rid"))
            .unionByName(matches.select(F.col("id_b").alias("rid")))
            .distinct(),
            "rid",
            "semi",
        )
        .join(pa, "rid", "anti")
    )
    seeded_delta = (
        match_prior.join(lmap_side, match_prior["rid"] == lmap["node"])
        .filter(F.col("final") != F.col("rid"))
        .select(
            F.col("rid").alias(id_col), F.col("final").alias("entity")
        )
    )
    return new_delta.unionByName(relabel).unionByName(seeded_delta)
