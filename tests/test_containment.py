"""Containment dedup: the asymmetric excerpt/superset case symmetric
Jaccard under-scores."""

from __future__ import annotations

from pymongo_change_stream_reader_spark.operators.dedup import (
    containment_pairs,
    exact_jaccard_pairs,
)

LONG = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)
EXCERPT = "eta theta iota kappa lambda mu"  # 6 of LONG's 20 tokens
OTHER = "one two three four five six seven eight nine ten"


def test_containment_catches_excerpt_jaccard_misses(spark):
    d = spark.createDataFrame(
        [(0, LONG), (1, EXCERPT), (2, OTHER)], "doc_id LONG, text STRING"
    )
    # the excerpt's 4 distinct 3-grams all occur in LONG's 18
    got = {
        (r["id_a"], r["id_b"]): (r["c_ab"], r["c_ba"])
        for r in containment_pairs(d, "text", "doc_id", 0.9).collect()
    }
    assert got == {(0, 1): (round(4 / 18, 6), 1.0)}
    # symmetric Jaccard on the same pair is 4/18 — below any sane
    # near-dup threshold, so the excerpt is invisible to it
    assert (
        exact_jaccard_pairs(d, "text", "doc_id", threshold=0.5)
        .filter("id_a = 0 and id_b = 1")
        .count()
        == 0
    )


def test_containment_direction_identifies_contained_side(spark):
    d = spark.createDataFrame(
        [(7, LONG), (3, EXCERPT)], "doc_id LONG, text STRING"
    )
    [r] = containment_pairs(d, "text", "doc_id", 0.9).collect()
    # pair is emitted id_a < id_b; the contained doc is the one whose
    # direction hits 1.0 — here doc 3 (the excerpt)
    assert (r["id_a"], r["id_b"]) == (3, 7)
    assert r["c_ab"] == 1.0 and r["c_ba"] < 0.5
