"""Mergeable quantile sketch — a deterministic KLL/MRL-style
multi-level compactor, completing the mergeable-sketch family (HLL
distincts, bitmap segments, Misra-Gries heavy hitters, Count-Min
point frequencies — this one answers "what value sits at rank p").

Why not just ``approx_percentile``: Spark's built-in answers one
query inside one aggregation; a PIPELINE wants the summary itself —
a tiny (value, weight) table it can PERSIST, MERGE across days/shards
by plain union (weights add), and probe repeatedly without touching
the data again.  That mergeable-artifact shape is exactly what the
other sketch operators here provide.

Shape (classic two-phase mergeable decomposition, like
operators/heavyhitters.py):

1. each input partition builds its own multi-level compactor in one
   Arrow-batched pass (``mapInPandas``, bounded memory: <= k doubles
   per level, ~log2(n/k) levels): a full level-i buffer sorts and
   promotes every second element to level i+1 at doubled weight —
   the alternation offset flips per compaction (deterministic, no
   RNG: results are stable across runs and engines);
2. the per-partition summaries are tiny (<= k * levels rows each), so
   they merge by UNION — estimation runs over the merged
   (value, weight) rows: est(p) = smallest value whose cumulative
   weight reaches p * W.

Guarantees (pinned by tests/test_quantiles.py):

- n <= k with one partition: no compaction ever fires — exact;
- each compaction of a weight-w buffer perturbs any rank by at most
  w, so the total rank error is bounded by sum over compactions —
  O(n * levels / k); the tests pin |rank(est(p)) - p*n| <= 2 * n *
  levels / k on adversarial (sorted / reversed / duplicate-heavy)
  inputs, and the registered query verifies a 5%% rank bound against
  exact ranks computed Spark-side.

Reference parity: the reference engine has no sketch surface; this is
training-data-pipeline extension surface (length/score distribution
summaries over a corpus too large to sort).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_sketch", "quantile_estimate"]

_SKETCH_SCHEMA = "value DOUBLE, weight BIGINT"


def _sketch_partition(k: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        levels: list[list[float]] = [[]]
        offs: list[int] = [0]

        def add(level: int, vals: list[float]) -> None:
            while len(levels) <= level:
                levels.append([])
                offs.append(0)
            buf = levels[level]
            buf.extend(vals)
            if len(buf) >= k:
                buf.sort()
                off = offs[level]
                offs[level] ^= 1
                promoted = buf[off::2]
                levels[level] = []
                add(level + 1, promoted)

        for pdf in batches:
            vals = [float(v) for v in pdf["v"].dropna()]
            for i in range(0, len(vals), max(1, k)):
                add(0, vals[i : i + k])
        rows = [
            (v, 1 << lvl)
            for lvl, buf in enumerate(levels)
            for v in buf
        ]
        yield pd.DataFrame(rows, columns=["value", "weight"])

    return run


def quantile_sketch(
    df: DataFrame, col: str | Column, k: int = 256
) -> DataFrame:
    """The merged (value, weight) summary of ``col`` — <= k * levels
    rows per input partition, nulls ignored.  Persist it, union it
    with another sketch of more data (weights just add), probe it
    with :func:`quantile_estimate`."""
    c = F.col(col) if isinstance(col, str) else col
    keyed = df.select(c.cast("double").alias("v"))
    return keyed.mapInPandas(_sketch_partition(k), _SKETCH_SCHEMA)


def quantile_estimate(
    sketch: DataFrame, probs: list[float]
) -> DataFrame:
    """(p, value) per requested quantile: the smallest sketch value
    whose cumulative weight reaches p * total_weight.  The sketch is
    summary-sized (k * levels * partitions rows), so the weighted
    rank scan runs as ONE applyInPandas group — no unpartitioned
    window, no driver collect."""
    ps = sorted(float(p) for p in probs)

    def probe(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values("value")
        cum = s["weight"].cumsum()
        total = float(cum.iloc[-1]) if len(cum) else 0.0
        out = []
        for p in ps:
            target = p * total
            idx = (cum >= target).idxmax() if total else None
            out.append(
                (p, float(s["value"].loc[idx]) if idx is not None else None)
            )
        return pd.DataFrame(out, columns=["p", "value"])

    return (
        sketch.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(probe, "p DOUBLE, value DOUBLE")
        .select("p", "value")
    )


def grouped_quantile_sketch(
    df: DataFrame, group_cols: list[str], col: str | Column, k: int = 256
) -> DataFrame:
    """Per-GROUP mergeable quantile summaries: (group_cols..., value,
    weight) — the stratified sibling of :func:`quantile_sketch`.

    Phase 1 of the mergeable decomposition runs per PARTITION with a
    dict of compactors keyed by the partition's local groups
    (``mapInPandas`` streams Arrow batches, so memory is bounded by
    distinct-groups-per-partition x k x levels — an ``applyInPandas``
    per group would instead load each whole group into one pandas
    frame).  The per-partition summaries merge downstream by plain
    union: probe them grouped (weights add)."""
    c = F.col(col) if isinstance(col, str) else col
    gcols = [F.col(g) for g in group_cols]
    keyed = df.select(*gcols, c.cast("double").alias("__v"))
    gnames = list(group_cols)

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        state: dict = {}

        def add(st, level: int, vals: list) -> None:
            levels, offs = st
            while len(levels) <= level:
                levels.append([])
                offs.append(0)
            buf = levels[level]
            buf.extend(vals)
            if len(buf) >= k:
                buf.sort()
                off = offs[level]
                offs[level] ^= 1
                promoted = buf[off::2]
                levels[level] = []
                add(st, level + 1, promoted)

        for pdf in batches:
            for key, sub in pdf.groupby(gnames, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                st = state.setdefault(key, ([[]], [0]))
                vals = [float(v) for v in sub["__v"].dropna()]
                for i in range(0, len(vals), max(1, k)):
                    add(st, 0, vals[i : i + k])
        rows = [
            (*key, v, 1 << lvl)
            for key, (levels, _offs) in state.items()
            for lvl, buf in enumerate(levels)
            for v in buf
        ]
        yield pd.DataFrame(rows, columns=[*gnames, "value", "weight"])

    gschema = ", ".join(
        f"{g} {df.schema[g].dataType.simpleString()}" for g in group_cols
    )
    return keyed.mapInPandas(run, f"{gschema}, value DOUBLE, weight BIGINT")


def grouped_quantile_cuts(
    sketch: DataFrame, group_cols: list[str], probs: list[float]
) -> DataFrame:
    """(group_cols..., cuts ARRAY<DOUBLE>) per group from a grouped
    sketch — one ``applyInPandas`` over the SUMMARY rows (k * levels *
    partitions per group, never the data), so cut computation is as
    distributed as the groups are."""
    ps = sorted(float(p) for p in probs)
    gnames = list(group_cols)

    def probe(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values("value")
        cum = s["weight"].cumsum()
        total = float(cum.iloc[-1]) if len(cum) else 0.0
        cuts = []
        for p in ps:
            if not total:
                continue
            idx = (cum >= p * total).idxmax()
            cuts.append(float(s["value"].loc[idx]))
        head = pdf.iloc[[0]][gnames].reset_index(drop=True)
        head["cuts"] = [cuts]
        return head

    gschema = ", ".join(
        f"{g} {sketch.schema[g].dataType.simpleString()}" for g in gnames
    )
    return sketch.groupBy(*gnames).applyInPandas(
        probe, f"{gschema}, cuts ARRAY<DOUBLE>"
    )
