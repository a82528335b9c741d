"""Property-based check of the persisted ER registry
(streaming/er_registry.py) against an INDEPENDENT pure-Python model
of the documented semantics: random insert/update/delete sequences in
random batch splits must land on exactly the model's assignment
table.

Model semantics (the module docstring's contract):
- one effective row per rid per batch (the CDC wrapper's LWW fold);
- candidates = blocking-key collisions between the batch's live rows
  and the prior LIVE corpus (current fields) plus batch x batch;
- matches are EVIDENCE and never retract: merges accumulate in a
  union of clusters, each cluster keeping the MIN node label seen
  when it was merged (prior clusters contract to their LABEL, not
  their member min — a deleted record's id keeps serving as label);
- deletes remove the record, its postings and its assignment row;
  the remaining members keep the cluster label.

Scoring is re-implemented here in pure Python (levenshtein +
closeness over IEEE doubles with the same fold order), so a shared-
code bug in operators/linkage.py cannot hide.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.linkage import (
    MatchField,
    sim_edit_distance,
    sim_numeric_closeness,
)
from pymongo_change_stream_reader_spark.streaming.er_registry import (
    ERSpec,
    er_registry_batch,
    read_er_assign,
)

NAMES = [
    "jon smith", "john smith", "john smyth", "alice jones",
    "alice janes", "bob brown", "rob brown",
]
CITIES = ["nyc", "nya", "la"]
THRESHOLD = 0.75


def _keys_col():
    return F.array_distinct(
        F.transform(
            F.split(F.col("name"), " "), lambda t: F.substring(t, 1, 3)
        )
    )


def _spec():
    return ERSpec(
        "id",
        [
            MatchField("name", 0.6, sim_edit_distance),
            MatchField("city", 0.2, sim_edit_distance),
            MatchField("age", 0.2, sim_numeric_closeness),
        ],
        _keys_col(),
        THRESHOLD,
    )


# ---- the independent Python model ---------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _edit_sim(a: str, b: str) -> float:
    return 1.0 - _lev(a, b) / max(len(a), len(b), 1)


def _closeness(a: int, b: int) -> float:
    return 1.0 - abs(a - b) / max(a, b, 1)


def _score(ra, rb) -> float:
    # same weights, same left-fold order as the Spark expression
    return (
        0.6 * _edit_sim(ra[0], rb[0])
        + 0.2 * _edit_sim(ra[1], rb[1])
        + 0.2 * _closeness(ra[2], rb[2])
    )


def _blocks(name: str) -> set:
    return {t[:3] for t in name.split(" ") if t}


def model_fold(batches):
    """records: rid -> fields (live only); assign: rid -> entity."""
    records: dict = {}
    assign: dict = {}
    for batch in batches:
        eff = {}
        for rid, live, fields in batch:
            eff[rid] = (live, fields)
        new_live = {
            rid: f for rid, (lv, f) in eff.items() if lv
        }
        # candidates: batch x prior-live (key collision) + batch x batch
        prior = {
            rid: f
            for rid, f in records.items()
            if rid not in eff  # batch rids' stale state never probes
        }
        pairs = set()
        for ra, fa in new_live.items():
            for rb, fb in prior.items():
                if _blocks(fa[0]) & _blocks(fb[0]):
                    pairs.add((min(ra, rb), max(ra, rb)))
            for rb, fb in new_live.items():
                if ra < rb and _blocks(fa[0]) & _blocks(fb[0]):
                    pairs.add((ra, rb))
        allrec = dict(prior)
        allrec.update(new_live)
        matches = [
            (a, b)
            for a, b in pairs
            if _score(allrec[a], allrec[b]) >= THRESHOLD
        ]
        # contract to supernodes (prior entity labels), close, min-label
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo

        for a, b in matches:
            union(assign.get(a, a), assign.get(b, b))
        lmap = {v: find(v) for v in parent}
        # relabel merged prior entities
        for rid, e in list(assign.items()):
            if e in lmap and lmap[e] != e:
                assign[rid] = lmap[e]
        # batch rows
        for rid, (lv, f) in eff.items():
            if lv:
                node = assign.get(rid, rid)
                assign[rid] = lmap.get(node, node)
                records[rid] = f
            else:
                assign.pop(rid, None)
                records.pop(rid, None)
        # NOTE: eff rids with prior assign already relabeled above;
        # the explicit set handles both fresh and updated rows
    return assign


# ---- the property ---------------------------------------------------

op = st.tuples(
    st.integers(min_value=1, max_value=12),           # rid
    st.booleans(),                                    # live?
    st.tuples(
        st.sampled_from(NAMES),
        st.sampled_from(CITIES),
        st.integers(min_value=25, max_value=40),
    ),
)
batch = st.lists(op, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(batches=st.lists(batch, min_size=1, max_size=4))
def test_registry_fold_matches_python_model(spark, tmp_path_factory, batches):
    # one effective row per rid per batch (the core contract — the
    # CDC wrapper's LWW fold provides it in production)
    norm = []
    for b in batches:
        eff = {}
        for rid, live, fields in b:
            eff[rid] = (live, fields)
        norm.append([(rid, lv, f) for rid, (lv, f) in eff.items()])

    path = str(tmp_path_factory.mktemp("erprop") / "reg")
    spec = _spec()
    for ep, b in enumerate(norm, start=1):
        rows = [
            (rid, f[0], f[1], f[2], lv) for rid, lv, f in b
        ]
        df = spark.createDataFrame(
            rows,
            "id LONG, name STRING, city STRING, age INT, live BOOLEAN",
        )
        er_registry_batch(df, path, ep, spec, n_buckets=4)
    got_df = read_er_assign(spark, path)
    got = (
        {}
        if got_df is None
        else {r["rid"]: r["entity"] for r in got_df.collect()}
    )
    assert got == model_fold(norm)
