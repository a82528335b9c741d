"""Property-based tests (hypothesis) for the $match translator: a
randomly generated predicate tree must filter a DataFrame exactly as a
pure-Python evaluator of Mongo's documented semantics filters the same
rows.  (The reference validates its pipeline passthrough by shape only
— settings.py:69-76 — because mongod owns the semantics; here WE own
the semantics, so they get searched, not just spot-checked.)

One Spark action per example is slow, so the strategy generates a
BATCH of predicates and the test unions them into one collected
DataFrame pass per hypothesis example.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pymongo_change_stream_reader_spark.plans.pipeline import translate_match

# A fixed row universe: ints (incl. negatives), strings, nulls.
ROWS = [
    {"a": a, "b": b, "s": s}
    for a in [-5, 0, 3, 7, None]
    for b in [0, 7, 42]
    for s in ["x", "xyz", "zzz", None]
]

_INTS = st.sampled_from([-5, 0, 3, 7, 42])
# Comparison literals INCLUDE null — Mongo gives null its own
# equality-class semantics ({a: null} matches null/missing, {$ne:
# null} matches present non-null), which round 1's strategy never
# sampled and round 1's translator inverted (ADVICE r1, high).
_INTS_N = st.sampled_from([-5, 0, 3, 7, 42, None])
_STRS = st.sampled_from(["x", "xyz", "zzz"])


def _leaf() -> st.SearchStrategy:
    int_field = st.sampled_from(["a", "b"])
    cmp_op = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])
    return st.one_of(
        st.tuples(int_field, cmp_op, _INTS_N).map(lambda t: {t[0]: {t[1]: t[2]}}),
        st.tuples(
            int_field,
            st.sampled_from(["$in", "$nin"]),
            st.lists(_INTS_N, min_size=1, max_size=3),
        ).map(lambda t: {t[0]: {t[1]: t[2]}}),
        st.tuples(st.just("s"), cmp_op, _STRS).map(lambda t: {t[0]: {t[1]: t[2]}}),
        st.tuples(st.sampled_from(["a", "s"]), st.booleans()).map(
            lambda t: {t[0]: {"$exists": t[1]}}
        ),
        # field-level $not wraps an operator doc: two-valued negation
        st.tuples(int_field, cmp_op, _INTS_N).map(
            lambda t: {t[0]: {"$not": {t[1]: t[2]}}}
        ),
        _INTS_N.map(lambda v: {"a": v}),  # bare equality (incl. null)
    )


def _predicates(depth: int = 2) -> st.SearchStrategy:
    return st.recursive(
        _leaf(),
        lambda children: st.one_of(
            st.lists(children, min_size=2, max_size=3).map(lambda cs: {"$and": cs}),
            st.lists(children, min_size=2, max_size=3).map(lambda cs: {"$or": cs}),
            st.lists(children, min_size=1, max_size=2).map(lambda cs: {"$nor": cs}),
        ),
        max_leaves=6,
    )


def _in_match(v, arg: list) -> bool:
    """Mongo $in: null in the list matches null/missing fields."""
    if v is None:
        return None in arg
    return v in [x for x in arg if x is not None]


def _cmp_match(v, op: str, arg) -> bool:
    """One comparison with Mongo's documented null semantics: null
    literals form their own equality class ($eq/$gte/$lte null match
    null/missing; $ne null matches present non-null; strict $gt/$lt
    null match nothing), and a null/missing FIELD fails every positive
    comparison against a non-null literal but matches $ne."""
    if arg is None:
        if op in ("$eq", "$gte", "$lte"):
            return v is None
        if op == "$ne":
            return v is not None
        return False  # $gt / $lt
    if op == "$ne":
        return v is None or v != arg
    if v is None:
        return False
    return {
        "$eq": v == arg,
        "$gt": v > arg,
        "$gte": v >= arg,
        "$lt": v < arg,
        "$lte": v <= arg,
    }[op]


def _eval_leaf(row: dict, field: str, cond) -> bool:
    v = row[field]
    if cond is None:
        return v is None  # bare null matches null/missing
    if not isinstance(cond, dict):
        return v is not None and v == cond
    ok = True
    for op, arg in cond.items():
        if op in ("$eq", "$ne", "$gt", "$gte", "$lt", "$lte"):
            ok &= _cmp_match(v, op, arg)
        elif op == "$in":
            ok &= _in_match(v, arg)
        elif op == "$nin":
            ok &= not _in_match(v, arg)
        elif op == "$exists":
            ok &= (v is not None) if arg else (v is None)
        elif op == "$not":
            # two-valued: $not matches exactly when the body does not
            ok &= not _eval_leaf(row, field, arg)
    return ok


def _eval(row: dict, cond: dict) -> bool:
    out = True
    for key, val in cond.items():
        if key == "$and":
            out &= all(_eval(row, c) for c in val)
        elif key == "$or":
            out &= any(_eval(row, c) for c in val)
        elif key == "$nor":
            out &= not any(_eval(row, c) for c in val)
        else:
            out &= _eval_leaf(row, key, val)
    return out


@pytest.fixture(scope="module")
def universe(spark):
    df = spark.createDataFrame(
        [(i, r["a"], r["b"], r["s"]) for i, r in enumerate(ROWS)],
        "rid INT, a INT, b INT, s STRING",
    )
    df.persist().count()
    return df


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(preds=st.lists(_predicates(), min_size=4, max_size=8))
def test_match_translation_agrees_with_python_semantics(universe, preds):
    import pyspark.sql.functions as F

    # One action for the whole batch: tag each row with a bitmask of
    # which predicates keep it.
    cols = [
        F.when(translate_match(p), 1).otherwise(0).alias(f"p{i}")
        for i, p in enumerate(preds)
    ]
    got = universe.select("rid", *cols).collect()
    for i, p in enumerate(preds):
        spark_keep = {r["rid"] for r in got if r[f"p{i}"] == 1}
        py_keep = {i2 for i2, row in enumerate(ROWS) if _eval(row, p)}
        assert spark_keep == py_keep, f"predicate {p!r}"


# ---------------------------------------------------------------------------
# $group accumulator semantics: random rows with nulls must aggregate
# exactly as Mongo's documented accumulator rules (nulls ignored by
# $sum/$avg/$min/$max; $sum of an all-null group is 0, $avg/min/max null).
# ---------------------------------------------------------------------------
_GVALS = st.sampled_from([0, 1, 5, -3, None])
_GKEYS = st.sampled_from(["k1", "k2", "k3"])


def _py_group(rows):
    out = {}
    for k, v in rows:
        g = out.setdefault(k, [])
        if v is not None:
            g.append(v)
    res = {}
    for k, vals in out.items():
        res[k] = {
            "s": sum(vals) if vals else 0,  # Mongo $sum: all-null -> 0
            "mn": min(vals) if vals else None,
            "mx": max(vals) if vals else None,
            "n": len([1 for kk, _ in rows if kk == k]),  # $count counts docs
        }
    return res


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(_GKEYS, _GVALS), min_size=1, max_size=20))
def test_group_accumulators_match_mongo_semantics(spark, rows):
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )

    df = spark.createDataFrame(rows, "k STRING, v INT")
    got = {
        r["_id"]: r
        for r in translate_pipeline(
            [
                {
                    "$group": {
                        "_id": "$k",
                        "s": {"$sum": "$v"},
                        "mn": {"$min": "$v"},
                        "mx": {"$max": "$v"},
                        "n": {"$count": {}},
                    }
                }
            ]
        )(df).collect()
    }
    expected = _py_group(rows)
    assert set(got) == set(expected)
    for k, e in expected.items():
        r = got[k]
        assert r["s"] == e["s"], (k, "sum")  # all-null group -> 0, not null
        assert r["mn"] == e["mn"] and r["mx"] == e["mx"]
        assert r["n"] == e["n"]


# ---------------------------------------------------------------------------
# Aggregation-EXPRESSION semantics: random integer expression trees
# ($add/$subtract/$multiply/$abs/$min/$max/$ifNull/$cond over BSON-order
# comparisons) must evaluate exactly as a pure-Python evaluator of
# Mongo's documented rules — null-propagating arithmetic, null-ignoring
# $min/$max, truthiness in $cond, and null-lowest total-order
# comparisons ({$gt: [1, null]} is TRUE, not SQL null).
# ---------------------------------------------------------------------------
_E_INTS = st.sampled_from([-3, 0, 1, 2, 7])
_E_FIELDS = st.sampled_from(["$a", "$b"])


def _exprs() -> st.SearchStrategy:
    leaf = st.one_of(_E_INTS, _E_FIELDS, st.just(None))

    def node(children):
        two = st.lists(children, min_size=2, max_size=2)
        cmp_op = st.sampled_from(["$gt", "$gte", "$lt", "$lte", "$eq", "$ne"])
        return st.one_of(
            two.map(lambda cs: {"$add": cs}),
            two.map(lambda cs: {"$subtract": cs}),
            two.map(lambda cs: {"$multiply": cs}),
            children.map(lambda c: {"$abs": c}),
            two.map(lambda cs: {"$min": cs}),
            two.map(lambda cs: {"$max": cs}),
            two.map(lambda cs: {"$ifNull": cs}),
            st.tuples(cmp_op, two).map(lambda t: {"$cond": [{t[0]: t[1]}, 1, 0]}),
            st.tuples(two, two).map(
                lambda t: {"$cond": [{"$and": [{"$gt": t[0]}, {"$lte": t[1]}]}, 1, 0]}
            ),
        )

    return st.recursive(leaf, node, max_leaves=6)


def _bson_cmp_py(x, y) -> int:
    kx = (0,) if x is None else (1, x)
    ky = (0,) if y is None else (1, y)
    return (kx > ky) - (kx < ky)


def _truthy(v) -> bool:
    return not (v is None or v is False or v == 0)


def _ev(row: dict, e):
    if e is None or isinstance(e, int):
        return e
    if isinstance(e, str):
        return row.get(e[1:])
    [(op, arg)] = e.items()
    if op in ("$add", "$subtract", "$multiply"):
        vs = [_ev(row, a) for a in arg]
        if any(v is None for v in vs):
            return None
        if op == "$add":
            return vs[0] + vs[1]
        if op == "$subtract":
            return vs[0] - vs[1]
        return vs[0] * vs[1]
    if op == "$abs":
        v = _ev(row, arg)
        return None if v is None else abs(v)
    if op in ("$min", "$max"):
        vs = [v for v in (_ev(row, a) for a in arg) if v is not None]
        if not vs:
            return None
        return min(vs) if op == "$min" else max(vs)
    if op == "$ifNull":
        v = _ev(row, arg[0])
        return v if v is not None else _ev(row, arg[1])
    if op == "$cond":
        return _ev(row, arg[1]) if _truthy(_ev(row, arg[0])) else _ev(row, arg[2])
    if op in ("$gt", "$gte", "$lt", "$lte"):
        c = _bson_cmp_py(_ev(row, arg[0]), _ev(row, arg[1]))
        return {"$gt": c > 0, "$gte": c >= 0, "$lt": c < 0, "$lte": c <= 0}[op]
    if op == "$eq":
        return _ev(row, arg[0]) == _ev(row, arg[1])
    if op == "$ne":
        return _ev(row, arg[0]) != _ev(row, arg[1])
    if op == "$and":
        return all(_truthy(_ev(row, a)) for a in arg)
    raise AssertionError(op)


_E_ROWS = [
    {"a": a, "b": b}
    for a in [-5, 0, 3, 42, None]
    for b in [-1, 0, 7, None]
]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(exprs=st.lists(_exprs(), min_size=4, max_size=8))
def test_expression_translation_agrees_with_python_semantics(spark, exprs):
    import pyspark.sql.functions as F

    from pymongo_change_stream_reader_spark.plans.pipeline import translate_expr

    df = spark.createDataFrame(
        [(i, r["a"], r["b"]) for i, r in enumerate(_E_ROWS)],
        "rid INT, a BIGINT, b BIGINT",
    )
    cols = [
        translate_expr(e).cast("long").alias(f"e{i}") for i, e in enumerate(exprs)
    ]
    got = df.select("rid", *cols).collect()
    for i, e in enumerate(exprs):
        for r in got:
            expect = _ev(_E_ROWS[r["rid"]], e)
            if isinstance(expect, bool):
                expect = int(expect)
            assert r[f"e{i}"] == expect, (e, _E_ROWS[r["rid"]])
