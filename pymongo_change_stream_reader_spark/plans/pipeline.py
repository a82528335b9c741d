"""MongoDB aggregation-pipeline -> DataFrame translator (SURVEY §2.B).

The reference accepts an arbitrary change-stream pipeline as Extended
JSON and pushes it verbatim to the server (reference: settings.py:48,
69-76,85-90; change_stream_reading/watch.py:79).  This engine instead
*translates* the pipeline onto DataFrame operations, which hands the
predicates/projections to Catalyst — so pushdown into the source scan
(the optimization the reference gets from mongod) happens
automatically (SURVEY §4).

Supported surface (change-stream-legal stages):
  $match    — full predicate language: comparison ($eq $ne $gt $gte
              $lt $lte, incl. Mongo's null-literal equality class),
              membership ($in $nin), boolean ($and $or $not $nor),
              $exists, $regex (+$options), array ($size $all
              $elemMatch with operator or field-document bodies),
              $mod, $expr
  $project  — inclusion (incl. default _id, nested dotted output) /
              exclusion / computed fields
  $addFields / $set — add or overwrite columns
  $unset    — drop fields
  $replaceRoot / $replaceWith — promote a struct column to root
General aggregation stages (not change-stream-legal, SURVEY §2.B
breadth): $group, $unwind (incl. nested paths), $sort, $skip,
$limit, $count, $sortByCount, $bucket, $bucketAuto,
$setWindowFields, $fill, $densify, $facet, $lookup, $unionWith,
$graphLookup ($lookup/$unionWith/$graphLookup resolve foreign frames
via ``translate_pipeline(..., tables={...})``), and terminal $out
(``sinks={...}``).  System variables $$ROOT/$$CURRENT are bound in
stage expressions.
Aggregation expressions inside $project/$addFields/$expr/$cond:
  field paths ("$a.b"), literals, $literal, $concat, $toUpper,
  $toLower, $substr, $strLenCP, $split, arithmetic ($add $subtract
  $multiply $divide $mod $abs $ceil $floor $round), comparisons,
  boolean ops, $cond, $ifNull, $dateToString, $toString/$toInt/
  $toLong/$toDouble/$toDate, $size, $in, $trim/$ltrim/$rtrim,
  $indexOfCP, $arrayElemAt, $slice, and the array higher-order
  operators $map/$filter/$reduce with $$variable scoping.

Unsupported operators raise ``PipelineError`` at build time
(validation mirrors reference settings.py:69-76) — never silently
mis-translate.
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable, Sequence
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class PipelineError(ValueError):
    """Invalid or unsupported pipeline construct."""


def _regex_with_options(pattern: str, options: str) -> str:
    """Prefix the pattern with inline flags for Mongo's regex options
    — i/m/s/x all have exact Java inline equivalents.  An unknown
    option letter raises instead of silently mis-translating."""
    if not options:
        return pattern
    bad = set(options) - set("imsx")
    if bad:
        raise PipelineError(
            f"unsupported regex option(s) {''.join(sorted(bad))!r}"
        )
    flags = "".join(sorted(set(options)))
    return f"(?{flags}){pattern}"


def _regex_group_count(pattern: str) -> int:
    """Capture-group count of a literal regex, for $regexFind*
    `captures` arrays.  Python's compiler when it parses (it accepts
    the overwhelming Java-compatible subset); otherwise a scanner
    that counts unescaped capturing ``(`` outside character classes
    — ``(?`` opens a group only in the named forms ``(?<name>`` /
    ``(?P<name>``."""
    try:
        return re.compile(pattern).groups
    except re.error:
        n = 0
        i = 0
        in_class = False
        while i < len(pattern):
            ch = pattern[i]
            if ch == "\\":
                i += 2
                continue
            if in_class:
                if ch == "]":
                    in_class = False
            elif ch == "[":
                in_class = True
            elif ch == "(":
                rest = pattern[i + 1:]
                if not rest.startswith("?"):
                    n += 1
                elif rest.startswith(("?<", "?P<")) and not rest.startswith(
                    ("?<=", "?<!")
                ):
                    n += 1
            i += 1
        return n


# ---------------------------------------------------------------------------
# Validation (reference: settings.py:69-76 validate_mongo_pipeline).
# ---------------------------------------------------------------------------
def parse_pipeline(pipeline: str | Sequence[dict]) -> list[dict]:
    if isinstance(pipeline, str):
        try:
            pipeline = json.loads(pipeline)
        except json.JSONDecodeError as exc:
            raise PipelineError(f"pipeline is not valid JSON: {exc}") from exc
    if not isinstance(pipeline, (list, tuple)):
        raise PipelineError("pipeline must be a list of stages")
    for stage in pipeline:
        if not isinstance(stage, dict) or len(stage) != 1:
            raise PipelineError(f"each stage must be a single-key dict: {stage!r}")
    return list(pipeline)


# ---------------------------------------------------------------------------
# Aggregation-expression translation.
# ---------------------------------------------------------------------------
_MONGO_DATE_TOKENS = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%L": "SSS", "%j": "DDD",
}


def _date_format(fmt: str) -> str:
    for mongo, spark in _MONGO_DATE_TOKENS.items():
        fmt = fmt.replace(mongo, spark)
    if "%" in fmt:
        raise PipelineError(f"unsupported $dateToString token in {fmt!r}")
    return fmt


def _bson_compare(a: Column, b: Column) -> Column:
    """Three-way comparator under BSON total order: null ranks lowest
    (first ascending, last descending).  Declared deviation: NaN
    follows Spark's total order (above all numbers) rather than BSON's
    (below all numbers) — NaN cannot enter through a Mongo pipeline
    literal, only through a pre-existing NaN column value."""
    return (
        F.when(a.isNull() & b.isNull(), F.lit(0))
        .when(a.isNull(), F.lit(-1))
        .when(b.isNull(), F.lit(1))
        .when(a < b, F.lit(-1))
        .when(a > b, F.lit(1))
        .otherwise(F.lit(0))
    )


def _millis_of(d: Column) -> Column:
    """Mongo millisecond-of-second (0..999) of a timestamp — floored
    mod, because Spark's % takes the dividend's sign and pre-1970
    timestamps would otherwise yield -999..0 (same double-mod pattern
    as $dateTrunc).  Shared by $millisecond and both $dateToParts
    forms so the fix cannot drift between copies."""
    return (
        ((F.unix_micros(d) % 1_000_000 + 1_000_000) % 1_000_000) / 1000
    ).cast("int")


def translate_expr(expr: Any, env: dict[str, Column] | None = None) -> Column:
    """Aggregation expression -> Column.  ``env`` scopes ``$$var``
    references introduced by $map/$filter/$reduce."""
    env = env or {}
    if isinstance(expr, str) and expr.startswith("$$"):
        name, _, path = expr[2:].partition(".")
        if name == "NOW" and "NOW" not in env:
            # system variable: the statement timestamp (Mongo fixes it
            # per aggregation; Spark's current_timestamp is likewise
            # fixed per query execution)
            if path:
                raise PipelineError(
                    f"$$NOW is a timestamp, not a document — no field "
                    f"path {path!r}"
                )
            return F.current_timestamp()
        if name == "CLUSTER_TIME" and "CLUSTER_TIME" not in env:
            raise PipelineError(
                "$$CLUSTER_TIME is a replica-set oplog timestamp with no "
                "engine analog; use $$NOW or the clusterTime event field"
            )
        if name not in env:
            raise PipelineError(f"unbound variable {expr!r}")
        col = env[name]
        return _get_path(col, path) if path else col
    if isinstance(expr, str) and expr.startswith("$"):
        return F.col(expr[1:])
    if isinstance(expr, (int, float, bool)) or expr is None:
        return F.lit(expr)
    if isinstance(expr, str):
        return F.lit(expr)
    if isinstance(expr, list):
        return F.array(*[translate_expr(e, env) for e in expr])
    if isinstance(expr, dict) and expr and not any(
        isinstance(k, str) and k.startswith("$") for k in expr
    ):
        # document literal with embedded expressions -> struct
        return F.struct(
            *[translate_expr(v, env).alias(k) for k, v in expr.items()]
        )
    if not isinstance(expr, dict) or len(expr) != 1:
        raise PipelineError(f"unsupported expression: {expr!r}")

    [(op, arg)] = expr.items()
    args: list[Any] = arg if isinstance(arg, list) else [arg]

    def tx(i: int) -> Column:
        return translate_expr(args[i], env)

    match op:
        case "$literal":
            return F.lit(arg)
        case "$meta":
            # Only the $vectorSearch score is meaningful here (there is
            # no $text index); the stage leaves the score in a hidden
            # column that the pipeline epilogue drops if unreferenced.
            # Declared limitation: referencing it with no live
            # $vectorSearch upstream (or after a stage that drops the
            # hidden column, e.g. $group) surfaces as Spark's
            # unresolved-column analysis error — translate_expr has no
            # frame to validate against.
            if arg != "vectorSearchScore":
                raise PipelineError(
                    f"unsupported $meta kind {arg!r} (only "
                    "'vectorSearchScore' exists in this engine)"
                )
            return F.col(_VS_SCORE_COL)
        case "$concat":
            return F.concat(*[translate_expr(a, env) for a in args])
        case "$toUpper":
            return F.upper(tx(0))
        case "$toLower":
            return F.lower(tx(0))
        case "$substr" | "$substrCP":
            # Mongo is 0-based; Spark substring is 1-based.
            return F.substring(tx(0), translate_expr(args[1], env) + F.lit(1), tx(2))
        case "$strLenCP":
            return F.length(tx(0))
        case "$split":
            # Mongo's delimiter is a literal string; F.split takes a
            # Java regex, so '.', '|', '+' etc. must be escaped
            # (re.escape only backslash-escapes non-alphanumerics,
            # which Java regex accepts).
            if not isinstance(args[1], str) or args[1].startswith("$"):
                raise PipelineError("$split requires a literal string delimiter")
            return F.split(tx(0), re.escape(args[1]), -1)
        case "$add":
            out = tx(0)
            for i in range(1, len(args)):
                out = out + tx(i)
            return out
        case "$subtract":
            return tx(0) - tx(1)
        case "$multiply":
            out = tx(0)
            for i in range(1, len(args)):
                out = out * tx(i)
            return out
        case "$divide":
            return tx(0) / tx(1)
        case "$mod":
            return tx(0) % tx(1)
        case "$abs":
            return F.abs(tx(0))
        case "$ceil":
            return F.ceil(tx(0))
        case "$floor":
            return F.floor(tx(0))
        case "$round":
            place = args[1] if len(args) > 1 else 0
            return F.round(tx(0), place)
        case "$eq":
            # Mongo's aggregation comparisons use the total sort order
            # where null equals null (and never returns null itself) —
            # the null-safe operator, not SQL three-valued equality.
            return tx(0).eqNullSafe(tx(1))
        case "$ne":
            return ~tx(0).eqNullSafe(tx(1))
        case "$gt":
            # BSON total order: null ranks below every value, so e.g.
            # {$gt: [1, null]} is TRUE (not SQL's null) — same contract
            # as $cmp and the null-safe $eq above
            return _bson_compare(tx(0), tx(1)) > 0
        case "$gte":
            return _bson_compare(tx(0), tx(1)) >= 0
        case "$lt":
            return _bson_compare(tx(0), tx(1)) < 0
        case "$lte":
            return _bson_compare(tx(0), tx(1)) <= 0
        case "$and":
            # Mongo boolean operators apply truthiness per operand:
            # null/missing is FALSE, and the result is always a
            # boolean, never SQL null.  Declared narrower: operands
            # must be boolean-typed expressions — Mongo's numeric
            # truthiness (0 falsy, nonzero truthy) needs runtime type
            # dispatch the static schema doesn't carry.
            out = F.coalesce(tx(0), F.lit(False))
            for i in range(1, len(args)):
                out = out & F.coalesce(tx(i), F.lit(False))
            return out
        case "$or":
            out = F.coalesce(tx(0), F.lit(False))
            for i in range(1, len(args)):
                out = out | F.coalesce(tx(i), F.lit(False))
            return out
        case "$not":
            return ~F.coalesce(tx(0), F.lit(False))
        case "$cond":
            if isinstance(arg, dict):
                return F.when(
                    translate_expr(arg["if"], env), translate_expr(arg["then"], env)
                ).otherwise(translate_expr(arg["else"], env))
            return F.when(tx(0), tx(1)).otherwise(tx(2))
        case "$ifNull":
            return F.coalesce(*[translate_expr(a, env) for a in args])
        case "$dateToString":
            if not isinstance(arg, dict) or "date" not in arg:
                raise PipelineError("$dateToString takes {date, format?}")
            # Mongo's default format is the ISO-8601 form with
            # millisecond precision and a literal Z (session is UTC);
            # the Java pattern needs the literal T/Z quoted
            fmt_str = (
                _date_format(arg["format"])
                if "format" in arg
                else "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
            )
            formatted = F.date_format(
                translate_expr(arg["date"], env), fmt_str
            )
            if "onNull" in arg:
                return F.coalesce(
                    formatted, translate_expr(arg["onNull"], env)
                )
            return formatted
        case "$toString":
            return tx(0).cast("string")
        case "$toInt":
            return tx(0).cast("int")
        case "$toLong":
            return tx(0).cast("long")
        case "$toDouble":
            return tx(0).cast("double")
        case "$toBool":
            return tx(0).cast("boolean")
        case "$size":
            return F.size(tx(0))
        case "$in":
            return F.array_contains(translate_expr(args[1], env), tx(0))
        case "$trim" | "$ltrim" | "$rtrim":
            inp = translate_expr(arg["input"], env)
            chars = arg.get("chars")
            if chars is None:
                fn = {"$trim": F.trim, "$ltrim": F.ltrim, "$rtrim": F.rtrim}
                return fn[op](inp)
            if not isinstance(chars, str):
                raise PipelineError(f"{op} chars must be a literal string")
            if op == "$trim":
                return F.call_function("btrim", inp, F.lit(chars))
            # SQL 2-arg forms: ltrim(trimStr, str) / rtrim(trimStr, str)
            return F.call_function(op[1:], F.lit(chars), inp)
        case "$toDate":
            return tx(0).cast("timestamp")
        case "$indexOfCP":
            # Mongo returns 0-based, -1 when absent; instr is 1-based, 0
            return F.instr(tx(0), args[1]) - 1
        case "$arrayElemAt":
            idx = args[1]
            if not isinstance(idx, int):
                raise PipelineError("$arrayElemAt requires a literal index")
            # Mongo is 0-based (negatives from the end) and yields
            # missing out-of-bounds; try_element_at is 1-based with the
            # same negative convention and nulls out-of-bounds
            return F.try_element_at(tx(0), F.lit(idx + 1 if idx >= 0 else idx))
        case "$slice":
            # Mongo forms: [arr, n] (n<0 = last |n| elements) and
            # [arr, position, n] (position<0 counts from the end and
            # clamps to the start when |position| > len; n must be
            # positive).  Signs decide the translation, so the
            # count/position must be literal ints.
            arr = tx(0)
            if len(args) == 2:
                n = args[1]
                if not isinstance(n, int):
                    raise PipelineError("$slice count must be a literal integer")
                if n >= 0:
                    return F.slice(arr, 1, n)
                # last |n|: Spark's negative start errors when |start| >
                # len, Mongo returns the whole array — clamp explicitly.
                return F.when(
                    F.size(arr) <= F.lit(-n), arr
                ).otherwise(F.slice(arr, n, -n))
            pos, n = args[1], args[2]
            if not isinstance(pos, int) or not isinstance(n, int):
                raise PipelineError(
                    "$slice position and count must be literal integers"
                )
            if n <= 0:
                raise PipelineError("$slice count must be positive in 3-arg form")
            if pos >= 0:
                return F.slice(arr, pos + 1, n)
            # negative position: both are |pos|-from-the-end 1-based,
            # but Mongo clamps to the array start when |pos| > len.
            return F.when(
                F.size(arr) < F.lit(-pos), F.slice(arr, 1, n)
            ).otherwise(F.slice(arr, pos, n))
        case "$switch":
            out = None
            for branch in arg["branches"]:
                cond = translate_expr(branch["case"], env)
                then = translate_expr(branch["then"], env)
                out = F.when(cond, then) if out is None else out.when(cond, then)
            if "default" in arg:
                out = out.otherwise(translate_expr(arg["default"], env))
            return out
        case "$let":
            inner_env = dict(env)
            for name, val in arg["vars"].items():
                inner_env[name] = translate_expr(val, env)
            return translate_expr(arg["in"], inner_env)
        case "$range":
            step = translate_expr(args[2], env) if len(args) > 2 else F.lit(1)
            # Mongo $range is end-exclusive; Spark sequence is inclusive
            return F.sequence(tx(0), translate_expr(args[1], env) - 1, step)
        case "$concatArrays":
            return F.concat(*[translate_expr(a, env) for a in args])
        case "$setUnion":
            out = tx(0)
            for i in range(1, len(args)):
                out = F.array_union(out, tx(i))
            return F.array_sort(out)
        case "$setIntersection":
            out = tx(0)
            for i in range(1, len(args)):
                out = F.array_intersect(out, tx(i))
            return F.array_sort(out)
        case "$setDifference":
            return F.array_sort(F.array_except(tx(0), tx(1)))
        case "$indexOfArray":
            # Mongo: 0-based, -1 absent; array_position: 1-based, 0 absent
            return (
                F.array_position(tx(0), translate_expr(args[1], env)) - 1
            ).cast("int")
        case "$first":
            return F.try_element_at(tx(0), F.lit(1))
        case "$last":
            return F.try_element_at(tx(0), F.lit(-1))
        case "$reverseArray":
            return F.reverse(tx(0))
        case "$sum" if len(args) == 1:
            # array form: {"$sum": "$scores"} sums the array's elements
            return F.aggregate(
                tx(0), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
        case "$avg" if len(args) == 1:
            total = F.aggregate(
                tx(0), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            return total / F.greatest(F.size(tx(0)), F.lit(1))
        case "$map":
            var = arg.get("as", "this")
            return F.transform(
                translate_expr(arg["input"], env),
                _lambda1(arg["in"], var, env),
            )
        case "$filter":
            var = arg.get("as", "this")
            return F.filter(
                translate_expr(arg["input"], env),
                _lambda1(arg["cond"], var, env),
            )
        case "$reduce":
            return F.aggregate(
                translate_expr(arg["input"], env),
                translate_expr(arg["initialValue"], env),
                _lambda2(arg["in"], env),
            )
        case "$pow":
            return F.pow(tx(0), tx(1))
        case "$sqrt":
            return F.sqrt(tx(0))
        case "$exp":
            return F.exp(tx(0))
        case "$ln":
            return F.log(tx(0))
        case "$log10":
            return F.log10(tx(0))
        case "$log":
            # Mongo $log: [number, base]
            return F.log(tx(0)) / F.log(tx(1))
        case "$sin" | "$cos" | "$tan" | "$asin" | "$acos" | "$atan" | \
                "$sinh" | "$cosh" | "$tanh" | "$asinh" | "$acosh" | "$atanh":
            return getattr(F, op[1:])(tx(0))
        case "$atan2":
            return F.atan2(tx(0), tx(1))
        case "$degreesToRadians":
            return F.radians(tx(0))
        case "$radiansToDegrees":
            return F.degrees(tx(0))
        case "$bitAnd":
            out = tx(0)
            for i in range(1, len(args)):
                out = out.bitwiseAND(tx(i))
            return out
        case "$bitOr":
            out = tx(0)
            for i in range(1, len(args)):
                out = out.bitwiseOR(tx(i))
            return out
        case "$bitXor":
            out = tx(0)
            for i in range(1, len(args)):
                out = out.bitwiseXOR(tx(i))
            return out
        case "$bitNot":
            return F.bitwise_not(tx(0))
        case "$strcasecmp":
            a, b = F.lower(tx(0)), F.lower(tx(1))
            return (
                F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))
            )
        case "$replaceAll":
            find = arg.get("find")
            if not isinstance(find, str):
                raise PipelineError("$replaceAll requires a literal find string")
            # F.replace is LITERAL on both sides — regexp_replace would
            # interpret $/\ in the replacement as group references
            # (Mongo treats both find and replacement literally)
            return F.replace(
                translate_expr(arg["input"], env),
                F.lit(find),
                translate_expr(arg["replacement"], env),
            )
        case "$replaceOne":
            find = arg.get("find")
            if not isinstance(find, str):
                raise PipelineError("$replaceOne requires a literal find string")
            inp = translate_expr(arg["input"], env)
            rep = translate_expr(arg["replacement"], env)
            pos = F.instr(inp, find)  # 1-based, 0 = not found
            return F.when(pos == 0, inp).otherwise(
                F.concat(
                    F.substring(inp, F.lit(1), pos - 1),
                    rep,
                    F.substr(inp, pos + len(find)),
                )
            )
        case "$setIsSubset":
            return F.size(F.array_except(F.array_distinct(tx(0)), tx(1))) == 0
        case "$setEquals":
            first_set = F.array_distinct(tx(0))
            out = F.lit(True)
            for i in range(1, len(args)):
                cur = F.array_distinct(tx(i))
                out = (
                    out
                    & (F.size(F.array_except(first_set, cur)) == 0)
                    & (F.size(F.array_except(cur, first_set)) == 0)
                )
            return out
        case "$anyElementTrue" | "$allElementsTrue":
            # Mongo truthiness: false/null/0 are falsy, everything else
            # truthy.  Supported element types here: boolean / numeric
            # (strings would need Mongo's always-truthy rule, which a
            # boolean cast cannot express — declared narrower).
            arr = tx(0)
            truthy = lambda x: F.coalesce(x.cast("boolean"), F.lit(False))  # noqa: E731
            return (
                F.exists(arr, truthy)
                if op == "$anyElementTrue"
                else F.forall(arr, truthy)
            )
        case "$isoWeekYear":
            # ISO week-numbering year = calendar year of the Thursday
            # in the date's ISO week (weeks run Mon..Sun).
            d = tx(0)
            iso_dow = ((F.dayofweek(d) + F.lit(5)) % 7) + 1
            return F.year(F.date_add(d, F.lit(4) - iso_dow))
        case "$dateToParts":
            if not isinstance(arg, dict) or "date" not in arg:
                raise PipelineError("$dateToParts requires {date: <expr>}")
            if arg.get("iso8601"):
                # ISO week-date parts: isoWeekYear is the calendar year
                # of the Thursday in the date's ISO week; isoWeek /
                # isoDayOfWeek reuse the $isoWeek/$isoDayOfWeek forms.
                d = translate_expr(arg["date"], env)
                iso_dow = ((F.dayofweek(d) + F.lit(5)) % 7) + 1
                return F.struct(
                    F.year(F.date_add(d, F.lit(4) - iso_dow)).alias(
                        "isoWeekYear"
                    ),
                    F.weekofyear(d).alias("isoWeek"),
                    iso_dow.alias("isoDayOfWeek"),
                    F.hour(d).alias("hour"),
                    F.minute(d).alias("minute"),
                    F.second(d).alias("second"),
                    _millis_of(d).alias("millisecond"),
                )
            d = translate_expr(arg["date"], env)
            return F.struct(
                F.year(d).alias("year"),
                F.month(d).alias("month"),
                F.dayofmonth(d).alias("day"),
                F.hour(d).alias("hour"),
                F.minute(d).alias("minute"),
                F.second(d).alias("second"),
                _millis_of(d).alias("millisecond"),
            )
        case "$trunc":
            place = args[1] if len(args) > 1 else 0
            if not isinstance(place, int) or place < 0:
                raise PipelineError("$trunc requires a literal place >= 0")
            if place == 0:
                return tx(0).cast("long")
            scale = F.lit(10**place)
            return (tx(0) * scale).cast("long") / scale
        case "$regexMatch":
            pattern = _regex_with_options(arg["regex"], arg.get("options", ""))
            return translate_expr(arg["input"], env).rlike(pattern)
        case "$max" if len(args) == 1:
            return F.array_max(tx(0))
        case "$min" if len(args) == 1:
            return F.array_min(tx(0))
        case "$max":
            # multi-arg form: max of the operands, nulls ignored
            return F.greatest(*[translate_expr(a, env) for a in args])
        case "$min":
            return F.least(*[translate_expr(a, env) for a in args])
        case "$toDecimal":
            return tx(0).cast("decimal(38,10)")
        case "$isArray":
            return F.typeof(tx(0)).startswith("array")
        case "$type":
            # Expression $type: the BSON type NAME of the operand.
            # typeof() is constant per column data type, so the CASE
            # folds to a literal (plus the per-row null test) — same
            # zero-cost contract as the $match $type predicate.
            c = tx(0)
            t = F.typeof(c)
            name_expr = F.lit("object")  # struct/map fall-through
            for bson, sparks in _BSON_TYPES.items():
                if bson == "number":
                    continue
                cond = None
                for sn in sparks:
                    alt = (
                        (t == sn)
                        | t.startswith(sn + "<")
                        | t.startswith(sn + "(")
                    )
                    cond = alt if cond is None else (cond | alt)
                name_expr = F.when(cond, F.lit(bson)).otherwise(name_expr)
            return F.when(c.isNull(), F.lit("null")).otherwise(name_expr)
        case "$isNumber":
            t = F.typeof(tx(0))
            return (
                t.isin("int", "bigint", "smallint", "tinyint", "double", "float")
                | t.startswith("decimal")
            )
        case "$year":
            return F.year(tx(0))
        case "$month":
            return F.month(tx(0))
        case "$dayOfMonth":
            return F.dayofmonth(tx(0))
        case "$dayOfYear":
            return F.dayofyear(tx(0))
        case "$dayOfWeek":
            # Both Mongo and Spark use 1=Sunday .. 7=Saturday.
            return F.dayofweek(tx(0))
        case "$isoWeek":
            return F.weekofyear(tx(0))
        case "$isoDayOfWeek":
            # Mongo ISO: 1=Monday .. 7=Sunday.
            return (F.dayofweek(tx(0)) + 5) % 7 + 1
        case "$hour":
            return F.hour(tx(0))
        case "$minute":
            return F.minute(tx(0))
        case "$second":
            return F.second(tx(0))
        case "$millisecond":
            return _millis_of(tx(0))
        case "$dateTrunc":
            # Mongo bins anchored at the reference point
            # 2000-01-01T00:00:00Z; for unit week the anchor shifts to
            # the first `startOfWeek` on or after it (2000-01-01 was a
            # Saturday).  binSize must be a literal positive integer.
            bin_size = arg.get("binSize", 1)
            if (
                isinstance(bin_size, bool)
                or not isinstance(bin_size, int)
                or bin_size < 1
            ):
                raise PipelineError(
                    "$dateTrunc binSize must be a positive integer literal"
                )
            if arg.get("timezone") not in (None, "UTC", "+00", "+00:00", "Z"):
                raise PipelineError(
                    "$dateTrunc timezone other than UTC is not supported"
                )
            unit = arg["unit"]
            d = translate_expr(arg["date"], env)
            if unit in ("month", "quarter", "year"):
                if bin_size == 1:
                    return F.date_trunc(_date_unit(unit), d)
                step = {"month": 1, "quarter": 3, "year": 12}[unit] * bin_size
                months = (F.year(d) - F.lit(2000)) * 12 + (F.month(d) - 1)
                k = months - ((months % step) + step) % step
                return F.add_months(
                    F.to_date(F.lit("2000-01-01")), k
                ).cast("timestamp")
            if unit == "week":
                sow = str(arg.get("startOfWeek", "sunday")).lower()
                anchors = {
                    "saturday": "2000-01-01", "sunday": "2000-01-02",
                    "monday": "2000-01-03", "tuesday": "2000-01-04",
                    "wednesday": "2000-01-05", "thursday": "2000-01-06",
                    "friday": "2000-01-07",
                }
                anchors.update({k[:3]: v for k, v in list(anchors.items())})
                if sow not in anchors:
                    raise PipelineError(
                        f"$dateTrunc invalid startOfWeek {sow!r}"
                    )
                import datetime as _dt

                anchor_us = int(
                    _dt.datetime.fromisoformat(
                        anchors[sow] + "T00:00:00+00:00"
                    ).timestamp()
                ) * 1_000_000
            else:
                if unit not in _UNIT_SECONDS:
                    raise PipelineError(f"unsupported date unit {unit!r}")
                if bin_size == 1:
                    return F.date_trunc(_date_unit(unit), d)
                # 2000-01-01T00:00:00Z = 946684800s, a whole multiple
                # of every fixed sub-week unit.
                anchor_us = 946_684_800 * 1_000_000
            width = round(
                _UNIT_SECONDS["week" if unit == "week" else unit] * 1_000_000
            ) * bin_size
            x = F.unix_micros(d) - F.lit(anchor_us)
            off = ((x % width) + width) % width
            return F.timestamp_micros(F.unix_micros(d) - off)
        case "$dateAdd":
            return F.timestamp_add(
                _date_unit(arg["unit"]),
                translate_expr(arg["amount"], env),
                translate_expr(arg["startDate"], env),
            )
        case "$dateSubtract":
            return F.timestamp_add(
                _date_unit(arg["unit"]),
                -translate_expr(arg["amount"], env),
                translate_expr(arg["startDate"], env),
            )
        case "$dateDiff":
            return _date_diff(
                translate_expr(arg["startDate"], env),
                translate_expr(arg["endDate"], env),
                _date_unit(arg["unit"]),
            )
        case "$dateFromString":
            if not isinstance(arg, dict) or "dateString" not in arg:
                raise PipelineError("$dateFromString requires dateString")
            if "timezone" in arg:
                raise PipelineError(
                    "$dateFromString timezone is not translated (the "
                    "engine session is pinned to UTC)"
                )
            ds = translate_expr(arg["dateString"], env)
            fmt = (
                [_date_format(arg["format"])] if "format" in arg else []
            )
            if "onError" in arg:
                # try_to_timestamp: a malformed string falls back to
                # onError instead of failing the query (Mongo errors
                # without onError — so does the strict path below)
                parsed = F.coalesce(
                    F.try_to_timestamp(ds, *[F.lit(f) for f in fmt]),
                    translate_expr(arg["onError"], env),
                )
            else:
                parsed = F.to_timestamp(ds, *fmt)
            if "onNull" in arg:
                # Mongo: a NULL dateString takes onNull, not onError
                return F.when(ds.isNull(), translate_expr(arg["onNull"], env)).otherwise(parsed)
            return parsed
        case "$dateFromParts":
            if not isinstance(arg, dict):
                raise PipelineError("$dateFromParts takes a document")
            iso_form = "isoWeekYear" in arg
            if not iso_form and "year" not in arg:
                raise PipelineError(
                    "$dateFromParts requires 'year' or 'isoWeekYear'"
                )
            known = (
                {"isoWeekYear", "isoWeek", "isoDayOfWeek", "hour",
                 "minute", "second", "millisecond"}
                if iso_form
                else {"year", "month", "day", "hour", "minute", "second",
                      "millisecond"}
            )
            extra = set(arg) - known
            if extra:
                # timezone (and mixing the two calendars) not translated
                raise PipelineError(
                    f"unsupported $dateFromParts fields {sorted(extra)!r}"
                )

            def _part(name: str, default: int) -> Column:
                if name in arg:
                    return translate_expr(arg[name], env).cast("int")
                return F.lit(default)

            if iso_form:
                # ISO week-date calendar: week 1 always contains Jan 4;
                # pure date arithmetic so out-of-range isoWeek /
                # isoDayOfWeek CARRY like Mongo's (isoWeek 60 flows
                # into the next ISO year)
                iso_year = translate_expr(arg["isoWeekYear"], env).cast("int")
                anchor = F.make_date(iso_year, F.lit(1), F.lit(4))
                week1_monday = F.date_sub(anchor, F.weekday(anchor))
                date = F.date_add(
                    week1_monday,
                    (_part("isoWeek", 1) - F.lit(1)) * F.lit(7)
                    + (_part("isoDayOfWeek", 1) - F.lit(1)),
                )
            else:
                year = translate_expr(arg["year"], env).cast("int")
                # Date arithmetic (add_months / date_add) instead of
                # make_timestamp so out-of-range parts CARRY like
                # Mongo's (month 14 -> next year Feb; day 0 -> last
                # day of the previous month).
                date = F.date_add(
                    F.add_months(
                        F.make_date(year, F.lit(1), F.lit(1)),
                        _part("month", 1) - F.lit(1),
                    ),
                    _part("day", 1) - F.lit(1),
                )
            return date.cast("timestamp") + F.make_dt_interval(
                F.lit(0),
                _part("hour", 0),
                _part("minute", 0),
                _part("second", 0).cast("double")
                + _part("millisecond", 0).cast("double") / F.lit(1000.0),
            )
        case "$objectToArray":
            # Map column -> [{k, v}] (Mongo's document ≙ MapType here;
            # struct inputs would need schema access at translate time)
            return F.transform(
                F.map_entries(tx(0)),
                lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
            )
        case "$arrayToObject":
            return F.map_from_entries(
                F.transform(tx(0), lambda e: F.struct(e["k"], e["v"]))
            )
        case "$zip":
            inputs = [translate_expr(a, env) for a in arg["inputs"]]
            # Mongo yields an array of [x, y] pairs; the Spark-typed
            # analog is an array of structs (heterogeneous element
            # types cannot share one array type)
            return F.arrays_zip(*inputs)
        case "$sortArray":
            by = arg.get("sortBy")
            inp = translate_expr(arg["input"], env)
            if by in (1, -1):
                # Mongo's BSON total order ranks null LOWEST (first
                # asc, last desc); Spark's bare array_sort puts nulls
                # last asc, so sort with an explicit nulls-lowest
                # comparator instead.
                sorted_arr = F.array_sort(inp, _bson_compare)
                return sorted_arr if by == 1 else F.reverse(sorted_arr)
            if (
                isinstance(by, dict)
                and by
                and all(d in (1, -1) for d in by.values())
            ):
                # Document sortBy over an array of documents: compare
                # the listed fields in spec order, each under the BSON
                # null-lowest total order with its own direction; a
                # null ELEMENT ranks lowest too (its field access is
                # null on every key).
                fields = list(by.items())

                def doc_cmp(a: Column, b: Column) -> Column:
                    # _get_path resolves dotted keys into nested structs
                    cmps = [
                        _bson_compare(_get_path(a, f), _get_path(b, f))
                        if d == 1
                        else -_bson_compare(_get_path(a, f), _get_path(b, f))
                        for f, d in fields
                    ]
                    res = cmps[-1]
                    for c in reversed(cmps[:-1]):
                        res = F.when(c != 0, c).otherwise(res)
                    return res

                return F.array_sort(inp, doc_cmp)
            raise PipelineError(
                "$sortArray sortBy must be 1 / -1 or a document of "
                "field: 1 / -1 directions"
            )
        case "$firstN" | "$lastN" | "$minN" | "$maxN":
            n = arg.get("n")
            if not isinstance(n, int) or n < 1:
                raise PipelineError(f"{op} requires a literal n >= 1")
            arr = translate_expr(arg["input"], env)
            if op == "$firstN":
                return F.slice(arr, 1, n)
            if op == "$lastN":
                return F.when(F.size(arr) <= n, arr).otherwise(
                    F.slice(arr, -n, n)
                )
            # $minN / $maxN ignore nulls, as in Mongo
            nonnull = F.filter(arr, lambda x: x.isNotNull())
            ordered = (
                F.array_sort(nonnull)
                if op == "$minN"
                else F.reverse(F.array_sort(nonnull))
            )
            return F.slice(ordered, 1, n)
        case "$tsSecond":
            # BSON Timestamp rides as STRUCT<t, i> (schema.py CLUSTER_TIME)
            return tx(0).getField("t").cast("long")
        case "$tsIncrement":
            return tx(0).getField("i").cast("long")
        case "$getField":
            if isinstance(arg, str):
                raise PipelineError("$getField requires {field, input}")
            field_name = arg.get("field")
            if not isinstance(field_name, str):
                raise PipelineError("$getField field must be a literal string")
            return translate_expr(arg["input"], env).getField(field_name)
        case "$cmp":
            return _bson_compare(tx(0), tx(1))
        case "$week":
            # Mongo $week == strftime %U: Sunday-first weeks, days
            # before the year's first Sunday are week 0.
            d = tx(0)
            return F.floor(
                (F.dayofyear(d) + F.lit(7) - F.dayofweek(d)) / F.lit(7)
            ).cast("int")
        case "$strLenBytes":
            return F.octet_length(tx(0))
        case "$binarySize":
            return F.octet_length(tx(0))
        case "$bsonSize":
            # Document byte size; declared deviation: sized as the
            # document's JSON serialization (the engine's wire format,
            # per the envelope contract), not BSON framing.  Null
            # input -> null, as in Mongo.
            return F.octet_length(F.to_json(tx(0)))
        case "$substrBytes":
            # Exact byte semantics via binary substring.  Splitting a
            # multi-byte codepoint yields replacement chars where Mongo
            # errors — declared deviation (no error channel in a column).
            start = translate_expr(args[1], env)
            return F.substring(
                tx(0).cast("binary"), start + F.lit(1), tx(2)
            ).cast("string")
        case "$indexOfBytes":
            # Byte offset of the first occurrence: find the character
            # position, then count the bytes preceding it.
            s, sub = tx(0), tx(1)
            pos = F.instr(s, sub)  # 1-based chars, 0 = absent
            return F.when(pos == 0, F.lit(-1)).otherwise(
                F.octet_length(F.substring(s, F.lit(1), pos - 1))
            )
        case "$mergeObjects":
            # Map-typed documents; later operands win per key (Mongo's
            # last-write rule, including explicit nulls), null operands
            # are ignored.
            def _last_wins(nxt_col: Column):
                return lambda k, v1, v2: F.when(
                    F.map_contains_key(nxt_col, k), v2
                ).otherwise(v1)

            out = tx(0)
            for i in range(1, len(args)):
                nxt = tx(i)
                merged = F.map_zip_with(out, nxt, _last_wins(nxt))
                out = (
                    F.when(nxt.isNull(), out)
                    .when(out.isNull(), nxt)
                    .otherwise(merged)
                )
            return out
        case "$setField":
            field = arg.get("field")
            if not isinstance(field, str):
                raise PipelineError("$setField field must be a literal string")
            doc = translate_expr(arg["input"], env)
            val = translate_expr(arg["value"], env)
            return F.map_from_entries(
                F.array_append(
                    F.filter(
                        F.map_entries(doc), lambda e: e["key"] != field
                    ),
                    F.struct(
                        F.lit(field).alias("key"), val.alias("value")
                    ),
                )
            )
        case "$unsetField":
            field = arg.get("field")
            if not isinstance(field, str):
                raise PipelineError("$unsetField field must be a literal string")
            doc = translate_expr(arg["input"], env)
            return F.map_from_entries(
                F.filter(F.map_entries(doc), lambda e: e["key"] != field)
            )
        case "$regexFind":
            pattern = _regex_with_options(arg["regex"], arg.get("options", ""))
            n_caps = _regex_group_count(arg["regex"])
            inp = translate_expr(arg["input"], env)
            m = F.regexp_substr(inp, F.lit(pattern))
            idx = F.regexp_instr(inp, F.lit(pattern)) - 1
            # Full Mongo shape {match, idx, captures}; the pattern is a
            # translate-time literal so the capture-group count is
            # static.  Declared deviation: a non-participating group
            # yields "" where Mongo yields null (Spark regexp_extract
            # cannot distinguish the two).
            caps = (
                F.array(
                    *[
                        F.regexp_extract(inp, pattern, g)
                        for g in range(1, n_caps + 1)
                    ]
                )
                if n_caps
                else F.array().cast("array<string>")
            )
            return F.when(
                m.isNotNull(),
                F.struct(
                    m.alias("match"),
                    idx.alias("idx"),
                    caps.alias("captures"),
                ),
            )
        case "$regexFindAll":
            pattern = _regex_with_options(arg["regex"], arg.get("options", ""))
            n_caps = _regex_group_count(arg["regex"])
            inp = translate_expr(arg["input"], env)
            lit_pat = F.lit(pattern)
            matches = F.regexp_extract_all(inp, lit_pat, F.lit(0))
            # Per-group arrays are index-aligned with `matches` (one
            # entry per match), so the documents zip positionally.
            grp_arrays = [
                F.regexp_extract_all(inp, lit_pat, F.lit(g))
                for g in range(1, n_caps + 1)
            ]
            # Match offsets: scan forward locating each match string
            # after the previous match's end — exact for self-locating
            # patterns; a lookaround/anchor that lets the same literal
            # occur earlier WITHOUT matching can bias idx low
            # (declared deviation; match/captures are always exact).
            positions = F.aggregate(
                matches,
                F.struct(
                    F.lit(1).alias("p"),
                    F.array().cast("array<int>").alias("out"),
                ),
                lambda acc, m: F.struct(
                    (
                        F.call_function("locate", m, inp, acc["p"])
                        + F.greatest(F.length(m), F.lit(1))
                    ).alias("p"),
                    F.concat(
                        acc["out"],
                        F.array(
                            F.call_function("locate", m, inp, acc["p"])
                            - 1
                        ),
                    ).alias("out"),
                ),
                lambda acc: acc["out"],
            )
            docs = F.transform(
                matches,
                lambda m, i: F.struct(
                    m.alias("match"),
                    F.get(positions, i).alias("idx"),
                    (
                        F.array(*[F.get(g_arr, i) for g_arr in grp_arrays])
                        if n_caps
                        else F.array().cast("array<string>")
                    ).alias("captures"),
                ),
            )
            # Mongo: null/missing input -> [] (not null)
            return F.coalesce(
                F.when(inp.isNotNull(), docs),
                F.array().cast(
                    "array<struct<match:string,idx:int,captures:array<string>>>"
                ),
            )
        case "$percentile" | "$median" if isinstance(arg, dict) and "input" in arg:
            # Mongo 7.0 aggregation-expression form over an ARRAY input
            # (the accumulator/window forms live in $group /
            # $setWindowFields).  Computed EXACTLY with Spark's
            # linear-interpolation definition — the same contract as
            # the group-form $percentile here (Mongo's 'approximate'
            # method is a t-digest; exact is a tighter answer).  Null
            # elements are ignored; an empty/all-null input -> null.
            if op == "$percentile":
                ps = arg.get("p")
                if not (
                    isinstance(ps, list)
                    and ps
                    and all(
                        isinstance(p, (int, float))
                        and not isinstance(p, bool)
                        and 0 <= p <= 1
                        for p in ps
                    )
                ):
                    raise PipelineError(
                        "$percentile requires p: [numbers in 0..1]"
                    )
            else:
                ps = [0.5]
            sorted_nn = F.array_sort(
                F.filter(
                    F.transform(
                        translate_expr(arg["input"], env),
                        lambda x: x.cast("double"),
                    ),
                    lambda x: x.isNotNull(),
                )
            )
            n = F.size(sorted_nn)

            def one_pct(p: float) -> Column:
                # linear interpolation between closest ranks, matching
                # F.percentile / DuckDB quantile_cont
                idx = (n - 1).cast("double") * F.lit(float(p))
                lo = F.floor(idx)
                frac = idx - lo
                # try_element_at: the n==0 guard below cannot stop the
                # out-of-range probe from evaluating under ANSI mode
                lo_v = F.try_element_at(sorted_nn, (lo + 1).cast("int"))
                hi_v = F.try_element_at(
                    sorted_nn, (F.ceil(idx) + 1).cast("int")
                )
                interp = lo_v + (hi_v - lo_v) * frac
                return F.when(n > 0, interp)

            if op == "$median":
                return one_pct(0.5)
            return F.when(
                n > 0, F.array(*[one_pct(p) for p in ps])
            )
        case "$stdDevPop" | "$stdDevSamp" if len(args) == 1:
            # Array form; nulls ignored, as in the accumulator.
            vals = F.filter(tx(0), lambda x: x.isNotNull())
            n = F.size(vals).cast("double")
            s = F.aggregate(
                vals, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            )
            ss = F.aggregate(
                vals,
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
            if op == "$stdDevPop":
                return F.when(
                    n > 0, F.sqrt(ss / n - (s / n) * (s / n))
                )
            return F.when(
                n > 1, F.sqrt((ss - s * s / n) / (n - F.lit(1.0)))
            )
        case "$convert":
            to_types = {
                "string": "string",
                "int": "int",
                "long": "long",
                "double": "double",
                "decimal": "decimal(38,10)",
                "bool": "boolean",
                "date": "timestamp",
            }
            if arg.get("to") not in to_types:
                raise PipelineError(f"unsupported $convert target {arg.get('to')!r}")
            converted = translate_expr(arg["input"], env).try_cast(
                to_types[arg["to"]]
            )
            if "onNull" in arg or "onError" in arg:
                # try_cast folds conversion errors into null, so one
                # coalesce serves both fallbacks (onError first, per
                # Mongo's precedence when both are set).
                fallback = translate_expr(
                    arg.get("onError", arg.get("onNull")), env
                )
                return F.coalesce(converted, fallback)
            return converted
        case "$rand":
            raise PipelineError(
                "$rand is nondeterministic by definition and cannot be "
                "reproduced across retries/partitions; use $sampleRate "
                "or $sample (declared-deterministic) instead"
            )
        case "$function" | "$accumulator":
            raise PipelineError(
                f"{op} embeds server-side JavaScript, which this engine "
                "does not execute; register a pandas UDF through the "
                "functions facade for custom per-row/accumulator logic"
            )
        case _:
            raise PipelineError(f"unsupported expression operator {op!r}")


# Mongo $date* units -> Spark unit tokens (timestamp_add/date_trunc).
_DATE_UNITS = {
    "year": "YEAR",
    "quarter": "QUARTER",
    "month": "MONTH",
    "week": "WEEK",
    "day": "DAY",
    "hour": "HOUR",
    "minute": "MINUTE",
    "second": "SECOND",
    "millisecond": "MILLISECOND",
}


def _date_unit(unit: Any) -> str:
    if unit not in _DATE_UNITS:
        raise PipelineError(f"unsupported date unit {unit!r}")
    return _DATE_UNITS[unit]


def _date_diff(start: Column, end: Column, unit: str) -> Column:
    """Mongo $dateDiff counts UNIT-BOUNDARY CROSSINGS between the two
    instants (2 x 23:59 -> 3 x 00:01 is one day), not complete elapsed
    units — so truncate both ends to the unit before differencing
    instead of using timestamp_diff (which counts full units)."""
    if unit == "YEAR":
        return (F.year(end) - F.year(start)).cast("long")
    if unit == "QUARTER":
        return (
            (F.year(end) - F.year(start)) * 4 + F.quarter(end) - F.quarter(start)
        ).cast("long")
    if unit == "MONTH":
        return (
            (F.year(end) - F.year(start)) * 12 + F.month(end) - F.month(start)
        ).cast("long")
    if unit == "DAY":
        return F.datediff(end.cast("date"), start.cast("date")).cast("long")
    if unit == "WEEK":
        # Boundary = start of week; datediff of week-truncated dates / 7.
        return (
            F.datediff(
                F.date_trunc("WEEK", end).cast("date"),
                F.date_trunc("WEEK", start).cast("date"),
            )
            / 7
        ).cast("long")
    secs = {"HOUR": 3600, "MINUTE": 60, "SECOND": 1, "MILLISECOND": 0.001}[unit]
    trunc_unit = unit if unit != "MILLISECOND" else "SECOND"
    lo = F.unix_micros(F.date_trunc(trunc_unit, start))
    hi = F.unix_micros(F.date_trunc(trunc_unit, end))
    if unit == "MILLISECOND":
        return ((F.unix_micros(end) - F.unix_micros(start)) / 1000).cast("long")
    return ((hi - lo) / F.lit(int(secs * 1_000_000))).cast("long")


# BSON type name -> Spark typeof() names (exact, or parametrized prefix
# like array<...> / decimal(...)).
_BSON_TYPES = {
    "string": ("string",),
    "int": ("int", "smallint", "tinyint"),
    "long": ("bigint",),
    "double": ("double", "float"),
    "decimal": ("decimal",),
    "bool": ("boolean",),
    "date": ("timestamp", "timestamp_ntz"),
    "array": ("array",),
    "object": ("struct",),
    "binData": ("binary",),
    "number": ("int", "smallint", "tinyint", "bigint", "double", "float", "decimal"),
}


def _type_predicate(col: Column, val: Any) -> Column:
    """$type on a typed column: Spark's typeof() is constant per column
    data type, so Catalyst folds this predicate to true/false at
    optimization time — zero per-row cost (reference surface 2.B;
    change streams admit $type via $match passthrough)."""
    names = val if isinstance(val, list) else [val]
    preds: list[Column] = []
    for name in names:
        if name == "null":
            preds.append(col.isNull())
            continue
        if name not in _BSON_TYPES:
            raise PipelineError(f"unsupported $type name {name!r}")
        t = F.typeof(col)
        alts: list[Column] = []
        for spark_name in _BSON_TYPES[name]:
            alts.append(
                (t == spark_name)
                | t.startswith(spark_name + "<")
                | t.startswith(spark_name + "(")
            )
        type_ok = alts[0]
        for a in alts[1:]:
            type_ok = type_ok | a
        preds.append(type_ok & col.isNotNull())
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _lambda1(body: Any, var: str, env: dict) -> "Callable[[Column], Column]":
    """One-arg lambda factory binding $$<var> (PySpark derives HOF
    arity from the Python signature)."""

    def fn(x: Column) -> Column:
        return translate_expr(body, {**env, var: x})

    return fn


def _lambda2(body: Any, env: dict) -> "Callable[[Column, Column], Column]":
    """Two-arg lambda for $reduce binding $$value / $$this."""

    def fn(acc: Column, x: Column) -> Column:
        return translate_expr(body, {**env, "value": acc, "this": x})

    return fn


# ---------------------------------------------------------------------------
# $match predicate translation.
# ---------------------------------------------------------------------------
_CMP = {
    "$eq": lambda c, v: c == v,
    # Mongo $ne is two-valued: a null/missing field does NOT equal the
    # literal, so it MATCHES (same rule as $nin below) — plain SQL !=
    # would return NULL and drop the row.
    "$ne": lambda c, v: (c != v) | c.isNull(),
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
}


def _two_valued(pred: Column) -> Column:
    """Collapse SQL three-valued logic to Mongo's two-valued match
    semantics before negation: a NULL comparison means 'does not
    match', so ~NULL must be TRUE, not NULL.  (Found by the hypothesis
    property test: {$nor: [{a: {$eq: v}}]} must KEEP rows with a null
    `a`.)"""
    return F.coalesce(pred, F.lit(False))


def _cmp_predicate(op: str, col: Column, val: Any) -> Column:
    """One comparison operator with Mongo's null-literal semantics:
    {$eq: null} (and bare null) matches null/missing fields, {$ne:
    null} matches only present non-null fields, and because null sits
    in its own type bracket, {$gte/$lte: null} also matches only null
    while the strict {$gt/$lt: null} match nothing (plain SQL
    comparison against NULL would silently drop every row — the
    inverted-translation bug this special case exists for)."""
    if val is None:
        if op in ("$eq", "$gte", "$lte"):
            return col.isNull()
        if op == "$ne":
            return col.isNotNull()
        return F.lit(False)  # $gt / $lt
    return _CMP[op](col, F.lit(val))


def _field_predicate(path: str, cond: Any) -> Column:
    return _predicate_on(F.col(path), cond, path)


def _predicate_on(col: Column, cond: Any, path: str) -> Column:
    """Full $match operator document applied to an arbitrary Column
    (top-level field or an $elemMatch array element)."""
    if cond is None:
        # bare null matches null/missing (ADVICE r1: col == NULL
        # matches nothing)
        return col.isNull()
    if not isinstance(cond, dict) or not any(
        isinstance(k, str) and k.startswith("$") for k in cond
    ):
        # bare value: equality (including dict literals without operators)
        return col == F.lit(cond)

    preds: list[Column] = []
    for op, val in cond.items():
        if op in _CMP:
            preds.append(_cmp_predicate(op, col, val))
        elif op == "$in":
            # a null in the list matches null/missing fields
            rest = [v for v in val if v is not None]
            p = col.isin(*rest) if rest else F.lit(False)
            if any(v is None for v in val):
                p = p | col.isNull()
            preds.append(p)
        elif op == "$nin":
            rest = [v for v in val if v is not None]
            p = ~col.isin(*rest) if rest else F.lit(True)
            if any(v is None for v in val):
                # null listed: null/missing fields are IN the list
                preds.append(p & col.isNotNull())
            else:
                preds.append(p | col.isNull())
        elif op == "$exists":
            preds.append(col.isNotNull() if val else col.isNull())
        elif op == "$regex":
            pattern = val
            options = cond.get("$options", "")
            if "i" in options:
                pattern = f"(?i){pattern}"
            preds.append(col.rlike(pattern))
        elif op == "$options":
            continue  # consumed by $regex
        elif op == "$not":
            preds.append(~_two_valued(_predicate_on(col, val, path)))
        elif op == "$size":
            preds.append(F.size(col) == F.lit(val))
        elif op == "$all":
            for item in val:
                preds.append(F.array_contains(col, F.lit(item)))
        elif op == "$elemMatch":
            preds.append(F.exists(col, _element_matcher(val)))
        elif op == "$mod":
            divisor, remainder = val
            preds.append(col % F.lit(divisor) == F.lit(remainder))
        elif op == "$type":
            preds.append(_type_predicate(col, val))
        elif op in ("$bitsAllSet", "$bitsAllClear", "$bitsAnySet", "$bitsAnyClear"):
            # Bitmask query operators over INTEGER fields (BinData
            # masks declared out of scope — no BSON binary reaches the
            # relational surface).  Accepts a non-negative int mask or
            # an array of bit positions; null/missing fields never
            # match, as in Mongo.
            if isinstance(val, list):
                if not all(
                    isinstance(p, int) and not isinstance(p, bool) and 0 <= p <= 63
                    for p in val
                ):
                    raise PipelineError(
                        f"{op} positions must be integers in 0..63 "
                        "(fields are 64-bit; BinData masks are out of scope)"
                    )
                mask = 0
                for p in val:
                    mask |= 1 << p
                if mask >= 1 << 63:
                    # position 63 is the sign bit: fold to the signed
                    # two's-complement long the JVM bitwiseAND expects
                    mask -= 1 << 64
            elif (
                isinstance(val, int)
                and not isinstance(val, bool)
                and 0 <= val < 1 << 63
            ):
                mask = val
            else:
                raise PipelineError(
                    f"{op} takes a non-negative int64 mask or a "
                    "position array"
                )
            masked = col.cast("long").bitwiseAND(F.lit(mask))
            preds.append(
                {
                    "$bitsAllSet": masked == mask,
                    "$bitsAllClear": masked == 0,
                    "$bitsAnySet": masked != 0,
                    "$bitsAnyClear": masked != mask,
                }[op]
            )
        else:
            raise PipelineError(f"unsupported $match operator {op!r} on {path!r}")
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def _element_matcher(cond: Any) -> Callable[[Column], Column]:
    """Single-argument lambda factory for F.exists (PySpark derives the
    higher-order-function arity from the Python signature)."""

    def matcher(elem: Column) -> Column:
        return _element_predicate(elem, cond)

    return matcher


def _get_path(col: Column, path: str) -> Column:
    return reduce(lambda c, part: c.getField(part), path.split("."), col)


def _element_predicate(elem: Column, cond: Any) -> Column:
    """$elemMatch body applied to an array element.  Two Mongo forms:
    an operator doc ({$gt: 5, $lt: 9}) applied to the element itself,
    or a field doc ({qty: {$gte: 5}, "a.b": 1}) whose predicates apply
    to the (struct) element's fields."""
    if not isinstance(cond, dict):
        return elem == F.lit(cond)
    op_keys = [k for k in cond if isinstance(k, str) and k.startswith("$")]
    if op_keys and len(op_keys) != len(cond):
        raise PipelineError("$elemMatch cannot mix operator and field keys")
    if op_keys or not cond:
        return _predicate_on(elem, cond, "<element>")
    preds = [
        _two_valued(_predicate_on(_get_path(elem, k), v, k))
        for k, v in cond.items()
    ]
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def translate_match(cond: dict) -> Column:
    if not isinstance(cond, dict):
        raise PipelineError("$match takes a document")
    preds: list[Column] = []
    for key, val in cond.items():
        if key == "$and":
            sub = [translate_match(v) for v in val]
        elif key == "$or":
            sub = None
            out = translate_match(val[0])
            for v in val[1:]:
                out = out | translate_match(v)
            preds.append(out)
            continue
        elif key == "$nor":
            out = translate_match(val[0])
            for v in val[1:]:
                out = out | translate_match(v)
            preds.append(~_two_valued(out))
            continue
        elif key == "$not":
            preds.append(~_two_valued(translate_match(val)))
            continue
        elif key == "$expr":
            preds.append(translate_expr(val))
            continue
        elif key == "$where":
            raise PipelineError(
                "$where embeds server-side JavaScript, which this engine "
                "does not execute; express the predicate with $expr"
            )
        elif key == "$comment":
            continue  # query annotation — a no-op, as on the server
        elif key in ("$text", "$jsonSchema"):
            raise PipelineError(
                f"{key} requires server-side index/metadata state with "
                "no engine analog ($text: use $regex or the text "
                "operators; $jsonSchema: use $type predicates)"
            )
        elif key.startswith("$"):
            raise PipelineError(f"unsupported top-level $match operator {key!r}")
        else:
            preds.append(_field_predicate(key, val))
            continue
        preds.extend(sub)
    if not preds:
        return F.lit(True)
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


# ---------------------------------------------------------------------------
# Stage application.
# ---------------------------------------------------------------------------
def _nest_tree(paths: dict[str, Column]) -> list[Column]:
    """Dotted output paths -> nested-struct select list, preserving
    Mongo's {a: {b: ...}} shape ({"a.b": col} becomes
    struct(col AS b) AS a).  Path collisions ("a" and "a.b") raise,
    as Mongo does."""
    tree: dict[str, Any] = {}
    for path, col in paths.items():
        parts = path.split(".")
        node = tree
        for part in parts[:-1]:
            nxt = node.setdefault(part, {})
            if not isinstance(nxt, dict):
                raise PipelineError(f"$project path collision at {path!r}")
            node = nxt
        if parts[-1] in node:
            raise PipelineError(f"$project path collision at {path!r}")
        node[parts[-1]] = col

    def build(node: dict[str, Any]) -> list[Column]:
        return [
            (F.struct(*build(sub)) if isinstance(sub, dict) else sub).alias(name)
            for name, sub in node.items()
        ]

    return build(tree)


def _classify_project_spec(spec: dict) -> tuple[dict, list, list]:
    """Split a $project spec into (computed, included, excluded) —
    shared by the top-level stage and the $merge update-pipeline form
    so the 0/1/expression classification cannot diverge."""
    computed = {
        k: v
        for k, v in spec.items()
        if not isinstance(v, (int, bool)) or v not in (0, 1)
    }
    included = [
        k for k, v in spec.items() if isinstance(v, (int, bool)) and v in (1, True)
    ]
    excluded = [
        k for k, v in spec.items() if isinstance(v, (int, bool)) and v in (0, False)
    ]
    return computed, included, excluded


def _apply_project(df: DataFrame, spec: dict) -> DataFrame:
    if not spec:
        raise PipelineError("$project requires at least one field")
    computed, included, excluded = _classify_project_spec(spec)
    if included or computed:
        # Mongo rejects mixed inclusion/exclusion except for _id: 0.
        bad = [k for k in excluded if k != "_id"]
        if bad:
            raise PipelineError(
                f"cannot exclude {bad!r} in an inclusion $project"
            )
        out: dict[str, Column] = {}
        # _id rides along by default in inclusion mode (when the frame
        # has one and the spec doesn't say _id: 0).
        if (
            "_id" in df.columns
            and "_id" not in excluded
            and "_id" not in included
            and "_id" not in computed
        ):
            out["_id"] = F.col("_id")
        for k in included:
            out[k] = _get_path(F.col(k.split(".", 1)[0]), k.split(".", 1)[1]) \
                if "." in k else F.col(k)
        env = _root_env(df)
        for k, v in computed.items():
            out[k] = translate_expr(v, env)
        return df.select(*_nest_tree(out))
    # exclusion mode: top-level drops plus dropFields for dotted paths.
    for k in excluded:
        if "." in k:
            root, rest = k.split(".", 1)
            df = df.withColumn(root, F.col(root).dropFields(rest))
    return df.drop(*[k for k in excluded if "." not in k])


_GROUP_ACCUMULATORS: dict[str, Callable[[Column], Column]] = {
    # Mongo $sum yields 0 (not null) when the group has no numeric
    # values — caught by the hypothesis $group property test
    "$sum": lambda c: F.coalesce(F.sum(c), F.lit(0)),
    "$avg": F.avg,
    "$min": F.min,
    "$max": F.max,
    # struct-wrapped: collect_list/collect_set DROP nulls, Mongo's
    # $push/$addToSet keep them
    "$push": lambda c: F.transform(
        F.collect_list(F.struct(c.alias("v"))), lambda s: s["v"]
    ),
    # Mongo set order is unspecified; sort for run-to-run determinism
    # (array_sort places nulls last, deterministically)
    "$addToSet": lambda c: F.array_sort(
        F.array_distinct(
            F.transform(F.collect_list(F.struct(c.alias("v"))), lambda s: s["v"])
        )
    ),
    "$first": lambda c: F.first(c, ignorenulls=False),
    "$last": lambda c: F.last(c, ignorenulls=False),
    "$stdDevPop": F.stddev_pop,
    "$stdDevSamp": F.stddev_samp,
}


def _apply_group(df: DataFrame, spec: dict) -> DataFrame:
    """$group -> groupBy().agg().  The `_id` expression becomes the
    grouping key (null = one global group, a sub-document = a struct
    key); each output field is one accumulator.

    Not admissible inside a change-stream pipeline (mongod rejects it
    there) but part of the general aggregation surface (SURVEY §2.B);
    order-sensitive $first/$last follow Spark's first/last over the
    existing partition order — deterministic only after a $sort, as in
    Mongo."""
    if "_id" not in spec:
        raise PipelineError("$group requires an _id expression")
    env = _root_env(df)
    aggs = _group_aggs({k: v for k, v in spec.items() if k != "_id"}, env)
    if not aggs:
        raise PipelineError("$group requires at least one accumulator")

    key = spec["_id"]
    if key is None:
        # groupBy on a constant (not a global .agg) so an EMPTY input
        # yields zero groups — Mongo emits no document at all for
        # {_id: null} over an empty stream, never a default-value row.
        return df.groupBy(F.lit(None).alias("_id")).agg(*aggs)
    if isinstance(key, dict) and not any(
        isinstance(k, str) and k.startswith("$") for k in key
    ):
        # compound key document -> struct
        key_col = F.struct(
            *[translate_expr(v, env).alias(k) for k, v in key.items()]
        )
    else:
        key_col = translate_expr(key, env)
    return df.groupBy(key_col.alias("_id")).agg(*aggs)


def _apply_unwind(df: DataFrame, spec) -> DataFrame:
    if isinstance(spec, str):
        path, preserve, index = spec, False, None
    else:
        path = spec["path"]
        preserve = spec.get("preserveNullAndEmptyArrays", False)
        index = spec.get("includeArrayIndex")
    if not (isinstance(path, str) and path.startswith("$")):
        raise PipelineError("$unwind requires a $-prefixed field path")
    field_name = path[1:]
    if "." in field_name:
        # nested array: explode the leaf, then write the element back
        # at its dotted position (withField handles nested paths)
        root, rest = field_name.split(".", 1)
        if root not in df.columns:
            raise PipelineError(f"$unwind path {path!r}: no column {root!r}")
        if index:
            if "." in index:
                raise PipelineError(
                    "$unwind includeArrayIndex must be a top-level field"
                )
            fn = F.posexplode_outer if preserve else F.posexplode
            return (
                df.select(
                    "*",
                    fn(_get_path(F.col(root), rest)).alias(
                        "__unwound_idx", "__unwound"
                    ),
                )
                .withColumn(root, F.col(root).withField(rest, F.col("__unwound")))
                .withColumn(index, F.col("__unwound_idx").cast("long"))
                .drop("__unwound", "__unwound_idx")
            )
        fn = F.explode_outer if preserve else F.explode
        out = df.select(
            "*", fn(_get_path(F.col(root), rest)).alias("__unwound")
        ).withColumn(root, F.col(root).withField(rest, F.col("__unwound")))
        return out.drop("__unwound")
    if field_name not in df.columns:
        raise PipelineError(f"$unwind path {path!r} must be an array field")
    others = [c for c in df.columns if c != field_name]
    if index:
        fn = F.posexplode_outer if preserve else F.posexplode
        return df.select(
            *others, fn(F.col(field_name)).alias(index, field_name)
        ).withColumn(index, F.col(index).cast("long"))
    fn = F.explode_outer if preserve else F.explode
    return df.select(*others, fn(F.col(field_name)).alias(field_name))


def _sort_cols(spec: dict) -> list[Column]:
    cols = []
    for field_name, direction in spec.items():
        if direction not in (1, -1):
            raise PipelineError("$sort directions must be 1 or -1")
        col = F.col(field_name)
        cols.append(col.asc() if direction == 1 else col.desc())
    return cols


def _apply_lookup(df: DataFrame, spec: dict, tables: dict) -> DataFrame:
    """$lookup (equality form) -> left join against the foreign frame
    with matches collected into an array-of-structs column, [] when no
    match — Mongo's exact output shape.  The $lookup+$unwind idiom
    therefore lowers to a plain join, which Catalyst can broadcast or
    shuffle as sizes dictate."""
    if "pipeline" in spec or "let" in spec:
        if "localField" in spec or "foreignField" in spec:
            # Mongo 5.0+ combined form: localField/foreignField WITH a
            # pipeline.  Desugar exactly as the server docs specify —
            # an implicit let variable bound to the local field and an
            # implicit leading {$match: {$expr: {$eq: [...]}}} — then
            # reuse the let/pipeline machinery (the $eq conjunct
            # becomes a null-safe join key, so the combined form keeps
            # the single-shuffle plan of the equality form).
            if "pipeline" not in spec:
                raise PipelineError(
                    "$lookup with let requires a pipeline"
                )
            if ("localField" in spec) != ("foreignField" in spec):
                raise PipelineError(
                    "$lookup combined form needs BOTH localField and "
                    "foreignField"
                )
            spec = dict(spec)
            let = dict(spec.get("let") or {})
            var = "__implicit_local"
            while var in let:
                var += "_"
            let[var] = "$" + spec.pop("localField")
            implicit = {
                "$match": {
                    "$expr": {
                        "$eq": [f"$${var}", "$" + spec.pop("foreignField")]
                    }
                }
            }
            spec["let"] = let
            spec["pipeline"] = [implicit] + list(spec["pipeline"])
        return _apply_lookup_pipeline(df, spec, tables)
    unsupported = set(spec) - {"from", "localField", "foreignField", "as"}
    if unsupported:
        raise PipelineError(
            f"unsupported $lookup fields {sorted(unsupported)!r}"
        )
    try:
        foreign = tables[spec["from"]]
    except KeyError:
        raise PipelineError(
            f"$lookup from {spec.get('from')!r}: pass the frame via "
            "translate_pipeline(..., tables={name: df})"
        ) from None
    out_col = spec["as"]
    grouped = foreign.groupBy(
        F.col(spec["foreignField"]).alias("__lookup_key")
    ).agg(
        F.collect_list(F.struct(*foreign.columns)).alias(out_col)
    )
    joined = df.join(
        grouped,
        # null-safe: Mongo matches a null/missing localField to
        # foreign docs whose foreignField is null/missing
        F.col(spec["localField"]).eqNullSafe(F.col("__lookup_key")),
        "left",
    ).drop("__lookup_key")
    empty = F.array().cast(
        dict(joined.dtypes)[out_col]
    )
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), empty))


def _lookup_uses_vars(node: Any, names: set[str]) -> bool:
    """True if the pipeline node references any $$let variable."""
    if isinstance(node, str):
        return node.startswith("$$") and node[2:].split(".", 1)[0] in names
    if isinstance(node, dict):
        return any(_lookup_uses_vars(v, names) for v in node.values())
    if isinstance(node, list):
        return any(_lookup_uses_vars(n, names) for n in node)
    return False


def _make_field_cmp(fields: list[str], dirs: list[int]):
    """Comparator over named struct fields for trailing $sort inside a
    $lookup pipeline (BSON null-lowest per field)."""

    def cmp(a: Column, b: Column) -> Column:
        result = F.lit(0)
        for i in reversed(range(len(fields))):
            c = _bson_compare(a[fields[i]], b[fields[i]])
            if dirs[i] == -1:
                c = -c
            result = F.when(c != 0, c).otherwise(result)
        return result

    return cmp


def _apply_lookup_pipeline(df: DataFrame, spec: dict, tables: dict) -> DataFrame:
    """$lookup let/pipeline form.

    Scope (declared; anything else raises):
    - uncorrelated pipeline (no $$let refs): the sub-pipeline runs ONCE
      over the foreign frame and its full result attaches to every
      local row via a broadcast single-row cross join;
    - correlated pipeline: the FIRST stage must be the correlated
      ``{$match: {$expr: ...}}`` whose expression is a conjunction of
      comparisons, each between one $$let variable and one foreign
      field.  $eq conjuncts become join keys (null-safe, matching
      aggregation equality); ordered comparisons become theta
      conditions under BSON total order (null ranks lowest).
      Later stages: row-wise uncorrelated $match/$addFields/$set/$unset
      run on the foreign frame pre-join; a trailing $sort / $limit /
      inclusion-$project triple is applied per matched set on the
      collected array (sort comparator + slice + struct transform).

    Scale: with only $eq conjuncts the foreign side pre-aggregates on
    the key tuple — one shuffle of the foreign table, broadcast- or
    shuffle-joined as sizes dictate, no row-id bookkeeping.  Theta
    conditions fall back to a row-id join + per-row collect (two
    shuffles) — the price of a non-equi correlation in any engine."""
    try:
        foreign = tables[spec["from"]]
    except KeyError:
        raise PipelineError(
            f"$lookup from {spec.get('from')!r}: pass the frame via "
            "translate_pipeline(..., tables={name: df})"
        ) from None
    out_col = spec["as"]
    let_spec = spec.get("let", {})
    pipe = list(spec.get("pipeline", []))
    var_names = set(let_spec)

    def _attach_empty_default(joined: DataFrame) -> DataFrame:
        empty = F.array().cast(dict(joined.dtypes)[out_col])
        return joined.withColumn(
            out_col, F.coalesce(F.col(out_col), empty)
        )

    if not any(_lookup_uses_vars(st, var_names) for st in pipe):
        # Uncorrelated: one execution of the sub-pipeline, one array.
        sub = reduce(
            lambda acc, st: _apply_stage(acc, st, tables), pipe, foreign
        )
        arr = sub.agg(
            F.collect_list(F.struct(*sub.columns)).alias(out_col)
        )
        return _attach_empty_default(df.crossJoin(F.broadcast(arr)))

    if not pipe or set(pipe[0]) != {"$match"} or not (
        isinstance(pipe[0]["$match"], dict)
        and set(pipe[0]["$match"]) == {"$expr"}
    ):
        raise PipelineError(
            "correlated $lookup pipelines must start with the "
            "correlated {$match: {$expr: ...}} stage"
        )
    rest = pipe[1:]
    if any(_lookup_uses_vars(st, var_names) for st in rest):
        raise PipelineError(
            "$lookup: only the first pipeline stage may reference "
            "$$let variables"
        )

    # peel the trailing array-level stages: [$sort] [$limit] [$project]
    array_project = array_limit = array_sort = None
    if rest and set(rest[-1]) == {"$project"}:
        proj = rest.pop()["$project"]
        if not proj or any(v != 1 for v in proj.values()):
            raise PipelineError(
                "trailing $lookup $project supports inclusion specs "
                "({field: 1}) only"
            )
        array_project = list(proj)
    if rest and set(rest[-1]) == {"$limit"}:
        array_limit = rest.pop()["$limit"]
        if not isinstance(array_limit, int) or array_limit < 1:
            raise PipelineError("$limit requires a positive integer")
    if rest and set(rest[-1]) == {"$sort"}:
        array_sort = rest.pop()["$sort"]
        if any(d not in (1, -1) for d in array_sort.values()):
            raise PipelineError("$sort directions must be 1 or -1")

    # decompose the correlated $expr into (op, local $$var, foreign field)
    def conjuncts(e):
        if isinstance(e, dict) and set(e) == {"$and"}:
            out = []
            for c in e["$and"]:
                out.extend(conjuncts(c))
            return out
        return [e]

    local_env = _root_env(df)
    eq_pairs: list[tuple[Column, str]] = []   # (local expr, foreign field)
    theta: list[tuple[str, Column, str]] = []  # (op, local expr, field)
    _CMP = {"$eq", "$ne", "$lt", "$lte", "$gt", "$gte"}
    for c in conjuncts(pipe[0]["$match"]["$expr"]):
        if not (isinstance(c, dict) and len(c) == 1):
            raise PipelineError(f"unsupported correlated $expr term {c!r}")
        [(op, args)] = c.items()
        if op not in _CMP or not isinstance(args, list) or len(args) != 2:
            raise PipelineError(f"unsupported correlated $expr term {c!r}")
        a, b = args

        def _is_var(x):
            return (
                isinstance(x, str)
                and x.startswith("$$")
                and x[2:] in var_names
            )

        def _is_field(x):
            return (
                isinstance(x, str)
                and x.startswith("$")
                and not x.startswith("$$")
            )

        flip = {"$lt": "$gt", "$lte": "$gte", "$gt": "$lt", "$gte": "$lte"}
        if _is_var(a) and _is_field(b):
            var, field = a[2:], b[1:]
        elif _is_var(b) and _is_field(a):
            var, field = b[2:], a[1:]
            op = flip.get(op, op)  # normalize to local-op-foreign
        else:
            raise PipelineError(
                f"correlated $expr term must compare one $$let variable "
                f"with one foreign field: {c!r}"
            )
        lexpr = translate_expr(let_spec[var], local_env)
        if op == "$eq":
            eq_pairs.append((lexpr, field))
        else:
            theta.append((op, lexpr, field))

    # materialize hidden key columns on the foreign side BEFORE the
    # row-wise stages (so $unset etc. cannot break the join), then run
    # the remaining row-wise stages
    fk = foreign
    for i, (_, field) in enumerate(eq_pairs):
        fk = fk.withColumn(f"__lk{i}", F.col(field))
    for i, (_, _, field) in enumerate(theta):
        fk = fk.withColumn(f"__lt{i}", F.col(field))
    _ROW_WISE = {"$match", "$addFields", "$set", "$unset"}
    for st in rest:
        [(name, _)] = st.items()
        if name not in _ROW_WISE:
            raise PipelineError(
                f"unsupported stage {name!r} inside a correlated "
                "$lookup pipeline (row-wise stages plus a trailing "
                "$sort/$limit/$project only)"
            )
        fk = _apply_stage(fk, st, tables)
    # exclude exactly the hidden key columns added above — a prefix
    # test would silently drop a legitimate foreign field that
    # happens to start with "__l"
    hidden_keys = {f"__lk{i}" for i in range(len(eq_pairs))} | {
        f"__lt{i}" for i in range(len(theta))
    }
    struct_cols = [c for c in fk.columns if c not in hidden_keys]
    doc = F.struct(*[F.col(c) for c in struct_cols])

    # hidden local-side key columns avoid any name ambiguity in the
    # join condition
    left = df
    for i, (lexpr, _) in enumerate(eq_pairs):
        left = left.withColumn(f"__ll{i}", lexpr)
    for i, (_, lexpr, _) in enumerate(theta):
        left = left.withColumn(f"__lr{i}", lexpr)

    _THETA_OP = {
        "$ne": lambda c: c != 0,
        "$lt": lambda c: c < 0,
        "$lte": lambda c: c <= 0,
        "$gt": lambda c: c > 0,
        "$gte": lambda c: c >= 0,
    }
    if not theta:
        # equi-only fast path: pre-aggregate the foreign side
        grouped = fk.groupBy(
            *[F.col(f"__lk{i}") for i in range(len(eq_pairs))]
        ).agg(F.collect_list(doc).alias(out_col))
        cond = reduce(
            lambda acc, i: acc
            & F.col(f"__ll{i}").eqNullSafe(F.col(f"__lk{i}")),
            range(1, len(eq_pairs)),
            F.col("__ll0").eqNullSafe(F.col("__lk0")),
        )
        joined = left.join(grouped, cond, "left").drop(
            *[f"__lk{i}" for i in range(len(eq_pairs))],
            *[f"__ll{i}" for i in range(len(eq_pairs))],
        )
    else:
        left = left.withColumn(
            "__lookup_row", F.monotonically_increasing_id()
        )
        # rename the foreign doc columns to hidden names: the local and
        # foreign frames may share column names, and the row-id join
        # keeps both sides' columns in scope
        fk_hidden = fk.select(
            *[
                F.col(c).alias(f"__fd{i}")
                for i, c in enumerate(struct_cols)
            ],
            *[F.col(f"__lk{i}") for i in range(len(eq_pairs))],
            *[F.col(f"__lt{i}") for i in range(len(theta))],
        )
        hidden_doc = F.struct(
            *[
                F.col(f"__fd{i}").alias(c)
                for i, c in enumerate(struct_cols)
            ]
        )
        cond = F.lit(True)
        for i in range(len(eq_pairs)):
            cond = cond & F.col(f"__ll{i}").eqNullSafe(F.col(f"__lk{i}"))
        for i, (op, _, _) in enumerate(theta):
            cond = cond & _THETA_OP[op](
                _bson_compare(F.col(f"__lr{i}"), F.col(f"__lt{i}"))
            )
        matched = (
            left.join(fk_hidden, cond, "inner")
            .groupBy("__lookup_row")
            .agg(F.collect_list(hidden_doc).alias(out_col))
        )
        joined = left.join(matched, "__lookup_row", "left").drop(
            "__lookup_row",
            *[f"__ll{i}" for i in range(len(eq_pairs))],
            *[f"__lr{i}" for i in range(len(theta))],
        )

    arr = F.col(out_col)
    if array_sort is not None:
        arr = F.array_sort(
            arr,
            _make_field_cmp(
                list(array_sort), [d for d in array_sort.values()]
            ),
        )
    if array_limit is not None:
        arr = F.slice(arr, 1, array_limit)
    if array_project is not None:
        arr = F.transform(
            arr,
            lambda x: F.struct(
                *[x[f].alias(f) for f in array_project]
            ),
        )
    joined = joined.withColumn(out_col, arr)
    return _attach_empty_default(joined)


def _apply_bucket(df: DataFrame, spec: dict) -> DataFrame:
    """$bucket: assign by [boundaries[i], boundaries[i+1]) intervals,
    out-of-range to `default`.  Declared deviation: Mongo raises a
    runtime error when a value falls outside the boundaries and no
    default is given; here such documents are dropped (a translate-
    time check cannot see the data) — pass `default` to keep them."""
    bounds = spec.get("boundaries")
    if not isinstance(bounds, list) or len(bounds) < 2 or bounds != sorted(bounds):
        raise PipelineError("$bucket requires >= 2 sorted literal boundaries")
    expr = translate_expr(spec["groupBy"])
    bucket = None
    for lo, hi in zip(bounds, bounds[1:]):
        cond = (expr >= F.lit(lo)) & (expr < F.lit(hi))
        bucket = F.when(cond, F.lit(lo)) if bucket is None else bucket.when(
            cond, F.lit(lo)
        )
    if "default" in spec:
        bucket = bucket.otherwise(F.lit(spec["default"]))
    out = spec.get("output", {"count": {"$sum": 1}})
    return (
        df.withColumn("__bucket", bucket)
        .filter(F.col("__bucket").isNotNull())
        .groupBy(F.col("__bucket").alias("_id"))
        .agg(*_group_aggs(out))
    )


# Preferred-number mantissa tables for $bucketAuto granularity
# (public ISO-3 Renard / IEC-60063 E-series values, as in Mongo's
# granularity rounder).  Longer tables (R40/R80, E24+) are declared
# narrower — rejected with a clear error, not mistranslated.
_GRANULARITY_MANTISSAS: dict[str, list[float]] = {
    "R5": [1.0, 1.6, 2.5, 4.0, 6.3],
    "R10": [1.0, 1.25, 1.6, 2.0, 2.5, 3.15, 4.0, 5.0, 6.3, 8.0],
    "R20": [
        1.0, 1.12, 1.25, 1.4, 1.6, 1.8, 2.0, 2.24, 2.5, 2.8,
        3.15, 3.55, 4.0, 4.5, 5.0, 5.6, 6.3, 7.1, 8.0, 9.0,
    ],
    "1-2-5": [1.0, 2.0, 5.0],
    "E6": [1.0, 1.5, 2.2, 3.3, 4.7, 6.8],
    "E12": [1.0, 1.2, 1.5, 1.8, 2.2, 2.7, 3.3, 3.9, 4.7, 5.6, 6.8, 8.2],
}
_GRANULARITY_UNSUPPORTED = {"R40", "R80", "E24", "E48", "E96", "E192"}


def _granularity_round(x: float, gran: str, up: bool) -> float:
    """Round onto the preferred-number series: largest value <= x when
    rounding down (the first bucket's floor), smallest value STRICTLY
    greater than x when rounding up (bucket maxima are exclusive, so
    the boundary must clear the true max).  Post-checked against the
    raw value so epsilon snapping can never produce a floor above x or
    a ceiling at/below x (either would silently drop boundary docs)."""
    import math

    if not math.isfinite(x):
        raise PipelineError(
            "$bucketAuto granularity requires finite numeric groupBy values"
        )
    if x <= 0:
        # 0 floors to 0; anything must round UP to the series minimum
        return 0.0 if not up else (
            1.0 if gran == "POWERSOF2" else _GRANULARITY_MANTISSAS[gran][0]
        )
    if gran == "POWERSOF2":
        k = math.floor(round(math.log2(x), 9)) + (1 if up else 0)
        out = float(2.0**k)
        if up and out <= x:
            out = float(2.0 ** (k + 1))
        elif not up and out > x:
            out = float(2.0 ** (k - 1))
        return out
    mants = _GRANULARITY_MANTISSAS[gran]
    e = math.floor(round(math.log10(x), 9))
    m = round(x / 10**e, 9)
    if up:
        out = None
        for s in mants:
            if s > m + 1e-9:
                out = round(s * 10.0**e, 12)
                break
        if out is None:
            out = round(mants[0] * 10.0 ** (e + 1), 12)
        if out <= x:  # float-drift guard: the ceiling must clear x
            return _granularity_round(out, gran, up=True)
        return out
    best = None
    for s in mants:
        if s <= m + 1e-9:
            best = s
    out = (
        round(mants[-1] * 10.0 ** (e - 1), 12)
        if best is None  # m below the decade's first mantissa
        else round(best * 10.0**e, 12)
    )
    if out > x:  # float-drift guard: the floor must not exceed x
        idx = mants.index(best) if best is not None else 0
        if best is not None and idx > 0:
            return round(mants[idx - 1] * 10.0**e, 12)
        return round(mants[-1] * 10.0 ** (e - 1), 12)
    return out


def _apply_bucket_auto(df: DataFrame, spec: dict) -> DataFrame:
    """$bucketAuto: ~equal-count buckets; _id is the {min, max} span of
    each bucket (Mongo's approximate contract — boundary placement
    under ties follows the sort, as there).

    The equal-count split uses the DISTRIBUTED rank (range exchange +
    per-partition counts + prefix-sum offsets + NTILE arithmetic,
    operators/ranking.py) rather than ``ntile`` over an unpartitioned
    window — the stage's total order is genuinely required, but the
    scale-safe plan sorts per range-partition instead of serializing
    the table into one task (r3 verdict ask #2).  Bucket membership is
    bit-identical to the single-window plan for the min/max/count
    outputs (ties share a value, and NTILE bucket SIZES are fixed by
    arithmetic); tie PLACEMENT is arbitrary in both plans, exactly as
    in Mongo.  The split is computed eagerly (one pass for counts).

    With ``granularity``, the split only PROPOSES boundaries:
    the first bucket's floor rounds down onto the preferred-number
    series, every bucket's ceiling rounds strictly up, collapsed
    boundaries merge buckets (fewer than requested, as in Mongo), and
    documents re-bucket against the rounded [min, max) spans.  The
    boundary list is model-sized (n+1 values) — the only driver-side
    state — and the re-bucketing is one broadcast-literal CASE pass.
    """
    from pymongo_change_stream_reader_spark.operators.ranking import (
        ntile_from_rank,
        with_global_rank,
    )

    n = spec.get("buckets")
    if not isinstance(n, int) or n < 1:
        raise PipelineError("$bucketAuto requires a positive bucket count")
    expr = translate_expr(spec["groupBy"])
    out = spec.get("output", {"count": {"$sum": 1}})

    def _with_bucket(frame: DataFrame) -> DataFrame:
        ranked, n_rows = with_global_rank(frame, [F.col("__gb")])
        return ranked.withColumn(
            "__bucket", ntile_from_rank(F.col("__rank"), n_rows, n)
        ).drop("__rank")

    gran = spec.get("granularity")
    if gran is not None:
        if gran in _GRANULARITY_UNSUPPORTED:
            raise PipelineError(
                f"granularity {gran!r} not supported (declared narrower); "
                f"supported: {sorted(_GRANULARITY_MANTISSAS)} + POWERSOF2"
            )
        if gran != "POWERSOF2" and gran not in _GRANULARITY_MANTISSAS:
            raise PipelineError(f"unknown granularity {gran!r}")
        stats = (
            _with_bucket(df.withColumn("__gb", expr.cast("double")))
            .groupBy("__bucket")
            .agg(
                F.min("__gb").alias("lo"),
                F.max("__gb").alias("hi"),
                F.count(F.lit(1)).alias("cnt"),
                F.count("__gb").alias("nn"),
            )
            .orderBy("__bucket")
            .collect()
        )  # model-sized: one row per requested bucket
        if any(r["cnt"] != r["nn"] for r in stats):
            # Mongo: granularity requires every groupBy value numeric;
            # a null would otherwise surface as a spurious {_id: null}
            # bucket from the re-bucketing CASE pass
            raise PipelineError(
                "$bucketAuto granularity requires non-null numeric "
                "groupBy values"
            )
        if not stats:
            return (
                df.withColumn("__gb", expr)
                .groupBy(
                    F.struct(
                        F.lit(0.0).alias("min"), F.lit(0.0).alias("max")
                    ).alias("_id")
                )
                .agg(*_group_aggs(out))
                .limit(0)
                .select("_id", *out.keys())
            )
        if any(r["lo"] is None or float(r["lo"]) < 0 for r in stats):
            raise PipelineError(
                "$bucketAuto granularity requires non-negative numeric "
                "groupBy values"
            )
        bounds = [_granularity_round(float(stats[0]["lo"]), gran, up=False)]
        for r in stats:
            b = _granularity_round(float(r["hi"]), gran, up=True)
            if b > bounds[-1]:  # collapsed boundaries merge buckets
                bounds.append(b)
        gb = expr.cast("double")
        bucket_idx: Column = F.lit(None).cast("int")
        for i in range(len(bounds) - 1):
            bucket_idx = F.when(
                (gb >= bounds[i]) & (gb < bounds[i + 1]), F.lit(i)
            ).otherwise(bucket_idx)
        ids = F.array(
            *[
                F.struct(
                    F.lit(bounds[i]).alias("min"),
                    F.lit(bounds[i + 1]).alias("max"),
                )
                for i in range(len(bounds) - 1)
            ]
        )
        return (
            df.withColumn("__gb", gb)
            .withColumn("__bucket", bucket_idx)
            .groupBy("__bucket")
            .agg(*_group_aggs(out))
            .withColumn("_id", F.element_at(ids, F.col("__bucket") + 1))
            .orderBy("__bucket")
            .drop("__bucket")
            .select("_id", *out.keys())
        )
    return (
        _with_bucket(df.withColumn("__gb", expr))
        .groupBy("__bucket")
        .agg(
            F.struct(
                F.min("__gb").alias("min"), F.max("__gb").alias("max")
            ).alias("_id"),
            *_group_aggs(out),
        )
        .drop("__bucket")
        .select("_id", *out.keys())
    )


def _frame_bound(b: Any, default: int) -> int:
    from pyspark.sql import Window as W

    if b == "unbounded":
        return default
    if b == "current":
        return W.currentRow
    if isinstance(b, int):
        return b
    raise PipelineError(f"unsupported window bound {b!r}")


# Time units for $derivative / $integral rate arithmetic (the sortBy
# timestamp casts to epoch seconds).
_UNIT_SECONDS = {
    "week": 604800.0,
    "day": 86400.0,
    "hour": 3600.0,
    "minute": 60.0,
    "second": 1.0,
    "millisecond": 0.001,
}


def _make_ema_fn(alpha: float, field: str, sort_fields: list):
    """$expMovingAvg per-partition kernel: sort by the window's sortBy,
    then pandas' adjust=False/ignore_na=True recursion == Mongo's
    (nulls skipped in the state, null emitted for null inputs)."""

    def ema_fn(pdf):
        order = pdf.sort_values(
            [f for f, _ in sort_fields],
            ascending=[d == 1 for _, d in sort_fields],
            kind="mergesort",
        ).index
        pdf = pdf.loc[order]
        ema = pdf["__ema_in"].ewm(
            alpha=alpha, adjust=False, ignore_na=True
        ).mean()
        pdf[field] = ema.where(pdf["__ema_in"].notna())
        return pdf

    return ema_fn


def _linear_fill(value: Column, key: Column, base) -> Column:
    """Linear interpolation between the nearest non-null neighbours
    along the sort key ($linearFill / $fill method:linear).  Nulls
    before the first or after the last known value stay null, as in
    Mongo.  Two frame-bounded window passes — no self-join."""
    from pyspark.sql import Window as W

    w_back = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = base.rowsBetween(W.currentRow, W.unboundedFollowing)
    v = value.cast("double")
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_k = F.last(F.when(v.isNotNull(), key), ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_k = F.first(F.when(v.isNotNull(), key), ignorenulls=True).over(w_fwd)
    interp = prev_v + (next_v - prev_v) * (key - prev_k) / (next_k - prev_k)
    return (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull() | next_v.isNull(), F.lit(None).cast("double"))
        .otherwise(interp)
    )


def _apply_set_window_fields(df: DataFrame, spec: dict) -> DataFrame:
    """$setWindowFields -> Spark window functions.  partitionBy/sortBy
    map to the window spec; `window.documents` bounds map to
    rowsBetween; rank-family operators ignore frames (as in Mongo).
    Aggregates without an explicit window use Mongo's default — the
    whole partition.  Time-series operators: $locf / $linearFill
    (frame-bounded window passes), $derivative (frame-endpoint deltas),
    $integral (per-pair trapezoid + frame sum; unbounded lower bound
    only), $covariancePop/Samp, and $expMovingAvg (sequential
    recursion -> one Arrow applyInPandas pass per partition)."""
    from pyspark.sql import Window as W

    part = spec.get("partitionBy")
    part_only = (
        W.partitionBy(translate_expr(part))
        if part is not None
        else W.partitionBy(F.lit(1))
    )
    base = part_only
    sort = spec.get("sortBy")
    if sort:
        base = base.orderBy(*_sort_cols(sort))

    def make_frame(win):
        """window.{documents,range} -> a framed WindowSpec (Mongo's
        default without `window` is the whole partition)."""
        if win is not None:
            docs = win.get("documents")
            rng = win.get("range")
            if rng is not None:
                if len(rng) != 2:
                    raise PipelineError("window.range requires [lo, hi]")
                if not sort or len(sort) != 1 or list(sort.values()) != [1]:
                    raise PipelineError(
                        "window.range requires a single ascending sortBy field"
                    )
                unit = win.get("unit")
                if unit:
                    # Date-unit range window (Mongo: sortBy must be a
                    # date; frame covers sort values in
                    # [cur + lo*unit, cur + hi*unit]).  Fixed-width
                    # units map exactly onto rangeBetween over epoch
                    # microseconds of the sort field; calendar units
                    # (year/quarter/month) are not fixed-width and are
                    # declared narrower.
                    if unit not in _UNIT_SECONDS:
                        raise PipelineError(
                            f"window.range unit {unit!r} is not "
                            "fixed-width (year/quarter/month range "
                            "windows are not supported)"
                        )
                    scale = round(_UNIT_SECONDS[unit] * 1_000_000)
                    sfield = next(iter(sort))
                    ordered = part_only.orderBy(
                        F.unix_micros(F.col(sfield).cast("timestamp"))
                    )

                    def unit_bound(b, default):
                        if b == "unbounded":
                            return default
                        if b == "current":
                            return W.currentRow
                        if isinstance(b, bool) or not isinstance(
                            b, (int, float)
                        ):
                            raise PipelineError(
                                f"unsupported window bound {b!r}"
                            )
                        v = b * scale
                        if v != int(v):
                            raise PipelineError(
                                f"window.range bound {b!r} with unit "
                                f"{unit!r} is finer than microseconds"
                            )
                        return int(v)

                    return ordered.rangeBetween(
                        unit_bound(rng[0], W.unboundedPreceding),
                        unit_bound(rng[1], W.unboundedFollowing),
                    )
                return base.rangeBetween(
                    _frame_bound(rng[0], W.unboundedPreceding),
                    _frame_bound(rng[1], W.unboundedFollowing),
                )
            if not docs or len(docs) != 2:
                raise PipelineError("window requires documents: [lo, hi]")
            return base.rowsBetween(
                _frame_bound(docs[0], W.unboundedPreceding),
                _frame_bound(docs[1], W.unboundedFollowing),
            )
        return base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)

    def sort_key() -> Column:
        """The single sortBy field as a double (timestamps become
        epoch seconds) for interpolation / rate arithmetic."""
        if not sort or len(sort) != 1 or list(sort.values()) != [1]:
            raise PipelineError(
                "this window operator requires a single ascending sortBy field"
            )
        return F.col(next(iter(sort))).cast("double")

    out = df
    dotted_moves: list[tuple[str, str]] = []
    for field_name, op_spec in spec.get("output", {}).items():
        if not isinstance(op_spec, dict) or not op_spec:
            raise PipelineError(f"invalid $setWindowFields output {field_name!r}")
        if "." in field_name:
            # dotted output path (Mongo writes into the nested doc):
            # compute under a temp name, relocate after the loop
            tmp = f"__swf_dotted_{len(dotted_moves)}"
            dotted_moves.append((tmp, field_name))
            field_name = tmp
        body = dict(op_spec)
        win = body.pop("window", None)
        if len(body) != 1:
            raise PipelineError(
                f"output field {field_name!r} must be a single window operator"
            )
        [(op, arg)] = body.items()
        if op in ("$rank", "$denseRank", "$documentNumber"):
            if not sort:
                raise PipelineError(f"{op} requires sortBy")
            fn = {
                "$rank": F.rank,
                "$denseRank": F.dense_rank,
                "$documentNumber": F.row_number,
            }[op]
            out = out.withColumn(field_name, fn().over(base))
            continue
        if op == "$shift":
            if not sort:
                raise PipelineError("$shift requires sortBy")
            by = arg.get("by", 1)
            expr = translate_expr(arg["output"])
            default = arg.get("default")
            # Mongo allows any constant expression as `default`; Spark's
            # lead/lag take a literal.  Accept scalar literals only and
            # fail loudly at translate time — an expression document
            # passed through would silently become a wrong literal.
            if not isinstance(default, (type(None), bool, int, float, str)):
                raise PipelineError(
                    "$shift default must be a scalar literal in this "
                    f"engine, got {default!r}"
                )
            shifted = (
                F.lead(expr, by, default) if by >= 0 else F.lag(expr, -by, default)
            )
            out = out.withColumn(field_name, shifted.over(base))
            continue
        if op == "$locf":
            if not sort:
                raise PipelineError("$locf requires sortBy")
            w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
            out = out.withColumn(
                field_name,
                F.last(translate_expr(arg), ignorenulls=True).over(w),
            )
            continue
        if op == "$linearFill":
            out = out.withColumn(
                field_name,
                _linear_fill(translate_expr(arg), sort_key(), base),
            )
            continue
        if op in ("$covariancePop", "$covarianceSamp"):
            if not isinstance(arg, list) or len(arg) != 2:
                raise PipelineError(f"{op} requires [x, y]")
            fn = F.covar_pop if op == "$covariancePop" else F.covar_samp
            x = translate_expr(arg[0]).cast("double")
            y = translate_expr(arg[1]).cast("double")
            out = out.withColumn(field_name, fn(x, y).over(make_frame(win)))
            continue
        if op == "$derivative":
            # (last(y) - first(y)) / (last(x) - first(x)) over the
            # frame; one-row frames yield null (dx = 0 -> null divide).
            inp = translate_expr(arg["input"]).cast("double")
            k = sort_key()
            w = make_frame(win)
            dy = F.last(inp).over(w) - F.first(inp).over(w)
            dx = F.last(k).over(w) - F.first(k).over(w)
            if "unit" in arg:
                # sortBy is a timestamp (epoch seconds after the cast);
                # express dx in the requested unit.
                unit_s = _UNIT_SECONDS.get(arg["unit"])
                if unit_s is None:
                    raise PipelineError(
                        f"unsupported $derivative unit {arg['unit']!r}"
                    )
                dx = dx / F.lit(unit_s)
            out = out.withColumn(field_name, F.try_divide(dy, dx))
            continue
        if op == "$integral":
            # Trapezoidal sum between consecutive docs: the per-row
            # area column holds the area between row i-1 and i, so the
            # integral from doc(a) to doc(b) is the frame sum over
            # rows a+1..b — a bounded DOCUMENTS lower bound shifts by
            # one row to exclude the pair straddling the frame edge.
            # Range frames bound by sort-key VALUE, where the row
            # shift has no analog: they stay unbounded-lower-only
            # (declared narrower).
            w = None
            if win is not None:
                docs = win.get("documents")
                if docs is not None and (
                    not isinstance(docs, list) or len(docs) != 2
                ):
                    raise PipelineError("window requires documents: [lo, hi]")
                lo = (docs or win.get("range") or [None])[0]
                if docs is not None and (isinstance(lo, int) or lo == "current"):
                    lo_num = 0 if lo == "current" else lo
                    up = docs[1]
                    up_num = 0 if up == "current" else up
                    if isinstance(up_num, int) and lo_num > up_num:
                        raise PipelineError(
                            "window bounds must be in ascending order"
                        )
                    shifted = lo_num + 1
                    if isinstance(up_num, int) and shifted > up_num:
                        # a frame of at most one doc spans no pair:
                        # the integral is 0 (matches the frame-sum
                        # coalesce below, without an invalid frame)
                        out = out.withColumn(field_name, F.lit(0.0))
                        continue
                    w = base.rowsBetween(
                        shifted, _frame_bound(up, W.unboundedFollowing)
                    )
                elif lo != "unbounded":
                    raise PipelineError(
                        "$integral requires an unbounded lower bound on "
                        "range windows (documents windows support any "
                        "lower bound)"
                    )
            inp = translate_expr(arg["input"]).cast("double")
            k = sort_key()
            if "unit" in arg:
                unit_s = _UNIT_SECONDS.get(arg["unit"])
                if unit_s is None:
                    raise PipelineError(
                        f"unsupported $integral unit {arg['unit']!r}"
                    )
                k = k / F.lit(unit_s)
            area = (k - F.lag(k, 1).over(base)) * (
                inp + F.lag(inp, 1).over(base)
            ) / F.lit(2.0)
            if w is None:
                w = make_frame(win)
            out = out.withColumn(
                "__integral_area", area
            ).withColumn(
                field_name,
                F.coalesce(
                    F.sum("__integral_area").over(w), F.lit(0.0)
                ),
            ).drop("__integral_area")
            continue
        if op == "$expMovingAvg":
            # Inherently sequential recursion (ema_i depends on
            # ema_{i-1}) — one Arrow-batched pass per partition via
            # applyInPandas, the same shuffle any window op pays.
            if not sort:
                raise PipelineError("$expMovingAvg requires sortBy")
            n = arg.get("N")
            alpha = arg.get("alpha")
            if (n is None) == (alpha is None):
                raise PipelineError(
                    "$expMovingAvg requires exactly one of N / alpha"
                )
            if n is not None:
                if not isinstance(n, int) or n < 1:
                    raise PipelineError("$expMovingAvg N must be an int >= 1")
                alpha = 2.0 / (n + 1)
            inp = translate_expr(arg["input"]).cast("double")
            part_col = (
                translate_expr(part) if part is not None else F.lit(0)
            )
            tmp = out.withColumn("__ema_part", part_col).withColumn(
                "__ema_in", inp
            )
            # copy: StructType.add would mutate tmp's cached schema
            schema = T.StructType(
                list(tmp.schema.fields)
                + [T.StructField(field_name, T.DoubleType())]
            )
            sort_fields = [(f, d) for f, d in sort.items()]

            out = (
                tmp.groupBy("__ema_part")
                .applyInPandas(
                    _make_ema_fn(alpha, field_name, sort_fields), schema
                )
                .drop("__ema_part", "__ema_in")
            )
            continue
        if op in ("$firstN", "$lastN", "$minN", "$maxN"):
            # Window forms of the N-accumulators: the frame's rows in
            # sort order (first/last) or by BSON value order (min/max,
            # nulls dropped — collect_list already skips them), cut to
            # n.  One collect over the frame, then array ops.
            if not isinstance(arg, dict) or "input" not in arg:
                raise PipelineError(f"{op} requires an input document")
            n_arg = arg.get("n")
            if not isinstance(n_arg, int) or isinstance(n_arg, bool) or n_arg < 1:
                raise PipelineError(f"{op} requires a positive integer n")
            lst = F.collect_list(translate_expr(arg["input"])).over(
                make_frame(win)
            )
            if op == "$firstN":
                col = F.slice(lst, 1, n_arg)
            elif op == "$lastN":
                col = F.slice(
                    lst,
                    F.greatest(F.size(lst) - n_arg + 1, F.lit(1)),
                    n_arg,
                )
            elif op == "$minN":
                col = F.slice(F.array_sort(lst, _bson_compare), 1, n_arg)
            else:
                col = F.slice(
                    F.reverse(F.array_sort(lst, _bson_compare)), 1, n_arg
                )
            out = out.withColumn(field_name, col)
            continue
        if op in ("$top", "$bottom", "$topN", "$bottomN"):
            # Window forms of the sortBy-pickers: collect the frame's
            # (sort-key..., output) structs, sort by the keys under
            # BSON order with per-field directions, take 1 / n.
            if not isinstance(arg, dict) or "output" not in arg:
                raise PipelineError(f"{op} requires an output document")
            sort_by = arg.get("sortBy")
            if not isinstance(sort_by, dict) or not sort_by or not all(
                d in (1, -1) for d in sort_by.values()
            ):
                raise PipelineError(f"{op} requires sortBy of 1 / -1 fields")
            if op in ("$topN", "$bottomN"):
                n_arg = arg.get("n")
                if (
                    not isinstance(n_arg, int)
                    or isinstance(n_arg, bool)
                    or n_arg < 1
                ):
                    raise PipelineError(f"{op} requires a positive integer n")
            else:
                n_arg = 1
            fields = list(sort_by.items())
            entry = F.struct(
                *[
                    translate_expr(f"${f}").alias(f"__k{i}")
                    for i, (f, _) in enumerate(fields)
                ],
                translate_expr(arg["output"]).alias("__out"),
            )
            lst = F.collect_list(entry).over(make_frame(win))

            def pick_cmp(a: Column, b: Column) -> Column:
                cmps = [
                    _bson_compare(a[f"__k{i}"], b[f"__k{i}"])
                    if d == 1
                    else -_bson_compare(a[f"__k{i}"], b[f"__k{i}"])
                    for i, (_, d) in enumerate(fields)
                ]
                res = cmps[-1]
                for c in reversed(cmps[:-1]):
                    res = F.when(c != 0, c).otherwise(res)
                return res

            ordered = F.array_sort(lst, pick_cmp)
            if op == "$bottom":
                col = F.try_element_at(ordered, F.size(ordered))["__out"]
            elif op == "$top":
                col = F.try_element_at(ordered, F.lit(1))["__out"]
            elif op == "$topN":
                col = F.transform(
                    F.slice(ordered, 1, n_arg), lambda s: s["__out"]
                )
            else:  # $bottomN: the LAST n in sort order, order preserved
                col = F.transform(
                    F.slice(
                        ordered,
                        F.greatest(F.size(ordered) - n_arg + 1, F.lit(1)),
                        n_arg,
                    ),
                    lambda s: s["__out"],
                )
            out = out.withColumn(field_name, col)
            continue
        if op in ("$percentile", "$median"):
            # Mongo 7.0 window forms — computed EXACTLY over the
            # frame, same contract as the group/expression forms
            if not isinstance(arg, dict) or "input" not in arg:
                raise PipelineError(f"{op} requires an input document")
            inp = translate_expr(arg["input"])
            if op == "$percentile":
                ps = arg.get("p")
                if not (
                    isinstance(ps, list)
                    and ps
                    and all(
                        isinstance(p, (int, float))
                        and not isinstance(p, bool)
                        and 0 <= p <= 1
                        for p in ps
                    )
                ):
                    raise PipelineError(
                        "$percentile requires p: [numbers in 0..1]"
                    )
                col = F.percentile(inp, [float(p) for p in ps])
            else:
                col = F.percentile(inp, 0.5)
            out = out.withColumn(field_name, col.over(make_frame(win)))
            continue
        agg_ops = {
            "$sum": F.sum,
            "$avg": F.avg,
            "$min": F.min,
            "$max": F.max,
            "$count": lambda _c: F.count(F.lit(1)),
            "$push": F.collect_list,
            "$addToSet": F.collect_set,
            "$first": lambda c: F.first(c, ignorenulls=False),
            "$last": lambda c: F.last(c, ignorenulls=False),
            "$stdDevPop": F.stddev_pop,
            "$stdDevSamp": F.stddev_samp,
        }
        if op not in agg_ops:
            raise PipelineError(f"unsupported window operator {op!r}")
        w = make_frame(win)
        col = (
            agg_ops[op](F.lit(1))
            if op == "$count"
            else agg_ops[op](translate_expr(arg))
        ).over(w)
        if op == "$sum":
            # Mongo window $sum is 0 over an empty/all-null frame
            col = F.coalesce(col, F.lit(0))
        out = out.withColumn(field_name, col)
    for tmp, target in dotted_moves:
        root, rest = target.split(".", 1)
        out = out.withColumn(
            root, F.col(root).withField(rest, F.col(tmp))
        ).drop(tmp)
    return out


def _apply_graph_lookup(df: DataFrame, spec: dict, tables: dict) -> DataFrame:
    """$graphLookup -> iterative breadth-first expansion over the
    foreign frame: per round one equi-join of the frontier values
    against connectToField plus an anti-join against the visited set
    (both shuffle on the connect key).  Rounds are bounded by
    ``maxDepth`` (required here — the unbounded Mongo default needs a
    convergence loop like operators.dedup.connected_components; bound
    it explicitly for a deterministic plan).  Matches collect into an
    array-of-structs `as` column with an optional numeric
    ``depthField``, [] when nothing matched — Mongo's output shape.
    ``restrictSearchWithMatch`` filters the foreign frame once up
    front (reachable-set semantics, applied at every depth).
    Declared deviation: null connect values TERMINATE a path here
    (equi-join semantics), whereas Mongo's null matches foreign docs
    whose connectToField is null/missing — termination is almost
    always the wanted behavior for parent-pointer graphs."""
    required = {"from", "startWith", "connectFromField", "connectToField", "as"}
    missing = required - set(spec)
    if missing:
        raise PipelineError(f"$graphLookup missing {sorted(missing)!r}")
    if (
        "maxDepth" not in spec
        or not isinstance(spec["maxDepth"], int)
        or spec["maxDepth"] < 0
    ):
        raise PipelineError(
            "$graphLookup requires a literal non-negative integer maxDepth "
            "in this engine"
        )
    if spec["from"] not in tables:
        raise PipelineError(
            f"$graphLookup from {spec['from']!r}: pass the frame via "
            "translate_pipeline(..., tables={name: df})"
        )
    foreign = tables[spec["from"]]
    if "restrictSearchWithMatch" in spec:
        # Applied to the foreign frame ONCE, before any traversal
        # round — Mongo's documented semantics (the restriction is on
        # reachable documents, not the start set).  The filter is a
        # narrow predicate on the scan, so every BFS round joins
        # against the already-restricted (and pushdown-pruned) side.
        restrict = spec["restrictSearchWithMatch"]
        if not isinstance(restrict, dict):
            raise PipelineError(
                "$graphLookup restrictSearchWithMatch takes a document"
            )
        foreign = foreign.filter(translate_match(restrict))
    to_field, from_field = spec["connectToField"], spec["connectFromField"]
    out_col, depth_field = spec["as"], spec.get("depthField")

    src = df.withColumn(
        "__row_id", F.monotonically_increasing_id()
    ).localCheckpoint(eager=False)
    frontier = src.select(
        "__row_id", translate_expr(spec["startWith"]).alias("__val")
    )
    visited = None
    max_depth = spec["maxDepth"]
    for depth in range(max_depth + 1):
        matched = (
            frontier.join(
                foreign, F.col("__val") == F.col(to_field)
            )
            .select(
                "__row_id",
                F.struct(*foreign.columns).alias("__doc"),
                F.lit(depth).cast("long").alias("__depth"),
            )
            .dropDuplicates(["__row_id", "__doc"])
        )
        if visited is not None:
            matched = matched.join(
                visited.select("__row_id", "__doc"),
                ["__row_id", "__doc"],
                "left_anti",
            )
        # Materialize each BFS round: each round references the
        # previous round's frame TWICE (the frontier and the visited
        # anti-join), so an un-checkpointed round's subtree both
        # doubles the plan per round AND re-executes per reference —
        # measured r15: checkpointing every 3rd round instead of every
        # round made the apply WORSE (33 -> 38 jobs; the duplicated
        # subtrees become extra AQE stages that exchange reuse does
        # not recover).  Per-round materialization is load-bearing;
        # what r15 DID cut is its price: a LAZY checkpoint whose
        # count() is the materialization (one driver job per round,
        # not an eager-materialize job plus an isEmpty job — the
        # composed-relay pin pattern), and NO checkpoint on the final
        # round, whose only consumer is the single collect action
        # below (the r14 ER "lazy localCheckpoint is eager under AQE"
        # lesson: truncating a plan that runs once anyway is a wasted
        # job).  Measured: 33 -> 31 jobs/apply (deterministic census;
        # the remaining jobs are the per-round join/anti-join stages
        # AQE materializes regardless), oracle + cycle tests green.
        if depth < max_depth:
            matched = matched.localCheckpoint(eager=False)
            if matched.count() == 0:
                break
        visited = matched if visited is None else visited.union(matched)
        frontier = matched.select(
            "__row_id", F.col("__doc").getField(from_field).alias("__val")
        )
    if visited is None:
        visited = matched  # empty frame with the right schema
    doc_struct = (
        F.struct(F.col("__doc.*"), F.col("__depth").alias(depth_field))
        if depth_field
        else F.col("__doc")
    )
    collected = visited.groupBy("__row_id").agg(
        F.collect_list(doc_struct).alias(out_col)
    )
    joined = src.join(collected, "__row_id", "left")
    empty = F.array().cast(dict(joined.dtypes)[out_col])
    return joined.withColumn(
        out_col, F.coalesce(F.col(out_col), empty)
    ).drop("__row_id")


def _apply_fill(df: DataFrame, spec: dict) -> DataFrame:
    """$fill -> window last-ignore-nulls (locf), nearest-neighbour
    interpolation (linear), or coalesce (value)."""
    from pyspark.sql import Window as W

    part = spec.get("partitionBy")
    base = (
        W.partitionBy(translate_expr(part))
        if part is not None
        else W.partitionBy(F.lit(1))
    )
    sort = spec.get("sortBy")
    if sort:
        base = base.orderBy(*_sort_cols(sort))
    out = df
    for field_name, how in spec.get("output", {}).items():
        if not isinstance(how, dict) or len(how) != 1:
            raise PipelineError(f"$fill output {field_name!r} must be one method")
        if "value" in how:
            out = out.withColumn(
                field_name,
                F.coalesce(F.col(field_name), translate_expr(how["value"])),
            )
        elif how.get("method") == "locf":
            if not sort:
                raise PipelineError("$fill locf requires sortBy")
            w = base.rowsBetween(W.unboundedPreceding, W.currentRow)
            out = out.withColumn(
                field_name, F.last(F.col(field_name), ignorenulls=True).over(w)
            )
        elif how.get("method") == "linear":
            if not sort or len(sort) != 1 or list(sort.values()) != [1]:
                raise PipelineError(
                    "$fill linear requires a single ascending sortBy field"
                )
            key = F.col(next(iter(sort))).cast("double")
            out = out.withColumn(
                field_name, _linear_fill(F.col(field_name), key, base)
            )
        else:
            raise PipelineError(f"unsupported $fill method {how!r}")
    return out


def _apply_densify(df: DataFrame, spec: dict) -> DataFrame:
    """$densify (numeric ranges) -> generated value spine left-joined
    against the data; documents missing from the range appear with all
    other fields null, as in Mongo.

    Scale: the spine is a per-partition `sequence` explode (no driver
    loop); the join shuffles on (partition, field).  bounds: "full"
    computes the global min/max with one tiny aggregate."""
    field_name = spec.get("field")
    rng = spec.get("range") or {}
    step = rng.get("step")
    bounds = rng.get("bounds")
    unit = rng.get("unit")
    parts = spec.get("partitionByFields", [])
    if not field_name or not isinstance(step, (int, float)) or step <= 0:
        raise PipelineError("$densify requires field and a positive range.step")
    if unit is not None and unit not in _DATE_UNITS:
        raise PipelineError(f"unsupported $densify unit {unit!r}")
    if unit is not None and not isinstance(step, int):
        raise PipelineError("$densify date step must be an integer")
    if bounds == "partition":
        # Per-partition [min, max] spine — one groupBy aggregate plus a
        # sequence explode, fully distributed (no driver collect; the
        # "full" mode's 2-scalar collect is fine, a per-key collect
        # would not be).
        if not parts:
            raise PipelineError(
                '$densify bounds "partition" requires partitionByFields'
            )
        if unit is not None:
            step_interval = F.expr(
                f"INTERVAL {int(step)} {_DATE_UNITS[unit]}"
            )
            seq = F.sequence(F.col("__lo"), F.col("__hi"), step_interval)
        else:
            seq = F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        spine = (
            df.groupBy(*parts)
            .agg(
                F.min(field_name).alias("__lo"),
                F.max(field_name).alias("__hi"),
            )
            .where(F.col("__lo").isNotNull())
            .select(*parts, F.explode(seq).alias(field_name))
        )
        join_cols = [*parts, field_name]
        stubs = spine.join(
            df.select(*join_cols).distinct(), join_cols, "left_anti"
        )
        return df.unionByName(stubs, allowMissingColumns=True)
    if bounds == "full":
        lo_hi = df.agg(
            F.min(field_name).alias("lo"), F.max(field_name).alias("hi")
        ).collect()[0]
        lo, hi = lo_hi["lo"], lo_hi["hi"]
        if lo is None:
            return df
        lo_col, end = F.lit(lo), F.lit(hi)
        upper_excl = None
    elif isinstance(bounds, list) and len(bounds) == 2:
        lo, hi = bounds
        # Mongo's explicit bounds are end-exclusive: the spine is every
        # lo + k*step strictly below hi.  Generate up to hi INCLUSIVE and
        # filter < hi afterwards — subtracting one step from the sequence
        # end (the old form) drops the last in-range value whenever
        # (hi - lo) is not a multiple of step (e.g. [0,10) step 3 must
        # yield 0,3,6,9 — not 0,3,6).
        if unit is not None:
            lo_col, end = F.to_timestamp(F.lit(lo)), F.to_timestamp(F.lit(hi))
            upper_excl = F.to_timestamp(F.lit(hi))
        else:
            lo_col, end = F.lit(lo), F.lit(hi)
            upper_excl = F.lit(hi)
    else:
        raise PipelineError('$densify bounds must be "full" or [lo, hi)')
    if unit is not None:
        # timestamp spine: sequence over a day/hour/... interval
        step_interval = F.expr(f"INTERVAL {int(step)} {_DATE_UNITS[unit]}")
        spine_vals = F.explode(
            F.sequence(lo_col, end, step_interval)
        ).alias(field_name)
    else:
        spine_vals = F.explode(
            F.sequence(lo_col, end, F.lit(step))
        ).alias(field_name)
    if parts:
        spine = df.select(*parts).distinct().select(*parts, spine_vals)
        join_cols = [*parts, field_name]
    else:
        spine = df.sparkSession.range(1).select(spine_vals)
        join_cols = [field_name]
    if upper_excl is not None:
        spine = spine.where(F.col(field_name) < upper_excl)
    # Original documents all survive; the spine contributes only the
    # MISSING (partition, value) combinations as stub rows with every
    # other field null — Mongo's densify contract.
    stubs = spine.join(df.select(*join_cols).distinct(), join_cols, "left_anti")
    return df.unionByName(stubs, allowMissingColumns=True)


def _root_env(df: DataFrame) -> dict[str, Column]:
    """System variables for stage-level expressions: $$ROOT /
    $$CURRENT are the whole input document as a struct."""
    doc = F.struct(*[F.col(c).alias(c) for c in df.columns])
    return {"ROOT": doc, "CURRENT": doc}


def _make_chain_cmp(dirs: list[int]):
    """Comparator over k0..kN struct fields honouring per-field sort
    directions ($topN / $bottomN) — the positional-name instance of
    _make_field_cmp."""
    return _make_field_cmp([f"k{i}" for i in range(len(dirs))], dirs)


def _group_aggs(out: dict, env: dict | None = None) -> list[Column]:
    aggs = []
    for field_name, accum in out.items():
        if not isinstance(accum, dict) or len(accum) != 1:
            raise PipelineError(
                f"output field {field_name!r} must be a single accumulator"
            )
        [(op, arg)] = accum.items()
        if op == "$count":
            aggs.append(F.count(F.lit(1)).alias(field_name))
        elif op == "$percentile":
            # Mongo 7.0 accumulator; computed EXACTLY here (Mongo's
            # 'approximate' method is a t-digest — same contract,
            # tighter answer)
            ps = arg.get("p")
            if not isinstance(ps, list) or not ps:
                raise PipelineError("$percentile requires p: [..]")
            aggs.append(
                F.percentile(
                    translate_expr(arg["input"], env), ps
                ).alias(field_name)
            )
        elif op == "$median":
            aggs.append(
                F.percentile(translate_expr(arg["input"], env), 0.5).alias(
                    field_name
                )
            )
        elif op in ("$top", "$bottom"):
            # Single-doc pick by sortBy -> min_by/max_by over a struct
            # key (lexicographic, so directions must be uniform; null
            # key fields sort first, matching BSON's null-lowest).
            # No group materialization — one map-side-combinable agg.
            sort_by = arg.get("sortBy")
            if not isinstance(sort_by, dict) or not sort_by:
                raise PipelineError(f"{op} requires sortBy")
            dirs = set(sort_by.values())
            if not dirs <= {1, -1} or len(dirs) != 1:
                raise PipelineError(
                    f"{op} sortBy requires uniform 1 / -1 directions "
                    "(mixed directions: use the N-form)"
                )
            out_expr = translate_expr(arg["output"], env)
            key = F.struct(
                *[translate_expr(f"${f}", env) for f in sort_by]
            )
            pick_min = (op == "$top") == (dirs == {1})
            fn = F.min_by if pick_min else F.max_by
            aggs.append(fn(out_expr, key).alias(field_name))
        elif op in ("$topN", "$bottomN"):
            n = arg.get("n")
            if not isinstance(n, int) or n < 1:
                raise PipelineError(f"{op} requires a literal n >= 1")
            sort_by = arg.get("sortBy")
            if not isinstance(sort_by, dict) or not sort_by or not (
                set(sort_by.values()) <= {1, -1}
            ):
                raise PipelineError(f"{op} requires sortBy with 1 / -1")
            out_expr = translate_expr(arg["output"], env)
            key_items = [
                (translate_expr(f"${f}", env), d)
                for f, d in sort_by.items()
            ]
            item = F.struct(
                *[kc.alias(f"k{i}") for i, (kc, _) in enumerate(key_items)],
                out_expr.alias("v"),
            )
            lst = F.collect_list(item)

            ordered = F.array_sort(
                lst, _make_chain_cmp([d for _, d in key_items])
            )
            if op == "$topN":
                take = F.slice(ordered, 1, n)
            else:
                take = F.when(F.size(ordered) <= n, ordered).otherwise(
                    F.slice(ordered, -n, n)
                )
            aggs.append(
                F.transform(take, lambda s: s["v"]).alias(field_name)
            )
        elif op in ("$firstN", "$lastN", "$minN", "$maxN"):
            n = arg.get("n")
            if not isinstance(n, int) or n < 1:
                raise PipelineError(f"{op} requires a literal n >= 1")
            c = translate_expr(arg["input"], env)
            # struct wrap keeps nulls through collect_list ($firstN /
            # $lastN retain them; $minN / $maxN drop them, as in Mongo)
            lst = F.transform(
                F.collect_list(F.struct(c.alias("v"))), lambda s: s["v"]
            )
            if op == "$firstN":
                take = F.slice(lst, 1, n)
            elif op == "$lastN":
                take = F.when(F.size(lst) <= n, lst).otherwise(
                    F.slice(lst, -n, n)
                )
            else:
                nonnull = F.filter(lst, lambda x: x.isNotNull())
                ordered = (
                    F.array_sort(nonnull)
                    if op == "$minN"
                    else F.reverse(F.array_sort(nonnull))
                )
                take = F.slice(ordered, 1, n)
            aggs.append(take.alias(field_name))
        elif op == "$mergeObjects":
            # Fold the group's documents (maps) in document order with
            # per-key last-wins.  All-null groups yield null (Mongo
            # yields {} — an empty map needs a value type the
            # translator cannot know; declared deviation).
            c = translate_expr(arg, env)
            lst = F.transform(
                F.collect_list(F.struct(c.alias("v"))), lambda s: s["v"]
            )
            nn = F.filter(lst, lambda m: m.isNotNull())
            init = F.try_element_at(nn, F.lit(1))
            rest = F.slice(
                nn, F.lit(2), F.greatest(F.size(nn) - 1, F.lit(0))
            )
            merged = F.aggregate(
                rest,
                init,
                lambda acc, m: F.map_zip_with(
                    acc,
                    m,
                    lambda k, v1, v2: F.when(
                        F.map_contains_key(m, k), v2
                    ).otherwise(v1),
                ),
            )
            aggs.append(merged.alias(field_name))
        elif op in _GROUP_ACCUMULATORS:
            aggs.append(
                _GROUP_ACCUMULATORS[op](translate_expr(arg, env)).alias(field_name)
            )
        elif op == "$accumulator":
            raise PipelineError(
                "$accumulator embeds server-side JavaScript, which this "
                "engine does not execute; register a pandas grouped-agg "
                "UDF through the functions facade instead"
            )
        else:
            raise PipelineError(f"unsupported accumulator {op!r}")
    return aggs


def _apply_stage(df: DataFrame, stage: dict, tables: dict | None = None) -> DataFrame:
    tables = tables or {}
    [(name, spec)] = stage.items()
    match name:
        case "$match":
            return df.filter(translate_match(spec))
        case "$project":
            return _apply_project(df, spec)
        case "$addFields" | "$set":
            out = df
            env = _root_env(df)
            for field, expr in spec.items():
                if "." in field:
                    # dotted target: write into the nested struct
                    root, rest = field.split(".", 1)
                    out = out.withColumn(
                        root, F.col(root).withField(rest, translate_expr(expr, env))
                    )
                else:
                    out = out.withColumn(field, translate_expr(expr, env))
            return out
        case "$unset":
            fields = [spec] if isinstance(spec, str) else list(spec)
            return df.drop(*fields)
        case "$replaceRoot" | "$replaceWith":
            root = spec["newRoot"] if name == "$replaceRoot" else spec
            if isinstance(root, str) and root.startswith("$"):
                return df.select(f"{root[1:]}.*")
            # expression form: any struct-valued expression can become
            # the new root (e.g. a computed struct document)
            return df.select(
                translate_expr(root, _root_env(df)).alias("__root")
            ).select(
                "__root.*"
            )
        case "$redact":
            # Row-level $redact: the expression decides $$KEEP/$$PRUNE
            # for the whole document.  $$DESCEND recurses into
            # subdocuments per-field (schema-directed rebuild below).
            if _contains_descend(spec):
                return _apply_redact_descend(df, spec)
            env = {"KEEP": F.lit("KEEP"), "PRUNE": F.lit("PRUNE")}
            return df.filter(translate_expr(spec, env) == "KEEP")
        case "$sample":
            return _apply_sample(df, spec)
        case "$sampleRate":
            # Declared-deterministic deviation (like $sample): each doc
            # keeps with probability ~rate, decided by a content hash —
            # reproducible across runs/partitions; identical documents
            # share one decision (Mongo draws independently per doc).
            if not isinstance(spec, (int, float)) or not 0 <= spec <= 1:
                raise PipelineError("$sampleRate takes a number in [0, 1]")
            h = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(1 << 20),
            )
            return df.filter(h < int(spec * (1 << 20)))
        case "$geoNear":
            return _apply_geo_near(df, spec)
        case "$vectorSearch":
            return _apply_vector_search(df, spec)
        case "$changeStreamSplitLargeEvent":
            return _apply_split_large_event(df, spec)
        case "$group":
            return _apply_group(df, spec)
        case "$unwind":
            return _apply_unwind(df, spec)
        case "$sort":
            return df.orderBy(*_sort_cols(spec))
        case "$limit":
            if not isinstance(spec, int) or spec < 0:
                raise PipelineError("$limit requires a non-negative integer")
            return df.limit(spec)
        case "$skip":
            if not isinstance(spec, int) or spec < 0:
                raise PipelineError("$skip requires a non-negative integer")
            return df.offset(spec)
        case "$count":
            if not isinstance(spec, str) or not spec:
                raise PipelineError("$count requires an output field name")
            # Mongo emits NO document for an empty input (not {count: 0})
            return df.agg(F.count(F.lit(1)).alias(spec)).where(F.col(spec) > 0)
        case "$sortByCount":
            return (
                df.groupBy(translate_expr(spec).alias("_id"))
                .agg(F.count(F.lit(1)).alias("count"))
                .orderBy(F.col("count").desc(), F.col("_id").asc())
            )
        case "$lookup":
            return _apply_lookup(df, spec, tables)
        case "$unionWith":
            coll = spec if isinstance(spec, str) else spec.get("coll")
            if coll not in tables:
                raise PipelineError(
                    f"$unionWith {coll!r}: pass the frame via "
                    "translate_pipeline(..., tables={name: df})"
                )
            other = tables[coll]
            if isinstance(spec, dict) and spec.get("pipeline"):
                other = translate_pipeline(spec["pipeline"], tables)(other)
            return df.unionByName(other, allowMissingColumns=True)
        case "$bucket":
            return _apply_bucket(df, spec)
        case "$bucketAuto":
            return _apply_bucket_auto(df, spec)
        case "$setWindowFields":
            return _apply_set_window_fields(df, spec)
        case "$graphLookup":
            return _apply_graph_lookup(df, spec, tables)
        case "$fill":
            return _apply_fill(df, spec)
        case "$densify":
            return _apply_densify(df, spec)
        case "$facet":
            # Each sub-pipeline runs over the same input; results
            # collapse to one row of array-of-structs columns (Mongo's
            # single output document).  Element order within a facet
            # array follows partition order — deterministic only if
            # the sub-pipeline ends in a $sort, as in practice.
            if not isinstance(spec, dict) or not spec:
                raise PipelineError("$facet requires named sub-pipelines")
            outs = None
            for facet_name, sub in spec.items():
                res = translate_pipeline(sub, tables)(df)
                one = res.agg(
                    F.collect_list(F.struct(*res.columns)).alias(facet_name)
                )
                outs = one if outs is None else outs.crossJoin(one)
            return outs
        case "$search" | "$searchMeta":
            raise PipelineError(
                f"{name} requires an Atlas Search (Lucene) index with no "
                "engine analog; use $match with $regex / the text "
                "operators, or $vectorSearch for vector queries"
            )
        case _:
            raise PipelineError(f"unsupported stage {name!r}")


_EARTH_RADIUS_M = 6378100.0  # MongoDB's spherical-model Earth radius


def _apply_geo_near(df: DataFrame, spec: dict) -> DataFrame:
    """$geoNear -> distance projection + ascending sort.

    ``key`` names an ``array<double>`` [lon, lat] column (the legacy
    coordinate-pair layout; a GeoJSON ``near`` point is accepted and
    unwrapped).  ``spherical: true`` computes haversine meters on
    Mongo's Earth radius; false computes planar Euclidean distance in
    coordinate units (Mongo's 2d semantics).  ``query`` filters with
    full $match semantics BEFORE distances, so the predicate reaches
    the scan; min/maxDistance bound the (pre-multiplier) distance;
    ``distanceMultiplier`` scales the reported value; ``includeLocs``
    copies the matched point.  No geo index exists here, so ``key``
    is required rather than inferred.

    Scale: distance is a narrow per-row JVM expression; the ascending
    order is a range-partitioned sort — and the usual trailing
    $limit collapses it into TakeOrdered (top-k, no global sort).
    """
    if not isinstance(spec, dict):
        raise PipelineError("$geoNear takes a document")
    for req in ("near", "distanceField", "key"):
        if req not in spec:
            raise PipelineError(f"$geoNear requires {req!r}")
    near = spec["near"]
    if isinstance(near, dict):
        if near.get("type") != "Point":
            raise PipelineError("$geoNear near must be a Point")
        near = near.get("coordinates")
    if not (
        isinstance(near, (list, tuple))
        and len(near) == 2
        and all(isinstance(c, (int, float)) for c in near)
    ):
        raise PipelineError("$geoNear near must be [lon, lat]")
    lon2, lat2 = float(near[0]), float(near[1])

    key = F.col(spec["key"])
    lon1, lat1 = key.getItem(0), key.getItem(1)

    if "query" in spec:
        df = df.filter(translate_match(spec["query"]))

    if spec.get("spherical"):
        dphi = (F.radians(F.lit(lat2)) - F.radians(lat1)) / 2
        dlmb = (F.radians(F.lit(lon2)) - F.radians(lon1)) / 2
        a = (
            F.sin(dphi) * F.sin(dphi)
            + F.cos(F.radians(lat1))
            * F.cos(F.radians(F.lit(lat2)))
            * F.sin(dlmb)
            * F.sin(dlmb)
        )
        dist = 2 * F.lit(_EARTH_RADIUS_M) * F.asin(F.sqrt(a))
    else:
        dx, dy = lon1 - F.lit(lon2), lat1 - F.lit(lat2)
        dist = F.sqrt(dx * dx + dy * dy)

    out = df.withColumn("__geo_dist", dist)
    if "minDistance" in spec:
        out = out.filter(F.col("__geo_dist") >= float(spec["minDistance"]))
    if "maxDistance" in spec:
        out = out.filter(F.col("__geo_dist") <= float(spec["maxDistance"]))
    reported = F.col("__geo_dist") * float(spec.get("distanceMultiplier", 1.0))
    out = out.withColumn(spec["distanceField"], reported)
    if "includeLocs" in spec:
        out = out.withColumn(spec["includeLocs"], key)
    # backquote the sort reference: a dotted distanceField (Mongo's
    # canonical example is "dist.calculated") lands as a literal
    # dot-in-name TOP-LEVEL column here (declared deviation from
    # Mongo's nested-document shape), and a bare F.col would parse
    # the dot as struct access
    dist_ref = F.col("`" + spec["distanceField"].replace("`", "``") + "`")
    return out.drop("__geo_dist").orderBy(dist_ref.asc())


_VS_SCORE_COL = "__vs_score"


def _apply_vector_search(df: DataFrame, spec: dict) -> DataFrame:
    """$vectorSearch -> scored exact top-k over an embedding column.

    Mirrors the Atlas stage surface (reference passes any stage
    verbatim to the server, `settings.py:69-76`): ``path`` names an
    ``array<numeric>`` column, ``queryVector`` is a numeric literal
    array, ``filter`` is a pre-scoring predicate (full $match
    semantics — a superset of Atlas's restricted MQL subset), and
    ``limit`` bounds the output.  The similarity lives in the Atlas
    index definition, which has no analog here, so it is accepted
    inline via a ``similarity`` key (cosine | dotProduct | euclidean,
    default cosine).  Scores use Atlas's published normalizations:
    cosine/dotProduct -> (1 + sim) / 2, euclidean -> 1 / (1 + dist).
    The score rides in a hidden column readable downstream via
    ``{"$meta": "vectorSearchScore"}`` and is dropped at pipeline end
    when unreferenced.

    Declared deviations: the scan is EXACT brute force (so
    ``numCandidates`` is validated but is only a recall knob for the
    approximate index this engine replaces — recall here is 1.0), and
    ties at the rounded score break deterministically by a row
    content hash (Atlas leaves tie order unspecified).

    Scale: the query vector is a literal (broadcast by construction);
    scoring is one narrow JVM HOF pass over the scan with the filter
    pushed ahead of it, and sort+limit collapses to TakeOrdered —
    no global sort, no shuffle beyond the top-k gather.  The ANN
    index paths (IVF/PQ/LSH, operators/similarity.py) are the scale
    alternative when brute force is too slow.
    """
    if not isinstance(spec, dict):
        raise PipelineError("$vectorSearch takes a document")
    for req in ("path", "queryVector", "limit"):
        if req not in spec:
            raise PipelineError(f"$vectorSearch requires {req!r}")
    qv = spec["queryVector"]
    if not (
        isinstance(qv, list)
        and qv
        and all(
            isinstance(x, (int, float)) and not isinstance(x, bool) for x in qv
        )
    ):
        raise PipelineError("$vectorSearch queryVector must be a numeric array")
    limit = spec["limit"]
    if not isinstance(limit, int) or isinstance(limit, bool) or limit <= 0:
        raise PipelineError("$vectorSearch limit must be a positive integer")
    if "numCandidates" in spec:
        nc = spec["numCandidates"]
        if not isinstance(nc, int) or isinstance(nc, bool) or nc < limit:
            raise PipelineError(
                "$vectorSearch numCandidates must be an integer >= limit"
            )
        if spec.get("exact"):
            raise PipelineError(
                "$vectorSearch exact:true excludes numCandidates"
            )
    sim = spec.get("similarity", "cosine")
    if sim not in ("cosine", "dotProduct", "euclidean"):
        raise PipelineError(f"unsupported $vectorSearch similarity {sim!r}")
    tie_break = spec.get("tieBreak")
    if tie_break is not None and not (
        isinstance(tie_break, list)
        and tie_break
        and all(isinstance(f, str) for f in tie_break)
    ):
        raise PipelineError("$vectorSearch tieBreak must be a field-name array")
    if "filter" in spec:
        df = df.filter(translate_match(spec["filter"]))

    from pymongo_change_stream_reader_spark.operators.similarity import (
        dot as _dot,
        l2_norm as _l2,
    )

    v = F.transform(F.col(spec["path"]), lambda x: x.cast("double"))
    q = F.array(*[F.lit(float(x)) for x in qv])
    if sim == "cosine":
        score = (F.lit(1.0) + _dot(v, q) / (_l2(v) * _l2(q))) / F.lit(2.0)
    elif sim == "dotProduct":
        score = (F.lit(1.0) + _dot(v, q)) / F.lit(2.0)
    else:
        dist = F.sqrt(
            F.aggregate(
                F.zip_with(v, q, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        score = F.lit(1.0) / (F.lit(1.0) + dist)

    # ties at the rounded score: an explicit tieBreak field list
    # (engine extension — lets callers match an external ordering
    # contract exactly) or a deterministic row content hash (Atlas
    # leaves tie order unspecified)
    tie = (
        [F.col(f) for f in tie_break]
        if tie_break
        else [F.xxhash64(*[F.col(c) for c in df.columns])]
    )
    return (
        df.withColumn(_VS_SCORE_COL, F.round(score, 6))
        .orderBy(F.col(_VS_SCORE_COL).desc(), *tie)
        .limit(limit)
    )


def _apply_split_large_event(df: DataFrame, spec: Any) -> DataFrame:
    """$changeStreamSplitLargeEvent -> fragment explosion over the
    change-event frame (the one change-stream-specific stage a CDC
    user sends; reference passes it verbatim to mongod,
    `settings.py:69-76`; Mongo requires it LAST in the pipeline).

    Mongo splits events exceeding 16 MB into fragments, each carrying
    ``splitEvent: {fragment: k, of: n}``; fields are never split
    across fragments.  Fixed-schema adaptation (declared):

    - the three schemaless payload fields (``fullDocument``,
      ``fullDocumentBeforeChange``, ``updateDescription`` — sized by
      its ``updatedFields`` payload) are the split unit, packed
      greedy-first-fit in that order against ``maxSize`` (extension
      key, default Mongo's 16 MB — parameterized because the limit is
      a server constant, not part of the event data);
    - bounded envelope fields replicate into every fragment (the
      static schema cannot drop them; Mongo ships them in the first
      fragment they fit);
    - a single field larger than maxSize gets a fragment of its own
      (Mongo errors; lenient here, declared);
    - events that fit emit unchanged with a null ``splitEvent``
      (Mongo adds splitEvent only to split events).

    Scale: one narrow JVM pass — sizes, a 3-element fold, and a
    per-row explode of at most n_fragments; no shuffle, no Python.
    """
    if not isinstance(spec, dict):
        raise PipelineError("$changeStreamSplitLargeEvent takes a document")
    extra = set(spec) - {"maxSize"}
    if extra:
        raise PipelineError(
            f"unsupported $changeStreamSplitLargeEvent option(s) {sorted(extra)!r}"
        )
    max_size = spec.get("maxSize", 16 * 1024 * 1024)
    if not isinstance(max_size, int) or isinstance(max_size, bool) or max_size <= 0:
        raise PipelineError("maxSize must be a positive integer byte count")
    payload = ["fullDocument", "fullDocumentBeforeChange", "updateDescription"]
    missing = [c for c in payload if c not in df.columns]
    if missing:
        raise PipelineError(
            "$changeStreamSplitLargeEvent requires a change-event frame "
            f"(missing {missing!r})"
        )

    # A PRESENT field is sized at least 1 byte, so presence always
    # survives packing: an empty-string document, or an
    # updateDescription whose updatedFields is null but whose
    # removedFields/truncatedArrays carry data, still gets assigned a
    # fragment (size 0 means ABSENT — null column — and only then is
    # the field skipped).
    def _present_size(col: Column, measured: Column) -> Column:
        return (
            F.when(
                col.isNotNull(),
                F.greatest(F.coalesce(measured, F.lit(0)), F.lit(1)),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    sizes = F.array(
        _present_size(F.col("fullDocument"), F.octet_length("fullDocument")),
        _present_size(
            F.col("fullDocumentBeforeChange"),
            F.octet_length("fullDocumentBeforeChange"),
        ),
        _present_size(
            F.col("updateDescription"),
            F.octet_length(F.col("updateDescription")["updatedFields"]),
        ),
    )

    def fold(acc: Column, s: Column) -> Column:
        overflow = (acc["used"] > 0) & (acc["used"] + s > F.lit(max_size))
        frag = F.when(s == 0, acc["frag"]).when(
            overflow, acc["frag"] + 1
        ).otherwise(acc["frag"])
        used = F.when(s == 0, acc["used"]).when(overflow, s).otherwise(
            acc["used"] + s
        )
        assigned = F.when(s == 0, F.lit(0)).otherwise(frag)
        return F.struct(
            frag.alias("frag"),
            used.alias("used"),
            F.concat(acc["a"], F.array(assigned)).alias("a"),
        )

    init = F.struct(
        F.lit(1).alias("frag"),
        F.lit(0).cast("long").alias("used"),
        F.array().cast("array<int>").alias("a"),
    )
    packed = F.aggregate(sizes, init, fold)
    cols = list(df.columns)
    out = df.withColumn("__se", packed).withColumn(
        "__k",
        F.explode(
            F.when(
                F.col("__se")["frag"] >= 2,
                F.sequence(F.lit(1), F.col("__se")["frag"]),
            ).otherwise(F.array(F.lit(0)))
        ),
    )
    k, n = F.col("__k"), F.col("__se")["frag"]
    for i, field in enumerate(payload):
        out = out.withColumn(
            field,
            F.when(
                (k == 0) | (F.element_at(F.col("__se")["a"], i + 1) == k),
                F.col(field),
            ),
        )
    return out.select(
        *cols,
        F.when(
            k > 0, F.struct(k.alias("fragment"), n.alias("of"))
        ).alias("splitEvent"),
    )


def _contains_descend(spec: Any) -> bool:
    if isinstance(spec, str):
        return spec == "$$DESCEND"
    if isinstance(spec, dict):
        return any(_contains_descend(v) for v in spec.values())
    if isinstance(spec, list):
        return any(_contains_descend(v) for v in spec)
    return False


def _apply_sample(df: DataFrame, spec: Any) -> DataFrame:
    """$sample, re-expressed DETERMINISTICALLY (declared deviation:
    Mongo's $sample draws a fresh random sample per run — reference
    settings.py:69-76 just forwards it to mongod; a reproducible
    engine wants the same sample every run and on every engine).

    Documents are ranked by ``md5(seed || ':' || key)`` — uniform and
    bit-identical across Spark and DuckDB — and the first ``size``
    taken.  Extensions: ``by`` (an expression; defaults to ``$_id``)
    picks the ranking key; ``seed`` reshuffles.

    Scale: TakeOrdered top-n (per-partition heaps + driver merge of n
    rows per partition), never a full sort."""
    if (
        not isinstance(spec, dict)
        or not isinstance(spec.get("size"), int)
        or isinstance(spec.get("size"), bool)
        or spec["size"] < 0
    ):
        raise PipelineError("$sample requires {size: <non-negative int>}")
    by = spec.get("by")
    if by is None:
        if "_id" not in df.columns:
            raise PipelineError(
                "$sample needs by: '$field' when the frame has no _id column"
            )
        by = "$_id"
    seed = spec.get("seed", 0)
    key = translate_expr(by)
    rank = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), key.cast("string"))
    )
    # tie-break on the key itself so equal hashes cannot reorder
    return df.orderBy(rank, key).limit(spec["size"])


def _path_exists(dtype, path: str) -> bool:
    """Does a dotted field path exist in this (struct) schema?"""
    from pyspark.sql.types import StructType

    cur = dtype
    for part in path.split("."):
        if not isinstance(cur, StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return True


def _rewrite_for_level(spec: Any, dtype) -> Any:
    """Rewrite field references ``$a.b`` -> ``$$CURRENT.a.b`` so the
    SAME $redact expression can be re-evaluated against every nesting
    level (Mongo rebinds $$CURRENT per level).  A path that does not
    exist at this level's (static) schema becomes a null literal —
    Mongo's missing-field behavior, minus BSON's null-sorts-lowest
    comparison order (declared deviation: SQL null semantics apply).
    ``$$``-vars and ``$literal`` payloads pass through untouched."""
    if isinstance(spec, str):
        if spec.startswith("$$"):
            return spec
        if spec.startswith("$"):
            path = spec[1:]
            if _path_exists(dtype, path):
                return "$$CURRENT." + path
            return {"$literal": None}
        return spec
    if isinstance(spec, dict):
        return {
            k: (v if k == "$literal" else _rewrite_for_level(v, dtype))
            for k, v in spec.items()
        }
    if isinstance(spec, list):
        return [_rewrite_for_level(v, dtype) for v in spec]
    return spec


def _apply_redact_descend(df: DataFrame, spec: Any) -> DataFrame:
    """$redact with $$DESCEND: schema-directed recursive rebuild.

    Mongo re-evaluates the redact expression at every document level
    with $$CURRENT bound to that level: $$KEEP keeps the subtree
    as-is, $$PRUNE removes it, $$DESCEND keeps scalars and recurses
    into embedded documents (including documents inside arrays).

    Spark's schema is static, so two declared deviations:
    - a pruned embedded document FIELD becomes NULL (a column cannot
      be dropped per-row); pruned array ELEMENTS are truly removed;
    - recursion follows the static schema: struct fields and
      array-of-struct elements descend; deeper generic nestings
      (array of array of struct) are kept as scalars.

    Scale: pure column expressions over the existing row layout — no
    shuffle, no UDF; the whole rebuild runs in the projection."""
    from pyspark.sql.types import ArrayType, StructType

    root = F.struct(*[F.col(c).alias(c) for c in df.columns])
    sysenv = {
        "KEEP": F.lit("KEEP"),
        "PRUNE": F.lit("PRUNE"),
        "DESCEND": F.lit("DESCEND"),
        "ROOT": root,
    }

    def decide(cur: Column, dtype) -> Column:
        return translate_expr(
            _rewrite_for_level(spec, dtype), {**sysenv, "CURRENT": cur}
        )

    def rebuild(col: Column, dtype: "StructType") -> Column:
        dec = decide(col, dtype)
        children = [
            _child(col.getField(f.name), f.dataType).alias(f.name)
            for f in dtype.fields
        ]
        return (
            F.when(col.isNull(), F.lit(None).cast(dtype))
            .when(dec == "KEEP", col)
            .when(dec == "PRUNE", F.lit(None).cast(dtype))
            .otherwise(F.struct(*children))
        )

    def _child(child: Column, dt) -> Column:
        if isinstance(dt, StructType):
            return rebuild(child, dt)
        if isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            et = dt.elementType

            def _elem(t):
                # 1-arg closure: PySpark derives HOF arity from the
                # signature, so the element type must be captured, not
                # passed as a defaulted second parameter
                return lambda x: rebuild(x, t)

            return F.filter(
                F.transform(child, _elem(et)), lambda x: x.isNotNull()
            )
        return child

    dec0 = decide(root, df.schema)
    projected = [
        F.when(dec0 == "KEEP", F.col(f.name))
        .otherwise(_child(F.col(f.name), f.dataType))
        .alias(f.name)
        if isinstance(f.dataType, (StructType,))
        or (
            isinstance(f.dataType, ArrayType)
            and isinstance(f.dataType.elementType, StructType)
        )
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.filter(dec0 != "PRUNE").select(*projected)


def translate_pipeline(
    pipeline: str | Sequence[dict],
    tables: dict[str, DataFrame] | None = None,
    sinks: dict[str, str] | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Compile a pipeline into a DataFrame transform.  Stages compose
    lazily, so Catalyst sees one logical plan and pushes the combined
    predicates/pruning into the scan.  ``tables`` resolves the foreign
    frames referenced by $lookup / $unionWith (the Mongo collection
    namespace has no Spark analog, so the caller supplies it);
    ``sinks`` resolves $out targets to parquet paths ($out replaces
    the whole target, so the write is mode=overwrite; it must be the
    final stage, as in Mongo)."""
    stages = parse_pipeline(pipeline)
    for i, stage in enumerate(stages):
        if ("$out" in stage or "$merge" in stage) and i != len(stages) - 1:
            raise PipelineError("$out/$merge must be the last stage")
        if "$geoNear" in stage and i != 0:
            raise PipelineError("$geoNear must be the first stage")
        if "$vectorSearch" in stage and i != 0:
            raise PipelineError("$vectorSearch must be the first stage")
        if "$changeStreamSplitLargeEvent" in stage and i != len(stages) - 1:
            raise PipelineError(
                "$changeStreamSplitLargeEvent must be the last stage"
            )
        if "$documents" in stage and i != 0:
            raise PipelineError("$documents must be the first stage")

    def apply(df: DataFrame | None) -> DataFrame:
        run_stages = stages
        if stages and "$documents" in stages[0]:
            # Input-producing stage: the literal documents REPLACE the
            # input frame (which may be None — Mongo's
            # aggregate([{$documents: ...}]) needs no collection).
            # Literals only (declared narrower: Mongo also allows
            # constant-foldable expressions); ingested via the JSON
            # reader for consistent schema inference, then re-ordered
            # to first-document key order (the reader sorts
            # alphabetically, Mongo preserves insertion order).
            docs = stages[0]["$documents"]
            if not (
                isinstance(docs, list)
                and docs
                and all(isinstance(d, dict) for d in docs)
            ):
                raise PipelineError(
                    "$documents takes a non-empty array of documents"
                )
            spark = SparkSession.getActiveSession()
            inferred = spark.read.json(
                spark.sparkContext.parallelize(
                    [json.dumps(d) for d in docs], 1
                )
            )
            order = list(docs[0])
            cols = [c for c in order if c in inferred.columns] + [
                c for c in inferred.columns if c not in order
            ]
            df = inferred.select(*cols)
            run_stages = stages[1:]
        for stage in run_stages:
            if ("$out" in stage or "$merge" in stage) and _VS_SCORE_COL in df.columns:
                # the hidden $vectorSearch score must not leak into a
                # terminal sink (the epilogue drop below never runs on
                # the early-return terminal branches)
                df = df.drop(_VS_SCORE_COL)
            if "$out" in stage:
                spec = stage["$out"]
                target = spec if isinstance(spec, str) else spec.get("coll")
                if not sinks or target not in sinks:
                    raise PipelineError(
                        f"$out {target!r}: pass the path via "
                        "translate_pipeline(..., sinks={name: path})"
                    )
                return _versioned_commit(df, sinks[target])
            if "$merge" in stage:
                return _apply_merge(df, stage["$merge"], sinks)
            df = _apply_stage(df, stage, tables)
        if _VS_SCORE_COL in df.columns:
            # the hidden $vectorSearch score survives only when a
            # later stage projected it via {"$meta": ...}
            df = df.drop(_VS_SCORE_COL)
        return df

    return apply


def read_versioned_sink(
    spark: SparkSession, path: str, version: int = 0
) -> DataFrame | None:
    """Read a committed version of a versioned parquet sink (see
    _versioned_commit), or None when the sink/version does not exist.
    ``version=0`` is the CURRENT commit; ``version=-1`` the previous
    one (the commit protocol retains exactly one superseded version —
    the local analog of a table format's retention window, enabling
    one-step rollback/time-travel).  Legacy plain-parquet directories
    (no ``_manifest``) read as-is."""
    import os

    if _read_bucket_manifest(path) is not None:
        # bucketed sinks retain an N-deep history (see _commit_bucketed
        # `retain`); delegate any version offset to their reader
        return read_bucketed_sink(spark, path, version)
    if version not in (0, -1):
        raise PipelineError(
            "whole-table versioned sinks retain the current and "
            "previous commit only (version 0 or -1); bucketed sinks "
            "support deeper history via the merge's `retain` option"
        )
    manifest = os.path.join(path, "_manifest")
    if os.path.exists(manifest):
        with open(manifest) as fh:
            lines = [ln.strip() for ln in fh.read().splitlines() if ln.strip()]
        if version == 0:
            return spark.read.parquet(os.path.join(path, lines[0]))
        # the predecessor comes from the MANIFEST (recorded at commit
        # time), never from listdir — a half-written crash-leftover dir
        # must not masquerade as the previous committed version
        if len(lines) < 2 or not os.path.isdir(os.path.join(path, lines[1])):
            return None
        return spark.read.parquet(os.path.join(path, lines[1]))
    if os.path.exists(path) and version == 0:
        return spark.read.parquet(path)
    return None


def _versioned_commit(df: DataFrame, path: str) -> DataFrame:
    """Materialize ``df`` as the sink's next version and atomically
    swap the manifest pointer — the local-FS analog of a lakehouse
    table format's commit protocol:

    1. write ``path/v-NNNNNN`` (a crash here leaves the previous
       version LIVE and the half-written dir inert);
    2. ``os.replace`` a temp manifest over ``path/_manifest`` — the
       POSIX-atomic commit point;
    3. only then garbage-collect superseded version dirs (a crash
       during GC cannot affect the committed version).

    Unlike ``write.mode("overwrite")`` / rmtree+rename, no failure
    mode destroys the previous committed data, and a $merge reading
    the current version while writing the next never races its own
    scan.  On a real deployment this maps onto Delta/Iceberg commits;
    the layout here keeps the same crash contract without a table
    format on the classpath."""
    import os
    import shutil

    os.makedirs(path, exist_ok=True)
    versions = sorted(
        d for d in os.listdir(path)
        if d.startswith("v-") and os.path.isdir(os.path.join(path, d))
    )
    n = int(versions[-1][2:]) + 1 if versions else 1
    vdir = f"v-{n:06d}"
    # the previously COMMITTED version (manifest target, not merely
    # the lexically-previous dir — that could be a crash leftover) is
    # the one the retention window below must keep
    prev_committed = None
    manifest_path = os.path.join(path, "_manifest")
    if os.path.exists(manifest_path):
        with open(manifest_path) as fh:
            first = fh.read().splitlines()
        prev_committed = first[0].strip() if first else None
    df.write.mode("overwrite").parquet(os.path.join(path, vdir))
    tmp = os.path.join(path, "_manifest.tmp")
    with open(tmp, "w") as fh:
        # line 1: current commit; line 2 (optional): its predecessor —
        # recorded HERE rather than inferred from listdir so a
        # half-written crash-leftover dir can never masquerade as the
        # previous committed version
        fh.write(vdir)
        if prev_committed:
            fh.write("\n" + prev_committed)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, "_manifest"))
    # post-commit GC: older superseded versions, crash leftovers, and
    # legacy plain-parquet files all go; the committed version, its
    # immediate predecessor (a one-deep retention window for rollback/
    # time-travel via read_versioned_sink(version=-1)), and the
    # manifest remain.  A crash anywhere in GC leaves the commit
    # intact.
    survivors = {vdir}
    if prev_committed:
        survivors.add(prev_committed)
    for entry in os.listdir(path):
        if entry == "_manifest" or entry in survivors:
            continue
        full = os.path.join(path, entry)
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            os.unlink(full)
    return df.sparkSession.read.parquet(os.path.join(path, vdir))


def _read_bucket_manifest(path: str, filename: str = "_manifest"):
    """Parse a BUCKETED sink manifest (``buckets=N`` header, then one
    ``K:relative/dir`` line per non-empty bucket).  Returns
    (n_buckets, {bucket: rel_dir}) or None when the file is absent or
    is not a bucketed manifest.  ``filename`` selects which snapshot
    to parse (``_manifest``, ``_manifest.prev``, or a retained
    ``_manifest.h-v-NNNNNN`` history entry) — every reader path shares
    this one validator, so a truncated/corrupt snapshot always
    surfaces as the same PipelineError."""
    import os

    mpath = os.path.join(path, filename)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        lines = [ln.strip() for ln in fh.read().splitlines() if ln.strip()]
    if not lines or not lines[0].startswith("buckets="):
        return None
    try:
        n = int(lines[0].split("=", 1)[1])
        entries: dict[int, str] = {}
        for ln in lines[1:]:
            k, rel = ln.split(":", 1)
            entries[int(k)] = rel
    except ValueError as exc:
        raise PipelineError(
            f"corrupt bucketed-sink manifest at {mpath!r}: {exc} — "
            "restore from _manifest.prev or recreate the sink"
        ) from exc
    return n, entries


def _bucket_history_files(path: str) -> list[str]:
    """Retained manifest-history snapshots, OLDEST FIRST (numeric
    commit order — NOT lexical: zero-padding runs out at v-1000000,
    well inside a long-lived streaming replica's commit count).  Each
    commit archives the manifest it installs as
    ``_manifest.h-v-NNNNNN`` (NNNNNN = the version dir that commit
    created).  ``.tmp`` crash leftovers from _write_atomic are never
    history entries."""
    import os

    if not os.path.isdir(path):
        return []
    return sorted(
        (
            e
            for e in os.listdir(path)
            if e.startswith("_manifest.h-v-")
            and not e.endswith(".tmp")
            and os.path.isfile(os.path.join(path, e))
        ),
        key=lambda e: int(e.rsplit("v-", 1)[1]),
    )


def bucketed_sink_lock(path: str):
    """Cross-process write lock for a bucketed versioned sink: every
    read-merge-commit sequence (``$merge buckets``, the replica
    materializer, ``compact_replica``) and every GC pass
    (``vacuum_bucketed_sink``) takes it, so a compaction cannot base
    its rewrite on a snapshot a concurrent micro-batch is advancing
    (the manifest swap alone gives last-writer-wins — the LOSING
    commit's effect would silently vanish), and a vacuum cannot GC an
    in-flight commit's version dir before the manifest references it.
    flock-based (kernel-released on crash), BLOCKING — a writer
    arriving during a long compaction waits instead of failing the
    streaming query.  The lock file lives under the sink root, which
    is never renamed."""
    import os as _os

    from pymongo_change_stream_reader_spark.operators.maintenance import (
        IndexWriteLock,
    )

    return IndexWriteLock(_os.path.join(path, "_write.lock"))


def _bucket_of(on: list[str], n_buckets: int) -> Column:
    """Deterministic bucket of the merge key: pmod(xxhash64(keys), n).
    Derived from the on-key columns alone, so it is never stored —
    any reader recomputes it identically."""
    return F.pmod(F.xxhash64(*[F.col(k) for k in on]), F.lit(n_buckets)).cast(
        "int"
    )


def read_bucketed_sink(
    spark: SparkSession, path: str, version: int = 0
) -> DataFrame | None:
    """Read a bucket-partitioned versioned sink: the union of every
    bucket's current directory (``version=0``) or of the previous
    commit's manifest snapshot (``version=-1``, kept in
    ``_manifest.prev``).  Buckets written by different commits may
    carry different columns (merges can add fields) — unionByName with
    allowMissingColumns reconciles them.

    Asymmetry, by contract: ``version=-1`` with nothing retained
    returns None (indistinguishable from — and usually meaning — "only
    one commit ever happened"; replica_changes relies on that probe),
    while ``-n`` for n >= 2 outside the window raises, because deeper
    offsets are only ever requested deliberately."""
    import os

    if not isinstance(version, int) or version > 0:
        raise PipelineError(
            "bucketed-sink version must be 0 (current) or a negative "
            "offset (-n = n commits back, within the retention window)"
        )
    if version < 0:
        cur_mf = _read_bucket_manifest(path)
        if cur_mf is None:
            # no current manifest means no commit ever succeeded: a
            # crash between the FIRST commit's history write and its
            # manifest swap leaves only a phantom snapshot, and serving
            # it would return never-committed data for version=-1 while
            # version=0 says the sink does not exist.  Nonexistent for
            # ALL versions, consistently.
            return None
        hist = _bucket_history_files(path)
        # hist is oldest-first and its LAST entry is the current
        # commit's snapshot, so -n indexes hist[-1 - n].  A crash
        # between the history write and the manifest swap leaves a
        # PHANTOM trailing snapshot (a commit that never became
        # current — see the crash-ordering note in _commit_bucketed);
        # indexing through it would silently return the CURRENT data
        # for version=-1.  After every successful commit the newest
        # snapshot equals _manifest by construction (buried phantoms
        # are purged at commit time), so a differing trailing entry is
        # conclusively a phantom — skip it.
        if hist and _read_bucket_manifest(path, hist[-1]) != cur_mf:
            hist = hist[:-1]
        idx = len(hist) - 1 + version
        if 0 <= idx < len(hist):
            mf = _read_bucket_manifest(path, hist[idx])
        elif version == -1:
            # legacy sinks written before history snapshots existed
            # keep one-step rollback via _manifest.prev
            mf = _read_bucket_manifest(path, "_manifest.prev")
        else:
            raise PipelineError(
                f"bucketed sink at {path!r} retains {len(hist)} "
                f"version(s); version {version} is outside the "
                "retention window (raise `retain` on the merge, or "
                "vacuum less aggressively)"
            )
        if mf is None:
            return None
        entries = mf[1]
    else:
        mf = _read_bucket_manifest(path)
        if mf is None:
            return None
        entries = mf[1]
    return _read_entry_dirs(spark, path, list(entries.values()))


def _read_entry_dirs(
    spark: SparkSession, path: str, rels: list[str]
) -> DataFrame | None:
    """Union the given bucket dirs, grouped by VERSION dir: every
    bucket written by one commit shares that commit's schema, so one
    ``spark.read.parquet(*dirs)`` per version replaces the per-bucket
    read (16 buckets = 16 driver-side footer/schema inferences, ~0.1 s
    each — measured as a real slice of the composed relay's per-batch
    floor); unionByName(allowMissingColumns) still reconciles ACROSS
    versions, where merges may have added fields."""
    import os

    by_version: dict[str, list[str]] = {}
    for rel in rels:
        if os.path.isdir(os.path.join(path, rel)):
            by_version.setdefault(rel.split("/", 1)[0], []).append(rel)
    frames = [
        spark.read.parquet(*[os.path.join(path, rel) for rel in group])
        for group in by_version.values()
    ]
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def _apply_merge_bucketed(
    df: DataFrame,
    spec: dict,
    path: str,
    on: list[str],
    when_matched,
    when_not_matched: str,
    n_buckets,
) -> DataFrame:
    """$merge with the engine's ``buckets: N`` extension — the
    partition-level commit the whole-table protocol cannot give:

    1. incoming keys hash to a CHANGED-bucket set (collected — at most
       N small ints of driver state);
    2. only those buckets' stored data joins the merge (a matching key
       always hashes to the same bucket, so untouched buckets cannot
       change under any whenMatched/whenNotMatched mode);
    3. the merged changed-bucket rows are written ONCE, partitioned by
       bucket, into the next version dir — untouched buckets keep
       their existing directories byte-for-byte;
    4. the manifest (bucket -> dir map) swaps atomically via
       os.replace, with the superseded map kept in ``_manifest.prev``
       (one-step rollback, same retention contract as the plain path).

    At 100 TB this is the Delta/Iceberg-style upsert: write cost
    scales with the touched partitions, not the table.  A crash before
    the manifest swap leaves the previous commit live; GC removes only
    version dirs referenced by neither manifest."""
    import os
    import shutil

    spark = df.sparkSession
    if isinstance(n_buckets, bool) or not isinstance(n_buckets, int) or (
        n_buckets < 1
    ):
        raise PipelineError("$merge buckets must be a positive integer")
    # one materialization: the distinct-bucket probe, any fail-mode
    # probe, and the final write must all see the same incoming data —
    # done BEFORE taking the write lock, so the (possibly long) Spark
    # job that computes the batch never holds other writers up
    df = df.localCheckpoint(eager=True)
    bcol = _bucket_of(on, n_buckets)
    changed = sorted(
        r["b"] for r in df.select(bcol.alias("b")).distinct().collect()
    )
    # the read-merge-commit sequence holds the sink write lock: the
    # stored-bucket snapshot this merge bases itself on must stay the
    # CURRENT manifest until this commit swaps it in, or a concurrent
    # committer's effect silently vanishes (last-writer-wins)
    with bucketed_sink_lock(path):
        if os.path.exists(os.path.join(path, "_manifest")) and (
            _read_bucket_manifest(path) is None
        ):
            raise PipelineError(
                "$merge buckets: target already exists as a WHOLE-TABLE "
                "versioned sink — cannot convert in place"
            )
        mf = _read_bucket_manifest(path)
        if mf is not None and mf[0] != n_buckets:
            raise PipelineError(
                f"$merge buckets={n_buckets} does not match the sink's "
                f"existing bucket count {mf[0]}"
            )
        entries = dict(mf[1]) if mf is not None else {}
        old_frames = [
            spark.read.parquet(os.path.join(path, entries[k]))
            for k in changed
            if k in entries and os.path.isdir(os.path.join(path, entries[k]))
        ]
        old = None
        for f in old_frames:
            old = f if old is None else old.unionByName(
                f, allowMissingColumns=True
            )
        merged = _merge_frames(
            spark, old, df, on, when_matched, when_not_matched, spec
        )
        return _commit_bucketed(
            merged,
            path,
            on,
            n_buckets,
            entries,
            changed,
            retain=spec.get("retain", 2),
        )


def _purge_phantom_history(path: str) -> list[str]:
    """Delete PHANTOM history snapshots — commits whose manifest swap
    never landed.  After a successful commit the newest snapshot
    equals ``_manifest`` by construction, so every snapshot NEWER than
    the newest one matching the installed manifest was never current;
    with no ``_manifest`` at all (first-commit crash) every snapshot
    is a phantom.  If no snapshot matches a present manifest
    (externally tampered / legacy sink) nothing is purged —
    conservative.  Callers hold ``bucketed_sink_lock``.  Returns the
    purged names."""
    import os

    cur_body = _read_bucket_manifest(path)
    hist0 = _bucket_history_files(path)
    if cur_body is None:
        phantoms = hist0
    else:
        phantoms = []
        for name in reversed(hist0):
            if _read_bucket_manifest(path, name) == cur_body:
                break
            phantoms.append(name)
        else:
            phantoms = []
    for name in phantoms:
        os.unlink(os.path.join(path, name))
    return phantoms


def _write_atomic(dest: str, body: str) -> None:
    """Durable single-file write: tmp + fsync + os.replace — the file
    at ``dest`` either keeps its old content or holds the complete new
    body; no crash point exposes a truncation."""
    import os

    tmp = dest + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(body)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, dest)


def _commit_bucketed(
    merged: DataFrame,
    path: str,
    on: list[str],
    n_buckets: int,
    entries: dict[int, str],
    changed: "list[int] | tuple" = (),
    retain: int = 2,
    return_df: bool = True,
) -> DataFrame | None:
    """Commit ``merged`` (the rewritten rows of the CHANGED buckets
    only) into a bucketed versioned sink: one partitioned write, an
    atomic manifest swap, a manifest-history snapshot for time travel
    (the newest ``retain`` commits stay readable via
    ``read_bucketed_sink(version=-n)``), and GC of version dirs
    referenced by NO retained manifest.  ``retain=2`` is the classic
    current+prev contract; larger values widen the time-travel /
    rollback window at the cost of keeping superseded bucket dirs on
    disk until they age out or ``vacuum_bucketed_sink`` prunes them.
    See _apply_merge_bucketed for the full protocol contract.

    CALLERS HOLD ``bucketed_sink_lock(path)`` — every read-merge-commit
    path ($merge buckets, materialize_change_batch, bootstrap_replica,
    compact_replica) wraps its manifest-read → commit span in the lock;
    this function must not re-acquire it (flock on a second fd of the
    same file blocks even within one process)."""
    import os
    import shutil

    # validate BEFORE any filesystem mutation: an invalid retain must
    # leave the sink untouched, not raise with the commit half-installed
    if isinstance(retain, bool) or not isinstance(retain, int) or retain < 1:
        raise PipelineError("bucketed-sink retain must be an int >= 1")
    spark = merged.sparkSession
    vdir = _next_version_dir(path)
    merged.withColumn("__bucket", _bucket_of(on, n_buckets)).write.partitionBy(
        "__bucket"
    ).mode("overwrite").parquet(os.path.join(path, vdir))
    _finalize_bucketed_version(
        path, vdir, n_buckets, entries, changed, retain
    )
    # the post-commit frame costs a manifest read + one reader build
    # per retained version; relay hot paths that ignore it skip the
    # work (return_df=False)
    return read_bucketed_sink(spark, path) if return_df else None


def _next_version_dir(path: str) -> str:
    """Reserve the next version-dir name for a bucketed-sink commit
    and purge phantom history (the pre-write half of
    _commit_bucketed; callers hold the sink write lock)."""
    import os

    os.makedirs(path, exist_ok=True)
    # next version number = max over BOTH live v-dirs AND history
    # snapshot names: an all-deletes commit's (empty) v-dir is GC'd,
    # and reusing its number would silently overwrite that commit's
    # history snapshot — version numbers must never recycle
    seen = [
        int(d[2:])
        for d in os.listdir(path)
        if d.startswith("v-") and os.path.isdir(os.path.join(path, d))
    ] + [int(h.rsplit("v-", 1)[1]) for h in _bucket_history_files(path)]
    vdir = f"v-{(max(seen) + 1 if seen else 1):06d}"
    # purge PHANTOM history snapshots left by a crash between a prior
    # commit's history write and its manifest swap.  Without this,
    # THIS commit's snapshot would bury the phantom mid-history, after
    # which read_bucketed_sink(version=-1) resolves to the phantom —
    # never-committed data served as "the previous commit" — and every
    # deeper -n read is off by one.  (Purged AFTER `seen` so the
    # phantom's version number still counts toward never-recycling.)
    _purge_phantom_history(path)
    return vdir


def _finalize_bucketed_version(
    path: str,
    vdir: str,
    n_buckets: int,
    entries: dict,
    changed,
    retain: int,
) -> None:
    """Install an already-written version dir as the sink's current
    commit: written-bucket scan, manifest build, history snapshot,
    atomic swap, retention, GC — the post-write half of
    _commit_bucketed (callers hold the sink write lock).  Split out
    so the FUSED commit path (one Spark write for several stores,
    _commit_bucketed_fused) can reuse the manifest protocol
    unchanged; it is also the per-store crash seam the chaos suites
    hook."""
    import os
    import shutil

    vpath = os.path.join(path, vdir)
    written = (
        {
            int(d.split("=", 1)[1])
            for d in os.listdir(vpath)
            if d.startswith("__bucket=")
        }
        if os.path.isdir(vpath)
        else set()
    )
    new_entries = dict(entries)
    for k in written:
        new_entries[k] = f"{vdir}/__bucket={k}"
    # a changed bucket that produced NO rows (every document deleted —
    # the materializer path) must drop its stale entry, not keep
    # serving the pre-delete data
    for k in changed:
        if k not in written:
            new_entries.pop(k, None)
    mpath = os.path.join(path, "_manifest")
    body = f"buckets={n_buckets}" + "".join(
        f"\n{k}:{new_entries[k]}" for k in sorted(new_entries)
    )
    # archive this commit's history snapshot FIRST (durably: tmp +
    # fsync + os.replace, same discipline as the main manifest — a
    # crash mid-write must never leave a truncated _manifest.h-* that
    # poisons every later commit's GC pass), then snapshot the
    # superseded map (rollback / legacy version=-1), then the atomic
    # swap that IS the commit point.  Crash ordering: history-before-
    # swap means a crash in between leaves a PHANTOM snapshot (a fully
    # written commit that never became current) occupying one retention
    # slot until it ages out — its data dirs are GC-protected, so
    # reading it is consistent.  The reverse order would instead leave
    # the current commit with NO snapshot, permanently off-by-one-ing
    # every version=-n read across that boundary — strictly worse.
    _write_atomic(os.path.join(path, f"_manifest.h-{vdir}"), body)
    prev_path = os.path.join(path, "_manifest.prev")
    if retain >= 2:
        if os.path.exists(mpath):
            shutil.copyfile(mpath, prev_path)
    elif os.path.exists(prev_path):
        # retain=1 means ONLY the current commit is retained: a live
        # _manifest.prev would keep serving version=-1 (and pinning its
        # dirs) outside the declared window
        os.unlink(prev_path)
    _write_atomic(mpath, body)
    hist = _bucket_history_files(path)
    for stale in hist[: max(0, len(hist) - retain)]:
        os.unlink(os.path.join(path, stale))
    _gc_bucket_versions(path)


def _commit_bucketed_fused(specs: list, scratch_root: str) -> None:
    """Commit SEVERAL bucketed stores' changed-bucket rows with ONE
    Spark write (the r14 per-store driver-job cut, guide §1.2/§2.4:
    the commit wave's floor is per-write driver latency + commit
    protocol, not data).  ``specs``: dicts with keys ``name`` (store
    tag — a safe dirname), ``df`` (rows to commit), ``path``, ``on``,
    ``n_buckets``, ``entries``, ``changed``, ``retain`` — the exact
    per-store _commit_bucketed arguments.  CALLERS HOLD the sink
    write lock covering every store (the view stores share the view
    root's lock).

    Mechanics: each store's frame gains its own ``__bucket`` (hashed
    on ITS key columns) and a ``__fstore`` tag; the union writes once
    under ``scratch_root/.commit-wave`` partitioned by
    (__fstore, __bucket); each store's bucket dirs are then RENAMED
    into that store's next version dir and finalized through the
    normal manifest protocol (_finalize_bucketed_version) — pure
    filesystem ops, no further Spark jobs.  The union schema means a
    store's parquet files can carry the OTHER stores' columns as
    nulls; every reader of these stores selects its own columns or
    reads with an explicit schema, and unionByName across versions
    reconciles (the same contract schema-on-read already relies on).
    A crash mid-wave leaves either no manifest swapped (invisible) or
    a prefix of stores swapped — exactly the per-store-commit crash
    surface the replay contracts already cover.  Falls back to
    per-store _commit_bucketed when the frames cannot union (e.g. a
    user field column colliding with another store's column under a
    different type)."""
    import os
    import shutil

    for s in specs:
        if (
            isinstance(s["retain"], bool)
            or not isinstance(s["retain"], int)
            or s["retain"] < 1
        ):
            raise PipelineError("bucketed-sink retain must be an int >= 1")
    wave = os.path.join(scratch_root, ".commit-wave")
    shutil.rmtree(wave, ignore_errors=True)
    try:
        tagged = None
        for s in specs:
            t = (
                s["df"]
                .withColumn(
                    "__bucket", _bucket_of(s["on"], s["n_buckets"])
                )
                .withColumn("__fstore", F.lit(s["name"]))
            )
            tagged = (
                t
                if tagged is None
                else tagged.unionByName(t, allowMissingColumns=True)
            )
        tagged.write.partitionBy("__fstore", "__bucket").mode(
            "overwrite"
        ).parquet(wave)
    except Exception:
        # un-unionable frames (same-name different-type columns):
        # the per-store path is always correct, just more jobs
        shutil.rmtree(wave, ignore_errors=True)
        for s in specs:
            _commit_bucketed(
                s["df"], s["path"], s["on"], s["n_buckets"],
                s["entries"], s["changed"], retain=s["retain"],
                return_df=False,
            )
        return
    for s in specs:
        path = s["path"]
        vdir = _next_version_dir(path)
        vpath = os.path.join(path, vdir)
        os.makedirs(vpath, exist_ok=True)
        src = os.path.join(wave, f"__fstore={s['name']}")
        if os.path.isdir(src):
            for d in os.listdir(src):
                if d.startswith("__bucket="):
                    os.rename(
                        os.path.join(src, d), os.path.join(vpath, d)
                    )
        _finalize_bucketed_version(
            path, vdir, s["n_buckets"], s["entries"], s["changed"],
            s["retain"],
        )
    shutil.rmtree(wave, ignore_errors=True)


def _gc_bucket_versions(path: str) -> None:
    """Remove version dirs referenced by NO retained manifest (current,
    _manifest.prev, or any history snapshot).  A version dir survives
    while ANY retained manifest references any bucket inside it —
    superseded bucket dirs inside a still-live version dir linger until
    the whole dir is unreferenced (bounded retention slack,
    documented).  Safe under a concurrent reader of a RETAINED version:
    every dir such a reader can reach through a retained manifest is a
    survivor by construction."""
    import os
    import shutil

    survivors: set[str] = set()
    hist = _bucket_history_files(path)
    names = ["_manifest", "_manifest.prev"] + hist
    for name in names:
        mf = _read_bucket_manifest(path, name)
        if mf is not None:
            survivors |= {rel.split("/", 1)[0] for rel in mf[1].values()}
    # High-watermark guard (defense in depth under the sink write
    # lock): an IN-FLIGHT commit writes its v-dir long before any
    # manifest references it, so a dir numbered above every retained
    # reference AND above every completed commit's history snapshot
    # may be mid-write — never GC it.  A CRASHED commit's orphan dir
    # becomes collectable as soon as the next successful commit takes
    # a higher number (version numbers never recycle).
    watermark = max(
        [int(d[2:]) for d in survivors]
        + [int(h.rsplit("v-", 1)[1]) for h in hist]
        + [0]
    )
    for entry in os.listdir(path):
        if (
            entry.startswith("v-")
            and entry not in survivors
            and os.path.isdir(os.path.join(path, entry))
            and int(entry[2:]) <= watermark
        ):
            shutil.rmtree(os.path.join(path, entry), ignore_errors=True)


def vacuum_bucketed_sink(path: str, keep: int = 1) -> int:
    """Shrink a bucketed sink's retention window to the newest ``keep``
    commits and GC the version dirs that fall out of it.  Returns the
    number of history snapshots dropped.  ``keep >= 1`` always — the
    current commit is never vacuumable.  The stale ``_manifest.prev``
    compatibility snapshot is dropped too when ``keep == 1`` (it
    references the pre-current commit); a reader holding an
    already-opened DataFrame keeps working until its underlying files
    are deleted, exactly the Delta/Iceberg vacuum contract — vacuum
    trades replay depth for space, never current-version safety."""
    import os

    if isinstance(keep, bool) or not isinstance(keep, int) or keep < 1:
        raise PipelineError("vacuum keep must be an int >= 1")
    # GC holds the sink write lock: without it a vacuum racing an
    # in-flight commit could delete the version dir the commit has
    # written but whose manifest swap hasn't landed yet (the
    # high-watermark guard in _gc_bucket_versions is defense in depth
    # behind this lock, not a substitute for it)
    with bucketed_sink_lock(path):
        if _read_bucket_manifest(path) is None:
            # NOT a bucketed sink (whole-table manifests start with a
            # version dir, not 'buckets=') — proceeding would compute an
            # empty survivor set and delete EVERY v-* dir including the
            # current commit
            raise PipelineError(
                f"{path!r} is not a bucketed versioned sink; vacuum "
                "applies to bucketed sinks only"
            )
        # purge phantoms FIRST: a trailing phantom would otherwise
        # count toward `keep` and push the REAL anchor snapshot (the
        # one matching _manifest) into the stale set — after which the
        # next commit's purge finds no anchor, goes conservative, and
        # buries the phantom where version=-1 serves it (review r6
        # finding #2)
        _purge_phantom_history(path)
        hist = _bucket_history_files(path)
        stale = hist[: max(0, len(hist) - keep)]
        for name in stale:
            os.unlink(os.path.join(path, name))
        if keep == 1 and os.path.exists(os.path.join(path, "_manifest.prev")):
            os.unlink(os.path.join(path, "_manifest.prev"))
        _gc_bucket_versions(path)
        return len(stale)


def _apply_when_matched_pipeline(
    old: DataFrame,
    incoming: DataFrame,
    on: str,
    stages: list,
    let_spec: dict | None = None,
) -> DataFrame:
    """$merge whenMatched custom-update pipeline: each stage runs
    over the STORED document with ``$$new`` bound to the incoming
    document (Mongo's update-pipeline form).  Supported stages:
    $addFields/$set (dotted targets included), $unset,
    $replaceWith/$replaceRoot, and $project (on-key-protected
    inclusion/exclusion + computed fields; the on key — including its
    subfields — is immutable, as _id is in Mongo update pipelines).
    The whole form is one inner join plus per-row expressions — no
    extra exchange beyond the join itself."""
    # ``let`` values evaluate against the INCOMING document (Mongo's
    # default is {new: "$$ROOT"}), so they are computed as columns on
    # the incoming frame BEFORE the join — bare `$field` paths inside
    # a let expression then naturally resolve to incoming fields.
    base_cols = list(incoming.columns)
    let_names = list(let_spec or {})
    for name in let_names:
        incoming = incoming.withColumn(
            f"__let_{name}", translate_expr((let_spec or {})[name])
        )
    joined = old.alias("__o").join(incoming.alias("__n"), on, "inner")
    new_struct = F.struct(
        *[F.col(f"__n.{c}").alias(c) for c in base_cols]
    )
    out = joined.select(
        *[F.col(f"__o.{c}").alias(c) for c in old.columns],
        new_struct.alias("__new"),
        *[
            F.col(f"__n.__let_{n}").alias(f"__let_{n}")
            for n in let_names
        ],
    )
    hidden = ["__new"] + [f"__let_{n}" for n in let_names]
    for stage in stages:
        if not (isinstance(stage, dict) and len(stage) == 1):
            raise PipelineError(
                "$merge whenMatched pipeline stage must be a "
                "single-key document"
            )
        [(sname, sspec)] = stage.items()
        doc_cols = [c for c in out.columns if c not in hidden]
        doc = F.struct(*[F.col(c).alias(c) for c in doc_cols])
        env = {"ROOT": doc, "CURRENT": doc, "new": F.col("__new")}
        for n in let_names:
            env[n] = F.col(f"__let_{n}")
        if sname in ("$addFields", "$set"):
            for field, expr in sspec.items():
                if "." in field:
                    root, rest = field.split(".", 1)
                    out = out.withColumn(
                        root,
                        F.col(root).withField(
                            rest, translate_expr(expr, env)
                        ),
                    )
                else:
                    out = out.withColumn(field, translate_expr(expr, env))
        elif sname == "$unset":
            fields = [sspec] if isinstance(sspec, str) else list(sspec)
            on_keys = [on] if isinstance(on, str) else list(on)
            if any(k in fields for k in on_keys):
                raise PipelineError(
                    "$merge whenMatched pipeline cannot unset the on key"
                )
            out = out.drop(*fields)
        elif sname in ("$replaceWith", "$replaceRoot"):
            root_expr = (
                sspec["newRoot"] if sname == "$replaceRoot" else sspec
            )
            out = out.select(
                translate_expr(root_expr, env).alias("__root"), *hidden
            ).select("__root.*", *hidden)
        elif sname == "$project":
            # Mid-merge $project: the on key is immutable (Mongo's
            # update pipelines cannot remove _id), so it always
            # survives; beyond that the stage is on-key-protected
            # drops + computed fields over the stored doc.  Dotted
            # inclusion paths are declared narrower (top-level only),
            # matching the rest of the update-pipeline surface.
            if not isinstance(sspec, dict) or not sspec:
                raise PipelineError("$project requires at least one field")
            computed, included, excluded = _classify_project_spec(sspec)
            on_keys = [on] if isinstance(on, str) else list(on)

            def _touches_on(k: str) -> bool:
                # whole key OR any subfield of it — the on key is
                # immutable incl. its nested parts (Mongo update
                # pipelines reject any _id modification)
                return any(k == ok or k.startswith(ok + ".") for ok in on_keys)

            if any("." in k for k in included + list(computed)):
                raise PipelineError(
                    "$merge pipeline $project supports top-level "
                    "fields only"
                )
            if any(_touches_on(k) for k in list(computed)):
                raise PipelineError(
                    "$merge pipeline $project cannot recompute the on key"
                )
            if included or computed:
                bad = [k for k in excluded if not _touches_on(k)]
                if bad:
                    raise PipelineError(
                        f"cannot exclude {bad!r} in an inclusion $project"
                    )
                if excluded:
                    raise PipelineError(
                        "$merge pipeline $project cannot exclude the on key"
                    )
                keep = set(included) | set(computed) | set(on_keys)
                drops = [c for c in doc_cols if c not in keep]
            else:
                if any(_touches_on(k) for k in excluded):
                    raise PipelineError(
                        "$merge pipeline $project cannot exclude the on key"
                    )
                drops = [c for c in excluded if "." not in c]
                for k in excluded:
                    if "." in k:
                        root, rest = k.split(".", 1)
                        out = out.withColumn(
                            root, F.col(root).dropFields(rest)
                        )
            for k, v in computed.items():
                out = out.withColumn(k, translate_expr(v, env))
            out = out.drop(*drops)
        else:
            raise PipelineError(
                f"unsupported $merge whenMatched pipeline stage {sname!r}"
            )
    return out.drop(*hidden)


def _apply_merge(df: DataFrame, spec, sinks: dict | None) -> DataFrame:
    """$merge -> upsert into a parquet target keyed by ``on``:
    whenMatched replace/keepExisting/merge or a custom-update
    pipeline (list form, $$new bound to the incoming doc),
    whenNotMatched insert/discard.  ``merge`` is
    field-level: non-null fields of the incoming doc override, null
    fields keep the stored value — in a fixed-schema DataFrame a
    "missing" field ≙ null, so an incoming explicit null cannot erase
    a stored value (declared deviation; Mongo distinguishes missing
    from null).  The merged result is committed through the
    versioned-manifest protocol (_versioned_commit): a failed write
    can never destroy the previously committed target."""

    if isinstance(spec, str):
        spec = {"into": spec}
    target = spec.get("into")
    on = spec.get("on", "_id")
    # Mongo accepts a single field or an array (compound unique key);
    # Spark's join/select take the list form natively.
    on = [on] if isinstance(on, str) else list(on)
    when_matched = spec.get("whenMatched", "replace")
    when_not_matched = spec.get("whenNotMatched", "insert")
    if not isinstance(when_matched, list) and when_matched not in (
        "replace",
        "keepExisting",
        "merge",
        "fail",
    ):
        raise PipelineError(
            f"unsupported $merge whenMatched {when_matched!r}"
        )
    if when_not_matched not in ("insert", "discard", "fail"):
        raise PipelineError(
            f"unsupported $merge whenNotMatched {when_not_matched!r}"
        )
    if not sinks or target not in sinks:
        raise PipelineError(
            f"$merge into {target!r}: pass the path via "
            "translate_pipeline(..., sinks={name: path})"
        )
    path = sinks[target]
    spark = df.sparkSession
    n_buckets = spec.get("buckets")
    if n_buckets is not None:
        return _apply_merge_bucketed(
            df, spec, path, on, when_matched, when_not_matched, n_buckets
        )
    if _read_bucket_manifest(path) is not None:
        raise PipelineError(
            f"$merge into {target!r}: target is a BUCKETED sink — "
            "pass the same 'buckets' count to merge into it"
        )
    old = read_versioned_sink(spark, path)
    merged = _merge_frames(
        spark, old, df, on, when_matched, when_not_matched, spec
    )
    return _versioned_commit(merged, path)


def _merge_frames(
    spark: SparkSession,
    old: DataFrame | None,
    df: DataFrame,
    on: list[str],
    when_matched,
    when_not_matched: str,
    spec: dict,
) -> DataFrame:
    """The engine of $merge: combine the stored frame (``old``, may be
    None) with the incoming frame under the whenMatched/whenNotMatched
    mode matrix and return the merged result — no I/O.  Shared by the
    whole-table commit path and the bucket-pruned path (where ``old``
    is pre-restricted to the buckets the incoming keys hash into —
    safe because a matching key always hashes to the same bucket)."""
    # "fail" modes abort the whole merge BEFORE any write — the
    # versioned target is untouched (Mongo errors the aggregate).
    # Materialize the incoming frame once first: each isEmpty probe
    # and the final write would otherwise recompute the full upstream
    # pipeline, and a non-deterministic source could even let the
    # checked condition diverge from the data actually merged.
    if "fail" in (when_matched, when_not_matched):
        df = df.localCheckpoint(eager=True)
    if when_not_matched == "fail":
        unmatched_new = (
            df
            if old is None
            else df.join(old.select(on).distinct(), on, "left_anti")
        )
        if not unmatched_new.isEmpty():
            raise PipelineError(
                "$merge whenNotMatched: fail — incoming documents "
                "have no match in the target"
            )
        when_not_matched = "discard"  # nothing unmatched remains
    if when_matched == "fail":
        if old is not None and not df.join(
            old.select(on).distinct(), on, "semi"
        ).isEmpty():
            raise PipelineError(
                "$merge whenMatched: fail — incoming documents "
                "match existing target documents"
            )
        when_matched = "keepExisting"  # no matches remain by proof
    if old is not None:
        if when_matched == "replace":
            kept_old = old.join(df.select(on).distinct(), on, "left_anti")
            new_side = (
                df
                if when_not_matched == "insert"
                else df.join(old.select(on).distinct(), on, "semi")
            )
        elif when_matched == "merge":
            # field-level: one inner join builds the merged matched
            # rows (coalesce new-over-old per shared column, old-only
            # and new-only columns pass through)
            cols = [F.col(k) for k in on]
            for c in old.columns:
                if c in on:
                    continue
                if c in df.columns:
                    cols.append(
                        F.coalesce(
                            F.col(f"__n.{c}"), F.col(f"__o.{c}")
                        ).alias(c)
                    )
                else:
                    cols.append(F.col(f"__o.{c}"))
            for c in df.columns:
                if c not in on and c not in old.columns:
                    cols.append(F.col(f"__n.{c}"))
            matched = (
                old.alias("__o").join(df.alias("__n"), on, "inner")
                .select(*cols)
            )
            unmatched_old = old.join(
                df.select(on).distinct(), on, "left_anti"
            )
            kept_old = unmatched_old.unionByName(
                matched, allowMissingColumns=True
            )
            new_side = (
                df.join(old.select(on).distinct(), on, "left_anti")
                if when_not_matched == "insert"
                else spark.createDataFrame([], df.schema)
            )
        elif isinstance(when_matched, list):
            matched = _apply_when_matched_pipeline(
                old, df, on, when_matched, spec.get("let")
            )
            unmatched_old = old.join(
                df.select(on).distinct(), on, "left_anti"
            )
            kept_old = unmatched_old.unionByName(
                matched, allowMissingColumns=True
            )
            new_side = (
                df.join(old.select(on).distinct(), on, "left_anti")
                if when_not_matched == "insert"
                else spark.createDataFrame([], df.schema)
            )
        else:  # keepExisting
            kept_old = old
            new_side = (
                df.join(old.select(on).distinct(), on, "left_anti")
                if when_not_matched == "insert"
                else spark.createDataFrame([], df.schema)
            )
        merged = kept_old.unionByName(new_side, allowMissingColumns=True)
    else:
        merged = df if when_not_matched == "insert" else df.limit(0)
    return merged
