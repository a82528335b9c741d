"""Oracle-checked queries driving the Mongo-pipeline translator
(SURVEY §2.B) over the events table and the simulated change stream.

Each query feeds an Extended-JSON pipeline through
``plans.pipeline.translate_pipeline`` — exactly the path a reference
user's ``cursor_pipeline`` setting takes — and the oracle reproduces
the semantics in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.plans.pipeline import translate_pipeline
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.simulate import simulate_change_stream
from pymongo_change_stream_reader_spark.sources.tables import load_table


@query(
    "pipeline_match_project",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value >= 100
    ORDER BY event_id
    """,
    doc="$match ($in, $gte) + $project inclusion -> filter/select; "
    "predicates reach the parquet scan via Catalyst pushdown.",
    tags=("pipeline",),
)
def pipeline_match_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        """
        [{"$match": {"event_type": {"$in": ["click", "purchase"]},
                     "value": {"$gte": 100}}},
         {"$project": {"event_id": 1, "user_id": 1, "event_type": 1, "value": 1}}]
        """
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_match_boolean_ops",
    oracle="""
    SELECT event_id, event_type, value
    FROM events
    WHERE event_type = 'error'
       OR (value < 50 AND (user_id % 7) = 0 AND props IS NOT NULL
           AND regexp_matches(props, '"k": 1[0-9]'))
    ORDER BY event_id
    """,
    doc="$match with $or/$and/$mod/$exists/$regex predicate tree.",
    tags=("pipeline",),
)
def pipeline_match_boolean_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$match": {
                    "$or": [
                        {"event_type": "error"},
                        {
                            "$and": [
                                {"value": {"$lt": 50}},
                                {"user_id": {"$mod": [7, 0]}},
                                {"props": {"$exists": True}},
                                {"props": {"$regex": '"k": 1[0-9]'}},
                            ]
                        },
                    ]
                }
            },
            {"$project": {"event_id": 1, "event_type": 1, "value": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_addfields_compute",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value / 50) AS BIGINT)                 AS value_bucket,
           UPPER(event_type) || '-' || CAST(user_id AS VARCHAR) AS label,
           CASE WHEN value >= 250 THEN 'high' ELSE 'low' END AS tier
    FROM events
    ORDER BY event_id
    """,
    doc="$addFields with $floor/$divide/$concat/$toUpper/$toString/"
    "$cond computed expressions + $project.",
    tags=("pipeline",),
)
def pipeline_addfields_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$addFields": {
                    "value_bucket": {"$floor": {"$divide": ["$value", 50]}},
                    "label": {
                        "$concat": [
                            {"$toUpper": "$event_type"},
                            "-",
                            {"$toString": "$user_id"},
                        ]
                    },
                    "tier": {
                        "$cond": {
                            "if": {"$gte": ["$value", 250]},
                            "then": "high",
                            "else": "low",
                        }
                    },
                }
            },
            {
                "$project": {
                    "event_id": 1, "value_bucket": 1, "label": 1, "tier": 1
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_unset",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE event_id < 3000
    ORDER BY event_id
    """,
    doc="$unset -> drop columns ($match first so the scan prunes).",
    tags=("pipeline",),
)
def pipeline_unset(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 3000}}},
            {"$unset": ["props", "value"]},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_dotted_path_replaceroot",
    oracle="""
    SELECT 'users_' || CAST(user_id % 4 AS VARCHAR) AS coll,
           COUNT(*) AS n
    FROM events
    WHERE event_type IN ('signup', 'purchase', 'click', 'error')
    GROUP BY coll
    ORDER BY coll
    """,
    doc="Dotted-path $match (ns.db) + $replaceRoot promoting the ns "
    "struct, over the simulated change stream.",
    tags=("pipeline", "cdc"),
)
def pipeline_dotted_path_replaceroot(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$match": {
                    "ns.db": "appdb",
                    "operationType": {
                        "$in": ["insert", "update", "replace", "delete"]
                    },
                }
            },
            {"$replaceRoot": {"newRoot": "$ns"}},
        ]
    )
    out = pipe(simulate_change_stream(spark, sf_dir))
    return (
        out.groupBy("coll").agg(F.count("*").alias("n")).orderBy("coll")
    )


@query(
    "pipeline_expr_datetostring",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:00') AS hour_bucket
    FROM events
    WHERE value * 2 > 900
    ORDER BY event_id
    """,
    doc="$expr arithmetic predicate + $dateToString formatting.",
    tags=("pipeline",),
)
def pipeline_expr_datetostring(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"$expr": {"$gt": [{"$multiply": ["$value", 2]}, 900]}}},
            {
                "$project": {
                    "event_id": 1,
                    "hour_bucket": {
                        "$dateToString": {"format": "%Y-%m-%d %H:00", "date": "$ts"}
                    },
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_switch_let",
    oracle="""
    SELECT event_id,
           CASE
             WHEN value >= 300 THEN 'high'
             WHEN value >= 100 THEN 'mid'
             ELSE 'low'
           END AS band,
           ROUND(value * 100 + CAST(json_extract_string(props, '$.k') AS INT), 4)
               AS scorex
    FROM events
    WHERE event_id < 3000
    ORDER BY event_id
    """,
    doc="$switch multi-branch + $let variable binding in computed "
    "projections.",
    tags=("pipeline",),
)
def pipeline_switch_let(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 3000}}},
            {
                "$project": {
                    "event_id": 1,
                    "band": {
                        "$switch": {
                            "branches": [
                                {"case": {"$gte": ["$value", 300]}, "then": "high"},
                                {"case": {"$gte": ["$value", 100]}, "then": "mid"},
                            ],
                            "default": "low",
                        }
                    },
                    "scorex": {
                        "$let": {
                            "vars": {"cents": {"$multiply": ["$value", 100]}},
                            "in": {
                                "$round": [
                                    {
                                        "$add": [
                                            "$$cents",
                                            {"$toInt": "$k_str"},
                                        ]
                                    },
                                    4,
                                ]
                            },
                        }
                    },
                }
            },
        ]
    )
    e = load_table(spark, sf_dir, "events").withColumn(
        "k_str", F.get_json_object("props", "$.k")
    )
    return pipe(e).orderBy("event_id")


@query(
    "pipeline_redact_date_ops",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP)        AS day,
           CAST(isodow(ts) AS INT)                          AS idow,
           datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS age_days,
           CAST(ts + INTERVAL 48 HOUR AS TIMESTAMP)         AS due
    FROM events
    WHERE regexp_matches(event_type, '^(?i)(CLICK|PURCHASE)$')
    ORDER BY event_id
    """,
    doc="$redact (KEEP/PRUNE via $regexMatch) + the date family: "
    "$dateTrunc, $isoDayOfWeek, $dateDiff (boundary-crossing "
    "semantics), $dateAdd — SURVEY 2.B expression passthrough.",
    tags=("pipeline",),
)
def pipeline_redact_date_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$redact": {
                    "$cond": [
                        {
                            "$regexMatch": {
                                "input": "$event_type",
                                "regex": "^(CLICK|PURCHASE)$",
                                "options": "i",
                            }
                        },
                        "$$KEEP",
                        "$$PRUNE",
                    ]
                }
            },
            {
                "$addFields": {
                    "day": {"$dateTrunc": {"date": "$ts", "unit": "day"}},
                    "idow": {"$isoDayOfWeek": "$ts"},
                    "age_days": {
                        "$dateDiff": {
                            "startDate": {"$toDate": {"$literal": "2024-01-01"}},
                            "endDate": "$ts",
                            "unit": "day",
                        }
                    },
                    "due": {
                        "$dateAdd": {"startDate": "$ts", "unit": "hour", "amount": 48}
                    },
                }
            },
            {
                "$project": {
                    "event_id": 1,
                    "day": 1,
                    "idow": 1,
                    "age_days": 1,
                    "due": 1,
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_group_agg",
    oracle="""
    SELECT event_type AS _id,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total,
           ROUND(MAX(value), 2) AS mx
    FROM events
    GROUP BY event_type
    """,
    doc="$group with $sum/$max accumulators over an expression key -> "
    "groupBy().agg() (one shuffle, map-side partial aggregation).",
    tags=("pipeline", "agg"),
)
def pipeline_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$group": {
                    "_id": "$event_type",
                    "n": {"$sum": 1},
                    "total": {"$sum": "$value"},
                    "mx": {"$max": "$value"},
                }
            },
            {
                "$project": {
                    "_id": 1,
                    "n": 1,
                    "total": {"$round": ["$total", 2]},
                    "mx": {"$round": ["$mx", 2]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_unwind_split",
    oracle="""
    SELECT event_id, unnest(string_split(event_type, 'u')) AS parts
    FROM events
    """,
    doc="$split (literal delimiter, regex-escaped) + $unwind -> "
    "split + explode; zero-shuffle narrow plan.",
    tags=("pipeline",),
)
def pipeline_unwind_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$project": {"event_id": 1, "parts": {"$split": ["$event_type", "u"]}}},
            {"$unwind": "$parts"},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_sort_skip_limit",
    oracle="""
    SELECT event_id, ROUND(value, 2) AS value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 10 OFFSET 5
    """,
    doc="$sort/$skip/$limit page over a deterministic total order "
    "(unique tiebreak) -> TakeOrdered-family plan, no full sort at "
    "the driver.",
    tags=("pipeline",),
)
def pipeline_sort_skip_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$sort": {"value": -1, "event_id": 1}},
            {"$skip": 5},
            {"$limit": 10},
            {"$project": {"event_id": 1, "value": {"$round": ["$value", 2]}}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_sort_by_count",
    oracle="""
    SELECT event_type AS _id, COUNT(*) AS count
    FROM events
    GROUP BY event_type
    """,
    doc="$sortByCount -> groupBy().count() with count-desc order "
    "(hash compare is order-insensitive; the order itself is asserted "
    "in pytest).",
    tags=("pipeline", "agg"),
)
def pipeline_sort_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline([{"$sortByCount": "$event_type"}])
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_count_stage",
    oracle="""
    SELECT COUNT(*) AS n FROM events WHERE value > 100
    """,
    doc="$match + $count -> filtered global aggregate.",
    tags=("pipeline", "agg"),
)
def pipeline_count_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [{"$match": {"value": {"$gt": 100}}}, {"$count": "n"}]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_elemmatch_size",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE len(string_split(event_type, 'u')) = 2
      AND list_contains(string_split(event_type, 'u'), 'p')
    """,
    doc="$elemMatch ($eq body) + $size on a computed array column.",
    tags=("pipeline",),
)
def pipeline_elemmatch_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$addFields": {"parts": {"$split": ["$event_type", "u"]}}},
            {
                "$match": {
                    "parts": {"$elemMatch": {"$eq": "p"}, "$size": 2}
                }
            },
            {"$project": {"event_id": 1, "event_type": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_date_from_parts",
    oracle="""
    SELECT event_id, date_trunc('second', ts) AS rebuilt
    FROM events
    WHERE event_id < 500
    """,
    doc="$dateFromParts round-trips $year..$second of ts (carry "
    "semantics covered in pytest).",
    tags=("pipeline", "date"),
)
def pipeline_date_from_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 500}}},
            {
                "$addFields": {
                    "rebuilt": {
                        "$dateFromParts": {
                            "year": {"$year": "$ts"},
                            "month": {"$month": "$ts"},
                            "day": {"$dayOfMonth": "$ts"},
                            "hour": {"$hour": "$ts"},
                            "minute": {"$minute": "$ts"},
                            "second": {"$second": "$ts"},
                        }
                    }
                }
            },
            {"$project": {"event_id": 1, "rebuilt": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_lookup_unwind",
    oracle="""
    SELECT o.o_orderkey, c.c_name, ROUND(o.o_totalprice, 2) AS price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderkey < 2000
    """,
    doc="$lookup (equality form) + $unwind + nested-field $project -> "
    "plain join: Catalyst broadcasts the grouped foreign side.",
    tags=("pipeline", "join"),
)
def pipeline_lookup_unwind(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"o_orderkey": {"$lt": 2000}}},
            {
                "$lookup": {
                    "from": "customer",
                    "localField": "o_custkey",
                    "foreignField": "c_custkey",
                    "as": "cust",
                }
            },
            {"$unwind": "$cust"},
            {
                "$project": {
                    "o_orderkey": 1,
                    "c_name": "$cust.c_name",
                    "price": {"$round": ["$o_totalprice", 2]},
                }
            },
        ],
        tables={"customer": load_table(spark, sf_dir, "customer")},
    )
    return pipe(load_table(spark, sf_dir, "orders"))


@query(
    "pipeline_union_with",
    oracle="""
    SELECT event_type AS _id, COUNT(*) AS n
    FROM (
        SELECT event_type FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_type FROM events WHERE event_type = 'purchase'
    )
    GROUP BY event_type
    """,
    doc="$unionWith (with a sub-pipeline on the unioned side) + $group.",
    tags=("pipeline", "setops"),
)
def pipeline_union_with(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pipe = translate_pipeline(
        [
            {"$match": {"event_type": "click"}},
            {
                "$unionWith": {
                    "coll": "events",
                    "pipeline": [{"$match": {"event_type": "purchase"}}],
                }
            },
            {"$group": {"_id": "$event_type", "n": {"$sum": 1}}},
        ],
        tables={"events": events},
    )
    return pipe(events)


@query(
    "pipeline_bucket",
    oracle="""
    SELECT CASE
             WHEN value >= 0   AND value < 50  THEN 0
             WHEN value >= 50  AND value < 100 THEN 50
             WHEN value >= 100 AND value < 200 THEN 100
             WHEN value >= 200 AND value < 500 THEN 200
             ELSE 999
           END AS _id,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total
    FROM events
    GROUP BY _id
    """,
    doc="$bucket with explicit boundaries -> CASE bucketing + "
    "groupBy (one shuffle, partial agg map-side).",
    tags=("pipeline", "agg"),
)
def pipeline_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$bucket": {
                    "groupBy": "$value",
                    "boundaries": [0, 50, 100, 200, 500],
                    "default": 999,
                    "output": {"n": {"$sum": 1}, "total": {"$sum": "$value"}},
                }
            },
            {
                "$project": {
                    "_id": 1,
                    "n": 1,
                    "total": {"$round": ["$total", 2]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_set_window_fields",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
           CAST(RANK() OVER (PARTITION BY event_type ORDER BY event_id) AS INT) AS rnk,
           ROUND(LAG(value, 1, 0.0) OVER (PARTITION BY event_type ORDER BY event_id), 2) AS prev
    FROM events
    WHERE event_id < 2000
    """,
    doc="$setWindowFields -> Spark window functions: bounded running "
    "sum, rank, and $shift(lag) over a per-type partition.",
    tags=("pipeline", "window"),
)
def pipeline_set_window_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {
                "$setWindowFields": {
                    "partitionBy": "$event_type",
                    "sortBy": {"event_id": 1},
                    "output": {
                        "running": {
                            "$sum": "$value",
                            "window": {"documents": ["unbounded", "current"]},
                        },
                        "rnk": {"$rank": {}},
                        "prev": {
                            "$shift": {"output": "$value", "by": -1, "default": 0.0}
                        },
                    },
                }
            },
            {
                "$project": {
                    "event_id": 1,
                    "running": {"$round": ["$running", 2]},
                    "rnk": 1,
                    "prev": {"$round": ["$prev", 2]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_graph_lookup",
    oracle="""
    WITH RECURSIVE
    nodes AS (
        SELECT event_id AS id, event_id + 1 AS nxt
        FROM events WHERE event_id < 60
    ),
    reach(start_id, id, depth) AS (
        SELECT s.event_id, n.id, 0
        FROM (SELECT event_id FROM events WHERE event_id IN (1, 25, 58)) s
        JOIN nodes n ON n.id = s.event_id
        UNION
        SELECT r.start_id, n.id, r.depth + 1
        FROM reach r JOIN nodes n ON n.id = r.id + 1
        WHERE r.depth < 4
    )
    SELECT CAST(start_id AS BIGINT) AS event_id,
           CAST(id AS BIGINT)       AS node_id,
           CAST(depth AS BIGINT)    AS d
    FROM reach
    ORDER BY event_id, node_id
    """,
    doc="$graphLookup BFS (maxDepth 4, depthField) over a derived "
    "chain graph + $unwind; oracle walks the same graph with a "
    "recursive CTE.",
    tags=("pipeline", "join"),
)
def pipeline_graph_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    nodes = events.filter(F.col("event_id") < 60).select(
        F.col("event_id").cast("long").alias("id"),
        (F.col("event_id") + 1).cast("long").alias("nxt"),
    )
    starters = events.filter(F.col("event_id").isin(1, 25, 58)).select(
        F.col("event_id").cast("long").alias("event_id")
    )
    pipe = translate_pipeline(
        [
            {
                "$graphLookup": {
                    "from": "nodes",
                    "startWith": "$event_id",
                    "connectFromField": "nxt",
                    "connectToField": "id",
                    "as": "chain",
                    "maxDepth": 4,
                    "depthField": "d",
                }
            },
            {"$unwind": "$chain"},
            {
                "$project": {
                    "event_id": 1,
                    "node_id": "$chain.id",
                    "d": "$chain.d",
                }
            },
        ],
        tables={"nodes": nodes},
    )
    return pipe(starters).orderBy("event_id", "node_id")


def _join_csv(inp):
    """Mongo-pipeline helper: join an array to a CSV string via
    $reduce (+$toString), so array results hash as plain strings."""
    return {
        "$reduce": {
            "input": inp,
            "initialValue": "",
            "in": {
                "$cond": [
                    {"$eq": ["$$value", ""]},
                    {"$toString": "$$this"},
                    {"$concat": ["$$value", ",", {"$toString": "$$this"}]},
                ]
            },
        }
    }


@query(
    "pipeline_array_n_ops",
    oracle="""
    WITH t AS (
        SELECT event_id, range(0, (event_id % 5) + 1) AS arr
        FROM events WHERE event_id < 1000
    )
    SELECT event_id,
           array_to_string(list_sort(arr, 'DESC'), ',')      AS desc_str,
           array_to_string(arr[1:2], ',')                    AS first2,
           array_to_string(CASE WHEN len(arr) <= 2 THEN arr
                ELSE arr[len(arr)-1:len(arr)] END, ',')      AS last2,
           array_to_string(list_sort(arr, 'DESC')[1:2], ',') AS max2
    FROM t
    """,
    doc="$sortArray/$firstN/$lastN/$maxN over computed $range arrays, "
    "reduced to CSV strings for hashing.",
    tags=("pipeline",),
)
def pipeline_array_n_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    arr = {"$range": [0, {"$add": [{"$mod": ["$event_id", 5]}, 1]}]}
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 1000}}},
            {
                "$project": {
                    "event_id": 1,
                    "desc_str": _join_csv({"$sortArray": {"input": arr, "sortBy": -1}}),
                    "first2": _join_csv({"$firstN": {"n": 2, "input": arr}}),
                    "last2": _join_csv({"$lastN": {"n": 2, "input": arr}}),
                    "max2": _join_csv({"$maxN": {"n": 2, "input": arr}}),
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_fill_locf",
    oracle="""
    SELECT event_id,
           ROUND(last_value(CASE WHEN event_type = 'view' THEN NULL
                                 ELSE value END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS filled
    FROM events
    WHERE event_id < 2000
    """,
    doc="$fill method:locf -> last-ignore-nulls window (forward fill "
    "per user ordered by event id).",
    tags=("pipeline", "window"),
)
def pipeline_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {
                "$addFields": {
                    "nullable": {
                        "$cond": [
                            {"$eq": ["$event_type", "view"]},
                            None,
                            "$value",
                        ]
                    }
                }
            },
            {
                "$fill": {
                    "partitionBy": "$user_id",
                    "sortBy": {"event_id": 1},
                    "output": {"nullable": {"method": "locf"}},
                }
            },
            {
                "$project": {
                    "event_id": 1,
                    "filled": {"$round": ["$nullable", 2]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_densify",
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(event_id % 20 AS BIGINT) AS slot, COUNT(*) AS n
        FROM events WHERE user_id < 20
        GROUP BY user_id, slot
    ),
    spine AS (
        SELECT DISTINCT d.user_id, s.slot
        FROM d, (SELECT unnest(range(0, 20)) AS slot) s
    )
    SELECT s.user_id, s.slot, d.n
    FROM spine s LEFT JOIN d ON d.user_id = s.user_id AND d.slot = s.slot
    ORDER BY s.user_id, s.slot
    """,
    doc="$densify over a numeric range per partition: generated spine "
    "rows carry null metrics; existing rows survive untouched.",
    tags=("pipeline",),
)
def pipeline_densify(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"user_id": {"$lt": 20}}},
            {
                "$group": {
                    "_id": {"u": "$user_id", "s": {"$mod": ["$event_id", 20]}},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "user_id": "$_id.u",
                    "slot": {"$toLong": "$_id.s"},
                    "n": 1,
                    "_id": 0,
                }
            },
            {
                "$densify": {
                    "field": "slot",
                    "partitionByFields": ["user_id"],
                    "range": {"step": 1, "bounds": [0, 20]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).select(
        "user_id", "slot", "n"
    ).orderBy("user_id", "slot")


@query(
    "pipeline_timeseries_gapfill",
    oracle="""
    WITH d AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n
        FROM events WHERE user_id < 5
        GROUP BY user_id, day
    ),
    b AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    spine AS (
        SELECT u.user_id, s.day
        FROM (SELECT DISTINCT user_id FROM d) u,
             (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
              FROM b) s
    )
    SELECT s.user_id, s.day, COALESCE(d.n, 0) AS n
    FROM spine s LEFT JOIN d ON d.user_id = s.user_id AND d.day = s.day
    ORDER BY s.user_id, s.day
    """,
    doc="Time-series gap fill: $group daily counts -> $densify (day "
    "unit, full bounds) -> $fill zeros — the metrics-pipeline idiom "
    "for complete per-partition time spines.",
    tags=("pipeline", "date"),
)
def pipeline_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"user_id": {"$lt": 5}}},
            {
                "$group": {
                    "_id": {
                        "u": "$user_id",
                        "d": {"$dateTrunc": {"date": "$ts", "unit": "day"}},
                    },
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "user_id": "$_id.u",
                    "day": "$_id.d",
                    "n": 1,
                    "_id": 0,
                }
            },
            {
                "$densify": {
                    "field": "day",
                    "partitionByFields": ["user_id"],
                    "range": {"step": 1, "unit": "day", "bounds": "full"},
                }
            },
            {"$fill": {"output": {"n": {"value": 0}}}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).select(
        "user_id", "day", "n"
    ).orderBy("user_id", "day")


@query(
    "pipeline_group_percentile",
    oracle="""
    SELECT event_type AS _id,
           ROUND(quantile_cont(value, 0.5), 6) AS med,
           ROUND(quantile_cont(value, 0.9), 6) AS p90
    FROM events
    GROUP BY event_type
    """,
    doc="$median / $percentile accumulators (exact interpolated "
    "percentiles; Mongo's 'approximate' t-digest contract, tighter "
    "answer).",
    tags=("pipeline", "agg"),
)
def pipeline_group_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$group": {
                    "_id": "$event_type",
                    "med": {"$median": {"input": "$value"}},
                    "p90": {
                        "$percentile": {"input": "$value", "p": [0.9]}
                    },
                }
            },
            {
                "$project": {
                    "_id": 1,
                    "med": {"$round": ["$med", 6]},
                    "p90": {
                        "$round": [{"$arrayElemAt": ["$p90", 0]}, 6]
                    },
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_sample",
    oracle="""
    SELECT event_id, event_type
    FROM events
    WHERE event_id < 5000
    ORDER BY md5('7:' || CAST(event_id AS VARCHAR)), event_id
    LIMIT 100
    """,
    doc="$sample (declared-deterministic deviation: seeded md5 rank + "
    "top-n; Mongo's nondeterministic draw has no reproducible oracle). "
    "Scale: TakeOrdered top-n, never a full sort.",
    tags=("pipeline",),
)
def pipeline_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 5000}}},
            {"$sample": {"size": 100, "by": "$event_id", "seed": 7}},
            {"$project": {"event_id": 1, "event_type": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_redact_descend",
    oracle="""
    SELECT doc_id,
           doc_id % 7 AS level,
           CASE WHEN doc_id % 5 < 3 THEN doc_id % 5 END AS sub_level,
           CASE WHEN doc_id % 5 < 3 THEN n_chars END AS sub_secret
    FROM documents
    WHERE doc_id % 7 < 3
    ORDER BY doc_id
    """,
    doc="$redact $$DESCEND: per-level re-evaluation — the root decides "
    "document survival, each embedded document independently keeps or "
    "prunes (pruned struct fields -> NULL, the static-schema declared "
    "deviation).  Result flattened to scalars for the oracle hash.",
    tags=("pipeline",),
)
def pipeline_redact_descend(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$project": {
                    "doc_id": 1,
                    "level": {"$mod": ["$doc_id", 7]},
                    "sub": {
                        "level": {"$mod": ["$doc_id", 5]},
                        "secret": "$n_chars",
                    },
                }
            },
            {
                "$redact": {
                    "$cond": [
                        {"$lt": ["$level", 3]},
                        "$$DESCEND",
                        "$$PRUNE",
                    ]
                }
            },
            {
                "$project": {
                    "doc_id": 1,
                    "level": 1,
                    "sub_level": "$sub.level",
                    "sub_secret": "$sub.secret",
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


@query(
    "pipeline_expr_mathops",
    oracle="""
    SELECT event_id,
           ROUND(sin(value / 100.0), 6)                        AS s,
           ROUND(atan2(value, 100.0), 6)                       AS at2,
           ROUND(ln(greatest(value, 1.0)) / ln(2), 6)          AS lg2,
           event_id & 255                                      AS band,
           event_id | 7                                        AS bor,
           xor(event_id, 255)                                  AS bxor,
           replace(event_type, 'c', 'K')                       AS rep,
           CASE WHEN lower(event_type) < lower('ERROR') THEN -1
                WHEN lower(event_type) > lower('ERROR') THEN 1
                ELSE 0 END                                     AS casecmp,
           isoyear(ts)                                         AS iwy,
           list_has_all(range(0, (event_id % 5) + 1), range(0, 3)) AS subset3
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="Round-3 expression surface: trig ($sin/$atan2), arbitrary-"
    "base $log, bitwise $bitAnd/$bitOr/$bitXor, literal $replaceAll, "
    "$strcasecmp, $isoWeekYear, and $setIsSubset over computed $range "
    "sets — each mirrored exactly in the DuckDB oracle.",
    tags=("pipeline",),
)
def pipeline_expr_mathops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {
                "$project": {
                    "event_id": 1,
                    "s": {"$round": [{"$sin": {"$divide": ["$value", 100.0]}}, 6]},
                    "at2": {"$round": [{"$atan2": ["$value", 100.0]}, 6]},
                    "lg2": {
                        "$round": [
                            {"$log": [{"$max": [{"$literal": 1.0}, "$value"]}, 2]},
                            6,
                        ]
                    },
                    "band": {"$bitAnd": ["$event_id", 255]},
                    "bor": {"$bitOr": ["$event_id", 7]},
                    "bxor": {"$bitXor": ["$event_id", 255]},
                    "rep": {
                        "$replaceAll": {
                            "input": "$event_type", "find": "c", "replacement": "K"
                        }
                    },
                    "casecmp": {"$strcasecmp": ["$event_type", "ERROR"]},
                    "iwy": {"$isoWeekYear": "$ts"},
                    "subset3": {
                        "$setIsSubset": [
                            {"$range": [0, 3]},
                            {"$range": [0, {"$add": [{"$mod": ["$event_id", 5]}, 1]}]},
                        ]
                    },
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_expr_cmp_week_bytes",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 10.0 THEN -1
                WHEN value > 10.0 THEN 1 ELSE 0 END          AS c,
           CAST(strftime(ts, '%U') AS INT)                   AS wk,
           strlen(event_type)                                AS blen,
           CASE WHEN strpos(event_type, 'c') = 0 THEN -1
                ELSE strpos(event_type, 'c') - 1 END         AS ib,
           regexp_extract_all(event_type, '[aeiou]+')        AS vowels
    FROM events
    WHERE event_id < 2000
    ORDER BY event_id
    """,
    doc="Round-3 expression surface, part 2: $cmp three-way compare, "
    "$week (strftime %U semantics), $strLenBytes, $indexOfBytes (byte "
    "offset; ASCII corpus makes the DuckDB char-based oracle exact), "
    "and $regexFindAll match extraction.",
    tags=("pipeline",),
)
def pipeline_expr_cmp_week_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {
                "$project": {
                    "event_id": 1,
                    "c": {"$cmp": ["$value", 10.0]},
                    "wk": {"$week": "$ts"},
                    "blen": {"$strLenBytes": "$event_type"},
                    "ib": {"$indexOfBytes": ["$event_type", "c"]},
                    "vowels": {
                        "$map": {
                            "input": {
                                "$regexFindAll": {
                                    "input": "$event_type",
                                    "regex": "[aeiou]+",
                                }
                            },
                            "in": "$$this.match",
                        }
                    },
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_window_timeseries_ops",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, value,
               CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v2
        FROM events WHERE event_id < 5000
    ),
    w AS (
        SELECT event_id, user_id, value, v2,
               last_value(v2 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v2 IS NOT NULL
                               THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pk,
               first_value(v2 IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v2 IS NOT NULL
                                THEN CAST(event_id AS DOUBLE) END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nk,
               lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS py,
               lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS px,
               covar_pop(event_id, value) OVER (PARTITION BY user_id) AS cv
        FROM base
    ),
    areas AS (
        SELECT *,
               (event_id - px) * (value + py) / 2.0 AS pair_area
        FROM w
    )
    SELECT event_id,
           pv AS carried,
           ROUND(CASE WHEN v2 IS NOT NULL THEN v2
                      WHEN pv IS NULL OR nv IS NULL THEN NULL
                      ELSE pv + (nv - pv) * (event_id - pk) / (nk - pk)
                 END, 6)                                            AS lin,
           ROUND((value - py) / NULLIF(CAST(event_id - px AS DOUBLE), 0), 6)
                                                                    AS rate,
           ROUND(COALESCE(SUM(pair_area) OVER (
                     PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 6)
                                                                    AS area,
           ROUND(cv, 6)                                             AS cov
    FROM areas
    ORDER BY event_id
    """,
    doc="Round-3 time-series window surface: $locf, $linearFill "
    "(sort-key-weighted interpolation), $derivative over a 2-doc "
    "frame, cumulative trapezoidal $integral, and $covariancePop — "
    "each rebuilt in the DuckDB oracle from IGNORE NULLS window "
    "passes and lag-pair trapezoids.  Scale: every output is a "
    "window function over the same (user_id, event_id) ordering — "
    "one hash-shuffle on user_id serves all five.",
    tags=("pipeline",),
)
def pipeline_window_timeseries_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 5000}}},
            {
                "$set": {
                    "v2": {
                        "$cond": [
                            {"$eq": ["$event_type", "click"]},
                            None,
                            "$value",
                        ]
                    }
                }
            },
            {
                "$setWindowFields": {
                    "partitionBy": "$user_id",
                    "sortBy": {"event_id": 1},
                    "output": {
                        "carried": {"$locf": "$v2"},
                        "lin0": {"$linearFill": "$v2"},
                        "rate0": {
                            "$derivative": {"input": "$value"},
                            "window": {"documents": [-1, 0]},
                        },
                        "area0": {
                            "$integral": {"input": "$value"},
                            "window": {"documents": ["unbounded", 0]},
                        },
                        "cov0": {"$covariancePop": ["$event_id", "$value"]},
                    },
                }
            },
            {
                "$project": {
                    "event_id": 1,
                    "carried": 1,
                    "lin": {"$round": ["$lin0", 6]},
                    "rate": {"$round": ["$rate0", 6]},
                    "area": {"$round": ["$area0", 6]},
                    "cov": {"$round": ["$cov0", 6]},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_group_top_bottom_n",
    oracle="""
    SELECT user_id AS _id,
           (array_agg(event_id ORDER BY value DESC, event_id DESC))[1] AS top_ev,
           (array_agg(event_id ORDER BY value ASC, event_id ASC))[1]   AS bottom_ev,
           (array_agg(event_id ORDER BY value DESC, event_id ASC))[1:3] AS top3,
           (array_agg(value ORDER BY value ASC))[1:3]                  AS low3,
           (array_agg(value ORDER BY value DESC))[1:3]                 AS high3
    FROM events
    GROUP BY user_id
    ORDER BY _id
    """,
    doc="$top/$bottom/$topN/$minN/$maxN group accumulators.  $top and "
    "$bottom compile to min_by/max_by over a lexicographic struct key "
    "— single map-side-combinable aggregates, no group "
    "materialization; the N-forms sort one collected array per group "
    "with a direction-aware BSON comparator (event_id tiebreak makes "
    "every pick deterministic for the hash compare).",
    tags=("pipeline",),
)
def pipeline_group_top_bottom_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$group": {
                    "_id": "$user_id",
                    "top_ev": {
                        "$top": {
                            "output": "$event_id",
                            "sortBy": {"value": -1, "event_id": -1},
                        }
                    },
                    "bottom_ev": {
                        "$bottom": {
                            "output": "$event_id",
                            "sortBy": {"value": -1, "event_id": -1},
                        }
                    },
                    "top3": {
                        "$topN": {
                            "n": 3,
                            "output": "$event_id",
                            "sortBy": {"value": -1, "event_id": 1},
                        }
                    },
                    "low3": {"$minN": {"input": "$value", "n": 3}},
                    "high3": {"$maxN": {"input": "$value", "n": 3}},
                }
            },
            {"$sort": {"_id": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_lookup_let_topn",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT c.c_custkey,
           r.rk - 1      AS rank,
           r.o_orderkey,
           r.o_totalprice
    FROM customer c
    JOIN ranked r ON r.o_custkey = c.c_custkey AND r.rk <= 2
    WHERE c.c_custkey < 500
    ORDER BY c_custkey, rank
    """,
    doc="$lookup let/pipeline form: per customer, the two most "
    "expensive open orders via a correlated {$match: {$expr: {$eq: "
    "[$$ck, $o_custkey]}}} + uncorrelated status filter + trailing "
    "$sort/$limit/$project applied per matched set at the array "
    "level.  Scale: the equi-correlation pre-aggregates the orders "
    "side on the key — one shuffle of orders, no row-id bookkeeping; "
    "the per-set top-2 is an array sort of each customer's matches, "
    "never a global window.",
    tags=("pipeline",),
)
def pipeline_lookup_let_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"c_custkey": {"$lt": 500}}},
            {
                "$lookup": {
                    "from": "orders",
                    "let": {"ck": "$c_custkey"},
                    "pipeline": [
                        {"$match": {"$expr": {"$eq": ["$$ck", "$o_custkey"]}}},
                        {"$match": {"o_orderstatus": "O"}},
                        {"$sort": {"o_totalprice": -1, "o_orderkey": 1}},
                        {"$limit": 2},
                        {"$project": {"o_orderkey": 1, "o_totalprice": 1}},
                    ],
                    "as": "top_orders",
                }
            },
            {"$unwind": {"path": "$top_orders", "includeArrayIndex": "rank"}},
            {
                "$project": {
                    "c_custkey": 1,
                    "rank": 1,
                    "o_orderkey": "$top_orders.o_orderkey",
                    "o_totalprice": "$top_orders.o_totalprice",
                }
            },
        ],
        tables={"orders": load_table(spark, sf_dir, "orders")},
    )
    return pipe(load_table(spark, sf_dir, "customer")).orderBy(
        "c_custkey", "rank"
    )


@query(
    "pipeline_geo_near",
    oracle="""
    WITH pts AS (
        SELECT c_custkey,
               (c_custkey % 36) * 10.0 - 179.5 AS lon,
               (c_custkey % 17) * 10.0 - 84.5  AS lat
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ),
    d AS (
        SELECT c_custkey,
               2 * 6378100.0 * asin(sqrt(
                   pow(sin((radians(42.5) - radians(lat)) / 2), 2) +
                   cos(radians(lat)) * cos(radians(42.5)) *
                   pow(sin((radians(12.5) - radians(lon)) / 2), 2))) AS dist
        FROM pts
    )
    SELECT c_custkey, CAST(floor(dist) AS BIGINT) AS dist_m
    FROM d WHERE dist <= 5000000
    ORDER BY c_custkey
    """,
    doc="$geoNear spherical: haversine meters on Mongo's Earth radius "
    "from a fixed point to a deterministic per-customer grid "
    "location, query pre-filter on market segment, maxDistance "
    "bound; distances floored to whole meters so the comparison "
    "is robust to last-ulp libm differences between engines.",
    tags=("pipeline", "geo"),
)
def pipeline_geo_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the query filter and the distance projection are narrow
    JVM expressions on the scan (predicate pushdown holds); the
    ascending distance order is a range sort that a trailing $limit
    would collapse to TakeOrdered.  See plans.pipeline._apply_geo_near."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "loc",
        F.array(
            (F.col("c_custkey") % 36) * 10.0 - 179.5,
            (F.col("c_custkey") % 17) * 10.0 - 84.5,
        ),
    )
    pipe = translate_pipeline(
        [
            {
                "$geoNear": {
                    "near": {"type": "Point", "coordinates": [12.5, 42.5]},
                    "key": "loc",
                    "distanceField": "d",
                    "spherical": True,
                    "query": {"c_mktsegment": "BUILDING"},
                    "maxDistance": 5_000_000,
                }
            },
            {
                "$project": {
                    "c_custkey": 1,
                    "dist_m": {"$toLong": {"$floor": "$d"}},
                }
            },
        ]
    )
    return pipe(c).orderBy("c_custkey")


@query(
    "pipeline_lookup_theta_band",
    oracle="""
    SELECT o.o_orderkey,
           CAST(COUNT(l.l_orderkey) AS INT) AS n_cheap_lines
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_extendedprice <= o.o_totalprice / 2
    WHERE o.o_orderkey < 2000
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
    doc="Range-correlated $lookup (let/pipeline form with theta "
    "conjuncts): each order collects its own line items priced at or "
    "below half the order total — the equality conjunct becomes the "
    "join key, the ordered comparison a theta condition on the "
    "row-id fallback join.",
    tags=("pipeline",),
)
def pipeline_lookup_theta_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"o_orderkey": {"$lt": 2000}}},
            {
                "$lookup": {
                    "from": "lineitem",
                    "let": {
                        "ok": "$o_orderkey",
                        "cap": {"$divide": ["$o_totalprice", 2]},
                    },
                    "pipeline": [
                        {"$match": {"$expr": {"$and": [
                            {"$eq": ["$l_orderkey", "$$ok"]},
                            {"$lte": ["$l_extendedprice", "$$cap"]},
                        ]}}},
                    ],
                    "as": "cheap_lines",
                }
            },
            {
                "$project": {
                    "o_orderkey": 1,
                    "n_cheap_lines": {"$size": "$cheap_lines"},
                }
            },
        ],
        tables={"lineitem": load_table(spark, sf_dir, "lineitem")},
    )
    return pipe(load_table(spark, sf_dir, "orders")).orderBy("o_orderkey")


# Deterministic 64-dim query vector for $vectorSearch: values are
# rounded to 4 dp so the literal is byte-identical in the Spark
# pipeline and the DuckDB oracle SQL.
_VS_QV = [round(__import__("math").sin(0.7 * i + 0.3), 4) for i in range(64)]
_VS_QV_SQL = "[" + ", ".join(repr(x) for x in _VS_QV) + "]::DOUBLE[]"


@query(
    "pipeline_vector_search",
    oracle=f"""
    SELECT vec_id, label,
           ROUND((1 + list_cosine_similarity(embedding::DOUBLE[],
                                             {_VS_QV_SQL})) / 2, 6) AS score
    FROM embeddings
    WHERE label >= 1
    ORDER BY score DESC, vec_id
    LIMIT 12
    """,
    doc="$vectorSearch (Atlas stage surface: queryVector + filter + "
    "limit, cosine score normalized to (1+cos)/2) followed by a "
    "$project reading the score via {$meta: 'vectorSearchScore'} — "
    "the Mongo vector-query surface bridged onto the engine's exact "
    "cosine scan; filter applies before scoring and reaches the "
    "parquet scan, sort+limit collapses to TakeOrdered.",
    tags=("pipeline", "similarity"),
)
def pipeline_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$vectorSearch": {
                    "index": "embeddings_cosine_idx",
                    "path": "embedding",
                    "queryVector": _VS_QV,
                    "numCandidates": 200,
                    "limit": 12,
                    "filter": {"label": {"$gte": 1}},
                    # engine extension: deterministic tie-break matching
                    # the oracle's ORDER BY score DESC, vec_id — rounded
                    # scores CAN collide at the limit boundary
                    "tieBreak": ["vec_id"],
                }
            },
            {
                "$project": {
                    "vec_id": 1,
                    "label": 1,
                    "score": {"$meta": "vectorSearchScore"},
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "embeddings")).orderBy(
        F.desc("score"), "vec_id"
    )


@query(
    "pipeline_expr_percentile",
    oracle="""
    SELECT user_id % 10 AS grp,
           ROUND(quantile_cont(value, 0.5), 6)  AS med,
           list_transform(quantile_cont(value, [0.25, 0.9]),
                          x -> ROUND(x, 6))      AS pcts
    FROM events
    GROUP BY grp
    ORDER BY grp
    """,
    doc="$percentile/$median aggregation-EXPRESSION form (Mongo 7.0, "
    "array input) — $group $push builds the per-group array, $project "
    "computes exact linear-interpolated quantiles with JVM HOFs; "
    "matches DuckDB quantile_cont.",
    tags=("pipeline",),
)
def pipeline_expr_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$group": {
                    "_id": {"$mod": ["$user_id", 10]},
                    "vals": {"$push": "$value"},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "grp": "$_id",
                    "med": {
                        "$round": [
                            {
                                "$median": {
                                    "input": "$vals",
                                    "method": "approximate",
                                }
                            },
                            6,
                        ]
                    },
                    "pcts": {
                        "$map": {
                            "input": {
                                "$percentile": {
                                    "input": "$vals",
                                    "p": [0.25, 0.9],
                                    "method": "approximate",
                                }
                            },
                            "as": "x",
                            "in": {"$round": ["$$x", 6]},
                        }
                    },
                }
            },
            {"$sort": {"grp": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_match_bits",
    oracle="""
    SELECT event_id, user_id
    FROM events
    WHERE (user_id & 5) = 5      -- $bitsAllSet 0b101
      AND (user_id & 2) = 0      -- $bitsAllClear 0b010
      AND (event_id & 12) <> 0   -- $bitsAnySet positions [2, 3]
    ORDER BY event_id
    """,
    doc="$bitsAllSet/$bitsAllClear/$bitsAnySet bitmask query operators "
    "(mask and position-array forms) -> JVM bitwiseAND predicates that "
    "reach the scan.",
    tags=("pipeline",),
)
def pipeline_match_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$match": {
                    "user_id": {"$bitsAllSet": 5, "$bitsAllClear": 2},
                    "event_id": {"$bitsAnySet": [2, 3]},
                }
            },
            {"$project": {"event_id": 1, "user_id": 1}},
        ]
    )
    return pipe(load_table(spark, sf_dir, "events")).orderBy("event_id")


@query(
    "pipeline_window_range_unit",
    oracle="""
    SELECT event_id,
           ROUND(SUM(value) OVER (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW), 2) AS hour_sum,
           CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS half_hour_n
    FROM events
    WHERE event_id < 2000
    """,
    doc="$setWindowFields date-unit range windows (Mongo `window.range` "
    "with `unit`): fixed-width units lower onto rangeBetween over epoch "
    "microseconds of the sortBy timestamp — value-based frames, so tied "
    "timestamps are peers in both engines.",
    tags=("pipeline", "window"),
)
def pipeline_window_range_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {
                "$setWindowFields": {
                    "partitionBy": "$event_type",
                    "sortBy": {"ts": 1},
                    "output": {
                        "hour_sum": {
                            "$sum": "$value",
                            "window": {"range": [-1, 0], "unit": "hour"},
                        },
                        "half_hour_n": {
                            "$count": {},
                            "window": {"range": [-30, 0], "unit": "minute"},
                        },
                    },
                }
            },
            {
                "$project": {
                    "event_id": 1,
                    "hour_sum": {"$round": ["$hour_sum", 2]},
                    "half_hour_n": 1,
                }
            },
        ]
    )
    return pipe(load_table(spark, sf_dir, "events"))


@query(
    "pipeline_facet_profile",
    oracle="""
    SELECT
        (SELECT list_sort(list(event_type || ':' || CAST(n AS VARCHAR)))
         FROM (SELECT event_type, COUNT(*) AS n FROM events
               WHERE event_id < 3000 GROUP BY event_type))     AS by_type,
        (SELECT list_sort(list(CAST(h AS VARCHAR) || ':'
                               || CAST(n AS VARCHAR)))
         FROM (SELECT EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
               FROM events WHERE event_id < 3000 GROUP BY h))  AS by_hour,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM events
         WHERE event_id < 3000)                                AS total
    """,
    doc="$facet fan-out: one input pass feeds independent sub-pipelines "
    "($sortByCount by type, $group by hour, $count) whose results "
    "collapse into a single profile document — the one-shot dashboard "
    "pattern.  Facet arrays are canonicalized to sorted strings for "
    "the order-insensitive oracle compare (facet element order is "
    "only defined under a trailing $sort; the CONTENT is what the "
    "oracle pins).",
    tags=("pipeline", "agg"),
)
def pipeline_facet_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 3000}}},
            {
                "$facet": {
                    "by_type": [{"$sortByCount": "$event_type"}],
                    "by_hour": [
                        {"$addFields": {"h": {"$hour": "$ts"}}},
                        {"$group": {"_id": "$h", "n": {"$sum": 1}}},
                    ],
                    "totals": [{"$count": "n"}],
                }
            },
        ]
    )
    out = pipe(load_table(spark, sf_dir, "events"))
    render = lambda col, key, val: F.array_sort(
        F.transform(
            F.col(col),
            lambda x: F.concat(
                x[key].cast("string"), F.lit(":"), x[val].cast("string")
            ),
        )
    )
    return out.select(
        render("by_type", "_id", "count").alias("by_type"),
        render("by_hour", "_id", "n").alias("by_hour"),
        F.element_at(F.col("totals"), 1)["n"].cast("bigint").alias("total"),
    )


@query(
    "pipeline_bucket_auto",
    oracle="""
    WITH r AS (
        SELECT value AS v,
               ntile(4) OVER (ORDER BY value) AS b
        FROM events WHERE event_id < 2000
    )
    SELECT ROUND(MIN(v), 4) AS lo,
           ROUND(MAX(v), 4) AS hi,
           COUNT(*) AS count
    FROM r GROUP BY b ORDER BY lo
    """,
    doc="$bucketAuto (no granularity): ntile proposes 4 equal-count "
    "buckets over the value distribution; the oracle replays the "
    "positional split.  Output is tie-permutation-invariant: rows "
    "with equal values at a boundary can land in either bucket "
    "without changing any bucket's min/max/count.",
    tags=("pipeline", "agg"),
)
def pipeline_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {"$match": {"event_id": {"$lt": 2000}}},
            {"$bucketAuto": {"groupBy": "$value", "buckets": 4}},
        ]
    )
    out = pipe(load_table(spark, sf_dir, "events"))
    return out.select(
        F.round(F.col("_id.min"), 4).alias("lo"),
        F.round(F.col("_id.max"), 4).alias("hi"),
        F.col("count"),
    ).orderBy("lo")


@query(
    "pipeline_documents_literal",
    oracle="""
    SELECT k, CAST(n * 10 AS BIGINT) AS n10
    FROM (VALUES ('a', 1), ('b', 2), ('c', 3)) AS t(k, n)
    WHERE n >= 2
    ORDER BY k
    """,
    doc="$documents input-producing stage: aggregate over literal "
    "documents with NO collection input (Mongo's "
    "db.aggregate([{$documents: ...}])), composed with $match and a "
    "computed $project — the inline-data path used for lookup seeds "
    "and tests.",
    tags=("pipeline",),
)
def pipeline_documents_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipe = translate_pipeline(
        [
            {
                "$documents": [
                    {"k": "a", "n": 1},
                    {"k": "b", "n": 2},
                    {"k": "c", "n": 3},
                ]
            },
            {"$match": {"n": {"$gte": 2}}},
            {"$project": {"k": 1, "n10": {"$multiply": ["$n", 10]}}},
        ]
    )
    return pipe(None).orderBy("k")
