"""Oracle-checked batch coverage of the CDC operators (SURVEY §2 A5,
A8, A9, A10).

The streaming relay itself is verified by the e2e pytest suite
(tests/test_streaming_e2e.py — golden events, checkpoint restart);
these queries run the *same column expressions* over the deterministic
change-stream simulation of the `events` table so the driver's DuckDB
gate hash-verifies the envelope/key/topic string assembly at sf scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.cdc import (
    filter_data_ops,
    op_code,
    to_kafka_records,
)
from pymongo_change_stream_reader_spark.queries import query
from pymongo_change_stream_reader_spark.sources.simulate import simulate_change_stream
from pymongo_change_stream_reader_spark.sources.tables import load_table

# Shared SQL fragments reproducing sources/simulate.py in DuckDB.
_SIM = """
    SELECT
        event_id,
        ts,
        CASE event_type
            WHEN 'signup'   THEN 'insert'
            WHEN 'purchase' THEN 'update'
            WHEN 'click'    THEN 'replace'
            WHEN 'error'    THEN 'delete'
            ELSE 'drop'
        END AS operation,
        lpad(lower(hex(event_id)), 24, '0') AS oid,
        CAST(round(value * 100, 0) AS BIGINT) AS cents,
        CAST(json_extract_string(props, '$.k') AS INT) AS k,
        'test.appdb.users_' || CAST(user_id % 4 AS VARCHAR) AS topic
    FROM events
"""

# The replica-family event envelope: the simulated history re-keyed
# onto 101 logical documents.  ONE definition on each engine — the
# four replica queries (table / pipeline / change feed / bootstrap
# handoff) all consume it, so the key modulus, cents rounding, and
# triple fields can never desynchronize between a query and its
# oracle.  SQL side assumes a prior CTE `sim` (= _SIM).
_EV_SQL = """
        SELECT '{"_id": ' || CAST(event_id % 101 AS VARCHAR) || '}' AS key,
               operation,
               CASE WHEN operation <> 'delete'
                    THEN '{"v": ' || CAST(cents AS VARCHAR) || '}'
               END AS doc,
               event_id AS t,
               'tok' || CAST(event_id AS VARCHAR) AS d
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
"""


def _replica_events(e: DataFrame) -> DataFrame:
    """Spark side of _EV_SQL: change-event envelopes over the events
    table, one row per data op."""
    operation = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "click", "replace")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("drop")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return e.filter(
        operation.isin("insert", "update", "replace", "delete")
    ).select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.concat(
            F.lit('{"_id": '),
            (F.col("event_id") % 101).cast("string"),
            F.lit("}"),
        ).alias("documentKey"),
        F.when(
            operation.isin("insert", "update", "replace"),
            F.concat(F.lit('{"v": '), cents.cast("string"), F.lit("}")),
        ).alias("fullDocument"),
    )


_DOC = (
    "'{{\"_id\": {{\"$oid\": \"' || oid || '\"}}, \"value_cents\": ' || "
    "CAST({cents} AS VARCHAR) || ', \"k\": ' || CAST(k AS VARCHAR) || '}}'"
)
_AFTER = _DOC.format(cents="cents")
_BEFORE = _DOC.format(cents="cents + 1")


@query(
    "cdc_envelope",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        topic,
        '{{"_id": {{"$oid": "' || oid || '"}}}}' AS key,
        CASE operation
            WHEN 'insert' THEN '{{"after": ' || {_AFTER} || ', "op": "c"}}'
            WHEN 'update' THEN '{{"before": ' || {_BEFORE}
                 || ', "updateDescription": {{"removedFields": [], "truncatedArrays": [], "updatedFields": '
                 || '{{"value_cents": ' || CAST(cents AS VARCHAR) || '}}'
                 || '}}, "after": ' || {_AFTER} || ', "op": "u"}}'
            WHEN 'replace' THEN '{{"before": ' || {_BEFORE} || ', "after": '
                 || {_AFTER} || ', "op": "u"}}'
            WHEN 'delete' THEN '{{"before": ' || {_BEFORE} || ', "op": "d"}}'
        END AS value
    FROM sim
    WHERE operation IN ('insert', 'update', 'replace', 'delete')
    """,
    doc="A5+A8+A9+A10: op filter -> Debezium envelope -> key/topic "
    "projection, hash-verified string-for-string against the oracle.",
    tags=("cdc",),
)
def cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: pure narrow projection over the source scan — no
    shuffle, fully codegen'd; identical plan shape to the streaming
    relay's per-micro-batch work."""
    sim = simulate_change_stream(spark, sf_dir)
    # no sort: the relay plan is a pure narrow projection (zero
    # exchanges); the driver's value-hash compare is order-insensitive
    return to_kafka_records(filter_data_ops(sim), "test")


@query(
    "cdc_op_counts",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        topic,
        CASE operation
            WHEN 'insert' THEN 'c'
            WHEN 'update' THEN 'u'
            WHEN 'replace' THEN 'u'
            WHEN 'delete' THEN 'd'
        END AS op,
        COUNT(*) AS n
    FROM sim
    WHERE operation IN ('insert', 'update', 'replace', 'delete')
    GROUP BY topic, op
    ORDER BY topic, op
    """,
    doc="Per-topic op-code distribution of the relayed stream "
    "(A5 filter + A10 routing + op map).",
    tags=("cdc", "agg"),
)
def cdc_op_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = filter_data_ops(simulate_change_stream(spark, sf_dir))
    topic = F.concat_ws(
        ".", F.lit("test"), F.col("ns.db"), F.col("ns.coll")
    ).alias("topic")
    return (
        sim.select(topic, op_code().alias("op"))
        .groupBy("topic", "op")
        .agg(F.count("*").alias("n"))
        .orderBy("topic", "op")
    )


@query(
    "cdc_heartbeat_frontier",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT
        CAST(SUM(CASE WHEN operation IN ('insert','update','replace','delete')
                 THEN 1 ELSE 0 END) AS BIGINT)            AS data_events,
        CAST(SUM(CASE WHEN operation NOT IN ('insert','update','replace','delete')
                 THEN 1 ELSE 0 END) AS BIGINT)            AS heartbeat_only,
        COUNT(*)                                          AS offset_frontier,
        max_by('tok' || CAST(event_id AS VARCHAR), event_id) AS last_token
    FROM sim
    """,
    doc="A3/A18 analog: ALL events (including non-data ops) advance "
    "the commit frontier; the last token is the max-by-time offset.",
    tags=("cdc", "agg"),
)
def cdc_heartbeat_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference sends every event down the commit path regardless
    of the data-path filter (change_handler.py:24-41); here the
    frontier aggregate proves the same accounting declaratively."""
    sim = simulate_change_stream(spark, sf_dir)
    is_data = F.col("operationType").isin("insert", "update", "replace", "delete")
    return sim.agg(
        F.sum(F.when(is_data, 1).otherwise(0)).cast("bigint").alias("data_events"),
        F.sum(F.when(~is_data, 1).otherwise(0)).cast("bigint").alias("heartbeat_only"),
        F.count("*").alias("offset_frontier"),
        # tie-safe: order by the unique numeric token suffix
        F.max_by(
            F.col("_id._data"), F.expr("CAST(substring(_id._data, 4) AS BIGINT)")
        ).alias("last_token"),
    )


_UPD = "'{\"value_cents\": ' || CAST(cents AS VARCHAR) || '}'"
_SPLIT_MAX = 80  # bytes; sized so sim updates split 3-way, replaces 2-way


@query(
    "cdc_split_large_event",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS (
        SELECT 'tok' || CAST(event_id AS VARCHAR) AS ev,
               operation AS operationType,
               CASE WHEN operation IN ('insert','update','replace')
                    THEN {_AFTER} END AS after,
               CASE WHEN operation IN ('update','replace','delete')
                    THEN {_BEFORE} END AS before,
               CASE WHEN operation = 'update' THEN {_UPD} END AS upd
        FROM sim
    ),
    sz AS (
        SELECT *, COALESCE(length(after), 0) AS s1,
                  COALESCE(length(before), 0) AS s2,
                  COALESCE(length(upd), 0) AS s3
        FROM ev
    ),
    g1 AS (
        SELECT *, CASE WHEN s1 > 0 THEN 1 ELSE 0 END AS a1, s1 AS u1 FROM sz
    ),
    g2 AS (
        SELECT *,
            CASE WHEN s2 = 0 THEN 0
                 WHEN u1 > 0 AND u1 + s2 > {_SPLIT_MAX} THEN 2
                 ELSE 1 END AS a2,
            CASE WHEN s2 = 0 THEN u1
                 WHEN u1 > 0 AND u1 + s2 > {_SPLIT_MAX} THEN s2
                 ELSE u1 + s2 END AS u2,
            CASE WHEN s2 = 0 THEN 1
                 WHEN u1 > 0 AND u1 + s2 > {_SPLIT_MAX} THEN 2
                 ELSE 1 END AS f2
        FROM g1
    ),
    g3 AS (
        SELECT *,
            CASE WHEN s3 = 0 THEN 0
                 WHEN u2 > 0 AND u2 + s3 > {_SPLIT_MAX} THEN f2 + 1
                 ELSE f2 END AS a3
        FROM g2
    ),
    n AS (SELECT *, GREATEST(1, a1, a2, a3) AS nfrag FROM g3)
    SELECT ev, operationType,
           CASE WHEN k > 0 THEN CAST(k AS BIGINT) END AS fragment,
           CASE WHEN k > 0 THEN CAST(nfrag AS BIGINT) END AS of_n,
           CASE WHEN k = 0 OR a1 = k THEN after END AS fullDocument,
           CASE WHEN k = 0 OR a2 = k THEN before END AS beforeDocument,
           CASE WHEN k = 0 OR a3 = k THEN upd END AS updatedFields
    FROM n, LATERAL unnest(
        CASE WHEN nfrag >= 2 THEN generate_series(1, nfrag) ELSE [0] END
    ) AS t(k)
    ORDER BY ev, fragment
    """,
    doc="$changeStreamSplitLargeEvent over the simulated change "
    "stream (maxSize=80 so updates fragment 3-way, replaces 2-way, "
    "single-payload events pass unsplit): greedy first-fit packing "
    "of the schemaless payload fields, splitEvent fragment/of "
    "numbering, envelope replication — the DuckDB oracle replays the "
    "greedy cascade and the fragment explosion.",
    tags=("cdc", "pipeline"),
)
def cdc_split_large_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: one narrow JVM pass (sizes + 3-element fold + per-row
    explode), zero shuffle — the same shape as the envelope hot path."""
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )

    pipe = translate_pipeline(
        [{"$changeStreamSplitLargeEvent": {"maxSize": _SPLIT_MAX}}]
    )
    out = pipe(simulate_change_stream(spark, sf_dir))
    return out.select(
        F.col("_id")["_data"].alias("ev"),
        "operationType",
        F.col("splitEvent")["fragment"].cast("long").alias("fragment"),
        F.col("splitEvent")["of"].cast("long").alias("of_n"),
        "fullDocument",
        F.col("fullDocumentBeforeChange").alias("beforeDocument"),
        F.col("updateDescription")["updatedFields"].alias("updatedFields"),
    ).orderBy("ev", "fragment")


@query(
    "cdc_split_reassemble",
    oracle=f"""
    WITH sim AS ({_SIM})
    SELECT 'tok' || CAST(event_id AS VARCHAR) AS ev,
           operation AS operationType,
           CASE WHEN operation IN ('insert','update','replace')
                THEN {_AFTER} END AS fullDocument,
           CASE WHEN operation IN ('update','replace','delete')
                THEN {_BEFORE} END AS beforeDocument,
           CASE WHEN operation = 'update' THEN {_UPD} END AS updatedFields,
           TRUE AS complete
    FROM sim
    ORDER BY ev
    """,
    doc="split -> reassemble roundtrip as an oracle: fragmenting the "
    "simulated stream with $changeStreamSplitLargeEvent and merging "
    "the fragments back (operators.cdc.reassemble_split_events) must "
    "reproduce the original events exactly — the oracle is simply the "
    "unsplit simulation, proving the operators are inverses.",
    tags=("cdc", "pipeline"),
)
def cdc_split_reassemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the split is a narrow pass; the reassembly is one
    hash-shuffle keyed on the event id with map-side partials."""
    from pymongo_change_stream_reader_spark.operators.cdc import (
        reassemble_split_events,
    )
    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )

    split = translate_pipeline(
        [{"$changeStreamSplitLargeEvent": {"maxSize": _SPLIT_MAX}}]
    )(simulate_change_stream(spark, sf_dir))
    back = reassemble_split_events(split)
    return back.select(
        F.col("_id")["_data"].alias("ev"),
        "operationType",
        "fullDocument",
        F.col("fullDocumentBeforeChange").alias("beforeDocument"),
        F.col("updateDescription")["updatedFields"].alias("updatedFields"),
        "complete",
    ).orderBy("ev")


@query(
    "cdc_replica_table",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EV_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM ev GROUP BY key
    )
    SELECT key,
           CAST(json_extract_string(
               substr(payload, position('|' IN payload) + 1), '$.v'
           ) AS BIGINT) AS v
    FROM last
    WHERE split_part(payload, '|', 1) <> 'delete'
    ORDER BY key
    """,
    doc="CDC replica maintenance (streaming/materialize.py): the full "
    "simulated change stream — re-keyed onto 101 logical documents so "
    "every key sees a long insert/update/replace/delete history — is "
    "applied to a bucketed parquet replica with last-writer-wins "
    "conflict resolution, then the committed replica is read back.  "
    "The oracle replays the same history with max_by per key.  The "
    "apply path is the foreachBatch consumer of the relay: per-batch "
    "work touches only the buckets the batch's keys hash into.",
    tags=("cdc", "streaming"),
)
def cdc_replica_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.materialize import (
        materialize_change_batch,
    )

    ev = _replica_events(load_table(spark, sf_dir, "events"))
    # fresh replica per run: the apply itself is idempotent, but the
    # oracle models a single full-history application
    path = tempfile.mkdtemp(prefix="spark_cdc_replica_")
    try:
        replica = materialize_change_batch(ev, path, n_buckets=16).filter(
            F.col("doc").isNotNull()  # deletes persist as tombstones
        )
        return (
            replica.select(
                "key",
                F.get_json_object("doc", "$.v").cast("bigint").alias("v"),
            )
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_replica_pipeline_query",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EV_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM ev GROUP BY key
    ),
    live AS (
        SELECT CAST(json_extract_string(
                   substr(payload, position('|' IN payload) + 1), '$.v'
               ) AS BIGINT) AS v
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    )
    SELECT CAST(v % 5 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(v) AS BIGINT) AS total
    FROM live
    WHERE v >= 100
    GROUP BY bucket
    ORDER BY bucket
    """,
    doc="The full circle: the change stream materializes into the "
    "replica (LWW + tombstones), the replica's documents project to "
    "typed columns, and the USER'S OWN Mongo pipeline language "
    "($match/$addFields/$group) queries the result — a reference "
    "user keeps both their collection (as the replica) and their "
    "query dialect after switching engines.",
    tags=("cdc", "pipeline"),
)
def cdc_replica_pipeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.plans.pipeline import (
        translate_pipeline,
    )
    from pymongo_change_stream_reader_spark.streaming.materialize import (
        materialize_change_batch,
    )

    ev = _replica_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_replica_q_")
    try:
        replica = materialize_change_batch(ev, path, n_buckets=16).filter(
            F.col("doc").isNotNull()
        )
        typed = replica.select(
            F.get_json_object("doc", "$.v").cast("long").alias("v")
        )
        pipe = translate_pipeline(
            [
                {"$match": {"v": {"$gte": 100}}},
                {"$addFields": {"bucket": {"$mod": ["$v", 5]}}},
                {
                    "$group": {
                        "_id": "$bucket",
                        "n": {"$sum": 1},
                        "total": {"$sum": "$v"},
                    }
                },
            ]
        )
        out = pipe(typed).select(
            F.col("_id").cast("bigint").alias("bucket"),
            F.col("n").cast("bigint").alias("n"),
            F.col("total").cast("bigint").alias("total"),
        ).orderBy("bucket")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_replica_update_delta",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS (
        SELECT '{{"_id": ' || CAST(event_id % 101 AS VARCHAR) || '}}' AS key,
               operation, cents, event_id AS t
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
    ),
    anchor AS (
        SELECT key, max_by(operation, t) AS aop, MAX(t) AS at
        FROM ev WHERE operation <> 'update' GROUP BY key
    ),
    -- final state per key: the last anchor's doc patched by every
    -- LATER delta (each delta fully sets v here); keys whose last
    -- anchor is a delete tombstone regardless of later deltas, and
    -- delta-only keys (no anchor) have no base to patch
    final AS (
        SELECT e.key, max_by(e.cents, e.t) AS cents
        FROM ev e JOIN anchor a ON e.key = a.key
        WHERE e.t = a.at OR (e.operation = 'update' AND e.t > a.at)
        GROUP BY e.key
    )
    SELECT f.key, CAST(f.cents AS BIGINT) AS v
    FROM final f JOIN anchor a ON f.key = a.key
    WHERE a.aop <> 'delete'
    ORDER BY f.key
    """,
    doc="updateDescription DELTA application (streaming/materialize.py "
    "— the reference's full_document=None configuration, reference "
    "change_event_handler.py:100-113): the simulated history's "
    "updates carry NO post-image, only updatedFields deltas; the "
    "replica applies each delta to the stored document.  The oracle "
    "replays the fold: last full-state anchor per key, later deltas "
    "patched on top, delete-anchored and anchor-less keys absent.",
    tags=("cdc", "streaming"),
)
def cdc_replica_update_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: same bucket-pruned LWW apply as cdc_replica_table; the
    delta patch is an Arrow-batched pandas UDF that runs ONLY for
    delta rows (post-image batches stay pure-JVM)."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.materialize import (
        materialize_change_batch,
    )

    operation = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "click", "replace")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("drop")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    e = load_table(spark, sf_dir, "events")
    ev = e.filter(
        operation.isin("insert", "update", "replace", "delete")
    ).select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.concat(
            F.lit('{"_id": '),
            (F.col("event_id") % 101).cast("string"),
            F.lit("}"),
        ).alias("documentKey"),
        # updates carry NO post-image — the delta is the payload
        F.when(
            operation.isin("insert", "replace"),
            F.concat(F.lit('{"v": '), cents.cast("string"), F.lit("}")),
        ).alias("fullDocument"),
        F.when(
            operation == "update",
            F.struct(
                F.concat(
                    F.lit('{"v": '), cents.cast("string"), F.lit("}")
                ).alias("updatedFields"),
                F.lit(None).cast("array<string>").alias("removedFields"),
                F.lit(None)
                .cast("array<struct<field:string,newSize:int>>")
                .alias("truncatedArrays"),
            ),
        ).alias("updateDescription"),
    )
    path = tempfile.mkdtemp(prefix="spark_cdc_delta_")
    try:
        replica = materialize_change_batch(ev, path, n_buckets=16).filter(
            F.col("doc").isNotNull()
        )
        return (
            replica.select(
                "key",
                F.get_json_object("doc", "$.v").cast("bigint").alias("v"),
            )
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_replica_change_feed",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EV_SQL}),
    prev AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS p,
               MAX(t) AS wt
        FROM ev WHERE t % 2 = 0 GROUP BY key
    ),
    cur AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS p,
               MAX(t) AS wt
        FROM ev GROUP BY key
    ),
    j AS (
        SELECT COALESCE(c.key, p.key) AS key,
               p.key IS NOT NULL
                   AND split_part(p.p, '|', 1) <> 'delete' AS live_p,
               c.key IS NOT NULL
                   AND split_part(c.p, '|', 1) <> 'delete' AS live_c,
               c.wt AS cwt, p.wt AS pwt,
               substr(c.p, position('|' IN c.p) + 1) AS cdoc
        FROM prev p FULL JOIN cur c ON p.key = c.key
    )
    SELECT key,
           CASE WHEN NOT live_p AND live_c THEN 'insert'
                WHEN live_p AND NOT live_c THEN 'delete'
                WHEN live_p AND live_c
                     AND (pwt IS NULL OR cwt <> pwt) THEN 'update'
           END AS op,
           CASE WHEN live_c
                THEN CAST(json_extract_string(cdoc, '$.v') AS BIGINT)
           END AS v
    FROM j
    WHERE (NOT live_p AND live_c)
       OR (live_p AND NOT live_c)
       OR (live_p AND live_c AND (pwt IS NULL OR cwt <> pwt))
    ORDER BY key
    """,
    doc="Replica CHANGE FEED between two retained commits "
    "(streaming/materialize.py replica_changes + the r4 N-version "
    "retention): the simulated history applies in two micro-batches "
    "(even event ids, then odd), and the feed classifies each key as "
    "insert (absent before), delete (tombstoned), or update (write "
    "triple advanced) between version -1 and the current commit — the "
    "incremental-consumer API a lakehouse exposes as a change data "
    "feed.  The oracle replays both prefix states with max_by and "
    "joins them.",
    tags=("cdc", "streaming"),
)
def cdc_replica_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: two bucket-pruned LWW applies + ONE full-outer join of
    two manifest snapshots (bucket-dir reads only — events never
    replay to compute the feed)."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.materialize import (
        materialize_change_batch,
        replica_changes,
    )

    ev = _replica_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_feed_")
    try:
        materialize_change_batch(
            ev.filter(F.col("clusterTime.t") % 2 == 0), path, n_buckets=16
        )
        materialize_change_batch(
            ev.filter(F.col("clusterTime.t") % 2 == 1), path, n_buckets=16
        )
        feed = replica_changes(spark, path)
        return (
            feed.select(
                "key",
                "op",
                F.get_json_object("doc", "$.v").cast("bigint").alias("v"),
            )
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_replica_bootstrap_handoff",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EV_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM ev GROUP BY key
    )
    SELECT key,
           CAST(json_extract_string(
               substr(payload, position('|' IN payload) + 1), '$.v'
           ) AS BIGINT) AS v
    FROM last
    WHERE split_part(payload, '|', 1) <> 'delete'
    ORDER BY key
    """,
    doc="The snapshot+stream HANDOFF, end to end: the replica is "
    "bootstrapped from a snapshot of the collection state at the "
    "half-way point of the history (live documents only, minimal "
    "write triples), then the FULL change stream replays on top — "
    "the resume-at-or-before-the-snapshot-point case, where every "
    "prefix event is an OVERLAP replay of state the snapshot already "
    "holds — and the result must equal a full-history LWW replay "
    "(the cdc_replica_table oracle): replayed events converge, never "
    "corrupt, which is the whole point of seeding snapshots with "
    "minimal write triples.",
    tags=("cdc", "streaming"),
)
def cdc_replica_bootstrap_handoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale: the snapshot is one LWW aggregation over the prefix;
    the handoff then re-applies the FULL stream — deliberately
    including the prefix the snapshot already reflects — so the
    OVERLAP-replay direction of the bootstrap contract (stream resumes
    from a token at or before the snapshot point; replayed events must
    converge, not corrupt) is what the oracle verifies."""
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.materialize import (
        _last_event_per_key,
        bootstrap_replica,
        materialize_change_batch,
        read_replica,
    )

    # one source scan: the threshold agg, snapshot build, and stream
    # apply all read this frame
    ev = _replica_events(load_table(spark, sf_dir, "events")).localCheckpoint(
        eager=True
    )
    tmax = ev.agg(F.max("clusterTime.t")).collect()[0][0]
    if tmax is None:  # no data ops at this sf: honest empty result
        return spark.createDataFrame([], "key STRING, v BIGINT")
    # snapshot point: half-way through the history (integer div)
    threshold = tmax // 2
    # the snapshot = LWW state of the prefix, LIVE documents only —
    # through the SAME reduction the materializer uses, so the
    # snapshot models exactly what a real bootstrap would see
    snap = (
        _last_event_per_key(ev.filter(F.col("clusterTime.t") <= threshold))
        .filter(F.col("op") != "delete")
        .select(F.col("key").alias("k"), F.col("doc").alias("d"))
    )
    path = tempfile.mkdtemp(prefix="spark_cdc_handoff_")
    try:
        bootstrap_replica(snap, path, "k", "d", n_buckets=16)
        # resume AT-OR-BEFORE the snapshot point: apply the whole
        # stream, prefix included — overlap events beat the snapshot's
        # minimal triples and must reproduce the same state
        materialize_change_batch(ev, path, n_buckets=16)
        rep = read_replica(spark, path)
        return (
            rep.select(
                "key",
                F.get_json_object("doc", "$.v").cast("bigint").alias("v"),
            )
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# The agg-view event envelope: the replica family's 101-key history
# with the post-image carrying a GROUP field that changes across
# updates (g = cents % 5), so incremental maintenance must move
# contributions BETWEEN groups, not just update them in place.
_EVG_SQL = """
        SELECT '{"_id": ' || CAST(event_id % 101 AS VARCHAR) || '}' AS key,
               operation,
               CASE WHEN operation <> 'delete'
                    THEN '{"v": ' || CAST(cents AS VARCHAR)
                         || ', "g": "s' || CAST(cents % 5 AS VARCHAR)
                         || '"}'
               END AS doc,
               event_id AS t
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
"""


def _agg_view_events(e: DataFrame) -> DataFrame:
    """Spark side of _EVG_SQL (the _replica_events envelope plus the
    group field in the post-image)."""
    operation = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "click", "replace")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("drop")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return e.filter(
        operation.isin("insert", "update", "replace", "delete")
    ).select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.concat(
            F.lit('{"_id": '),
            (F.col("event_id") % 101).cast("string"),
            F.lit("}"),
        ).alias("documentKey"),
        F.when(
            operation.isin("insert", "update", "replace"),
            F.concat(
                F.lit('{"v": '),
                cents.cast("string"),
                F.lit(', "g": "s'),
                (cents % 5).cast("string"),
                F.lit('"}'),
            ),
        ).alias("fullDocument"),
    )


@query(
    "cdc_agg_view_incremental",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EVG_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM ev GROUP BY key
    ),
    final AS (
        SELECT substr(payload, position('|' IN payload) + 1) AS doc
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    )
    SELECT json_extract_string(doc, '$.g') AS grp,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(json_extract_string(doc, '$.v') AS BIGINT))
                AS BIGINT) AS sum_val
    FROM final
    GROUP BY grp
    ORDER BY grp
    """,
    doc="Incremental materialized aggregate view "
    "(streaming/agg_view.py): the 101-key change history is applied in "
    "THREE interleaved micro-batches (event_id % 3 — each batch mixes "
    "newer and older events per key, stressing the LWW stale-event "
    "cancellation) maintaining per-group COUNT/SUM by contribution "
    "deltas only; the committed view is read back and hash-compared to "
    "the oracle's full recompute over the final document states.  "
    "Per-batch work is O(batch keys + touched buckets + touched "
    "groups) — never a corpus re-aggregation.",
    tags=("cdc", "streaming"),
)
def cdc_agg_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.agg_view import (
        agg_view_batch,
        read_agg_view,
    )

    ev = _agg_view_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_aggview_")
    try:
        for i in range(3):
            agg_view_batch(
                ev.filter(F.col("clusterTime.t") % 3 == i),
                path,
                epoch=i,
                value_type="long",
            )
        return (
            read_agg_view(spark, path).orderBy("grp").localCheckpoint(
                eager=True
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_agg_view_minmax",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EVG_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM ev GROUP BY key
    ),
    final AS (
        SELECT substr(payload, position('|' IN payload) + 1) AS doc
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    )
    SELECT json_extract_string(doc, '$.g') AS grp,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(json_extract_string(doc, '$.v') AS BIGINT))
                AS BIGINT) AS sum_val,
           CAST(MIN(CAST(json_extract_string(doc, '$.v') AS BIGINT))
                AS BIGINT) AS min_val,
           CAST(MAX(CAST(json_extract_string(doc, '$.v') AS BIGINT))
                AS BIGINT) AS max_val
    FROM final
    GROUP BY grp
    ORDER BY grp
    """,
    doc="MIN/MAX aggregate view maintenance (track_minmax): the same "
    "3-interleaved-batch change history as cdc_agg_view_incremental, "
    "but the view also maintains per-group MIN/MAX — arrivals fold "
    "with least/greatest; a batch removing a contribution at a "
    "group's stored extremum flags that group in its PERSISTED deltas "
    "and re-aggregates only the flagged groups from the keys store "
    "after the keys commit (the textbook non-fully-incremental "
    "aggregate treatment; candidate set bounded by the batch's "
    "touched groups).  Hash-compared to the oracle's full recompute "
    "of COUNT/SUM/MIN/MAX over the final document states.",
    tags=("cdc", "streaming"),
)
def cdc_agg_view_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.agg_view import (
        agg_view_batch,
        read_agg_view,
    )

    ev = _agg_view_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_aggview_mm_")
    try:
        for i in range(3):
            agg_view_batch(
                ev.filter(F.col("clusterTime.t") % 3 == i),
                path,
                epoch=i,
                value_type="long",
                track_minmax=True,
            )
        return (
            read_agg_view(spark, path).orderBy("grp").localCheckpoint(
                eager=True
            )
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


_JVG_SQL = """
        SELECT CASE WHEN event_id % 119 < 99
                    THEN '{"_id": "f' || CAST(event_id % 119 AS VARCHAR)
                         || '"}'
                    ELSE '{"_id": "d' || CAST(event_id % 119 - 99
                                              AS VARCHAR) || '"}'
               END AS key,
               operation,
               CASE WHEN operation <> 'delete' THEN
                   CASE WHEN event_id % 119 < 99
                        THEN '{"side": "f", "fk": "d'
                             || CAST(cents % 20 AS VARCHAR)
                             || '", "p": ' || CAST(cents AS VARCHAR) || '}'
                        ELSE '{"side": "d", "p": '
                             || CAST(cents AS VARCHAR) || '}'
                   END
               END AS doc,
               event_id AS t
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
"""


def _join_view_events(e: DataFrame) -> DataFrame:
    """Spark side of _JVG_SQL: the replica envelope over a
    POLYMORPHIC key space — keys 0..98 are facts referencing dim
    ``d(cents % 20)``, keys 99..118 are dims (modulus 119 is coprime
    with the 3-way batch split, so every key's history interleaves
    across the micro-batches)."""
    operation = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "click", "replace")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("drop")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.col("event_id") % 119
    is_fact = k < 99
    key = F.when(
        is_fact,
        F.concat(F.lit('{"_id": "f'), k.cast("string"), F.lit('"}')),
    ).otherwise(
        F.concat(F.lit('{"_id": "d'), (k - 99).cast("string"), F.lit('"}'))
    )
    doc = F.when(
        is_fact,
        F.concat(
            F.lit('{"side": "f", "fk": "d'),
            (cents % 20).cast("string"),
            F.lit('", "p": '),
            cents.cast("string"),
            F.lit("}"),
        ),
    ).otherwise(
        F.concat(
            F.lit('{"side": "d", "p": '), cents.cast("string"), F.lit("}")
        )
    )
    return e.filter(
        operation.isin("insert", "update", "replace", "delete")
    ).select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        key.alias("documentKey"),
        F.when(
            operation.isin("insert", "update", "replace"), doc
        ).alias("fullDocument"),
    )


@query(
    "cdc_join_view_incremental",
    oracle=f"""
    WITH sim AS ({_SIM}),
    evj AS ({_JVG_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM evj GROUP BY key
    ),
    finals AS (
        SELECT key, substr(payload, position('|' IN payload) + 1) AS doc
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    ),
    facts AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'f'
    ),
    dims AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'd'
    )
    SELECT f.key AS key,
           json_extract_string(f.doc, '$.fk') AS fk,
           f.doc AS fact_doc,
           d.doc AS dim_doc
    FROM facts f
    JOIN dims d
      ON json_extract_string(d.key, '$._id')
         = json_extract_string(f.doc, '$.fk')
    ORDER BY key
    """,
    doc="Incremental materialized JOIN view (streaming/join_view.py): "
    "a polymorphic 119-key change history (99 facts referencing 20 "
    "dims through $.fk) applied in THREE interleaved micro-batches "
    "(event_id % 3 — each batch mixes newer and older events per "
    "key, plus doc-less deletes that tombstone both stores); "
    "the maintained fact-join-dim table is read back and hash-compared "
    "to the oracle's full recompute over the final document states.  "
    "Per-batch work is ΔF ⋈ D' ∪ (F' − ΔF) ⋈ ΔD over touched buckets "
    "and the fk secondary index — never a full two-table re-join.",
    tags=("cdc", "streaming"),
)
def cdc_join_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.join_view import (
        join_view_batch,
        read_join_view,
    )

    ev = _join_view_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_joinview_")
    try:
        for i in range(3):
            join_view_batch(
                ev.filter(F.col("clusterTime.t") % 3 == i),
                path,
                epoch=i,
                dim_id_path="$._id",
            )
        return (
            read_join_view(spark, path)
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_join_view_left",
    oracle=f"""
    WITH sim AS ({_SIM}),
    evj AS ({_JVG_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM evj GROUP BY key
    ),
    finals AS (
        SELECT key, substr(payload, position('|' IN payload) + 1) AS doc
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    ),
    facts AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'f'
    ),
    dims AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'd'
    )
    SELECT f.key AS key,
           json_extract_string(f.doc, '$.fk') AS fk,
           f.doc AS fact_doc,
           d.doc AS dim_doc
    FROM facts f
    LEFT JOIN dims d
      ON json_extract_string(d.key, '$._id')
         = json_extract_string(f.doc, '$.fk')
    ORDER BY key
    """,
    doc="LEFT-join variant of the incremental materialized join view "
    "(streaming/join_view.py, join_type='left'): every LIVE fact "
    "keeps a view row — dim_doc is NULL until its dim exists and "
    "reverts to NULL when the dim is deleted (the replica-serving "
    "semantics: facts are visible before their dim arrives).  Same "
    "119-key interleaved 3-batch history as cdc_join_view_incremental "
    "(so some facts end NULL-padded where their dim's final state is "
    "a delete); hash-compared to the oracle's LEFT-join recompute "
    "over final document states.  The delta algebra differs from "
    "INNER only in row liveness, so stores, index, and replay "
    "contract are shared.",
    tags=("cdc", "streaming"),
)
def cdc_join_view_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.join_view import (
        join_view_batch,
        read_join_view,
    )

    ev = _join_view_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_joinview_left_")
    try:
        for i in range(3):
            join_view_batch(
                ev.filter(F.col("clusterTime.t") % 3 == i),
                path,
                epoch=i,
                dim_id_path="$._id",
                join_type="left",
            )
        return (
            read_join_view(spark, path)
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


_SVG_SQL = """
        SELECT CASE WHEN event_id % 119 < 99
                    THEN '{"_id": "f' || CAST(event_id % 119 AS VARCHAR)
                         || '"}'
                    WHEN event_id % 119 < 109
                    THEN '{"_id": "A' || CAST(event_id % 119 - 99
                                              AS VARCHAR) || '"}'
                    ELSE '{"_id": "B' || CAST(event_id % 119 - 109
                                              AS VARCHAR) || '"}'
               END AS key,
               operation,
               CASE WHEN operation <> 'delete' THEN
                   CASE WHEN event_id % 119 < 99
                        THEN '{"side": "f", "fka": "A'
                             || CAST(cents % 10 AS VARCHAR)
                             || '", "fkb": "B' || CAST(cents % 7 AS VARCHAR)
                             || '", "p": ' || CAST(cents AS VARCHAR) || '}'
                        WHEN event_id % 119 < 109
                        THEN '{"side": "a", "p": '
                             || CAST(cents AS VARCHAR) || '}'
                        ELSE '{"side": "b", "p": '
                             || CAST(cents AS VARCHAR) || '}'
                   END
               END AS doc,
               event_id AS t
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
"""


def _star_view_events(e: DataFrame) -> DataFrame:
    """Spark side of _SVG_SQL: a star-schema key space — keys 0..98
    are facts referencing dim ``A(cents % 10)`` on side a and
    ``B(cents % 7)`` on side b; keys 99..108 are a-dims, 109..118
    b-dims (so B7..B9 exist but are never referenced, and a fact's
    two fks move independently as its value changes)."""
    operation = (
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "purchase", "update")
        .when(F.col("event_type") == "click", "replace")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("drop")
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.col("event_id") % 119
    key = (
        F.when(
            k < 99,
            F.concat(F.lit('{"_id": "f'), k.cast("string"), F.lit('"}')),
        )
        .when(
            k < 109,
            F.concat(
                F.lit('{"_id": "A'), (k - 99).cast("string"), F.lit('"}')
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"_id": "B'), (k - 109).cast("string"), F.lit('"}')
            )
        )
    )
    doc = (
        F.when(
            k < 99,
            F.concat(
                F.lit('{"side": "f", "fka": "A'),
                (cents % 10).cast("string"),
                F.lit('", "fkb": "B'),
                (cents % 7).cast("string"),
                F.lit('", "p": '),
                cents.cast("string"),
                F.lit("}"),
            ),
        )
        .when(
            k < 109,
            F.concat(
                F.lit('{"side": "a", "p": '),
                cents.cast("string"),
                F.lit("}"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('{"side": "b", "p": '),
                cents.cast("string"),
                F.lit("}"),
            )
        )
    )
    return e.filter(
        operation.isin("insert", "update", "replace", "delete")
    ).select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        operation.alias("operationType"),
        F.struct(
            F.col("event_id").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        key.alias("documentKey"),
        F.when(
            operation.isin("insert", "update", "replace"), doc
        ).alias("fullDocument"),
    )


@query(
    "cdc_star_view_incremental",
    oracle=f"""
    WITH sim AS ({_SIM}),
    evj AS ({_SVG_SQL}),
    last AS (
        SELECT key,
               max_by(operation || '|' || COALESCE(doc, ''), t) AS payload
        FROM evj GROUP BY key
    ),
    finals AS (
        SELECT key, substr(payload, position('|' IN payload) + 1) AS doc
        FROM last WHERE split_part(payload, '|', 1) <> 'delete'
    ),
    facts AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'f'
    ),
    dims_a AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'a'
    ),
    dims_b AS (
        SELECT key, doc FROM finals
        WHERE json_extract_string(doc, '$.side') = 'b'
    )
    SELECT f.key AS key,
           f.doc AS fact_doc,
           json_extract_string(f.doc, '$.fka') AS fk_a,
           a.doc AS dim_a,
           json_extract_string(f.doc, '$.fkb') AS fk_b,
           b.doc AS dim_b
    FROM facts f
    LEFT JOIN dims_a a
      ON json_extract_string(a.key, '$._id')
         = json_extract_string(f.doc, '$.fka')
    LEFT JOIN dims_b b
      ON json_extract_string(b.key, '$._id')
         = json_extract_string(f.doc, '$.fkb')
    ORDER BY key
    """,
    doc="Incremental materialized STAR view (streaming/star_view.py): "
    "one fact side LEFT-joined against TWO dimension sides in one "
    "polymorphic 119-key change history (99 facts whose two fks move "
    "independently; 10 a-dims, 10 b-dims with B7..B9 never "
    "referenced), applied in THREE interleaved micro-batches.  The "
    "batch maintenance recomputes each touched fact's WHOLE row from "
    "the per-side secondary indexes and bucketed dim stores (never a "
    "full re-join; a fact hit by several dim sides in one batch "
    "yields exactly one row) and is hash-compared to the oracle's "
    "two-way LEFT-join recompute over final document states.",
    tags=("cdc", "streaming"),
)
def cdc_star_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.star_view import (
        DimSide,
        read_star_view,
        star_view_batch,
    )

    ev = _star_view_events(load_table(spark, sf_dir, "events"))
    path = tempfile.mkdtemp(prefix="spark_cdc_starview_")
    dims = [
        DimSide("a", "$.fka", dim_id_path="$._id"),
        DimSide("b", "$.fkb", dim_id_path="$._id"),
    ]
    try:
        for i in range(3):
            star_view_batch(
                ev.filter(F.col("clusterTime.t") % 3 == i),
                path,
                epoch=i,
                dims=dims,
            )
        return (
            read_star_view(spark, path)
            .orderBy("key")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


@query(
    "cdc_scd2_history",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS ({_EV_SQL}),
    v AS (
        SELECT key, operation, doc, t,
               lead(t) OVER (PARTITION BY key ORDER BY t) AS valid_to
        FROM ev
    )
    SELECT key, doc, t AS valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM v WHERE operation <> 'delete'
    ORDER BY key, valid_from
    """,
    doc="Type-2 SCD history from the change-event log (operators/"
    "cdc.py:scd2_from_events): one row per document version with "
    "[valid_from, valid_to) event-time intervals — a version closes "
    "at the key's next event, a delete closes without opening, the "
    "last undeleted version is current.  One partitioned lead() "
    "window over the same 101-key replica envelope the replica-store "
    "queries use; the oracle is the identical window in SQL.",
    tags=("cdc",),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.cdc import (
        scd2_from_events,
    )

    ev = _replica_events(load_table(spark, sf_dir, "events"))
    return scd2_from_events(ev).orderBy("key", "valid_from")


@query(
    "cdc_scd2_asof",
    oracle=f"""
    WITH sim AS ({_SIM}),
    ev AS (
        SELECT '{{"_id": ' || CAST(event_id % 101 AS VARCHAR) || '}}' AS key,
               operation, cents,
               event_id // 4 AS t, event_id % 4 + 1 AS i
        FROM sim
        WHERE operation IN ('insert', 'update', 'replace', 'delete')
    ),
    v AS (
        SELECT key, operation, cents, t, i,
               lead(t) OVER w AS to_t, lead(i) OVER w AS to_i
        FROM ev WINDOW w AS (PARTITION BY key ORDER BY t, i)
    ),
    hist AS (
        SELECT key, cents AS v, t * 8 + i AS efrom,
               CASE WHEN to_t IS NULL THEN NULL
                    ELSE to_t * 8 + to_i END AS eto
        FROM v WHERE operation <> 'delete'
    ),
    probes AS (
        SELECT key, pt
        FROM (SELECT DISTINCT key FROM ev)
        CROSS JOIN (VALUES (CAST(64 AS BIGINT) * 8 + 2),
                           (CAST(400 AS BIGINT) * 8 + 2),
                           (CAST(1200 AS BIGINT) * 8 + 2),
                           (CAST(1000000000 AS BIGINT) * 8 + 2))
                   AS p(pt)
    )
    SELECT pr.key, pr.pt AS probe_at, h.v AS v
    FROM probes pr
    LEFT JOIN hist h
      ON h.key = pr.key AND h.efrom <= pr.pt
     AND (h.eto IS NULL OR pr.pt < h.eto)
    ORDER BY pr.key, pr.pt
    """,
    doc="SCD2 as-of round trip under SAME-SECOND versions: event time "
    "is coarsened to t = event_id/4 so up to four versions share one "
    "cluster second, distinguishable only by the (t, i) COMPOSITE "
    "interval columns scd2_from_events(composite=True) emits — the "
    "default seconds-granularity columns would give them zero-width "
    "[t, t) intervals an as-of probe cannot tell apart (the round-12 "
    "advice case).  Instants encode as t*8+i (i <= 4 < 8, order-"
    "preserving); each key is probed at four encoded instants, "
    "resolving through the half-open interval that covers the probe "
    "(exactly one per key — intervals partition the key's timeline), "
    "NULL where the key has no live version (before its first event, "
    "or deleted).  The last probe sits past every event and resolves "
    "the is_current version.",
    tags=("cdc",),
)
def cdc_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pymongo_change_stream_reader_spark.operators.cdc import (
        scd2_from_events,
    )

    e = load_table(spark, sf_dir, "events")
    # the replica envelope re-timed so 4 consecutive events share a
    # cluster second: t = event_id/4, i = event_id%4 + 1
    ev = _replica_events(e)
    coarse = F.expr(
        "CAST(substring(_id._data, 4, 30) AS LONG)"
    )  # event_id back out of the resume token
    ev = ev.withColumn(
        "clusterTime",
        F.struct(
            (coarse / 4).cast("int").alias("t"),
            (coarse % 4 + 1).cast("int").alias("i"),
        ),
    )
    hist = scd2_from_events(ev, composite=True)
    enc_from = (
        F.col("valid_from").cast("long") * 8 + F.col("valid_from_i")
    )
    enc_to = F.when(
        F.col("valid_to").isNotNull(),
        F.col("valid_to").cast("long") * 8 + F.col("valid_to_i"),
    )
    h = hist.select(
        "key",
        F.get_json_object("doc", "$.v").cast("long").alias("v"),
        enc_from.alias("efrom"),
        enc_to.alias("eto"),
    )
    instants = [64 * 8 + 2, 400 * 8 + 2, 1200 * 8 + 2,
                1000000000 * 8 + 2]
    probes = (
        ev.select(F.col("documentKey").alias("key"))
        .distinct()
        .crossJoin(
            spark.createDataFrame([(p,) for p in instants], "pt LONG")
        )
    )
    out = probes.alias("pr").join(
        h.alias("h"),
        (F.col("h.key") == F.col("pr.key"))
        & (F.col("h.efrom") <= F.col("pr.pt"))
        & (F.col("h.eto").isNull() | (F.col("pr.pt") < F.col("h.eto"))),
        "left",
    ).select(
        F.col("pr.key").alias("key"),
        F.col("pr.pt").alias("probe_at"),
        F.col("h.v").alias("v"),
    )
    return out.orderBy("key", "probe_at")


@query(
    "cdc_er_registry_incremental",
    oracle="""
    WITH RECURSIVE recs AS (
        SELECT event_id AS rid,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'signup'
    ),
    inv AS (SELECT rid, substring(k, 1, 3) AS bk FROM recs),
    cand AS (
        SELECT DISTINCT a.rid AS id_a, b.rid AS id_b
        FROM inv a JOIN inv b ON a.bk = b.bk AND a.rid < b.rid
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CASE WHEN ra.k = rb.k THEN 1.0 ELSE 0.0 END)
            + 0.5 * (1.0 - CAST(abs(ra.cents - rb.cents) AS DOUBLE)
                     / CAST(greatest(ra.cents, rb.cents, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.rid = id_a
        JOIN recs rb ON rb.rid = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.9),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT rid AS v FROM recs),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    )
    SELECT v AS rid, MIN(lbl) AS entity
    FROM cc GROUP BY v ORDER BY rid
    """,
    doc="The ER registry driven through its CHANGE-EVENT wrapper "
    "(streaming/er_registry.py:er_registry_cdc_batch — the eighth "
    "composed store's apply): signup events become insert envelopes "
    "with unique integral rids, fold through THREE persisted epochs "
    "(event_id % 3) extracting fields from the post-image by JSON "
    "path (k string, cents long), blocking on the k 3-prefix with "
    "weighted exact+closeness scoring at threshold 0.9.  Insert-only "
    "streams make the incremental fold equal the one-shot closure "
    "(no update/delete re-keying), which the oracle computes as the "
    "recursive min-label CTE over all signups at once.",
    tags=("cdc", "dedup"),
)
def cdc_er_registry_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pymongo_change_stream_reader_spark.streaming.er_registry import (
        er_registry_cdc_batch,
        er_spec_from_config,
        read_er_assign,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.get_json_object("props", "$.k")
    ev = e.select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        F.lit("insert").alias("operationType"),
        F.struct(
            F.col("event_id").cast("int").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.col("event_id").cast("string").alias("documentKey"),
        F.concat(
            F.lit('{"rid": '),
            F.col("event_id").cast("string"),
            F.lit(', "k": "'),
            k,
            F.lit('", "cents": '),
            cents.cast("string"),
            F.lit("}"),
        ).alias("fullDocument"),
        F.col("event_id").alias("__eid"),
    )
    spec, fps = er_spec_from_config(
        [
            {"name": "k", "path": "$.k", "dtype": "string",
             "weight": 0.5, "scorer": "exact"},
            {"name": "cents", "path": "$.cents", "dtype": "long",
             "weight": 0.5, "scorer": "numeric"},
        ],
        threshold=0.9,
        block_field="k",
        block_kind="token_prefix",
        block_param=3,
    )
    path = tempfile.mkdtemp(prefix="spark_er_cdc_q_")
    shutil.rmtree(path, ignore_errors=True)
    for i in range(3):
        batch = ev.filter(F.pmod(F.col("__eid"), F.lit(3)) == i).drop(
            "__eid"
        )
        er_registry_cdc_batch(
            batch, path, i + 1, spec, id_path="$.rid",
            field_paths=fps, n_buckets=16,
        )
    out = (
        read_er_assign(spark, path)
        .orderBy("rid")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(path, ignore_errors=True)
    return out


@query(
    "cdc_er_registry_objectid",
    oracle="""
    WITH RECURSIVE recs AS (
        SELECT printf('%024x', event_id) AS oid,
               CAST(json_extract_string(props, '$.k') AS VARCHAR) AS k,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'signup'
    ),
    inv AS (SELECT oid, substring(k, 1, 3) AS bk FROM recs),
    cand AS (
        SELECT DISTINCT a.oid AS id_a, b.oid AS id_b
        FROM inv a JOIN inv b ON a.bk = b.bk AND a.oid < b.oid
    ),
    scored AS (
        SELECT id_a, id_b,
            0.5 * (CASE WHEN ra.k = rb.k THEN 1.0 ELSE 0.0 END)
            + 0.5 * (1.0 - CAST(abs(ra.cents - rb.cents) AS DOUBLE)
                     / CAST(greatest(ra.cents, rb.cents, 1) AS DOUBLE))
            AS score
        FROM cand
        JOIN recs ra ON ra.oid = id_a
        JOIN recs rb ON rb.oid = id_b
    ),
    matches AS (SELECT id_a, id_b FROM scored WHERE score >= 0.9),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM matches
        UNION ALL SELECT id_b, id_a FROM matches
    ),
    verts AS (SELECT oid AS v FROM recs),
    cc(v, lbl) AS (
        SELECT v, v FROM verts
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.v
    )
    SELECT v AS oid, MIN(lbl) AS entity_rep
    FROM cc GROUP BY v ORDER BY oid
    """,
    doc="The ER registry on the reference's CANONICAL id shape: "
    "documentKey._id is a 24-hex ObjectId (reference tests/mocks/"
    "events.py:15), which does not cast to LONG — id_mode='hashed' "
    "takes the {\"$oid\": ...} JSON fragment as the injective string "
    "key (rid = xxhash64, original id persisted as the __skey "
    "collision-ledger column).  Same three-epoch fold, blocking and "
    "weighted scoring as cdc_er_registry_incremental; because hashed "
    "entity labels are opaque, the comparable is the per-record "
    "entity REPRESENTATIVE (min ObjectId hex within the entity, via "
    "one entity-partitioned window), which the oracle reproduces as "
    "min-label over the recursive closure on the hex ids themselves.",
    tags=("cdc", "dedup"),
)
def cdc_er_registry_objectid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from pyspark.sql import Window

    from pymongo_change_stream_reader_spark.streaming.er_registry import (
        er_registry_cdc_batch,
        er_spec_from_config,
        read_er_assign,
        read_er_records,
    )

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    k = F.get_json_object("props", "$.k")
    hex24 = F.format_string("%024x", F.col("event_id"))
    oid_frag = F.concat(F.lit('{"$oid": "'), hex24, F.lit('"}'))
    ev = e.select(
        F.struct(
            F.concat(F.lit("tok"), F.col("event_id").cast("string")).alias(
                "_data"
            )
        ).alias("_id"),
        F.lit("insert").alias("operationType"),
        F.struct(
            F.col("event_id").cast("int").alias("t"), F.lit(1).alias("i")
        ).alias("clusterTime"),
        F.concat(F.lit('{"_id": '), oid_frag, F.lit("}")).alias(
            "documentKey"
        ),
        F.concat(
            F.lit('{"_id": '),
            oid_frag,
            F.lit(', "k": "'),
            k,
            F.lit('", "cents": '),
            cents.cast("string"),
            F.lit("}"),
        ).alias("fullDocument"),
        F.col("event_id").alias("__eid"),
    )
    spec, fps = er_spec_from_config(
        [
            {"name": "k", "path": "$.k", "dtype": "string",
             "weight": 0.5, "scorer": "exact"},
            {"name": "cents", "path": "$.cents", "dtype": "long",
             "weight": 0.5, "scorer": "numeric"},
        ],
        threshold=0.9,
        block_field="k",
        block_kind="token_prefix",
        block_param=3,
        id_mode="hashed",
    )
    path = tempfile.mkdtemp(prefix="spark_er_oid_q_")
    shutil.rmtree(path, ignore_errors=True)
    for i in range(3):
        batch = ev.filter(F.pmod(F.col("__eid"), F.lit(3)) == i).drop(
            "__eid"
        )
        er_registry_cdc_batch(
            batch, path, i + 1, spec, id_path="$._id",
            field_paths=fps, n_buckets=16,
        )
    oid = F.regexp_extract("__skey", '"([0-9a-f]{24})"', 1)
    j = (
        read_er_records(spark, path)
        .select("rid", oid.alias("oid"))
        .join(read_er_assign(spark, path), "rid")
    )
    out = (
        j.select(
            "oid",
            F.min("oid").over(Window.partitionBy("entity")).alias(
                "entity_rep"
            ),
        )
        .orderBy("oid")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(path, ignore_errors=True)
    return out
