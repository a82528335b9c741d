"""Engine configuration with the reference's env-driven settings
surface (SURVEY §2 A22; reference settings.py:37-112 — same names, so
a reference deployment's environment works unchanged).

Settings whose job Spark machinery absorbs are accepted and mapped:
- token_* (A16/A17)            -> checkpoint location (offset+commit logs)
- max_queue_size/queue_*       -> source rate limits / trigger cadence
- commit_interval              -> trigger(processingTime=...)
- producers_count              -> optional key-hash repartition (A6)
- program_*_timeout            -> awaitTermination / stop timeouts
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pymongo_change_stream_reader_spark.plans.pipeline import parse_pipeline


@dataclass(frozen=True)
class EngineSettings:
    # identity & sources (required, as in the reference)
    stream_reader_name: str
    mongo_uri: str
    kafka_bootstrap_servers: str
    # scope (A2): deployment / database / collection
    database: str | None = None
    collection: str | None = None
    pipeline: str | None = None
    full_document: str = "whenAvailable"
    full_document_before_change: str = "whenAvailable"
    # sink & routing
    kafka_prefix: str = ""
    producers_count: int = 0
    new_topic_num_partitions: int = 1
    new_topic_replication_factor: int = 1
    new_topic_config: dict[str, str] = field(default_factory=dict)
    kafka_producer_config: dict[str, str] = field(default_factory=dict)
    # commit cadence (A15) -> trigger
    commit_interval: int = 30
    max_uncommitted_events: int = 1000
    # offsets: the checkpoint replaces the token collection (A16/A17)
    checkpoint_dir: str = "/tmp/cdc-checkpoints"
    # replica sink (engine extension): maintain a queryable
    # bucket-partitioned parquet replica instead of (or beside) the
    # Kafka relay — streaming/materialize.py
    replica_path: str | None = None
    replica_buckets: int = 16
    # serving-index stores (engine extension): any of these switches
    # the entry point to the single-pass composed relay
    # (streaming/composed_relay.py) maintaining every enabled store
    # from ONE source read per micro-batch
    dedup_index_path: str | None = None
    dedup_flags_path: str | None = None
    bm25_index_path: str | None = None
    ann_index_path: str | None = None
    ann_kind: str = "ivf"
    # ANN_VEC_COL names the FIELD inside the Extended-JSON document
    # that holds the embedding array — the CLI decodes it into a typed
    # column before starting the relay (__main__.py); ANN_KEY_COL
    # optionally points the index id at a column other than
    # documentKey (its type must match the bootstrapped index's ids)
    ann_vec_col: str = "embedding"
    ann_key_col: str | None = None
    # incremental aggregate view (engine extension, the fifth composed
    # store): per-group COUNT/SUM over JSON paths into the post-image
    # — streaming/agg_view.py
    agg_view_path: str | None = None
    agg_group_path: str = "$.g"
    agg_value_path: str = "$.v"
    agg_value_type: str = "double"
    # opt-in MIN/MAX maintenance (bounded extremum rescans) —
    # config-pinned at the store like the paths
    agg_track_minmax: bool = False
    # incremental join view (engine extension, the sixth composed
    # store): fact-join-dim over a polymorphic collection —
    # streaming/join_view.py
    join_view_path: str | None = None
    join_side_path: str = "$.side"
    join_fk_path: str = "$.fk"
    join_dim_id_path: str | None = "$._id"
    join_join_type: str = "inner"
    # incremental star view (seventh composed store): fact joined to
    # N dim sides — streaming/star_view.py
    star_view_path: str | None = None
    star_view_dims: list | None = None
    star_side_path: str = "$.side"
    star_join_type: str = "left"
    # persisted entity-resolution registry (eighth composed store):
    # blocking + weighted field scoring + transitive merges over the
    # post-image stream — streaming/er_registry.py
    er_registry_path: str | None = None
    er_fields: list | None = None
    er_id_path: str = "$._id"
    er_threshold: float = 0.8
    er_block_field: str | None = None
    er_block_kind: str = "token_prefix"
    er_block_param: int = 3
    er_max_block: int | None = None
    er_id_mode: str = "integral"
    # lifecycle
    program_start_timeout: int = 60
    program_graceful_stop_timeout: int = 20

    def __post_init__(self) -> None:
        if self.star_join_type not in ("inner", "left"):
            raise ValueError(
                "STAR_VIEW_JOIN_TYPE must be 'inner' or 'left', got "
                f"{self.star_join_type!r}"
            )
        if self.star_view_path is not None and not self.star_view_dims:
            raise ValueError(
                "STAR_VIEW_PATH needs STAR_VIEW_DIMS — a JSON list of "
                '{"side", "fk_path"[, "dim_id_path"]} objects'
            )
        for d in self.star_view_dims or []:
            if not isinstance(d, dict) or "side" not in d or "fk_path" not in d:
                raise ValueError(
                    "STAR_VIEW_DIMS entries need 'side' and 'fk_path', "
                    f"got {d!r}"
                )
            # reject typos (e.g. 'dim_id') at config parse, not at
            # first-batch DimSide(**d) TypeError mid-stream
            extra = set(d) - {"side", "fk_path", "dim_id_path"}
            if extra:
                raise ValueError(
                    "STAR_VIEW_DIMS entry has unknown key(s) "
                    f"{sorted(extra)!r} — allowed: side, fk_path, "
                    "dim_id_path"
                )
            if not re.fullmatch(r"[A-Za-z0-9_]+", str(d["side"])):
                raise ValueError(
                    "STAR_VIEW_DIMS side must match [A-Za-z0-9_]+, got "
                    f"{d['side']!r}"
                )
        if self.er_registry_path is not None:
            # fail the whole declarative ER surface at config parse,
            # not at first-batch time mid-stream
            if not self.er_fields or not self.er_block_field:
                raise ValueError(
                    "ER_REGISTRY_PATH needs ER_FIELDS (a JSON list of "
                    '{"name", "path", "dtype", "weight", "scorer"} '
                    "objects) and ER_BLOCK_FIELD"
                )
            names = set()
            for fc in self.er_fields:
                want = {"name", "path", "dtype", "weight", "scorer"}
                if not isinstance(fc, dict) or set(fc) != want:
                    raise ValueError(
                        f"ER_FIELDS entries need exactly {sorted(want)}, "
                        f"got {fc!r}"
                    )
                if fc["scorer"] not in (
                    "exact", "edit", "numeric", "jaccard"
                ):
                    raise ValueError(
                        f"ER_FIELDS scorer {fc['scorer']!r} unknown; one "
                        "of exact, edit, numeric, jaccard"
                    )
                if fc["dtype"] not in (
                    "string", "long", "int", "double", "tokens"
                ):
                    raise ValueError(
                        f"ER_FIELDS dtype {fc['dtype']!r} unknown; one "
                        "of string, long, int, double, tokens"
                    )
                names.add(fc["name"])
            if self.er_block_field not in names:
                raise ValueError(
                    f"ER_BLOCK_FIELD {self.er_block_field!r} is not an "
                    "ER_FIELDS name"
                )
            if self.er_block_kind not in ("token_prefix", "word_ngram"):
                raise ValueError(
                    "ER_BLOCK_KIND must be 'token_prefix' or "
                    f"'word_ngram', got {self.er_block_kind!r}"
                )
            if self.er_id_mode not in ("integral", "hashed"):
                raise ValueError(
                    "ER_ID_MODE must be 'integral' or 'hashed' "
                    "(hashed = arbitrary string ids, e.g. ObjectId — "
                    f"streaming/er_registry.py), got {self.er_id_mode!r}"
                )
        if self.join_join_type not in ("inner", "left"):
            # fail fast at config parse, like the pipeline whitelist
            raise ValueError(
                "JOIN_VIEW_JOIN_TYPE must be 'inner' or 'left', got "
                f"{self.join_join_type!r}"
            )
        if self.collection and not self.database:
            # reference watch.py:56-58
            raise ValueError("collection requires database")
        if self.pipeline is not None:
            parse_pipeline(self.pipeline)  # fail fast, like settings.py:69-76
        if (self.dedup_index_path is None) != (self.dedup_flags_path is None):
            # same contract the composed relay enforces — fail at
            # settings build, like the reference's Settings validation
            raise ValueError(
                "dedup needs BOTH DEDUP_INDEX_PATH and DEDUP_FLAGS_PATH"
            )
        if self.ann_kind not in ("ivf", "ivfpq"):
            raise ValueError("ANN_KIND must be 'ivf' or 'ivfpq'")

    @property
    def checkpoint_location(self) -> str:
        return f"{self.checkpoint_dir}/{self.stream_reader_name}"


def _env_json(name: str) -> dict[str, str]:
    raw = os.environ.get(name)
    return json.loads(raw) if raw else {}


def settings_from_env() -> EngineSettings:
    """Build settings from the same env names the reference reads."""
    env = os.environ
    return EngineSettings(
        stream_reader_name=env["STREAM_READER_NAME"],
        mongo_uri=env["MONGO_URI"],
        kafka_bootstrap_servers=env["KAFKA_BOOTSTRAP_SERVERS"],
        database=env.get("DATABASE"),
        collection=env.get("COLLECTION"),
        pipeline=env.get("PIPELINE"),
        full_document=env.get("FULL_DOCUMENT", "whenAvailable"),
        full_document_before_change=env.get(
            "FULL_DOCUMENT_BEFORE_CHANGE", "whenAvailable"
        ),
        kafka_prefix=env.get("KAFKA_PREFIX", ""),
        producers_count=int(env.get("PRODUCERS_COUNT", "0")),
        new_topic_num_partitions=int(env.get("NEW_TOPIC_NUM_PARTITIONS", "1")),
        new_topic_replication_factor=int(
            env.get("NEW_TOPIC_REPLICATION_FACTOR", "1")
        ),
        new_topic_config=_env_json("NEW_TOPIC_CONFIG"),
        kafka_producer_config=_env_json("KAFKA_PRODUCER_CONFIG"),
        commit_interval=int(env.get("COMMIT_INTERVAL", "30")),
        max_uncommitted_events=int(env.get("MAX_UNCOMMITTED_EVENTS", "1000")),
        checkpoint_dir=env.get("CHECKPOINT_DIR", "/tmp/cdc-checkpoints"),
        replica_path=env.get("REPLICA_PATH"),
        replica_buckets=int(env.get("REPLICA_BUCKETS", "16")),
        dedup_index_path=env.get("DEDUP_INDEX_PATH"),
        dedup_flags_path=env.get("DEDUP_FLAGS_PATH"),
        bm25_index_path=env.get("BM25_INDEX_PATH"),
        ann_index_path=env.get("ANN_INDEX_PATH"),
        ann_kind=env.get("ANN_KIND", "ivf"),
        ann_vec_col=env.get("ANN_VEC_COL", "embedding"),
        ann_key_col=env.get("ANN_KEY_COL"),
        agg_view_path=env.get("AGG_VIEW_PATH"),
        agg_group_path=env.get("AGG_GROUP_PATH", "$.g"),
        agg_value_path=env.get("AGG_VALUE_PATH", "$.v"),
        agg_value_type=env.get("AGG_VALUE_TYPE", "double"),
        agg_track_minmax=env.get("AGG_TRACK_MINMAX", "").lower()
        in ("1", "true", "yes"),
        join_view_path=env.get("JOIN_VIEW_PATH"),
        join_side_path=env.get("JOIN_SIDE_PATH", "$.side"),
        join_fk_path=env.get("JOIN_FK_PATH", "$.fk"),
        join_dim_id_path=env.get("JOIN_DIM_ID_PATH", "$._id"),
        join_join_type=env.get("JOIN_VIEW_JOIN_TYPE", "inner"),
        star_view_path=env.get("STAR_VIEW_PATH"),
        star_view_dims=(
            json.loads(env["STAR_VIEW_DIMS"])
            if env.get("STAR_VIEW_DIMS")
            else None
        ),
        star_side_path=env.get("STAR_SIDE_PATH", "$.side"),
        star_join_type=env.get("STAR_VIEW_JOIN_TYPE", "left"),
        er_registry_path=env.get("ER_REGISTRY_PATH"),
        er_fields=_env_json("ER_FIELDS"),
        er_id_path=env.get("ER_ID_PATH", "$._id"),
        er_threshold=float(env.get("ER_THRESHOLD", "0.8")),
        er_block_field=env.get("ER_BLOCK_FIELD"),
        er_block_kind=env.get("ER_BLOCK_KIND", "token_prefix"),
        er_block_param=int(env.get("ER_BLOCK_PARAM", "3")),
        er_id_mode=env.get("ER_ID_MODE", "integral"),
        er_max_block=(
            int(env["ER_MAX_BLOCK"]) if env.get("ER_MAX_BLOCK") else None
        ),
        program_start_timeout=int(env.get("PROGRAM_START_TIMEOUT", "60")),
        program_graceful_stop_timeout=int(
            env.get("PROGRAM_GRACEFUL_STOP_TIMEOUT", "20")
        ),
    )
