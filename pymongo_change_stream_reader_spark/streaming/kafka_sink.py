"""Kafka sink with dynamic topic auto-creation (SURVEY §4 custom #2).

Topic creation is the one sink-side behavior Spark's Kafka sink lacks
(reference: change_event_handler.py:50-58 caches created topics;
producer.py:43-64 tolerates TOPIC_ALREADY_EXISTS error 36).  We
reproduce it inside ``foreachBatch``: collect the batch's distinct
topics (tiny — one per collection), create the missing ones via
AdminClient with an in-process cache, then hand the batch to the
regular Kafka writer.

``confluent_kafka`` is not bundled in this environment — the import
is gated and the admin step becomes a no-op with a warning, keeping
the Spark-side plumbing real and testable.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

# Process-wide cache of topics known to exist (mirrors the reference's
# ChangeEventHandler._created_topics, change_event_handler.py:29,38-42).
_created_topics: set[str] = set()


def _new_topic_specs(topics: set[str], settings=None) -> list[dict]:
    """NewTopic constructor kwargs for each missing topic, taken from
    ``EngineSettings`` exactly as the reference builds them
    (producer.py:43-53: num_partitions / replication_factor / config
    from NewTopicConfiguration).  Pure + lib-free so the spec wiring is
    unit-testable without a broker."""
    return [
        {
            "topic": t,
            "num_partitions": getattr(settings, "new_topic_num_partitions", 1),
            "replication_factor": getattr(
                settings, "new_topic_replication_factor", 1
            ),
            "config": dict(getattr(settings, "new_topic_config", {}) or {}),
        }
        for t in sorted(topics)
    ]


def _ensure_topics(bootstrap_servers: str, topics: set[str], settings=None) -> None:
    missing = topics - _created_topics
    if not missing:
        return
    specs = _new_topic_specs(missing, settings)
    try:
        from confluent_kafka.admin import AdminClient, NewTopic
    except ImportError:  # pragma: no cover - lib not bundled here
        logger.warning(
            "confluent_kafka unavailable; relying on broker "
            "auto.create.topics.enable for %s", sorted(missing)
        )
        _created_topics.update(missing)
        return
    admin = AdminClient({"bootstrap.servers": bootstrap_servers})
    futures = admin.create_topics([NewTopic(**spec) for spec in specs])
    for topic_name, fut in futures.items():
        try:
            fut.result()
        except Exception as exc:
            # TOPIC_ALREADY_EXISTS (36) is success for our purposes
            # (reference: producer.py:58-64).
            if "TOPIC_ALREADY_EXISTS" not in str(exc):
                raise
        _created_topics.add(topic_name)


def _require_local_path(path: str, what: str) -> None:
    """The marker/demux dirs are managed with os.path — a URI scheme
    (s3a://, hdfs://) would silently land in a literal local './s3a:'
    directory and defeat the replay dedup.  Refuse loudly instead of
    degrading (never silently mis-translate)."""
    if "://" in path:
        raise ValueError(
            f"{what} {path!r} uses a URI scheme; the epoch-marker "
            "sinks manage markers on the LOCAL filesystem only — use "
            "a local path or a transactional table sink"
        )


def _query_id(checkpoint_location: str | None) -> str:
    """The streaming query id from the checkpoint's metadata file.

    Stable across restarts of the SAME checkpoint; a new id appears
    when the checkpoint is lost/reset — which is exactly the boundary
    where epoch ids stop being unique, so the id scopes the epoch
    markers: exactly-once within a checkpoint lifetime, honest
    at-least-once RE-DELIVERY (never silent at-most-once loss) across
    checkpoint loss.  Empty when no metadata exists (marker names
    then degrade to the bare epoch form)."""
    import json
    import os

    if not checkpoint_location:
        return ""
    meta = os.path.join(checkpoint_location, "metadata")
    try:
        with open(meta) as fh:
            qid = json.load(fh).get("id", "")
            return f"{qid}-" if qid else ""
    except (OSError, ValueError):
        return ""


def _epoch_committed(marker_dir: str, epoch_id: int, qid: str = "") -> bool:
    import os

    return os.path.exists(
        os.path.join(marker_dir, f"epoch-{qid}{epoch_id:020d}")
    )


def _commit_epoch(marker_dir: str, epoch_id: int, qid: str = "") -> None:
    """Durably mark an epoch as written (atomic rename — the marker
    either exists completely or not at all)."""
    import os

    os.makedirs(marker_dir, exist_ok=True)
    marker = os.path.join(marker_dir, f"epoch-{qid}{epoch_id:020d}")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(epoch_id))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, marker)


def foreach_batch_kafka_with_topics(
    bootstrap_servers: str, settings
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: create missing topics, then write the batch
    through the regular Kafka batch writer (idempotent producer).

    Exactly-once upgrade over the reference's at-least-once contract
    (SURVEY §3.3): Structured Streaming re-invokes foreachBatch with
    the SAME epoch_id when a failed/restarted batch is replayed, and
    epoch_id is the documented dedup key.  A durable per-epoch marker
    (under the query's checkpoint dir) short-circuits replayed epochs
    so they cannot double-produce.  The one remaining at-least-once
    window — a crash BETWEEN the produce and the marker write — is
    inherent to any non-transactional sink; the parquet demux flavor
    below closes even that (its rename IS the marker).

    Scale: the distinct-topic collect is bounded by collection count,
    not row count; the write itself stays fully distributed."""
    import os

    _require_local_path(settings.checkpoint_location, "checkpoint_location")
    marker_dir = os.path.join(settings.checkpoint_location, "epoch_log")

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        qid = _query_id(settings.checkpoint_location)
        if _epoch_committed(marker_dir, epoch_id, qid):
            logger.info("epoch %s already produced; skipping replay", epoch_id)
            return
        if batch.isEmpty():  # nothing to produce, nothing to mark
            return
        topics = {r["topic"] for r in batch.select("topic").distinct().collect()}
        _ensure_topics(bootstrap_servers, topics, settings)
        (
            batch.selectExpr(
                "topic", "CAST(key AS BINARY) AS key", "CAST(value AS BINARY) AS value"
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("kafka.enable.idempotence", "true")
            .save()
        )
        _commit_epoch(marker_dir, epoch_id, qid)

    return write_batch


def foreach_batch_parquet_demux(
    out_dir: str, checkpoint_location: str | None = None
) -> Callable[[DataFrame, int], None]:
    """File flavor of the dynamic-topic sink (reference
    tests/test_file_writer/): one parquet partition per topic,
    EXACTLY-ONCE under replay within a checkpoint lifetime.

    Each epoch writes to a staging dir, then a single atomic rename
    publishes the epoch — the rename is both the commit point and
    the replay marker, so no crash point can double-write: before the
    rename a replay overwrites the staging dir; after it, the replay
    sees the published epoch and skips.  Pass ``checkpoint_location``
    so epochs are scoped by the streaming query id: epoch ids are
    only unique per checkpoint, and without the scope a NEW query
    (checkpoint lost/reset) would silently SKIP batches that collide
    with old epoch numbers — at-most-once loss.  With it, checkpoint
    loss re-delivers (honest at-least-once across that boundary).
    Readers union every published epoch dir."""
    import os
    import shutil

    _require_local_path(out_dir, "demux out_dir")

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        qid = _query_id(checkpoint_location)
        final = os.path.join(out_dir, f"epoch-{qid}{epoch_id:020d}")
        if os.path.exists(final):
            logger.info("epoch %s already published; skipping replay", epoch_id)
            return
        if batch.isEmpty():
            # a zero-row epoch has nothing to publish — and a
            # partitionBy write of 0 rows would leave a parquet-less
            # dir that poisons the union read
            return
        staging = final + ".staging"
        if os.path.exists(staging):  # crash leftover from a prior try
            shutil.rmtree(staging)
        batch.write.mode("overwrite").partitionBy("topic").parquet(staging)
        os.rename(staging, final)

    return write_batch


def _dir_has_parquet(path: str) -> bool:
    """True when any parquet file exists under ``path`` (LOCAL
    filesystem — callers gate URIs via _require_local_path).  Shared by
    the demux reader and the dedup-relay index/flags probes so the
    probe cannot drift between sibling modules."""
    import os

    return os.path.isdir(path) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(path)
        for f in files
    )


def read_parquet_demux(spark, out_dir: str):
    """Read every PUBLISHED epoch of a parquet-demux sink (staging
    dirs are invisible by construction).  Each epoch dir is its own
    partitioned root, so epochs are read individually and unioned —
    a single glob read would make Spark's partition discovery treat
    ``epoch-*`` as conflicting table roots."""
    import os
    from functools import reduce

    # an epoch published from an empty batch (or a _SUCCESS-only
    # dir) must not poison the union with schema inference errors
    has_parquet = _dir_has_parquet

    epochs = sorted(
        d
        for d in os.listdir(out_dir)
        if d.startswith("epoch-") and not d.endswith(".staging")
    )
    frames = [
        spark.read.parquet(os.path.join(out_dir, e))
        for e in epochs
        if has_parquet(os.path.join(out_dir, e))
    ]
    if not frames:
        raise FileNotFoundError(f"no published epochs under {out_dir}")
    return reduce(lambda a, b: a.unionByName(b), frames)
