"""Online near-duplicate detection for the relay: maintain the
persisted MinHash-LSH band index (operators/dedup.py) from the change
stream, flagging each arriving document that collides with the
already-ingested corpus — the streaming half of training-data dedup,
wired as a foreachBatch consumer exactly like the replica
materializer (streaming/materialize.py).

Per micro-batch (r3 verdict ask #5):

1. reduce the batch to its data-op documents (one row per key);
2. PROBE the stored index first — ``query_lsh_index`` equi-joins the
   batch's band sketches against the on-disk (band, bucket) table, so
   a document is never flagged against itself and flags always mean
   "near-dup of something ingested in an EARLIER batch";
3. append the flagged (new_id, corpus_id, epoch) pairs to the flags
   table (downstream drops or reviews them — candidate semantics, the
   same contract as lsh_candidate_pairs; exact-Jaccard verification
   needs the corpus text and runs downstream where that text lives);
4. APPEND the batch's own band sketches to the index — cost scales
   with the batch, never the corpus (the append-path contract of
   write_lsh_index/append_lsh_index).

Replay safety: the epoch-marker pattern from the Kafka sink
(streaming/kafka_sink.py) — a durable per-epoch marker scoped by the
streaming query id short-circuits replayed epochs, so a redelivered
batch cannot double-append the index or double-flag.  The remaining
at-least-once window (crash between the writes and the marker) is the
same one documented for every non-transactional sink here; duplicate
band rows only widen candidate sets, never lose flags.

Scale: the probe is a (tiny) batch-side broadcast against a
band-partition-pruned index scan; the append writes only new files
under existing band partitions.  Signatures are plan/session-stable
(_seeded_hash), so an index written yesterday matches sketches
computed today.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.dedup import (
    append_lsh_index,
    query_lsh_index,
    read_lsh_index,
)
from pymongo_change_stream_reader_spark.streaming.kafka_sink import (
    _commit_epoch,
    _dir_has_parquet,
    _epoch_committed,
    _query_id,
    _require_local_path,
)

logger = logging.getLogger(__name__)

_DATA_OPS = ("insert", "update", "replace")


def _last_doc_per_key(batch: DataFrame, text_col: str, key_col: str):
    """One (doc, text) row per key: the LAST data-op event by the LWW
    triple (clusterTime.t, clusterTime.i, _id._data) — the same
    reduction the replica materializer uses, so the index always
    stores the LIVE document version, never an arbitrary superseded
    one (and the choice is deterministic under replay).  Frames
    without the change-event columns (direct batch use of
    dedup_flag_batch) fall back to max_by on the text itself —
    still deterministic, just not time-ordered."""
    cols = set(batch.columns)
    if {"clusterTime", "_id"} <= cols:
        order = F.struct(
            F.col("clusterTime.t"), F.col("clusterTime.i"), F.col("_id._data")
        )
    else:
        order = F.col(text_col)
    return (
        batch.filter(F.col("operationType").isin(*_DATA_OPS))
        .filter(F.col(text_col).isNotNull())
        .groupBy(F.col(key_col).alias("doc"))
        .agg(F.max_by(F.col(text_col), order).alias("text"))
    )


def dedup_flag_batch(
    batch: DataFrame,
    index_path: str,
    flags_path: str,
    text_col: str = "fullDocument",
    key_col: str = "documentKey",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    epoch_id: int = 0,
) -> int:
    """Apply one batch of change events: probe-then-append (see module
    docstring).  Returns the number of flagged (new, corpus) pairs;
    flag rows carry ``epoch`` so replay-window duplicates are
    attributable.  Batch-testable without a streaming query, like
    materialize_change_batch."""
    _require_local_path(index_path, "index_path")
    _require_local_path(flags_path, "flags_path")
    docs = _last_doc_per_key(batch, text_col, key_col).localCheckpoint(
        eager=True  # probed AND appended below
    )
    n_flags = 0
    if _dir_has_parquet(index_path):
        spark = batch.sparkSession
        cand = query_lsh_index(
            docs,
            read_lsh_index(spark, index_path),
            "text",
            "doc",
            num_hashes,
            bands,
            n,
        )
        # one materialization: count and append must not re-run the
        # index-scan join (the per-batch hot-path cost) twice
        flagged = (
            cand.filter(F.col("new_id") != F.col("corpus_id"))
            .withColumn("epoch", F.lit(epoch_id).cast("long"))
            .localCheckpoint(eager=True)
        )
        n_flags = flagged.count()
        if n_flags:
            flagged.write.mode("append").parquet(flags_path)
    append_lsh_index(docs, index_path, "text", "doc", num_hashes, bands, n)
    return n_flags


def start_streaming_dedup(
    events: DataFrame,
    index_path: str,
    flags_path: str,
    checkpoint_dir: str,
    text_col: str = "fullDocument",
    key_col: str = "documentKey",
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    trigger_interval: str | None = None,
):
    """Streaming entry point: foreachBatch probe-then-append with
    epoch-marker replay protection."""
    _require_local_path(checkpoint_dir, "checkpoint_dir")
    _require_local_path(index_path, "index_path")
    _require_local_path(flags_path, "flags_path")
    marker_dir = os.path.join(checkpoint_dir, "epoch_log")

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        qid = _query_id(checkpoint_dir)
        if _epoch_committed(marker_dir, epoch_id, qid):
            logger.info("epoch %s already ingested; skipping replay", epoch_id)
            return
        if batch_df.isEmpty():
            return
        dedup_flag_batch(
            batch_df,
            index_path,
            flags_path,
            text_col,
            key_col,
            num_hashes,
            bands,
            n,
            epoch_id=epoch_id,
        )
        _commit_epoch(marker_dir, epoch_id, qid)

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def read_dedup_flags(spark, flags_path: str) -> DataFrame | None:
    """The accumulated (new_id, corpus_id, epoch) near-dup flags, or
    None before any flag has been written.  LOCAL paths only (the
    existence probe is driver-side) — a URI raises loudly rather than
    silently reporting no flags."""
    _require_local_path(flags_path, "flags_path")
    if not _dir_has_parquet(flags_path):
        return None
    return spark.read.parquet(flags_path)
