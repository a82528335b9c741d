"""Online BM25 serving-index maintenance from the change stream — the
lexical-retrieval sibling of the streaming LSH dedup consumer
(streaming/dedup_relay.py): each micro-batch's new documents fold into
the stored BM25 index (operators/retrieval.py append_bm25_index), so
the ingest-once/query-many serving contract holds for a corpus that
never stops growing.

Per micro-batch:

1. reduce the batch to one (doc, text) row per key — the LWW triple
   reduction shared with the dedup relay;
2. if the index does not exist yet, build it from the batch
   (write_bm25_index); otherwise append (postings/doclen appends +
   df SEGMENT rows + exact consts advance — see append_bm25_index);
3. the epoch marker (query-id scoped, streaming/kafka_sink.py) guards
   replays: a redelivered batch cannot double-append.

The BM25 index is append-only: a batch that UPDATES an existing
document's text cannot be folded (re-ingesting a doc_id would
double-count its terms), so by default those keys are skipped with a
warning — an updating corpus should either relay inserts only into
the index or rebuild periodically (the classic search-engine segment
merge, out of scope for the online path).

Scale: per batch, tokenize cost = the batch; the only index-sized
reads are the doclen id column (duplicate-id guard) and nothing else —
the corpus is never re-tokenized.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pymongo_change_stream_reader_spark.operators.retrieval import (
    append_bm25_index,
    recover_bm25_append,
    write_bm25_index,
)
from pymongo_change_stream_reader_spark.streaming.dedup_relay import (
    _last_doc_per_key,
)
from pymongo_change_stream_reader_spark.streaming.kafka_sink import (
    _commit_epoch,
    _epoch_committed,
    _query_id,
    _require_local_path,
)

logger = logging.getLogger(__name__)


def bm25_ingest_batch(
    batch: DataFrame,
    index_path: str,
    text_col: str = "fullDocument",
    key_col: str = "documentKey",
) -> int:
    """Fold one batch of change events into the stored BM25 index.
    Returns the number of documents ingested.  Keys already present in
    the index are skipped (append-only contract; logged)."""
    _require_local_path(index_path, "index_path")
    docs = (
        _last_doc_per_key(batch, text_col, key_col)
        .select(F.col("doc").alias("doc_id"), F.col("text"))
        .localCheckpoint(eager=True)
    )
    spark = batch.sparkSession
    if not os.path.exists(os.path.join(index_path, "_consts.json")):
        n = docs.count()
        if n:
            write_bm25_index(docs, index_path, "text", "doc_id")
        return n
    # a crashed previous append rolls back here BEFORE the anti-join:
    # its epoch never committed, so this batch IS the replay and must
    # see the exact pre-crash index state (append_bm25_index refuses
    # to run over a live journal otherwise)
    if recover_bm25_append(index_path):
        logger.warning(
            "bm25 index at %s: rolled back a crashed append before "
            "re-applying the replayed batch",
            index_path,
        )
    stored = spark.read.parquet(os.path.join(index_path, "doclen")).select(
        "doc_id"
    )
    fresh = docs.join(stored, "doc_id", "left_anti").localCheckpoint(
        eager=True
    )
    n_skipped = docs.count() - fresh.count()
    if n_skipped:
        logger.warning(
            "bm25 index at %s: skipped %d already-ingested key(s) — the "
            "index is append-only (updates need a rebuild/segment merge)",
            index_path,
            n_skipped,
        )
    # check_new_ids=False: the anti-join above IS the guard, and unlike
    # the raise-on-collision default it lets insert+update mixes flow
    return append_bm25_index(
        fresh, index_path, "text", "doc_id", check_new_ids=False
    )


def start_streaming_bm25_index(
    events: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    text_col: str = "fullDocument",
    key_col: str = "documentKey",
    trigger_interval: str | None = None,
):
    """Streaming entry point: foreachBatch fold-into-index with
    epoch-marker replay protection."""
    _require_local_path(checkpoint_dir, "checkpoint_dir")
    _require_local_path(index_path, "index_path")
    marker_dir = os.path.join(checkpoint_dir, "epoch_log")

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        qid = _query_id(checkpoint_dir)
        if _epoch_committed(marker_dir, epoch_id, qid):
            logger.info("epoch %s already ingested; skipping replay", epoch_id)
            return
        if batch_df.isEmpty():
            return
        bm25_ingest_batch(batch_df, index_path, text_col, key_col)
        _commit_epoch(marker_dir, epoch_id, qid)

    writer = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
