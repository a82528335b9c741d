"""Streaming observability: record every micro-batch's progress to a
durable metrics log.

The reference exposes its throughput through Prometheus counters
(reference `metrics/`); the Spark-native equivalent is the
StreamingQueryListener progress stream — this module persists it as
JSONL so operators (and the bench harness) can query relay throughput,
batch durations, and input rates AFTER the fact with the same engine
(``read_streaming_metrics`` returns a DataFrame).

Driver-side cost per batch: one small JSON append — no executor work,
no extra jobs.  The recorder is process-wide (Spark delivers listener
events for every query on the session); rows carry the query id/name
so multiple relays demux cleanly.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Append one JSONL row per micro-batch progress event."""

    def __init__(self, out_path: str):
        self.out_path = out_path
        self._lock = threading.Lock()
        parent = os.path.dirname(out_path)
        if parent:
            os.makedirs(parent, exist_ok=True)

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._write(
            {"event": "started", "id": str(event.id), "name": event.name}
        )

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "name": p.name,
                "batchId": p.batchId,
                "timestamp": p.timestamp,
                "numInputRows": p.numInputRows,
                "inputRowsPerSecond": p.inputRowsPerSecond,
                "processedRowsPerSecond": p.processedRowsPerSecond,
                "durationMs": dict(p.durationMs or {}),
            }
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._write(
            {
                "event": "terminated",
                "id": str(event.id),
                "exception": event.exception,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass  # idle ticks carry no progress worth persisting

    def _write(self, row: dict) -> None:
        line = json.dumps(row, default=str)
        with self._lock, open(self.out_path, "a") as fh:
            fh.write(line + "\n")
            fh.flush()


def attach_metrics_recorder(
    spark: SparkSession, out_path: str
) -> ProgressRecorder:
    """Attach a progress recorder to the session; returns it so the
    caller can ``spark.streams.removeListener(rec)`` when done."""
    rec = ProgressRecorder(out_path)
    spark.streams.addListener(rec)
    return rec


# Explicit schema: inference over a log holding only started/
# terminated rows would lack the progress columns, turning a
# filter on numInputRows into an AnalysisException mid-poll.
_METRICS_SCHEMA = (
    "event STRING, id STRING, name STRING, batchId LONG, "
    "timestamp STRING, numInputRows LONG, inputRowsPerSecond DOUBLE, "
    "processedRowsPerSecond DOUBLE, durationMs MAP<STRING, LONG>, "
    "exception STRING"
)


def read_streaming_metrics(
    spark: SparkSession, out_path: str
) -> DataFrame | None:
    """The recorded progress log as a DataFrame (None before any
    event).  `event='progress'` rows carry the per-batch figures;
    columns absent from a row read as null (fixed schema — no
    inference races against in-flight listener writes)."""
    if not os.path.exists(out_path):
        return None
    return spark.read.schema(_METRICS_SCHEMA).json(out_path)
