"""Custom streaming DataSource: a simulated MongoDB change stream with
a real offset / resume-token lifecycle (Spark 4 Python DataSource API).

This is the engine's own implementation of the reference's source
contract rather than a connector wrapper:

- ``initialOffset``        ≙ resume-token restore when no checkpoint
                             exists (reference A17, resume_token.py:35-85)
- ``read(start)``          ≙ one cursor pull from the resume point (A1,
                             watch.py:86-111); returns the rows AND the
                             next offset, so every trigger advances the
                             token even for heartbeat-only batches (A3)
- ``readBetweenOffsets``   ≙ deterministic replay after a crash — the
                             at-least-once redelivery window (A16/A17):
                             Spark re-reads exactly the uncommitted range
- the monotonically increasing ``seq`` in the offset plays the
  sequence-counter role (A4, watch.py:150-153)

Events are generated deterministically from the sequence number, so a
restart from a checkpoint resumes mid-stream with no duplicates —
asserted by the e2e test.  Swapping the generator for a ``pymongo``
cursor yields a production source with identical offset semantics.

Registration:
    from pymongo_change_stream_reader_spark.sources import python_datasource
    python_datasource.register(spark)
    spark.readStream.format("change_stream_sim")
         .option("events_per_batch", "5").load()
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from pymongo_change_stream_reader_spark.schema import CHANGE_EVENT_SCHEMA

_OPS = ("insert", "update", "replace", "delete", "drop")


def _id_json(seq: int) -> str:
    """Extended-JSON `_id` value — cycles through BSON key types
    (ObjectId / int / string / compound doc) so the key path is
    exercised for arbitrary `_id` shapes (A9, reference
    change_event_handler.py:93-98 serializes ANY documentKey)."""
    kind = seq % 4
    if kind == 0:
        return '{"$oid": "%s"}' % format(seq, "024x")
    if kind == 1:
        return str(seq)
    if kind == 2:
        return '"user-%d"' % seq
    return '{"tenant": %d, "n": %d}' % (seq % 7, seq)


def _event_for_seq(seq: int) -> tuple:
    """Deterministic change event for a global sequence number."""
    op = _OPS[seq % len(_OPS)]
    id_json = _id_json(seq)
    doc = '{"_id": %s, "n": %d}' % (id_json, seq)
    prev = '{"_id": %s, "n": %d}' % (id_json, seq - 1)
    has_key = op != "drop"
    has_after = op in ("insert", "update", "replace")
    has_before = op in ("update", "replace", "delete")
    return (
        {"_data": f"token{seq:012d}"},                      # _id (resume token)
        op,                                                 # operationType
        {"t": 1700000000 + seq, "i": 1},                    # clusterTime
        None,                                               # wallTime
        {"db": "simdb", "coll": f"c{seq % 3}"},             # ns
        '{"_id": %s}' % id_json if has_key else None,       # documentKey
        doc if has_after else None,                         # fullDocument
        prev if has_before else None,                       # fullDocumentBeforeChange
        (
            {"updatedFields": '{"n": %d}' % seq, "removedFields": [],
             "truncatedArrays": []}
            if op == "update"
            else None
        ),                                                  # updateDescription
    )


class ChangeStreamSimReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.events_per_batch = int(options.get("events_per_batch", "5"))
        self.max_events = int(options.get("max_events", "1000000"))

    def initialOffset(self) -> dict:
        # A17: fresh start when no saved token exists
        return {"seq": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # A1: one bounded cursor pull from the resume point; the
        # returned offset is the next resume token
        lo = start["seq"]
        hi = min(lo + self.events_per_batch, self.max_events)
        return iter([_event_for_seq(s) for s in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # A16/A17: crash replay of the exact uncommitted range
        return iter(
            [_event_for_seq(s) for s in range(start["seq"], end["seq"])]
        )

    def commit(self, end: dict) -> None:
        # token durably saved by the checkpoint offset log after the
        # sink finished the epoch — the reference's commit contract
        pass


class ChangeStreamSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "change_stream_sim"

    def schema(self):
        return CHANGE_EVENT_SCHEMA

    def simpleStreamReader(self, schema) -> ChangeStreamSimReader:
        return ChangeStreamSimReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ChangeStreamSimDataSource)


__all__ = ["ChangeStreamSimDataSource", "ChangeStreamSimReader", "register"]
