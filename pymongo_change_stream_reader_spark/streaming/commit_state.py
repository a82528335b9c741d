"""Prefix-commit state machine as a custom stateful streaming operator
(SURVEY §2 A14/A15).

The engine does NOT need this: Structured Streaming's checkpoint
offset+commit logs provide the identical at-least-once contract for
free (SURVEY §3.3).  It exists as the user-level re-expression SURVEY
A14 names — `applyInPandasWithState` keyed by stream id — both as
parity evidence and as the template for custom stateful operators.

Semantics (reference: committing/commit_processing.py:12-138):
- every event carries (count, need_confirm, token?);
- a reader record with need_confirm=0 is confirmed immediately
  (heartbeats, filtered op types);
- a reader record with need_confirm=1 is confirmed only once the
  matching producer ack (same count, need_confirm=0, no token)
  arrives; the two half-records merge, preferring the newest
  non-null token (:45-94);
- each trigger commits the longest contiguous prefix
  last_committed+1..k of confirmed counts, emitting the LAST token in
  the prefix (:96-118); committed entries are cleared (:131-138).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "stream_id STRING, committed_through BIGINT, resume_token STRING, "
    "n_committed INT"
)
STATE_SCHEMA = (
    "last_committed BIGINT, counts ARRAY<BIGINT>, confirmed ARRAY<BOOLEAN>, "
    "tokens ARRAY<STRING>"
)


@dataclass
class CommitLedger:
    """Pure-Python core of the state machine (unit-testable without
    Spark).  Tracks per-count confirmation and extracts the
    committable contiguous prefix."""

    last_committed: int = 0
    # count -> [confirmed, token]
    pending: dict[int, list] = field(default_factory=dict)

    def observe(self, count: int, need_confirm: bool, token: str | None) -> None:
        # reference commit_processing.py:46,60 — events at or below the
        # committed frontier are redeliveries; without this guard they
        # would accumulate in pending forever.
        if count <= self.last_committed:
            return
        entry = self.pending.get(count)
        if entry is None:
            self.pending[count] = [not need_confirm, token]
            return
        # merge the two half-records: an ack (need_confirm=0 without a
        # token) confirms; the newest non-null token wins
        # (commit_processing.py:83-94 _get_actual_token)
        if not need_confirm:
            entry[0] = True
        if token is not None:
            entry[1] = token

    def committable(self) -> tuple[int, str | None, int]:
        """(committed_through, token, n) for the confirmed contiguous
        prefix UP TO its last token-bearing entry; advances and clears
        the committed entries.

        Trailing confirmed-but-tokenless counts are withheld
        (reference commit_processing.py:96-118): a commit must carry a
        resume token, otherwise the downstream token upsert would
        regress the durable offset to null."""
        k = self.last_committed
        token = None
        commit_to = self.last_committed
        while True:
            entry = self.pending.get(k + 1)
            if entry is None or not entry[0]:
                break
            k += 1
            if entry[1] is not None:
                token = entry[1]
                commit_to = k
        n = commit_to - self.last_committed
        if n == 0:
            return self.last_committed, None, 0
        for c in range(self.last_committed + 1, commit_to + 1):
            self.pending.pop(c, None)
        self.last_committed = commit_to
        return commit_to, token, n


def _ledger_from_state(state: GroupState) -> CommitLedger:
    if not state.exists:
        return CommitLedger()
    last_committed, counts, confirmed, tokens = state.get
    ledger = CommitLedger(last_committed=last_committed)
    for c, ok, tok in zip(counts, confirmed, tokens):
        ledger.pending[c] = [ok, tok]
    return ledger


def _state_from_ledger(ledger: CommitLedger) -> tuple:
    counts = sorted(ledger.pending)
    return (
        ledger.last_committed,
        counts,
        [ledger.pending[c][0] for c in counts],
        [ledger.pending[c][1] for c in counts],
    )


def commit_prefix(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: fold this trigger's commit events
    into the ledger, emit one row when a prefix commits."""
    ledger = _ledger_from_state(state)
    for pdf in pdfs:
        for count, need_confirm, token in zip(
            pdf["count"], pdf["need_confirm"], pdf["resume_token"]
        ):
            ledger.observe(
                int(count), bool(need_confirm), None if pd.isna(token) else token
            )
    committed_through, token, n = ledger.committable()
    state.update(_state_from_ledger(ledger))
    if n:
        yield pd.DataFrame(
            {
                "stream_id": [key[0]],
                "committed_through": [committed_through],
                "resume_token": [token],
                "n_committed": [n],
            }
        )


def commit_stream(commit_events: DataFrame) -> DataFrame:
    """Wire the state machine over a streaming DataFrame of
    (stream_id, count, need_confirm, resume_token).

    Scale: state is per stream id (one ledger per CDC stream), the
    shuffle keys on stream_id only; within a trigger the fold is a
    single Arrow batch pass."""
    return (
        commit_events.groupBy(F.col("stream_id"))
        .applyInPandasWithState(
            commit_prefix,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas form — Spark 4's successor stateful API.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import surface depends on Spark build
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CommitStatefulProcessor(StatefulProcessor):
        """The same prefix-commit ledger on transformWithStateInPandas:
        typed ValueState instead of a raw state tuple, explicit
        init/close lifecycle, and (unused here) timer support.  Same
        semantics as ``commit_prefix`` — the equivalence test drives
        both through the identical scenario."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ledger_state = handle.getValueState("ledger", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            stored = self._ledger_state.get() if self._ledger_state.exists() else None
            ledger = CommitLedger()
            if stored is not None:
                last_committed, counts, confirmed, tokens = stored
                ledger.last_committed = last_committed
                for c, ok, tok in zip(counts, confirmed, tokens):
                    ledger.pending[c] = [ok, tok]
            for pdf in rows:
                for count, need_confirm, token in zip(
                    pdf["count"], pdf["need_confirm"], pdf["resume_token"]
                ):
                    ledger.observe(
                        int(count),
                        bool(need_confirm),
                        None if pd.isna(token) else token,
                    )
            committed_through, token, n = ledger.committable()
            self._ledger_state.update(_state_from_ledger(ledger))
            if n:
                yield pd.DataFrame(
                    {
                        "stream_id": [key[0]],
                        "committed_through": [committed_through],
                        "resume_token": [token],
                        "n_committed": [n],
                    }
                )

        def close(self) -> None:
            pass

    def commit_stream_tws(commit_events: DataFrame) -> DataFrame:
        """``commit_stream`` on the transformWithState API.  Requires
        the RocksDB state-store provider (set
        spark.sql.streaming.stateStore.providerClass to
        RocksDBStateStoreProvider before starting the query) and the
        ``protobuf`` package (the TWS state server's wire protocol —
        absent from this container, so the e2e test auto-skips; the
        ledger semantics are covered by the shared CommitLedger unit
        tests and the applyInPandasWithState integration)."""
        return commit_events.groupBy(F.col("stream_id")).transformWithStateInPandas(
            CommitStatefulProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    CommitStatefulProcessor = None  # type: ignore[assignment]
    commit_stream_tws = None  # type: ignore[assignment]
