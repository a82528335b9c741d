"""Property-based tests (hypothesis) for the prefix-commit ledger —
random interleavings of reader records and producer acks must always
commit exactly the reference's prefix: contiguous confirmed counts, up
to the LAST TOKEN-BEARING entry (reference commit_processing.py:96-118
— trailing tokenless confirmed counts are withheld so a commit never
carries a null resume token).  The reference's suite enumerates
orderings by hand; hypothesis searches the space."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pymongo_change_stream_reader_spark.streaming.commit_state import CommitLedger


@st.composite
def event_schedules(draw):
    """A set of counts 1..n, each either a heartbeat (confirmed on
    arrival) or a data event (reader record + optional ack), delivered
    in a random global order.  Reader records may lack a resume token —
    the case that exposes the tokenless-trailing-prefix rule."""
    n = draw(st.integers(min_value=1, max_value=12))
    events = []
    acked = {}
    has_token = {}
    for count in range(1, n + 1):
        is_data = draw(st.booleans())
        has_token[count] = draw(st.booleans())
        token = f"t{count}" if has_token[count] else None
        if is_data:
            events.append(("reader", count, True, token))
            acked[count] = draw(st.booleans())
            if acked[count]:
                events.append(("ack", count, False, None))
        else:
            events.append(("reader", count, False, token))
            acked[count] = True
    order = draw(st.permutations(events))
    return n, order, acked, has_token


def _expected_commit(n, acked, has_token):
    """Reference semantics: contiguous confirmed prefix, committed only
    through its last token-bearing count."""
    prefix = 0
    for count in range(1, n + 1):
        if acked[count]:
            prefix = count
        else:
            break
    return max(
        (c for c in range(1, prefix + 1) if has_token[c]), default=0
    )


@given(event_schedules())
@settings(max_examples=200, deadline=None)
def test_commits_token_bearing_confirmed_prefix(schedule):
    n, order, acked, has_token = schedule
    ledger = CommitLedger()
    for _, count, need_confirm, token in order:
        ledger.observe(count, need_confirm, token)
    committed_through, token, n_committed = ledger.committable()

    expected = _expected_commit(n, acked, has_token)
    assert committed_through == expected
    assert n_committed == expected
    if expected:
        assert token == f"t{expected}"  # the last token in the prefix
        # committed entries cleared; nothing below the frontier remains
        assert all(c > expected for c in ledger.pending)
    else:
        # no token-bearing confirmed prefix -> no commit, never a null
        # token row
        assert token is None
    # idempotence: a second commit with no new input commits nothing
    assert ledger.committable() == (expected, None, 0)


@given(event_schedules())
@settings(max_examples=100, deadline=None)
def test_incremental_equals_batch(schedule):
    """Committing after every event reaches the same frontier as one
    commit at the end (trigger-cadence independence, reference A15)."""
    n, order, acked, has_token = schedule
    incremental = CommitLedger()
    frontier = 0
    for _, count, need_confirm, token in order:
        incremental.observe(count, need_confirm, token)
        frontier = incremental.committable()[0]
    batch = CommitLedger()
    for _, count, need_confirm, token in order:
        batch.observe(count, need_confirm, token)
    assert frontier == batch.committable()[0]


@given(event_schedules())
@settings(max_examples=100, deadline=None)
def test_redelivered_acks_are_dropped(schedule):
    """Re-observing every event after a commit must not resurrect
    committed counts in pending state (reference guards observe with
    count > last_sent_commit_event) and must not move the frontier."""
    n, order, acked, has_token = schedule
    ledger = CommitLedger()
    for _, count, need_confirm, token in order:
        ledger.observe(count, need_confirm, token)
    committed_through, _, _ = ledger.committable()
    pending_before = {c: list(v) for c, v in ledger.pending.items()}

    for _, count, need_confirm, token in order:
        ledger.observe(count, need_confirm, token)
    assert all(c > committed_through for c in ledger.pending)
    # already-seen uncommitted events merge idempotently
    assert {c: list(v) for c, v in ledger.pending.items()} == pending_before
    assert ledger.committable() == (committed_through, None, 0)
