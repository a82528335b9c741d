"""Property-based tests (hypothesis) for the prefix-commit ledger —
random interleavings of reader records and producer acks must always
commit exactly the longest contiguous confirmed prefix, regardless of
arrival order.  (The reference's suite enumerates orderings by hand;
hypothesis searches the space.)"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pymongo_change_stream_reader_spark.streaming.commit_state import CommitLedger


@st.composite
def event_schedules(draw):
    """A set of counts 1..n, each either a heartbeat (confirmed on
    arrival) or a data event (reader record + optional ack), delivered
    in a random global order."""
    n = draw(st.integers(min_value=1, max_value=12))
    events = []
    acked = {}
    for count in range(1, n + 1):
        is_data = draw(st.booleans())
        if is_data:
            events.append(("reader", count, True, f"t{count}"))
            has_ack = draw(st.booleans())
            acked[count] = not True or has_ack
            if has_ack:
                events.append(("ack", count, False, None))
            else:
                acked[count] = False
        else:
            events.append(("reader", count, False, f"t{count}"))
            acked[count] = True
    order = draw(st.permutations(events))
    return n, order, acked


@given(event_schedules())
@settings(max_examples=200, deadline=None)
def test_commits_longest_confirmed_prefix(schedule):
    n, order, confirmed = schedule
    ledger = CommitLedger()
    for _, count, need_confirm, token in order:
        ledger.observe(count, need_confirm, token)
    committed_through, token, n_committed = ledger.committable()

    # expected: longest prefix of counts whose confirmation completed
    expected = 0
    for count in range(1, n + 1):
        if confirmed[count]:
            expected = count
        else:
            break
    assert committed_through == expected
    assert n_committed == expected
    if expected:
        assert token == f"t{expected}"  # last token in the prefix
        # committed entries cleared; nothing below the frontier remains
        assert all(c > expected for c in ledger.pending)
    # idempotence: a second commit with no new input commits nothing
    assert ledger.committable() == (expected, None, 0)


@given(event_schedules())
@settings(max_examples=100, deadline=None)
def test_incremental_equals_batch(schedule):
    """Committing after every event reaches the same frontier as one
    commit at the end (trigger-cadence independence, reference A15)."""
    n, order, confirmed = schedule
    incremental = CommitLedger()
    frontier = 0
    for _, count, need_confirm, token in order:
        incremental.observe(count, need_confirm, token)
        frontier = incremental.committable()[0]
    batch = CommitLedger()
    for _, count, need_confirm, token in order:
        batch.observe(count, need_confirm, token)
    assert frontier == batch.committable()[0]
