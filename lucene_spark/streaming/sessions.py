"""Stateful streaming sessionization — ``applyInPandasWithState``.

The custom-stateful-operator path of Structured Streaming (the analog
of a Flink keyed ProcessFunction): events grouped by ``user_id`` carry
per-user state (open session id, bounds, count) across micro-batches;
a session CLOSES when a later event of the same user arrives more than
``gap_secs`` after the session's end, and the closed session row is
emitted downstream. Batch semantics are pinned by the window-lag SQL
in ``ops/windows.py sessionize_sql``: replaying any stream split of
the same events through the stateful operator must yield exactly the
sessions the batch query computes over the union (asserted by
tests/test_streaming_sessions.py, including a mid-session split across
micro-batches).

Notes for the 1000-executor deployment:
- ``applyInPandasWithState`` shuffles by ``user_id`` once; state lives
  in the state store (RocksDB provider at scale), sized by ACTIVE
  users, not history.
- This module processes events assuming per-user event-time order
  within and across batches (the driver feeds ordered replays; a
  production pipeline puts ``withWatermark`` + a sort-within-batch in
  front, and state eviction by timeout — here sessions also close on
  GroupStateTimeout when the stream uses processing-time timeouts).
- Open sessions are emitted only on close. To FLUSH at end-of-replay,
  feed one sentinel event per user far beyond the gap (tests do this):
  it closes every open session and leaves only the discardable
  sentinel session in state — the streaming analog of the batch
  query's implicit end-of-input.
"""

from __future__ import annotations

SESSION_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
STATE_SCHEMA = "session_id long, n_events long, start_us long, end_us long"


def make_sessionizer(gap_secs: int = 1800):
    """Returns the ``(key, iterator, state)`` function for
    ``df.groupBy("user_id").applyInPandasWithState(fn, SESSION_SCHEMA,
    STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout)``."""
    gap_us = gap_secs * 1_000_000

    def sessionize(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            sid, n, start_us, end_us = state.get
        else:
            sid, n, start_us, end_us = 0, 0, None, None
        out = []
        for pdf in pdfs:
            es = pdf["es"].sort_values(kind="mergesort")
            for e in es:
                e = int(e)
                if n == 0:
                    sid, n, start_us, end_us = sid + 1, 1, e, e
                elif e - end_us > gap_us:
                    out.append((user_id, sid, n, start_us, end_us))
                    sid, n, start_us, end_us = sid + 1, 1, e, e
                else:
                    n += 1
                    end_us = max(end_us, e)
        if state.hasTimedOut:
            if n > 0:
                out.append((user_id, sid, n, start_us, end_us))
            state.remove()
        else:
            state.update((sid, n, start_us, end_us))
        return iter(
            [
                pd.DataFrame(
                    out,
                    columns=[
                        "user_id", "session_id", "n_events", "start_us",
                        "end_us",
                    ],
                )
            ]
        )

    return sessionize


def sessionize_stream(events_stream_df, gap_secs: int = 1800):
    """Wire the stateful operator onto a STREAMING events DataFrame
    (columns ``user_id``, ``es`` = event-time epoch micros). Returns
    the streaming DataFrame of closed-session rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events_stream_df.select("user_id", "es")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_secs),
            SESSION_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
