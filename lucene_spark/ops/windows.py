"""Event-time windowed aggregation over the ``events`` stream table.

The batch equivalent of the Structured Streaming path (streaming/nrt.py
covers the streaming runtime; watermark-windowed aggregation over a
stream uses the same tumbling-window computation below with
``readStream`` + ``withWatermark``). Window starts are emitted as epoch
seconds so the oracle compare is timezone-proof.
"""

from __future__ import annotations

from lucene_spark.ops import dialect as dl


def tumbling_counts_sql(
    d: str, window_secs: int = 86400, table: str = "events"
) -> str:
    """(win_start, event_type, n_events, n_users, max_value): tumbling
    event-time windows with exact aggregates (counts + max — no
    order-dependent float sums)."""
    # microsecond epoch (exact int64 both engines; < 2^53 so the double
    # division below is exact enough for the floor)
    us = ("unix_micros(CAST(ts AS TIMESTAMP))" if d == dl.SPARK else "epoch_us(ts)")
    win = (
        f"CAST(floor(CAST({us} AS DOUBLE) / {window_secs * 1_000_000}) "
        f"* {window_secs} AS BIGINT)"
    )
    return f"""
SELECT {win} AS win_start,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       max(value) AS max_value
FROM {table}
GROUP BY 1, 2
ORDER BY win_start, event_type
"""


def sessionize_sql(d: str, gap_secs: int = 1800, table: str = "events") -> str:
    """(user_id, session_id, n_events, start_epoch, end_epoch): gap-based
    sessionization via a window lag — the applyInPandasWithState batch
    analog (new session when the gap to the previous event of the same
    user exceeds ``gap_secs``)."""
    us = ("unix_micros(CAST(ts AS TIMESTAMP))" if d == dl.SPARK else "epoch_us(ts)")
    gap_us = gap_secs * 1_000_000
    return f"""
WITH ordered AS (
  SELECT user_id, event_id, {us} AS es,
         lag({us}) OVER (
           PARTITION BY user_id ORDER BY {us}, event_id) AS prev_es
  FROM {table}
),
marked AS (
  SELECT user_id, event_id, es,
         CASE WHEN prev_es IS NULL OR es - prev_es > {gap_us}
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
),
sess AS (
  SELECT user_id, es,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY es, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(es) AS BIGINT) AS start_us,
       CAST(max(es) AS BIGINT) AS end_us
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""
