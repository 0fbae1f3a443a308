"""Stateful streaming sessionization vs the batch SQL oracle.

Events are split into micro-batches that cut sessions across batch
boundaries; the applyInPandasWithState operator must carry per-user
session state across them so the closed sessions it emits equal the
DuckDB window-lag sessionization over the union of all events
(``ops/windows.py sessionize_sql`` — same gap, same ids, same bounds).
A far-future sentinel event per user flushes still-open sessions at
end of replay (the sentinel's own session stays open and unemitted).
"""

from __future__ import annotations

import os

import pytest

GAP_SECS = 1800
GAP_US = GAP_SECS * 1_000_000


def _events():
    """Deterministic events: 12 users, multiple sessions, varied gaps.
    Returns list of (user_id, event_id, es)."""
    rows = []
    eid = 0
    base = 1_700_000_000_000_000
    for u in range(12):
        t = base + u * 17_000_000
        for s in range(1 + (u % 3)):
            nev = 2 + ((u + s) % 4)
            for i in range(nev):
                rows.append((u, eid, t))
                eid += 1
                t += 60_000_000 + (i * 13_000_000) % 400_000_000
            t += GAP_US + 1 + (u * 7_000_000) % 90_000_000  # close session
    return rows


def _expected_duckdb(rows):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(user_id BIGINT, event_id BIGINT, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, make_timestamp(?))",
        [(u, e, es) for u, e, es in rows],
    )
    from lucene_spark.ops import dialect as dl
    from lucene_spark.ops.windows import sessionize_sql

    return [
        tuple(int(v) for v in r)
        for r in con.execute(sessionize_sql(dl.DUCK, GAP_SECS)).fetchall()
    ]


def test_stateful_streaming_sessionize_matches_batch(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_spark.streaming.sessions import sessionize_stream

    rows = _events()
    rows.sort(key=lambda r: r[2])  # global event-time order
    # split into 3 time-range files (cutting many sessions mid-way),
    # plus a sentinel file that closes everything still open
    n = len(rows)
    splits = [rows[: n // 3], rows[n // 3 : 2 * n // 3], rows[2 * n // 3 :]]
    max_es = max(r[2] for r in rows)
    sentinel = [(u, -1, max_es + 10 * GAP_US) for u in range(12)]
    splits.append(sentinel)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, chunk in enumerate(splits):
        path = str(in_dir / f"batch_{i:02d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in chunk], pa.int64()),
                    "es": pa.array([r[2] for r in chunk], pa.int64()),
                }
            ),
            path,
        )
        # the file source orders micro-batches by modification time;
        # identical mtimes would make the replay order undefined
        t = 1_000_000_000 + i * 100
        os.utime(path, (t, t))
    stream = (
        spark.readStream.schema("user_id long, es long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = sessionize_stream(stream, gap_secs=GAP_SECS)
    query = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .start()
    )
    query.awaitTermination(300)
    got = [
        (r["user_id"], r["session_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.table("sessions_out").collect()
    ]
    got.sort()
    expected = sorted(_expected_duckdb(rows))
    assert got == expected
