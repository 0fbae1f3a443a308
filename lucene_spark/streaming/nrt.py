"""Near-real-time indexing via Structured Streaming.

Lucene has no streaming operators; its NRT story is
``IndexWriter.getReader`` (flush in-memory buffers, open a
point-in-time reader without a durable commit —
``index/IndexWriter.java:515-712``) plus ``SearcherManager`` refresh.
The Spark-native translation (SURVEY.md §2.10):

- ``index_stream`` drives ``writeStream.foreachBatch``: every
  micro-batch becomes one or more immutable segments appended under a
  NEW commit generation (doc_base continues from the previous commit) —
  each micro-batch is a durable commit point, strictly stronger than
  Lucene NRT (which defers durability).
- ``append_batch`` is the batch-callable core (also usable standalone
  for incremental bulk loads).
- ``Searcher.refresh()`` (searcher.py) re-opens the latest generation —
  the SearcherManager.maybeRefresh analog; readers see snapshot-isolated
  generations because segments are immutable and commits are atomic
  JSON swaps.

Scale notes: the per-batch work is the same embarrassingly parallel
segment build as the bulk path (one shuffle, then per-partition
writes); small streaming segments are later folded in by the tiered
compaction job (merge.py) exactly like Lucene's merge-after-flush.
"""

from __future__ import annotations

import os

from lucene_spark.index.builder import (
    IndexConfig,
    _atomic_write_json,
    build_index,
    read_latest_commit,
)


def append_batch(spark, batch_df, index_dir: str, config: IndexConfig) -> dict:
    """Append one micro-batch as new segments in a new generation.

    Doc IDs continue densely from the previous commit's doc_count;
    previous segments are carried into the new commit unchanged.
    """
    import dataclasses

    try:
        prev = read_latest_commit(index_dir)
    except FileNotFoundError:
        prev = None
    gen = (prev["generation"] + 1) if prev else config.generation
    # the append's doc ids must start past every EXISTING id range, not
    # at doc_count: a reclaiming (squeeze) merge shrinks doc_count below
    # the max segment end, and basing the append on doc_count would
    # OVERLAP the tail segment's global ids (two docs sharing an id —
    # phantom hits and missed docmap lookups). Gaps left by squeezes
    # stay gaps; ids are never reused while any segment spans them.
    base = (
        max(
            (int(s["doc_base"]) + int(s["num_docs"]) for s in prev["segments"]),
            default=prev["doc_count"],
        )
        if prev
        else 0
    )

    # replace() carries EVERY config field (doc_base_mode/doc_stride/...)
    # — field-by-field reconstruction silently dropped new fields
    cfg = dataclasses.replace(config, generation=gen)
    # build the batch's segments WITHOUT publishing a commit: the only
    # commit point readers can ever observe is the fully-spliced one
    # (publish-then-overwrite left a window where gen_N listed only the
    # micro-batch segments — silent data loss on refresh/crash)
    batch_commit = build_index(
        spark, batch_df, index_dir, cfg, doc_base_offset=base, write_commit=False
    )
    if prev is None:
        merged = batch_commit
    else:
        merged = dict(prev)
        merged["generation"] = gen
        merged["segments"] = prev["segments"] + batch_commit["segments"]
        merged["doc_count"] = prev["doc_count"] + batch_commit["doc_count"]
        merged["sum_total_tf"] = prev["sum_total_tf"] + batch_commit["sum_total_tf"]
        fields = {f: dict(st) for f, st in (prev.get("fields") or {}).items()}
        for f, st in (batch_commit.get("fields") or {}).items():
            cur = fields.setdefault(f, {"doc_count": 0, "sum_total_tf": 0})
            cur["doc_count"] += int(st["doc_count"])
            cur["sum_total_tf"] += int(st["sum_total_tf"])
        merged["fields"] = fields
        merged["num_segments"] = len(merged["segments"])
    os.makedirs(os.path.join(index_dir, "commits"), exist_ok=True)
    _atomic_write_json(
        os.path.join(index_dir, "commits", f"gen_{gen:06d}.json"), merged
    )
    return merged


def index_stream(
    spark,
    stream_df,
    index_dir: str,
    config: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    trigger: dict | None = None,
):
    """Start a streaming indexer over ``stream_df`` (must contain the
    config's key/text columns). Returns the StreamingQuery.

    ``trigger`` kwargs pass through to ``writeStream.trigger`` (e.g.
    ``{"availableNow": True}`` for catch-up runs,
    ``{"processingTime": "10 seconds"}`` for continuous NRT).
    """
    config = config or IndexConfig()
    checkpoint_dir = checkpoint_dir or os.path.join(index_dir, "_stream_checkpoint")

    def fn(batch_df, batch_id: int):
        if batch_df.isEmpty():
            return
        append_batch(batch_df.sparkSession, batch_df, index_dir, config)

    w = stream_df.writeStream.foreachBatch(fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger:
        w = w.trigger(**trigger)
    return w.start()
