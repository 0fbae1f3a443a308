"""Document deletes — tombstone bitmaps per segment.

The reference model (SURVEY.md §1.2; ``Lucene90LiveDocsFormat``,
``IndexWriter.deleteDocuments`` at ``index/IndexWriter.java``): deletes
mark docs dead in a per-segment liveDocs structure; postings, norms and
GLOBAL STATS are untouched until a rewriting merge (docFreq still
counts deleted docs — scores of surviving docs are unchanged by a
delete, which the tests assert). Updates = delete + re-add (a
streaming append of the new version).

Layout: ``deletes/segment_id=<sid>/data.parquet`` with one ``local_id``
column; absent file = all live. Each delete batch publishes a new
commit generation recording per-segment delete counts.
"""

from __future__ import annotations

import os

import numpy as np

from lucene_spark.index.builder import _atomic_write_json, read_latest_commit


def _segment_of(doc_ids: np.ndarray, segments: list) -> dict:
    """Map global doc ids -> {segment_id: local_id array} via the
    commit's doc_base ranges."""
    segs = sorted(segments, key=lambda s: s["doc_base"])
    bases = np.array([s["doc_base"] for s in segs], dtype=np.int64)
    idx = np.searchsorted(bases, doc_ids, side="right") - 1
    out: dict = {}
    for i in np.unique(idx):
        s = segs[int(i)]
        sel = doc_ids[idx == i]
        local = sel - s["doc_base"]
        ok = (local >= 0) & (local < s["num_docs"])
        if not ok.all():
            bad = sel[~ok]
            raise KeyError(f"doc ids outside any live segment: {bad[:5]}")
        out[s["segment_id"]] = local
    return out


def _read_deletes(index_dir: str, segment_id: str) -> np.ndarray:
    import pyarrow.parquet as pq

    p = os.path.join(index_dir, "deletes", f"segment_id={segment_id}", "data.parquet")
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    return np.asarray(pq.read_table(p)["local_id"].to_pylist(), dtype=np.int64)


def _write_deletes(index_dir: str, segment_id: str, local_ids: np.ndarray) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(index_dir, "deletes", f"segment_id={segment_id}")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, "data.parquet.tmp")
    pq.write_table(
        pa.table({"local_id": pa.array(np.sort(local_ids).tolist(), pa.int64())}),
        tmp,
    )
    os.replace(tmp, os.path.join(d, "data.parquet"))


def delete_docs(
    spark,
    index_dir: str,
    keys: list | None = None,
    doc_ids: list | None = None,
    predicate: str | None = None,
) -> dict:
    """Delete documents by key (url), by global doc id, or by a SQL
    ``predicate`` over the docmap (columns ``url``, ``doc_id``,
    ``segment_id``) — deleteDocuments(Term)/(Query) analogs. Publishes
    a new commit generation; returns it. Idempotent (re-deleting is a
    no-op union).

    The predicate path is FULLY DISTRIBUTED (the delete-by-query shape
    for web-scale purges — policy takedowns, domain blocks): matched
    ids never visit the driver; each owning segment's task unions its
    tombstone file in place and reports only a count row."""
    import pyspark.sql.functions as F

    commit = read_latest_commit(index_dir)
    live = [s["segment_id"] for s in commit["segments"]]
    if predicate is not None:
        return _delete_by_predicate(spark, index_dir, commit, live, predicate)
    ids: list = list(doc_ids or [])
    if keys:
        dm = (
            spark.read.parquet(os.path.join(index_dir, "docmap"))
            .where(F.col("segment_id").isin(live))
            .where(F.col("url").isin([str(k) for k in keys]))
            .select("doc_id")
            .collect()
        )
        ids.extend(int(r["doc_id"]) for r in dm)
    if not ids:
        return commit
    per_seg = _segment_of(np.unique(np.asarray(ids, dtype=np.int64)), commit["segments"])
    new_segments = []
    total_del = 0
    for s in commit["segments"]:
        sid = s["segment_id"]
        prev = _read_deletes(index_dir, sid)
        add = per_seg.get(sid)
        merged = np.union1d(prev, add) if add is not None else prev
        if add is not None:
            _write_deletes(index_dir, sid, merged)
        s2 = dict(s)
        s2["del_count"] = int(merged.size)
        total_del += int(merged.size)
        new_segments.append(s2)
    gen = commit["generation"] + 1
    new_commit = dict(commit)
    new_commit["generation"] = gen
    new_commit["segments"] = new_segments
    new_commit["deleted_docs"] = total_del
    _atomic_write_json(
        os.path.join(index_dir, "commits", f"gen_{gen:06d}.json"), new_commit
    )
    return new_commit


def _delete_by_predicate(spark, index_dir, commit, live, predicate: str) -> dict:
    """Distributed delete-by-query: one task per MATCHED segment unions
    the predicate's local ids into that segment's tombstone file
    (task-side parquet write, the same shared-storage contract as the
    segment build) and emits (segment_id, del_count); the driver only
    composes the new commit from the count rows."""
    import pandas as pd
    import pyspark.sql.functions as F

    base_of = {s["segment_id"]: int(s["doc_base"]) for s in commit["segments"]}
    matched = (
        spark.read.parquet(os.path.join(index_dir, "docmap"))
        .where(F.col("segment_id").isin(live))
        .where(F.expr(predicate))
        .select("segment_id", "doc_id")
    )
    idx_dir = index_dir

    def merge_tombstones(key, pdf):
        sid = str(key[0])
        local = (
            pdf["doc_id"].to_numpy(dtype="int64") - base_of[sid]
        )
        prev = _read_deletes(idx_dir, sid)
        merged = np.union1d(prev, local)
        _write_deletes(idx_dir, sid, merged)
        return pd.DataFrame({"segment_id": [sid], "n": [int(merged.size)]})

    nseg = max(len(live), 1)
    counts = {
        r["segment_id"]: int(r["n"])
        for r in (
            matched.repartition(nseg, "segment_id")
            .groupBy("segment_id")
            .applyInPandas(merge_tombstones, schema="segment_id string, n long")
            .collect()
        )
    }
    if not counts:
        return commit
    new_segments = []
    total_del = 0
    for s in commit["segments"]:
        s2 = dict(s)
        if s["segment_id"] in counts:
            s2["del_count"] = counts[s["segment_id"]]
        else:
            s2["del_count"] = int(_read_deletes(index_dir, s["segment_id"]).size)
        total_del += int(s2["del_count"])
        new_segments.append(s2)
    gen = commit["generation"] + 1
    new_commit = dict(commit)
    new_commit["generation"] = gen
    new_commit["segments"] = new_segments
    new_commit["deleted_docs"] = total_del
    _atomic_write_json(
        os.path.join(index_dir, "commits", f"gen_{gen:06d}.json"), new_commit
    )
    return new_commit
