"""Posting-list blocking: 256-posting blocks with skip + impact metadata.

Computation mirrors the reference postings format
(``lucene/core/src/java/org/apache/lucene/codecs/lucene104/Lucene104PostingsWriter.java:237-478``
and ``Lucene104PostingsFormat.java:160-226``):

- doc IDs:   per-block delta-gap encoding, FOR bit-packed (no patching,
             Lucene104PostingsFormat.java:172-173)
- tfs:       PFor-packed (patched; exceptions for outliers)
- positions: per-doc delta encoding, concatenated per block, FOR-packed
             (per-doc counts == tfs, so no extra length stream)
- skip data: per-block ``first_doc`` / ``last_doc`` (level-0 skip entry)
- impacts:   pareto-competitive (tf, norm) pairs per block, the
             CompetitiveImpactAccumulator semantics
             (``codecs/CompetitiveImpactAccumulator.java:26-146``) —
             these give rank-safe block-max score upper bounds.

A "block row" is a plain dict; the segment writer turns lists of them
into Arrow/Parquet columns.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.codec import forutil, pforutil
from lucene_spark.util.smallfloat import byte4_to_int_np

BLOCK_SIZE = 256  # ForUtil.java:34


def competitive_impacts(tfs: np.ndarray, norms: np.ndarray) -> tuple[list[int], list[int]]:
    """Pareto frontier of (tf max, decoded-length min) pairs for one block.

    A pair dominates another if its tf is >= and its decoded doc length is
    <= (higher tf on a shorter doc always scores higher under BM25's
    monotonicity contract). Returns (impact_tfs, impact_norms), sorted by
    decoded length ascending with strictly increasing tf.
    """
    norms = np.asarray(norms, dtype=np.uint8)
    tfs = np.asarray(tfs, dtype=np.int64)
    lengths = byte4_to_int_np(norms)
    # max tf per distinct norm
    order = np.lexsort((tfs, lengths))
    l_sorted = lengths[order]
    t_sorted = tfs[order]
    n_sorted = norms[order]
    out_tf: list[int] = []
    out_norm: list[int] = []
    best = -1
    # iterate distinct lengths ascending; keep pair iff tf > all shorter-doc tfs
    i = 0
    n = l_sorted.size
    while i < n:
        j = i
        while j < n and l_sorted[j] == l_sorted[i]:
            j += 1
        tf_max = int(t_sorted[j - 1])
        if tf_max > best:
            out_tf.append(tf_max)
            out_norm.append(int(n_sorted[j - 1]))
            best = tf_max
        i = j
    return out_tf, out_norm


def encode_term_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions_flat: np.ndarray,
    norms_by_doc: np.ndarray,
    with_positions: bool = True,
) -> list[dict]:
    """Encode one term's full posting list into block rows.

    doc_ids: sorted local doc ids (int64), one per posting
    tfs: term frequency per posting (int64)
    positions_flat: concatenation of each posting's sorted positions
    norms_by_doc: uint8 norm byte per local doc id (indexable by doc id)
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    pos_bounds = np.concatenate(([0], np.cumsum(tfs)))
    rows = []
    for b0 in range(0, n, BLOCK_SIZE):
        b1 = min(b0 + BLOCK_SIZE, n)
        d = doc_ids[b0:b1]
        t = tfs[b0:b1]
        deltas = np.empty(d.size, dtype=np.uint32)
        deltas[0] = 0  # first doc stored absolutely in first_doc
        np.subtract(d[1:], d[:-1], out=deltas[1:], casting="unsafe")
        docs_bin = forutil.pack(deltas)
        tfs_bin = pforutil.pack(t.astype(np.uint32))
        if with_positions:
            p0, p1 = pos_bounds[b0], pos_bounds[b1]
            pos = np.asarray(positions_flat[p0:p1], dtype=np.int64)
            # per-doc delta encoding: first position absolute, rest gaps
            pd = np.diff(pos, prepend=0).astype(np.int64)
            starts = (pos_bounds[b0:b1] - p0).astype(np.int64)
            pd[starts] = pos[starts]
            pos_bin = forutil.pack(pd.astype(np.uint32))
        else:
            pos_bin = b""
        nb = np.asarray(norms_by_doc, dtype=np.uint8)[d]
        imp_tf, imp_norm = competitive_impacts(t, nb)
        rows.append(
            {
                "block_id": b0 // BLOCK_SIZE,
                "num_docs": int(d.size),
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "docs_bin": docs_bin,
                "tfs_bin": tfs_bin,
                "pos_bin": pos_bin,
                "impact_tfs": imp_tf,
                "impact_norms": imp_norm,
            }
        )
    return rows


def decode_docs(first_doc: int, docs_bin: bytes) -> np.ndarray:
    """Inverse of the doc-id delta encoding -> int64 local doc ids."""
    deltas = forutil.unpack(docs_bin).astype(np.int64)
    deltas[0] = first_doc
    return np.cumsum(deltas)


def decode_tfs(tfs_bin: bytes) -> np.ndarray:
    return pforutil.unpack(tfs_bin).astype(np.int64)


def decode_positions(pos_bin: bytes, tfs: np.ndarray) -> np.ndarray:
    """Decode the concatenated per-doc delta positions -> flat positions.

    Returns the flat absolute positions array; per-doc slice boundaries are
    ``np.concatenate(([0], np.cumsum(tfs)))``.
    """
    pd = forutil.unpack(pos_bin).astype(np.int64)
    if pd.size == 0:
        return pd
    bounds = np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]
    # segmented cumsum: cumsum over all, then subtract carried prefix at doc starts
    cs = np.cumsum(pd)
    carry = np.zeros_like(pd)
    if bounds.size:
        carry_vals = cs[bounds - 1]
        carry[bounds] = np.diff(np.concatenate(([0], carry_vals)))
    return cs - np.cumsum(carry)
