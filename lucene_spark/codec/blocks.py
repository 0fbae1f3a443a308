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
from lucene_spark.codec.pforutil import MAX_EXCEPTIONS
from lucene_spark.util.smallfloat import byte4_to_int_np

BLOCK_SIZE = 256  # ForUtil.java:34

# dense-block marker byte in the doc stream (FOR width bytes are 0..32;
# the reference writes a NEGATIVE long-count byte for its bit-set
# blocks, Lucene104PostingsWriter.java:444-460)
DENSE_MARKER = 0xFF


def _dense_wins(n, span, width, all_equal):
    """True where a doc block is cheaper as a bit set than FOR-packed
    deltas (the writer's storage-size rule; we compare byte-rounded
    sizes, the reference compares long-rounded bit counts). All-equal
    delta blocks keep the 9-byte run-length FOR encoding."""
    return (~all_equal) & ((span + 7) // 8 < (n * width + 7) // 8)


def _pack_dense(offsets: np.ndarray, span: int) -> bytes:
    """Bit set of doc offsets relative to the block's first doc."""
    import struct

    bits = np.zeros(int(span), dtype=np.uint8)
    bits[offsets] = 1
    return struct.pack("<BI", DENSE_MARKER, offsets.size) + np.packbits(
        bits, bitorder="little"
    ).tobytes()


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
    payloads_flat=None,
    offsets_flat=None,
) -> list[dict]:
    """Encode one term's full posting list into block rows.

    doc_ids: sorted local doc ids (int64), one per posting
    tfs: term frequency per posting (int64)
    positions_flat: concatenation of each posting's sorted positions
    norms_by_doc: uint8 norm byte per local doc id (indexable by doc id)
    payloads_flat: optional per-position payloads aligned with
        positions_flat (bytes or None each) — when given, every block
        row gains a ``pay_bin`` stream (:func:`pack_payloads`)
    offsets_flat: optional (starts, ends) arrays aligned with
        positions_flat — when given, every block row gains an
        ``off_bin`` stream (:func:`pack_offsets`, the 4th IndexOptions
        level)
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
        span = int(d[-1] - d[0] + 1)
        w = forutil.bit_width(deltas)
        if _dense_wins(
            d.size, span, max(1, w), bool((deltas == deltas[0]).all())
        ):
            docs_bin = _pack_dense((d - d[0]).astype(np.int64), span)
        else:
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
        row = {
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
        if payloads_flat is not None:
            p0, p1 = pos_bounds[b0], pos_bounds[b1]
            row["pay_bin"] = pack_payloads(payloads_flat[p0:p1])
        if offsets_flat is not None:
            p0, p1 = pos_bounds[b0], pos_bounds[b1]
            row["off_bin"] = pack_offsets(
                offsets_flat[0][p0:p1], offsets_flat[1][p0:p1], t
            )
        rows.append(row)
    return rows


def pack_payloads(payloads) -> bytes:
    """Encode one block's per-position payloads (the ``.pay`` stream
    role, ``Lucene104PostingsWriter.java`` payload branch): aligned
    with the block's flat positions, one payload (bytes or None) per
    position.  Layout: 4-byte little-endian size of the FOR-packed
    length stream, the packed lengths (one uint32 per position; 0 =
    no payload, matching the reference where a zero-length payload
    reads back as null), then the concatenated payload bytes."""
    import struct

    lengths = np.fromiter(
        (0 if p is None else len(p) for p in payloads),
        dtype=np.uint32,
        count=len(payloads),
    )
    len_bin = forutil.pack(lengths)
    data = b"".join(p for p in payloads if p)
    return struct.pack("<I", len(len_bin)) + len_bin + data


def unpack_payloads(pay_bin: bytes) -> list:
    """Inverse of :func:`pack_payloads` -> list[bytes | None] aligned
    with the block's flat positions (None where no payload was indexed,
    the reference's null ``getPayload()``)."""
    import struct

    if not pay_bin:
        return []
    (nlen,) = struct.unpack_from("<I", pay_bin, 0)
    lengths = forutil.unpack(pay_bin[4 : 4 + nlen]).astype(np.int64)
    out: list = [None] * lengths.size
    off = 4 + nlen
    for i, ln in enumerate(lengths):
        if ln:
            out[i] = pay_bin[off : off + ln]
            off += ln
    return out


def pack_offsets(starts: np.ndarray, ends: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one block's per-position character offsets (the 4th
    IndexOptions level, ``index/IndexOptions.java:29-50``
    DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS; the offsets branch of
    ``Lucene104PostingsWriter.java``): aligned with the block's flat
    positions.  Starts are per-doc delta encoded like positions (first
    absolute, rest gaps — non-decreasing within a doc); lengths are
    ``end - start``.  Layout: 4-byte LE size of the packed start
    stream, packed starts, then packed lengths."""
    import struct

    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    sd = np.diff(starts, prepend=0).astype(np.int64)
    doc_starts = np.concatenate(([0], np.cumsum(np.asarray(tfs, np.int64))))[:-1]
    sd[doc_starts] = starts[doc_starts]
    sb = forutil.pack(sd.astype(np.uint32))
    lb = forutil.pack((ends - starts).astype(np.uint32))
    return struct.pack("<I", len(sb)) + sb + lb


def unpack_offsets(off_bin: bytes, tfs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`pack_offsets` -> (starts, ends) flat arrays
    aligned with the block's flat positions."""
    import struct

    if not off_bin:
        e = np.empty(0, np.int64)
        return e, e
    (nsb,) = struct.unpack_from("<I", off_bin, 0)
    sd = forutil.unpack(off_bin[4 : 4 + nsb]).astype(np.int64)
    lengths = forutil.unpack(off_bin[4 + nsb :]).astype(np.int64)
    if sd.size == 0:
        return sd, sd
    bounds = np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1]
    cs = np.cumsum(sd)
    carry = np.zeros_like(sd)
    if bounds.size:
        carry_vals = cs[bounds - 1]
        carry[bounds] = np.diff(np.concatenate(([0], carry_vals)))
    starts = cs - np.cumsum(carry)
    return starts, starts + lengths


def decode_docs(first_doc: int, docs_bin: bytes) -> np.ndarray:
    """Inverse of the doc-id encoding -> int64 local doc ids (delta-FOR
    or dense bit-set blocks)."""
    if docs_bin and docs_bin[0] == DENSE_MARKER:
        bits = np.unpackbits(
            np.frombuffer(docs_bin, np.uint8, offset=5), bitorder="little"
        )
        return first_doc + np.flatnonzero(bits)
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


# ------------------------------------------------------- batch encode path


def _pfor_pack_many(tfs: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list:
    """PFor-pack many tf blocks, byte-identical to ``pforutil.pack``
    per block. The no-exception majority is batch-packed (one scatter
    per width via forutil.pack_many); the rare exception blocks fall
    back to the scalar encoder."""
    import struct

    tfs = np.asarray(tfs, dtype=np.uint32)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    nb = starts.size
    n_i = ends - starts
    out: list = [None] * nb
    # per-block sorted tf tails: sort (block, tf) once
    bid = np.repeat(np.arange(nb), n_i)
    flat = np.concatenate([tfs[s:e] for s, e in zip(starts, ends)]) if nb else tfs[:0]
    order = np.lexsort((flat, bid))
    fs = flat[order].astype(np.int64)
    off = np.concatenate(([0], np.cumsum(n_i)))
    # all-equal / empty blocks -> "\x00" + FOR (which hits its own
    # all-equal branch); handled by the batch FOR packer directly
    mx = np.full(nb, -1, dtype=np.int64)
    mn = np.full(nb, -1, dtype=np.int64)
    ne = np.flatnonzero(n_i > 0)
    if ne.size:
        # per-block min/max straight from the sorted tails
        mx[ne] = fs[off[ne + 1] - 1]
        mn[ne] = fs[off[ne]]
    simple = (n_i == 0) | ((mx == mn) & (n_i > 0))
    # exception cost model over the up-to-8 largest values
    from lucene_spark.codec.forutil import _bit_widths

    cand = np.flatnonzero(~simple)
    best_e = np.zeros(nb, dtype=np.int64)
    if cand.size:
        ncand = n_i[cand]
        costs = np.full((cand.size, MAX_EXCEPTIONS + 1), np.iinfo(np.int64).max, np.int64)
        for e in range(0, MAX_EXCEPTIONS + 1):
            ok = ncand - 1 >= e  # e <= n-1
            idx = off[cand[ok] + 1] - 1 - e
            w_e = np.maximum(_bit_widths(fs[idx]), 0)
            costs[ok, e] = w_e * ncand[ok] + e * 64
        # the scalar encoder keeps the FIRST strictly-smaller cost
        best_e[cand] = np.argmin(costs, axis=1)
    # batch: no-exception blocks at width max(1, bitlen(max))
    batch_idx = np.flatnonzero(simple | (best_e == 0))
    packed_for = None
    if batch_idx.size:
        from lucene_spark.codec import forutil as _fu

        packed_for = _fu.pack_many(tfs, starts[batch_idx], ends[batch_idx])
        for k, i in enumerate(batch_idx):
            out[i] = b"\x00" + packed_for[k]
    # scalar fallback: exception blocks (rare outlier tfs)
    for i in np.flatnonzero(best_e > 0):
        out[i] = pforutil.pack(tfs[starts[i] : ends[i]])
    return out


def _competitive_impacts_many(
    tfs: np.ndarray, norms: np.ndarray, block_of: np.ndarray, nb: int
):
    """Vectorized ``competitive_impacts`` for ALL blocks at once.

    tfs/norms: per-posting arrays (any order); ``block_of``: the block
    ordinal of each posting. Returns (impact_tfs list, impact_norms
    list) with per-block pareto pairs identical to the scalar function.
    """
    tfs = np.asarray(tfs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.uint8)
    lengths = byte4_to_int_np(norms)
    order = np.lexsort((tfs, lengths, block_of))
    b_s = block_of[order]
    l_s = lengths[order]
    t_s = tfs[order]
    n_s = norms[order]
    n = b_s.size
    if n == 0:
        return [[] for _ in range(nb)], [[] for _ in range(nb)]
    # last row of each (block, length) group = max tf of that length
    nxt_diff = np.concatenate(
        ((b_s[1:] != b_s[:-1]) | (l_s[1:] != l_s[:-1]), [True])
    )
    gi = np.flatnonzero(nxt_diff)
    gb, gt, gn = b_s[gi], t_s[gi], n_s[gi]
    # grouped (per block) strictly-increasing tf frontier via offset cummax
    M = int(gt.max()) + 1
    big = gb * M + gt
    cm = np.maximum.accumulate(big) - gb * M
    prev_cm = np.concatenate(([0], cm[:-1]))
    is_start = np.concatenate(([True], gb[1:] != gb[:-1]))
    keep = is_start | (gt > prev_cm)
    kb, kt, kn = gb[keep], gt[keep], gn[keep]
    # split into per-block lists
    bounds = np.searchsorted(kb, np.arange(nb + 1))
    imp_tfs = [kt[bounds[i] : bounds[i + 1]].tolist() for i in range(nb)]
    imp_norms = [
        [int(x) for x in kn[bounds[i] : bounds[i + 1]]] for i in range(nb)
    ]
    return imp_tfs, imp_norms


def encode_partition(
    p_codes: np.ndarray,
    p_docs: np.ndarray,
    p_tfs: np.ndarray,
    positions_flat: np.ndarray,
    norms_by_doc: np.ndarray,
    terms: np.ndarray,
    with_positions: bool = True,
) -> list:
    """Batch-encode EVERY term's postings of one segment in one
    vectorized pass (the invert hot path: replaces the per-term
    ``encode_term_postings`` loop; output block rows are identical).

    p_codes: per-posting term code (sorted by (code, doc)),
    p_docs/p_tfs: per-posting doc id / tf,
    positions_flat: concatenated per-posting sorted positions,
    norms_by_doc: uint8 norm byte per local doc id,
    terms: object[] term string per code.
    """
    import struct as _struct

    P = p_codes.size
    if P == 0:
        return []
    p_docs = np.asarray(p_docs, dtype=np.int64)
    p_tfs = np.asarray(p_tfs, dtype=np.int64)
    # per-term posting offsets -> block index within term
    t_change = np.concatenate(([True], p_codes[1:] != p_codes[:-1]))
    t_start = np.flatnonzero(t_change)
    t_len = np.diff(np.concatenate((t_start, [P])))
    rank = np.arange(P) - np.repeat(t_start, t_len)
    blk = rank // BLOCK_SIZE
    # global block ordinal (codes ascending, then block id) — output
    # order term-sorted like the scalar path
    b_change = t_change | np.concatenate(([False], blk[1:] != blk[:-1]))
    b_start = np.flatnonzero(b_change)
    nb = b_start.size
    b_end = np.concatenate((b_start[1:], [P]))
    b_code = p_codes[b_start]
    b_blk = blk[b_start]
    b_n = b_end - b_start
    first_doc = p_docs[b_start]
    last_doc = p_docs[b_end - 1]
    block_of = np.repeat(np.arange(nb), b_n)
    # doc deltas (first of block stored absolutely via first_doc)
    deltas = np.empty(P, dtype=np.int64)
    deltas[0] = 0
    np.subtract(p_docs[1:], p_docs[:-1], out=deltas[1:])
    deltas[b_start] = 0
    # dense-vs-FOR decision per block (same rule as the scalar path)
    from lucene_spark.codec.forutil import _bit_widths

    d_max = np.maximum.reduceat(deltas, b_start)
    d_min = np.minimum.reduceat(deltas, b_start)
    span = last_doc - first_doc + 1
    w = np.maximum(_bit_widths(d_max), 1)
    dense_sel = _dense_wins(b_n, span, w, d_max == d_min)
    docs_bins: list = [None] * nb
    sparse_idx = np.flatnonzero(~dense_sel)
    if sparse_idx.size:
        packed = forutil.pack_many(
            deltas.astype(np.uint32), b_start[sparse_idx], b_end[sparse_idx]
        )
        for k, i in enumerate(sparse_idx):
            docs_bins[i] = packed[k]
    dense_idx = np.flatnonzero(dense_sel)
    if dense_idx.size:
        # one scatter for ALL dense blocks: each block gets a byte-
        # aligned bit range of ceil(span/8)*8 bits
        span_bits = ((span[dense_idx] + 7) // 8) * 8
        base = np.concatenate(([0], np.cumsum(span_bits)))
        bits = np.zeros(int(base[-1]), dtype=np.uint8)
        for k, i in enumerate(dense_idx):
            s, e = b_start[i], b_end[i]
            bits[base[k] + (p_docs[s:e] - first_doc[i])] = 1
        packed_bytes = np.packbits(bits, bitorder="little").tobytes()
        for k, i in enumerate(dense_idx):
            hdr = _struct.pack("<BI", DENSE_MARKER, int(b_n[i]))
            docs_bins[i] = hdr + packed_bytes[base[k] // 8 : base[k + 1] // 8]
    tfs_bins = _pfor_pack_many(p_tfs.astype(np.uint32), b_start, b_end)
    # positions: per-doc delta streams, FOR-packed per block
    if with_positions:
        pos = np.asarray(positions_flat, dtype=np.int64)
        pd = np.empty(pos.size, dtype=np.int64)
        if pos.size:
            pd[0] = 0
            np.subtract(pos[1:], pos[:-1], out=pd[1:])
        pbounds = np.concatenate(([0], np.cumsum(p_tfs)))
        pstarts = pbounds[:-1]
        pd[pstarts] = pos[pstarts]
        pos_bins = forutil.pack_many(
            pd.astype(np.uint32), pbounds[b_start], pbounds[b_end]
        )
    else:
        pos_bins = [b""] * nb
    nb_arr = np.asarray(norms_by_doc, dtype=np.uint8)
    imp_tfs, imp_norms = _competitive_impacts_many(
        p_tfs, nb_arr[p_docs], block_of, nb
    )
    rows = []
    for i in range(nb):
        rows.append(
            {
                "term": str(terms[b_code[i]]),
                "block_id": int(b_blk[i]),
                "num_docs": int(b_n[i]),
                "first_doc": int(first_doc[i]),
                "last_doc": int(last_doc[i]),
                "docs_bin": docs_bins[i],
                "tfs_bin": tfs_bins[i],
                "pos_bin": pos_bins[i],
                "impact_tfs": imp_tfs[i],
                "impact_norms": imp_norms[i],
            }
        )
    return rows
