"""In-memory view of one segment's postings for the scoring kernels.

The kernel side of SURVEY.md §3.2 steps 4-5: given the block rows of a
segment (only the query's terms — term pruning happened at the Parquet
scan), expose per-term block metadata (skip data + impacts,
``index/Impacts.java`` analog) and lazy block decoding with a cache
(each block is decoded at most once per query).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from lucene_spark.codec import blocks as blk

# process-local decoded-block counter (diagnostics: the differential
# tests assert that theta seeding / skip consumption decode FEWER
# blocks for identical results; bench reports it per query class)
_DECODED_BLOCKS = [0]

# position-block counter (round-5 impact-pruned positional decode:
# the differentials assert that block-max pruning reads strictly fewer
# ``pos_bin`` blocks — ImpactsDISI.java:28-123 behind
# PhraseScorer.java:45-68 — for bit-identical results)
_DECODED_POS_BLOCKS = [0]


def reset_decode_count() -> None:
    _DECODED_BLOCKS[0] = 0
    _DECODED_POS_BLOCKS[0] = 0


def decode_count() -> int:
    return _DECODED_BLOCKS[0]


def pos_decode_count() -> int:
    return _DECODED_POS_BLOCKS[0]


@dataclass
class TermBlocks:
    """One term's posting blocks within a segment, doc-range sorted."""

    first_doc: np.ndarray  # int64[nblocks]
    last_doc: np.ndarray  # int64[nblocks]
    num_docs: np.ndarray  # int32[nblocks]
    docs_bin: list
    tfs_bin: list
    pos_bin: list
    impact_tfs: list  # list of int lists
    impact_norms: list
    # per-position payload streams (the ``.pay`` file role) — None for
    # indexes built without payloads (the common case)
    pay_bin: "list | None" = None
    # per-position character-offset streams (the 4th IndexOptions
    # level, offsets-in-postings) — None when not indexed
    off_bin: "list | None" = None
    doc_freq: int = 0
    # norm bytes of THIS term's field (per-field .nvd blob, indexable by
    # local doc id) — every scorer call uses the field's own lengths
    norms: "np.ndarray | None" = None
    _cache: dict = field(default_factory=dict)

    @property
    def nblocks(self) -> int:
        return int(self.first_doc.size)

    def decode(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(local doc ids, tfs) of block i, cached."""
        hit = self._cache.get(i)
        if hit is None:
            d = blk.decode_docs(int(self.first_doc[i]), self.docs_bin[i])
            t = blk.decode_tfs(self.tfs_bin[i])
            hit = (d, t)
            self._cache[i] = hit
            _DECODED_BLOCKS[0] += 1
        return hit

    def decode_positions(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        """(flat positions, per-posting offsets) of block i."""
        key = ("pos", i)
        hit = self._cache.get(key)
        if hit is None:
            _, t = self.decode(i)
            flat = blk.decode_positions(self.pos_bin[i], t)
            bounds = np.concatenate(([0], np.cumsum(t)))
            hit = (flat, bounds)
            self._cache[key] = hit
            _DECODED_POS_BLOCKS[0] += 1
        return hit

    def decode_payloads(self, i: int) -> list:
        """Per-position payloads of block i (aligned with the flat
        positions of :meth:`decode_positions`); [] when the index was
        built without payloads."""
        if self.pay_bin is None:
            return []
        key = ("pay", i)
        hit = self._cache.get(key)
        if hit is None:
            hit = blk.unpack_payloads(self.pay_bin[i])
            self._cache[key] = hit
        return hit

    @property
    def has_payloads(self) -> bool:
        return self.pay_bin is not None

    @property
    def has_offsets(self) -> bool:
        return self.off_bin is not None

    def decode_offsets(self, i: int) -> tuple:
        """(starts, ends) of block i aligned with the flat positions of
        :meth:`decode_positions`; empty arrays when offsets were not
        indexed."""
        key = ("off", i)
        hit = self._cache.get(key)
        if hit is None:
            _, t = self.decode(i)
            hit = blk.unpack_offsets(
                self.off_bin[i] if self.off_bin is not None else b"", t
            )
            self._cache[key] = hit
        return hit

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        """All (doc ids, tfs) of this term, concatenated."""
        if self.nblocks == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        parts = [self.decode(i) for i in range(self.nblocks)]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def block_max_scores(self, scorer) -> np.ndarray:
        """Per-block score upper bound from the competitive impacts
        (MaxScoreCache.java:74-89 analog) — rank-safe by construction.
        ONE vectorized scorer call over all blocks' impacts."""
        # key by id() BUT verify the stored scorer is the same object —
        # CPython reuses freed addresses, so a dead scorer's id can
        # collide with a new scorer's (stale bounds would silently break
        # rank safety); the strong ref in the entry pins the id
        key = ("bmax", id(scorer))
        ent = self._cache.get(key)
        hit = ent[1] if ent is not None and ent[0] is scorer else None
        if hit is None:
            counts = np.fromiter(
                (len(x) for x in self.impact_tfs), dtype=np.int64, count=self.nblocks
            )
            if counts.sum() == 0:
                hit = np.zeros(self.nblocks, dtype=np.float64)
            else:
                tfs = np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in self.impact_tfs]
                )
                nbs = np.concatenate(
                    [np.asarray(x, dtype=np.uint8) for x in self.impact_norms]
                )
                scores = np.asarray(scorer.score(tfs, nbs), dtype=np.float64)
                starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
                hit = np.maximum.reduceat(scores, starts)
            self._cache[key] = (scorer, hit)
        return hit

    # level-1 skip geometry: one entry per LEVEL1_GROUP blocks
    # (Lucene104PostingsFormat.java:347-353 — a second skip level every
    # 32 blocks / 8192 docs lets the scorer skip whole block GROUPS on
    # one bound check instead of 32)
    LEVEL1_GROUP = 32

    def level1(self, scorer):
        """(g_first_doc, g_last_doc, g_num_docs, g_bmax) per 32-block
        group; g_bmax is the max member block-max — a true upper bound
        for every doc in the group."""
        key = ("l1", id(scorer))
        ent = self._cache.get(key)
        hit = ent[1] if ent is not None and ent[0] is scorer else None
        if hit is None:
            bm = self.block_max_scores(scorer)
            g = self.LEVEL1_GROUP
            starts = np.arange(0, self.nblocks, g)
            ends = np.minimum(starts + g, self.nblocks)
            g_first = self.first_doc[starts]
            g_last = self.last_doc[ends - 1]
            g_ndocs = np.add.reduceat(
                self.num_docs.astype(np.int64), starts
            )
            g_bmax = np.maximum.reduceat(bm, starts)
            hit = (g_first, g_last, g_ndocs, g_bmax, starts, ends)
            self._cache[key] = (scorer, hit)
        return hit

    def overlapping(self, lo: int, hi: int) -> tuple[int, int]:
        """Block index range [b0, b1) whose doc ranges intersect [lo, hi]."""
        b0 = int(np.searchsorted(self.last_doc, lo, side="left"))
        b1 = int(np.searchsorted(self.first_doc, hi, side="right"))
        return b0, max(b0, b1)


@dataclass
class SegmentView:
    """All query-relevant state of one segment inside the kernel."""

    segment_id: str
    doc_base: int
    max_doc: int  # number of docs in this segment (local ids 0..max_doc-1)
    norms: np.ndarray  # uint8[max_doc] — the DEFAULT field's norms
    terms: dict  # term (fielded key) -> TermBlocks
    # per-field norm blobs (FieldInfos-per-field .nvd analog); the
    # default field is keyed '' and aliases ``norms``
    norms_by_field: "dict | None" = None
    # liveDocs tombstone mask (Lucene90LiveDocsFormat analog): None =
    # no deletes; else bool[max_doc], False = deleted. Postings and
    # global stats still include deleted docs until a rewriting merge —
    # exactly the reference's semantics (docFreq unchanged by deletes).
    live: "np.ndarray | None" = None
    # precomputed constant-score MultiTermQuery doc unions, keyed
    # (mode, args, field) -> RAW sorted unique local doc ids (live
    # filter applied by the consumer). Set by the direct executor's
    # spill guard (searcher._mt_union_docs_chunked) so a wide
    # expansion's postings never sit in the view in one piece;
    # None = derive unions from ``terms`` (the scan-plane shape).
    mt_docs: "dict | None" = None

    def term_blocks(self, term: str) -> "TermBlocks | None":
        return self.terms.get(term)

    def norms_for_term(self, term: str) -> np.ndarray:
        """Norm bytes of the field a (fielded) term key belongs to."""
        from lucene_spark.search.ast import field_of

        if self.norms_by_field is None:
            return self.norms
        return self.norms_by_field.get(field_of(term), self.norms)

    def live_mask(self, docs: np.ndarray) -> np.ndarray:
        """Boolean mask of non-deleted local doc ids."""
        if self.live is None:
            return np.ones(docs.size, dtype=bool)
        return self.live[docs]

    @staticmethod
    def from_block_rows(
        segment_id: str,
        doc_base: int,
        norms,
        rows_by_term: dict,
    ) -> "SegmentView":
        """``norms``: uint8 array (single default field) or a dict
        field -> uint8 array (multi-field; '' = default field)."""
        from lucene_spark.search.ast import field_of

        if isinstance(norms, dict):
            norms_by_field = {f: np.asarray(a, dtype=np.uint8) for f, a in norms.items()}
            default = norms_by_field.get("")
            if default is None:
                default = next(iter(norms_by_field.values()))
        else:
            default = np.asarray(norms, dtype=np.uint8)
            norms_by_field = None
        terms = {}
        for term, rows in rows_by_term.items():
            rows = sorted(rows, key=lambda r: r["block_id"])
            fn = (
                norms_by_field.get(field_of(term), default)
                if norms_by_field is not None
                else default
            )
            terms[term] = TermBlocks(
                first_doc=np.array([r["first_doc"] for r in rows], dtype=np.int64),
                last_doc=np.array([r["last_doc"] for r in rows], dtype=np.int64),
                num_docs=np.array([r["num_docs"] for r in rows], dtype=np.int32),
                docs_bin=[r["docs_bin"] for r in rows],
                tfs_bin=[r["tfs_bin"] for r in rows],
                pos_bin=[r["pos_bin"] for r in rows],
                impact_tfs=[list(r["impact_tfs"]) for r in rows],
                impact_norms=[list(r["impact_norms"]) for r in rows],
                pay_bin=(
                    [r.get("pay_bin") or b"" for r in rows]
                    if any(r.get("pay_bin") is not None for r in rows)
                    else None
                ),
                off_bin=(
                    [r.get("off_bin") or b"" for r in rows]
                    if any(r.get("off_bin") is not None for r in rows)
                    else None
                ),
                doc_freq=int(sum(r["num_docs"] for r in rows)),
                norms=fn,
            )
        return SegmentView(
            segment_id=segment_id,
            doc_base=doc_base,
            max_doc=int(len(default)),
            norms=default,
            terms=terms,
            norms_by_field=norms_by_field,
        )
