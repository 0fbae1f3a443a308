"""Pure-Python/numpy brute-force oracle — the rank/score ground truth.

Implements the reference's scoring contract exactly (SURVEY.md §2.8):
BM25 idf / avgdl / SmallFloat norms / float32 score operation order /
double accumulation for clause sums / score-desc-doc-asc tie-break
(``search/HitQueue.java:76-82``). Every engine query result must be
score- and rank-identical to this oracle (FIXTURES.md §3). No pruning,
no compression — everything brute force over in-memory postings.

Doc ID assignment matches the engine rule (SURVEY.md §4.4):
``pid = pmod(murmur3(url), num_segments)``; within a segment docs sort
by url; ``doc_id = doc_base[pid] + local_rank``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer, ENGLISH
from lucene_spark.similarity import bm25
from lucene_spark.search import ast
from lucene_spark.util.smallfloat import int_to_byte4_np
from lucene_spark.util.spark_hash import pmod_partition


@dataclass
class OracleIndex:
    doc_count: int
    sum_total_tf: int
    urls: list  # doc_id -> url
    norms: np.ndarray  # uint8 per doc_id (DEFAULT field)
    postings: dict  # fielded term -> (doc_ids int64[], tfs int64[], positions list[np.ndarray])
    analyzer: Analyzer
    # multi-field: per-field norms + CollectionStatistics; None = legacy
    # single-field semantics (doc_count/sum_total_tf apply everywhere)
    norms_by_field: "dict | None" = None
    field_stats: "dict | None" = None  # field -> (doc_count, sum_total_tf)

    @staticmethod
    def build(
        rows: "list[dict]",
        num_segments: int = 4,
        analyzer: Analyzer = ENGLISH,
        text_col: str = "text",
        key_col: str = "url",
        fields: tuple = (),
    ) -> "OracleIndex":
        # segment assignment + doc id rule (must match the engine)
        specs = fields or (("", text_col),)
        pids = [pmod_partition(str(r[key_col]), num_segments) for r in rows]
        by_pid: dict[int, list] = {}
        for r, p in zip(rows, pids):
            by_pid.setdefault(p, []).append(r)
        ordered: list[dict] = []
        for p in sorted(by_pid):
            ordered.extend(sorted(by_pid[p], key=lambda r: str(r[key_col])))
        urls = [str(r[key_col]) for r in ordered]

        postings: dict[str, dict[int, list[int]]] = {}
        norms_by_field: dict = {}
        field_stats: dict = {}
        for fname, src in specs:
            lengths = np.zeros(len(ordered), dtype=np.int64)
            for doc_id, r in enumerate(ordered):
                terms, positions = analyzer.tokenize_one(r.get(src) or "")
                lengths[doc_id] = len(terms)
                for t, p in zip(terms, positions):
                    postings.setdefault(ast.fielded(fname, t), {}).setdefault(
                        doc_id, []
                    ).append(p)
            norms_by_field[fname] = int_to_byte4_np(lengths)
            field_stats[fname] = (
                int(np.count_nonzero(lengths)),
                int(lengths.sum()),
            )
        packed: dict[str, tuple] = {}
        for t, docs in postings.items():
            doc_ids = np.array(sorted(docs), dtype=np.int64)
            tfs = np.array([len(docs[d]) for d in doc_ids], dtype=np.int64)
            pos = [np.array(docs[d], dtype=np.int64) for d in doc_ids]
            packed[t] = (doc_ids, tfs, pos)
        default = specs[0][0]
        return OracleIndex(
            doc_count=len(ordered),
            sum_total_tf=field_stats[default][1],
            urls=urls,
            norms=norms_by_field[default],
            postings=packed,
            analyzer=analyzer,
            norms_by_field=norms_by_field if fields else None,
            field_stats=field_stats if fields else None,
        )

    # ---- stats ----
    def doc_freq(self, term: str) -> int:
        e = self.postings.get(term)
        return 0 if e is None else int(e[0].size)

    def _collection(self, field: str) -> tuple:
        if self.field_stats and field in self.field_stats:
            return self.field_stats[field]
        return self.doc_count, self.sum_total_tf

    def _norms_of(self, term: str) -> np.ndarray:
        if self.norms_by_field is None:
            return self.norms
        return self.norms_by_field.get(ast.field_of(term), self.norms)

    def avgdl(self) -> float:
        return bm25.avgdl(self.sum_total_tf, self.doc_count)

    def _scorer(
        self, idf_value: float, boost: float = 1.0, field: str = ""
    ) -> bm25.BM25Scorer:
        dc, stf = self._collection(field)
        return bm25.BM25Scorer.build(idf_value, bm25.avgdl(stf, dc), boost=boost)

    # ---- scoring (recursive; returns sorted doc ids + f32 scores) ----
    def score_query(
        self, q: ast.Query, boost: float = 1.0
    ) -> tuple[np.ndarray, np.ndarray]:
        q = ast.rewrite(q)
        if isinstance(q, ast.MatchNoDocsQuery):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        if isinstance(q, ast.MatchAllDocsQuery):
            docs = np.arange(self.doc_count, dtype=np.int64)
            return docs, np.full(docs.size, np.float32(boost), np.float32)
        if isinstance(q, ast.FieldExistsQuery):
            if self.norms_by_field is not None:
                nrm = self.norms_by_field.get(q.field)
            else:
                nrm = self.norms if q.field == "" else None
            if nrm is None:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            docs = np.flatnonzero(np.asarray(nrm) > 0).astype(np.int64)
            return docs, np.full(docs.size, np.float32(boost), np.float32)
        if isinstance(q, ast.BoostQuery):
            return self.score_query(q.query, boost * q.boost)
        if isinstance(q, ast.ConstantScoreQuery):
            docs, _ = self.score_query(q.query, 1.0)
            return docs, np.full(
                docs.size, np.float32(boost * q.boost), np.float32
            )
        if isinstance(q, ast.MultiTermQuery):
            # CONSTANT_SCORE_REWRITE over the full term dictionary
            from lucene_spark.search.multiterm import term_key_matcher

            pred = term_key_matcher(q.mode, q.args, q.field)
            parts = [
                e[0] for t, e in self.postings.items() if pred(t)
            ]
            docs = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, np.int64)
            )
            return docs, np.full(docs.size, np.float32(boost), np.float32)
        if isinstance(q, ast.TermQuery):
            e = self.postings.get(q.term)
            if e is None:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            docs, tfs, _ = e
            fld = ast.field_of(q.term)
            dc, _ = self._collection(fld)
            sc = self._scorer(bm25.idf(docs.size, dc), boost, field=fld)
            return docs, sc.score(tfs, self._norms_of(q.term)[docs])
        if isinstance(q, ast.PhraseQuery):
            return self._score_phrase(q, boost)
        if isinstance(q, ast.MultiPhraseQuery):
            return self._score_multi_phrase(q, boost)
        if isinstance(q, ast.BooleanQuery):
            return self._score_bool(q, boost)
        raise TypeError(f"unsupported query {q!r}")

    def _score_multi_phrase(
        self, q: "ast.MultiPhraseQuery", boost: float = 1.0
    ) -> tuple[np.ndarray, np.ndarray]:
        """MultiPhraseQuery: any member term per slot; slot positions =
        union of member positions; idf = sum over ALL member terms
        (MultiPhraseQuery.java:218-237). slop > 0 runs the
        SloppyPhraseMatcher over the union lists (float32 sloppyFreq),
        including slots sharing a term (hasMultiTermRpts repeat
        machinery)."""
        slot_entries = []
        slot_present = []
        for slot in q.slots:
            present = [t for t in slot if t in self.postings]
            es = [self.postings[t] for t in present]
            if not es:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            slot_entries.append(es)
            slot_present.append(tuple(present))
        docs = None
        for es in slot_entries:
            d = np.unique(np.concatenate([e[0] for e in es]))
            docs = d if docs is None else np.intersect1d(docs, d, assume_unique=True)
            if docs.size == 0:
                return docs, np.empty(0, np.float32)
        from lucene_spark.search.sloppy import (
            multi_repeat_groups,
            sloppy_freq,
            sloppy_freq_repeats,
        )

        groups, mtr = (
            multi_repeat_groups(slot_present)
            if q.slop > 0
            else (None, False)
        )
        freqs = np.zeros(
            docs.size, dtype=np.float64 if q.slop > 0 else np.int64
        )
        for i, d in enumerate(docs):
            slot_pos: "list | None" = []
            for es in slot_entries:
                pos_parts = []
                for e in es:
                    j = int(np.searchsorted(e[0], d))
                    if j < e[0].size and e[0][j] == d:
                        pos_parts.append(e[2][j])
                if not pos_parts:
                    slot_pos = None
                    break
                slot_pos.append(np.unique(np.concatenate(pos_parts)))
            if slot_pos is None:
                continue
            if q.slop > 0:
                freqs[i] = (
                    sloppy_freq(slot_pos, q.positions, q.slop)
                    if groups is None
                    else sloppy_freq_repeats(
                        slot_pos, q.positions, q.slop, groups, mtr
                    )
                )
            else:
                cand = None
                for pos, rel in zip(slot_pos, q.positions):
                    p = pos - rel
                    cand = p if cand is None else np.intersect1d(cand, p)
                    if cand.size == 0:
                        break
                freqs[i] = cand.size
        hit = freqs > 0
        docs, freqs = docs[hit], freqs[hit]
        if docs.size == 0:
            return docs, np.empty(0, np.float32)
        all_terms = [t for slot in q.slots for t in slot]
        fld = ast.field_of(all_terms[0])
        dc, _ = self._collection(fld)
        idf_sum = bm25.idf_phrase([self.doc_freq(t) for t in all_terms], dc)
        sc = self._scorer(idf_sum, boost, field=fld)
        return docs, sc.score(freqs, self._norms_of(all_terms[0])[docs])

    def _score_phrase(
        self, q: ast.PhraseQuery, boost: float = 1.0
    ) -> tuple[np.ndarray, np.ndarray]:
        entries = [self.postings.get(t) for t in q.terms]
        if any(e is None for e in entries):
            return np.empty(0, np.int64), np.empty(0, np.float32)
        # doc-level intersection
        docs = entries[0][0]
        for e in entries[1:]:
            docs = np.intersect1d(docs, e[0], assume_unique=True)
        if docs.size == 0:
            return docs, np.empty(0, np.float32)
        if q.slop > 0:
            from lucene_spark.search.sloppy import (
                repeat_groups,
                sloppy_freq,
                sloppy_freq_repeats,
            )

            groups = repeat_groups(q.terms)
            freqs = np.zeros(docs.size, dtype=np.float64)
            for i, d in enumerate(docs):
                pls = []
                for e in entries:
                    j = int(np.searchsorted(e[0], d))
                    pls.append(e[2][j])
                if groups is None:
                    freqs[i] = sloppy_freq(pls, q.positions, q.slop)
                else:
                    freqs[i] = sloppy_freq_repeats(pls, q.positions, q.slop, groups)
            hit = freqs > 0
            docs, freqs = docs[hit], freqs[hit]
            if docs.size == 0:
                return docs, np.empty(0, np.float32)
            fld = ast.field_of(q.terms[0])
            dc, _ = self._collection(fld)
            idf_sum = bm25.idf_phrase([self.doc_freq(t) for t in q.terms], dc)
            sc = self._scorer(idf_sum, boost, field=fld)
            return docs, sc.score(freqs, self._norms_of(q.terms[0])[docs])
        freqs = np.zeros(docs.size, dtype=np.int64)
        for i, d in enumerate(docs):
            # candidate start positions: positions of term0 shifted to offset 0
            cand = None
            for e, rel in zip(entries, q.positions):
                j = int(np.searchsorted(e[0], d))
                pos = e[2][j] - rel
                cand = pos if cand is None else np.intersect1d(cand, pos, assume_unique=False)
                if cand.size == 0:
                    break
            freqs[i] = 0 if cand is None else cand.size
        hit = freqs > 0
        docs, freqs = docs[hit], freqs[hit]
        if docs.size == 0:
            return docs, np.empty(0, np.float32)
        fld = ast.field_of(q.terms[0])
        dc, _ = self._collection(fld)
        idf_sum = bm25.idf_phrase([self.doc_freq(t) for t in q.terms], dc)
        sc = self._scorer(idf_sum, boost, field=fld)
        return docs, sc.score(freqs, self._norms_of(q.terms[0])[docs])

    def _score_bool(
        self, q: ast.BooleanQuery, boost: float = 1.0
    ) -> tuple[np.ndarray, np.ndarray]:
        scored: list[tuple[np.ndarray, np.ndarray]] = []  # contribute to score
        must_sets: list[np.ndarray] = []
        for c in q.must:
            d, s = self.score_query(c, boost)
            scored.append((d, s))
            must_sets.append(d)
        for c in q.filter:
            d, _ = self.score_query(c)
            must_sets.append(d)
        should = [self.score_query(c, boost) for c in q.should]
        msm = q.min_should_match

        if must_sets:
            cand = must_sets[0]
            for d in must_sets[1:]:
                cand = np.intersect1d(cand, d, assume_unique=True)
        else:
            # pure disjunction: union of should docs
            if not should:
                return np.empty(0, np.int64), np.empty(0, np.float32)
            cand = np.unique(np.concatenate([d for d, _ in should])) if should else np.empty(0, np.int64)
        # min_should_match among should clauses
        if should and (msm > 0 or not must_sets):
            need = max(msm, 1) if not must_sets else msm
            if need > 0:
                cnt = np.zeros(cand.size, dtype=np.int64)
                for d, _ in should:
                    cnt += np.isin(cand, d, assume_unique=True)
                cand = cand[cnt >= need]
        for c in q.must_not:
            d, _ = self.score_query(c)
            cand = np.setdiff1d(cand, d, assume_unique=True)
        if cand.size == 0:
            return cand.astype(np.int64), np.empty(0, np.float32)
        # score: double accumulation of matching scoring clauses, f32 cast
        acc = np.zeros(cand.size, dtype=np.float64)
        for d, s in scored + should:
            idx = np.searchsorted(d, cand)
            idx = np.clip(idx, 0, max(d.size - 1, 0))
            m = (d.size > 0) & (d[idx] == cand) if d.size else np.zeros(cand.size, bool)
            acc[m] += s[idx[m]].astype(np.float64)
        return cand, acc.astype(np.float32)

    def top_k(self, q: ast.Query, k: int = 10) -> "list[tuple[int, float, str]]":
        docs, scores = self.score_query(q)
        if docs.size == 0:
            return []
        order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
        return [
            (int(docs[i]), float(scores[i]), self.urls[int(docs[i])]) for i in order
        ]
