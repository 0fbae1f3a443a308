"""In-process multi-segment index — same kernels, no Spark.

Used by the test suite to run the FULL fixture query set fast (the Spark
integration tests cover the distributed plumbing on a subset). Semantics
are identical by construction: the same ``invert_partition`` builds the
segments, the same ``search_segment`` kernel scores them, the same
(score desc, doc_id asc) merge reduces them.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer, ENGLISH
from lucene_spark.index.builder import invert_partition
from lucene_spark.search import ast as ast_mod
from lucene_spark.search import kernels
from lucene_spark.search.parser import parse
from lucene_spark.search.scoring import GlobalStats, build_scorers
from lucene_spark.search.segment import SegmentView
from lucene_spark.util.spark_hash import pmod_partition


class LocalIndex:
    def __init__(
        self, segments, urls_by_segment, doc_count, sum_total_tf, analyzer,
        field_stats=None,
    ):
        self.segments: list[SegmentView] = segments
        self.urls_by_segment = urls_by_segment
        self.doc_count = doc_count
        self.sum_total_tf = sum_total_tf
        self.analyzer = analyzer
        self.field_stats = field_stats  # field -> (doc_count, sum_total_tf)

    @staticmethod
    def build(
        rows: "list[dict]",
        num_segments: int = 4,
        analyzer: Analyzer = ENGLISH,
        key_col: str = "url",
        text_col: str = "text",
        store_positions: bool = True,
        fields: tuple = (),
        store_offsets: bool = False,
    ) -> "LocalIndex":
        """``fields``: ((field_name, row_key), ...) — multi-field build;
        () = single default field from ``text_col``."""
        from lucene_spark.index.builder import invert_field

        specs = fields or (("", text_col),)
        by_pid: dict[int, list] = {}
        for r in rows:
            by_pid.setdefault(pmod_partition(str(r[key_col]), num_segments), []).append(r)
        segments = []
        urls_by_segment = {}
        doc_base = 0
        field_totals: dict = {f: [0, 0] for f, _ in specs}
        for pid in sorted(by_pid):
            grp = sorted(by_pid[pid], key=lambda r: str(r[key_col]))
            urls = [str(r[key_col]) for r in grp]
            rows_by_term: dict[str, list] = {}
            term_stats_all: list = []
            norms_by_field: dict = {}
            for fname, src in specs:
                texts = [r.get(src) or "" for r in grp]
                block_rows, term_stats, norms, sum_tf, fdc = invert_field(
                    fname, texts, analyzer, store_positions,
                    store_offsets=store_offsets,
                )
                for r2 in block_rows:
                    rows_by_term.setdefault(r2["term"], []).append(r2)
                term_stats_all.extend(term_stats)
                norms_by_field[fname] = norms
                field_totals[fname][0] += fdc
                field_totals[fname][1] += sum_tf
            sid = f"local{pid:05d}"
            seg = SegmentView.from_block_rows(
                sid, doc_base, norms_by_field, rows_by_term
            )
            seg.term_stats = {
                t["term"]: (t["doc_freq"], t["total_tf"]) for t in term_stats_all
            }
            segments.append(seg)
            urls_by_segment[sid] = urls
            doc_base += len(urls)
        default = specs[0][0]
        field_stats = (
            {f: (v[0], v[1]) for f, v in field_totals.items()} if fields else None
        )
        return LocalIndex(
            segments,
            urls_by_segment,
            doc_base,
            field_totals[default][1],
            analyzer,
            field_stats=field_stats,
        )

    def global_stats(self, terms) -> GlobalStats:
        df: dict[str, int] = {}
        for seg in self.segments:
            for t in terms:
                e = seg.term_stats.get(t)
                if e:
                    df[t] = df.get(t, 0) + e[0]
        return GlobalStats(
            self.doc_count, self.sum_total_tf, df, field_stats=self.field_stats
        )

    def search(
        self,
        query,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
        share_theta: bool = True,
    ):
        """[(global doc_id, score, url)] — identical contract to the
        Spark Searcher and to OracleIndex.top_k. ``share_theta`` carries
        the running kth score into each next segment's kernel (the
        sequential-leaf minCompetitiveScore sharing of the reference's
        ``IndexSearcher.search``); results are bit-identical either way."""
        q = parse(query, self.analyzer) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        stats = self.global_stats(terms)
        scorers = build_scorers(q, stats, dtype=dtype)
        all_docs, all_scores = [], []
        seed = -np.inf
        run_docs = np.empty(0, np.int64)
        run_scores = np.empty(0, np.float64)
        order = self.segments
        if share_theta and pruned:
            order = sorted(
                self.segments,
                key=lambda s: (-int(s.max_doc), s.segment_id),
            )
        for seg in order:
            docs, scores = kernels.search_segment(
                seg, q, scorers, k, pruned=pruned, dtype=dtype,
                total_hits_threshold=total_hits_threshold, seed_theta=seed,
            )
            all_docs.append(docs + seg.doc_base)
            all_scores.append(np.asarray(scores, dtype=np.float64))
            if share_theta and pruned:
                run_docs = np.concatenate([run_docs, all_docs[-1]])
                run_scores = np.concatenate([run_scores, all_scores[-1]])
                run_docs, run_scores = kernels.top_k_select(run_docs, run_scores, k)
                if k > 0 and run_docs.size >= k:
                    seed = max(
                        seed, kernels.seed_below(float(run_scores[-1]), dtype)
                    )
        docs = np.concatenate(all_docs) if all_docs else np.empty(0, np.int64)
        scores = np.concatenate(all_scores) if all_scores else np.empty(0, np.float64)
        docs, scores = kernels.top_k_select(docs, scores, k)
        out = []
        for d, s in zip(docs, scores):
            out.append((int(d), float(np.float32(s)) if dtype == "f32" else float(s), self.url_of(int(d))))
        return out

    def url_of(self, doc_id: int) -> str:
        base = 0
        for seg in self.segments:
            if doc_id < seg.doc_base + seg.max_doc:
                return self.urls_by_segment[seg.segment_id][doc_id - seg.doc_base]
        raise KeyError(doc_id)

    def count(self, query) -> int:
        q = parse(query, self.analyzer) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        scorers = build_scorers(q, self.global_stats(terms), dtype="f32")
        return sum(
            int(kernels.score_exhaustive(seg, q, scorers, "f32")[0].size)
            for seg in self.segments
        )
