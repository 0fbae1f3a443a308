"""Distributed query execution over a committed index.

The Spark translation of SURVEY.md §3.2:

1. stats lookup — term_stats filtered to the query's terms, aggregated
   globally (a tiny job; stats MUST be global across segments so scores
   are comparable, ``search/TermQuery.java:303``),
2. weight creation on the driver (idf / norm caches frozen),
3. a shuffle-free scan of term-pruned postings blocks grouped by
   segment; each task runs the block-max kernel for its segment and
   emits at most k rows (``searchLeaf`` + per-leaf collector analog),
4. global reduce: ORDER BY score DESC, doc_id ASC LIMIT k over the
   S*k candidate rows (``TopScoreDocCollectorManager.reduce``).

Physical notes (100 TB thinking):
- The postings scan carries a ``term IN (...)`` predicate that Parquet
  pushes down to row-group min/max stats (postings are written sorted by
  term) — the .tip/term-dictionary pruning analog. `.explain` shows
  PushedFilters on `term`.
- Norms are NOT shuffled: each kernel task reads its segment's packed
  norm blob directly (the Lucene .nvd access pattern). Only ≤k rows per
  segment leave the executors.
- The final docmap join joins a broadcast k-row side against the docmap
  table.
"""

from __future__ import annotations

import os

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.index.builder import read_latest_commit
from lucene_spark.search import ast as ast_mod
from lucene_spark.search import kernels
from lucene_spark.search.parser import parse
from lucene_spark.search.scoring import GlobalStats, build_scorers
from lucene_spark.search.segment import SegmentView


def _load_segment_view(index_dir: str, segment_id: str, pdf_postings) -> SegmentView:
    """Build the kernel's segment view: postings rows from the Spark scan,
    norms read task-side from the segment's packed blob."""
    import pyarrow.parquet as pq

    norms_path = os.path.join(
        index_dir, "norms", f"segment_id={segment_id}", "data.parquet"
    )
    nt = pq.read_table(norms_path)
    doc_base = int(nt["doc_base"][0].as_py())
    norms = np.frombuffer(nt["norms_bin"][0].as_py(), dtype=np.uint8)
    rows_by_term: dict[str, list] = {}
    for rec in pdf_postings.itertuples(index=False):
        rows_by_term.setdefault(rec.term, []).append(
            {
                "block_id": rec.block_id,
                "num_docs": rec.num_docs,
                "first_doc": rec.first_doc,
                "last_doc": rec.last_doc,
                "docs_bin": rec.docs_bin,
                "tfs_bin": rec.tfs_bin,
                "pos_bin": rec.pos_bin,
                "impact_tfs": rec.impact_tfs,
                "impact_norms": rec.impact_norms,
            }
        )
    return SegmentView.from_block_rows(segment_id, doc_base, norms, rows_by_term)


class Searcher:
    """IndexSearcher analog over a committed index directory."""

    def __init__(self, spark, index_dir: str, analyzer: Analyzer | None = None):
        from lucene_spark.analysis.analyzer import ENGLISH, Analyzer as _A

        self.spark = spark
        self.index_dir = index_dir
        self.commit = read_latest_commit(index_dir)
        if analyzer is None:
            sw = frozenset(self.commit.get("stopwords", []))
            analyzer = _A(stopwords=sw)
        self.analyzer = analyzer
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
        self.docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
        self.live_segments = {s["segment_id"] for s in self.commit["segments"]}

    # ---- stats (SURVEY §2.4: global CollectionStatistics/TermStatistics) --
    def global_term_stats(self, terms: "set[str]") -> dict:
        import pyspark.sql.functions as F

        if not terms:
            return {}
        rows = (
            self.term_stats.where(F.col("term").isin(list(terms)))
            .where(F.col("segment_id").isin(list(self.live_segments)))
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("df"), F.sum("total_tf").alias("ttf"))
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def parse(self, query: str) -> ast_mod.Query:
        return parse(query, self.analyzer)

    def search(
        self,
        query,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
    ):
        """Top-k DataFrame (doc_id, score, url), rank == Lucene contract."""
        import pyspark.sql.functions as F

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        tstats = self.global_term_stats(terms)
        stats = GlobalStats(
            doc_count=int(self.commit["doc_count"]),
            sum_total_tf=int(self.commit["sum_total_tf"]),
            doc_freq={t: v[0] for t, v in tstats.items()},
        )
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        kq, kk, kp, kd, kt = q, k, pruned, dtype, total_hits_threshold

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            sid = str(key[0])
            seg = _load_segment_view(index_dir, sid, pdf)
            docs, scores = kernels.search_segment(
                seg, kq, scorers, kk, pruned=kp, dtype=kd, total_hits_threshold=kt
            )
            return pd.DataFrame(
                {
                    "doc_id": (docs + seg.doc_base).astype("int64"),
                    "score": np.asarray(scores, dtype=np.float64),
                }
            )

        filtered = self.postings
        if terms:
            filtered = filtered.where(F.col("term").isin(list(terms)))
        else:
            filtered = filtered.where(F.lit(False))
        per_seg = filtered.groupBy("segment_id").applyInPandas(
            kernel, schema="doc_id long, score double"
        )
        topk = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        out = (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return out

    def count(self, query) -> int:
        """TotalHitCountCollector analog: number of matching docs."""
        import pyspark.sql.functions as F

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        if not terms:
            return 0
        tstats = self.global_term_stats(terms)
        stats = GlobalStats(
            doc_count=int(self.commit["doc_count"]),
            sum_total_tf=int(self.commit["sum_total_tf"]),
            doc_freq={t: v[0] for t, v in tstats.items()},
        )
        scorers = build_scorers(q, stats, dtype="f32")
        index_dir = self.index_dir
        kq = q

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"n": []}).astype({"n": "int64"})
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, _ = kernels.score_exhaustive(seg, kq, scorers, "f32")
            return pd.DataFrame({"n": [int(docs.size)]})

        per_seg = (
            self.postings.where(F.col("term").isin(list(terms)))
            .groupBy("segment_id")
            .applyInPandas(kernel, schema="n long")
        )
        row = per_seg.agg(F.sum("n").alias("total")).collect()[0]
        return int(row["total"] or 0)
