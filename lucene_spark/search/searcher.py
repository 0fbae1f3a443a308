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


# Spill guard for the direct batched executor: a constant-score
# MultiTermQuery expansion's postings are NEVER materialized in one
# task-side frame. The leaf's doc union is accumulated in term-chunks
# of at most this many postings (decoded int64 docs = 8 bytes each, so
# the default bounds each chunk's decode at ~32 MB regardless of how
# wide the expansion is — `a*` on a huge segment stays flat). The
# value is captured driver-side at job submission (tests shrink it to
# force multi-chunk unions).
DIRECT_MT_CHUNK_POSTINGS = 4_000_000


def _mt_union_docs_chunked(
    index_dir: str, sid: str, mode: str, margs: tuple, mfield: str,
    budget: int,
) -> "np.ndarray":
    """RAW sorted unique local doc-id union of one constant-score
    MultiTermQuery leaf over one segment (liveDocs applied later by
    ``kernels.multi_term_union_docs``), computed under the direct
    executor's spill guard: the segment term dictionary supplies the
    matching terms and their docFreqs (``arrow_filters`` pruning the
    read for sargable modes), then postings are read docs_bin-ONLY —
    no tfs/pos/impacts, which a constant-score union never needs — for
    at most ``budget`` postings at a time."""
    import pyarrow.parquet as pq

    from lucene_spark.codec import blocks as blk
    from lucene_spark.search import multiterm

    t = pq.read_table(
        os.path.join(index_dir, "term_stats", f"segment_id={sid}"),
        columns=["term", "doc_freq"],
        filters=multiterm.arrow_filters(mode, margs, mfield),
    )
    pred = multiterm.term_key_matcher(mode, margs, mfield)
    matched = sorted(
        (x, int(df))
        for x, df in zip(t["term"].to_pylist(), t["doc_freq"].to_pylist())
        if pred(x)
    )  # term order == parquet sort order (row-group locality per chunk)
    acc = np.empty(0, np.int64)
    lo = 0
    while lo < len(matched):
        hi, load = lo, 0
        while hi < len(matched) and (
            hi == lo or load + matched[hi][1] <= budget
        ):
            load += matched[hi][1]
            hi += 1
        pt = pq.read_table(
            os.path.join(index_dir, "postings", f"segment_id={sid}"),
            columns=["first_doc", "docs_bin"],
            filters=[("term", "in", [x for x, _ in matched[lo:hi]])],
        )
        lo = hi
        if pt.num_rows:
            parts = [
                blk.decode_docs(int(fd), db)
                for fd, db in zip(
                    pt["first_doc"].to_pylist(), pt["docs_bin"].to_pylist()
                )
            ]
            acc = np.union1d(acc, np.concatenate(parts))
    return acc.astype(np.int64)


def _load_segment_view(index_dir: str, segment_id: str, pdf_postings) -> SegmentView:
    """Build the kernel's segment view: postings rows from the Spark scan,
    norms read task-side from the segment's packed blob."""
    import pyarrow.parquet as pq

    norms_path = os.path.join(
        index_dir, "norms", f"segment_id={segment_id}", "data.parquet"
    )
    nt = pq.read_table(norms_path)
    doc_base = int(nt["doc_base"][0].as_py())
    # one row per field ('' = default) — the per-field .nvd blobs
    if "field" in nt.column_names:
        norms = {
            f.as_py(): np.frombuffer(b.as_py(), dtype=np.uint8)
            for f, b in zip(nt["field"], nt["norms_bin"])
        }
        nsize = len(next(iter(norms.values())))
    else:  # legacy single-field layout
        norms = np.frombuffer(nt["norms_bin"][0].as_py(), dtype=np.uint8)
        nsize = norms.size
    # liveDocs tombstones (deletes are rare: absent file = all live)
    live = None
    del_path = os.path.join(
        index_dir, "deletes", f"segment_id={segment_id}", "data.parquet"
    )
    if os.path.exists(del_path):
        dt = pq.read_table(del_path)
        dead = np.asarray(dt["local_id"].to_pylist(), dtype=np.int64)
        if dead.size:
            live = np.ones(nsize, dtype=bool)
            live[dead] = False
    rows_by_term: dict[str, list] = {}
    has_pay = "pay_bin" in pdf_postings.columns
    has_off = "off_bin" in pdf_postings.columns
    for rec in pdf_postings.itertuples(index=False):
        if rec.term is None or not isinstance(rec.term, str):
            continue  # segment-skeleton row (term-less queries)
        row = {
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
        if has_pay and rec.pay_bin:
            row["pay_bin"] = rec.pay_bin
        if has_off and rec.off_bin:
            row["off_bin"] = rec.off_bin
        rows_by_term.setdefault(rec.term, []).append(row)
    seg = SegmentView.from_block_rows(segment_id, doc_base, norms, rows_by_term)
    seg.live = live
    return seg


class Searcher:
    """IndexSearcher analog over a committed index directory."""

    def __init__(
        self,
        spark,
        index_dir: str,
        analyzer: Analyzer | None = None,
        cache_stats: bool = False,
        preload_stats: bool = False,
    ):
        """``cache_stats=True`` memory-caches the term_stats table
        (TermStates/collectionStatistics lookups become in-memory scans
        — the LRUQueryCache analog for hot stats; suitable when the
        term dictionary fits executor memory). ``preload_stats=True``
        collects the whole global term dictionary to the driver once,
        removing the per-query stats job entirely (one Spark job per
        query instead of two) — right when the dictionary fits driver
        memory (10M terms ~ a few hundred MB)."""
        from lucene_spark.analysis.analyzer import ENGLISH, Analyzer as _A

        self.spark = spark
        self.index_dir = index_dir
        self.commit = read_latest_commit(index_dir)
        if analyzer is None:
            sw = frozenset(self.commit.get("stopwords", []))
            analyzer = _A(stopwords=sw)
        self.analyzer = analyzer
        # per-field analyzers reconstructed from the commit (query-time
        # analysis must match each field's index-time chain)
        self.field_analyzers = {
            f: _A(stopwords=frozenset(sw))
            for f, sw in (self.commit.get("field_stopwords") or {}).items()
        }
        import pyspark.sql.functions as F

        self.live_segments = {s["segment_id"] for s in self.commit["segments"]}
        live = list(self.live_segments)
        self.postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self.term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
        # dead (merged-away) segment files stay on disk until vacuumed;
        # every scan must partition-prune to the live set (the docmap
        # especially — dead segments carry the SAME doc ids)
        self.docmap = spark.read.parquet(os.path.join(index_dir, "docmap")).where(
            F.col("segment_id").isin(live)
        )
        if cache_stats:
            self.term_stats = self.term_stats.cache()
        self._stats_dict: dict | None = None
        if preload_stats:
            self._stats_dict = {
                r["term"]: (int(r["doc_freq"]), int(r["total_tf"]))
                for r in self.term_dictionary().collect()
            }

    def refresh(self) -> bool:
        """SearcherManager.maybeRefresh analog: re-open the latest
        commit generation. Returns True if a newer generation was
        loaded. Cheap: only the commit JSON and the docmap filter are
        rebuilt (segments are immutable)."""
        import pyspark.sql.functions as F

        latest = read_latest_commit(self.index_dir)
        if latest["generation"] == self.commit["generation"]:
            return False
        self.commit = latest
        self.live_segments = {s["segment_id"] for s in latest["segments"]}
        self.docmap = self.spark.read.parquet(
            os.path.join(self.index_dir, "docmap")
        ).where(F.col("segment_id").isin(list(self.live_segments)))
        if self._stats_dict is not None:
            self._stats_dict = {
                r["term"]: (int(r["doc_freq"]), int(r["total_tf"]))
                for r in self.term_dictionary().collect()
            }
        return True

    # ---- stats (SURVEY §2.4: global CollectionStatistics/TermStatistics) --
    def global_term_stats(self, terms: "set[str]") -> dict:
        import pyspark.sql.functions as F

        if not terms:
            return {}
        if self._stats_dict is not None:
            return {t: self._stats_dict[t] for t in terms if t in self._stats_dict}
        rows = (
            self.term_stats.where(F.col("term").isin(list(terms)))
            .where(F.col("segment_id").isin(list(self.live_segments)))
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("df"), F.sum("total_tf").alias("ttf"))
            .collect()
        )
        return {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}

    def parse(self, query: str) -> ast_mod.Query:
        return parse(query, self.analyzer, self.field_analyzers)

    # ---- cross-segment minCompetitiveScore sharing ----------------------
    def _champion_seeds(self, parsed: dict, scorers, k, dtype, threshold):
        """{query_id: seed_theta} from a driver-side pre-pass over the
        CHAMPION (largest) segment — the ``MaxScoreAccumulator`` /
        ``TopScoreDocCollectorManager.java:127-132`` cross-leaf
        threshold publication, adapted to Spark's one-stage-per-query
        execution: the champion's kth score (nudged rank-safe by
        ``kernels.seed_below``) seeds EVERY segment kernel's theta, so
        non-champion tasks prune from their first block instead of
        re-filling a heap from -inf.

        Cost model at scale: the pre-pass reads only the champion
        segment's term-filtered postings blocks (pyarrow row-group
        pruning over shared storage — the same access pattern the
        serving plane uses) and runs the pruned kernel once; the
        distributed stage it accelerates touches S segments. Results
        are bit-identical with or without seeding (differential-tested);
        queries where the champion yields < k hits simply get no seed."""
        from lucene_spark.search.serve import LocalSearcher

        segs = self.commit["segments"]
        if len(segs) <= 1 or not parsed or k <= 0:
            return {}
        champ = max(segs, key=lambda s: (int(s["num_docs"]), s["segment_id"]))
        ck = (self.commit["generation"], champ["segment_id"])
        cached = getattr(self, "_champ", None)
        if cached is None or cached[0] != ck:
            ls = LocalSearcher(
                self.index_dir,
                segment_ids=[champ["segment_id"]],
                preload_stats=False,
                workers=1,
            )
            self._champ = (ck, ls)
        ls = self._champ[1]
        seg_meta = ls.segments[0]
        all_terms: set = set()
        for q in parsed.values():
            all_terms |= ast_mod.query_terms(q)
        view = ls._view(seg_meta, all_terms)
        seeds: dict = {}
        for qid, q in parsed.items():
            if ast_mod.multi_term_leaves(q):
                continue  # exhaustive fallback ignores seeds anyway
            docs, scores = kernels.search_segment(
                view, q, scorers, k, pruned=True, dtype=dtype,
                total_hits_threshold=threshold,
            )
            if docs.size >= k:
                seeds[qid] = kernels.seed_below(float(scores[k - 1]), dtype)
        return seeds

    def _scan_pred(self, queries, terms: set):
        """Postings-scan term filter for a set of parsed queries: None
        when the plain ``term IN (...)`` list suffices, else a Column
        OR-ing the term list with every MultiTermQuery leaf's predicate
        (the leaf's dictionary rewrite, evaluated in the scan — sargable
        modes still reach parquet row-group stats)."""
        import pyspark.sql.functions as F

        leaves: list = []
        for q in queries:
            leaves.extend(ast_mod.multi_term_leaves(q))
        if not leaves:
            return None
        pred = (
            F.col("term").isin(list(terms)) if terms else F.lit(False)
        )
        for l in leaves:
            pred = pred | self._term_predicate(l.mode, *l.args, field=l.field)
        return pred

    def search(
        self,
        query,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
        share_theta: bool = False,
        direct: bool = False,
    ):
        """Top-k DataFrame (doc_id, score, url), rank == Lucene contract.

        ``direct=True`` routes through the one-stage batched executor
        (``_search_many_direct`` with a single query): segment tasks
        read their own pruned postings/docmap row groups task-side —
        no postings exchange, no corpus-wide docmap scan per query.
        Default OFF for single queries — measured, not assumed: on the
        960k/64-segment corpus at local[8] the direct shape runs ~25%
        SLOWER per query (22.1 s vs 17.8 s per 12-query sweep, 2
        interleaved reps) because each segment task re-pays parquet
        dataset discovery + footer parses for ONE query's terms, which
        the Catalyst scan amortizes JVM-side; the batch amortizes them
        across the whole query set, which is why ``search_many``
        defaults ON. Bit-identical either way
        (tests/test_search_many.py).

        ``share_theta`` (opt-in): seed every segment kernel's theta from
        a driver-side champion-segment pre-pass — the
        ``MaxScoreAccumulator`` cross-leaf threshold analog. Results are
        bit-identical either way (tests/test_theta_sharing.py) and the
        non-champion kernels decode measurably fewer blocks, but the
        pre-pass is serial driver time on the latency path and the
        interleaved A/B on the 960k/64-segment corpus (BENCH.md round 3)
        reads a net LOSS at this scale: ~5% per sequential query, ~20%
        batched — Spark's per-segment tasks are too coarse for the saved
        decode work to beat one cold champion read. The serving plane's
        sequential running-theta (LocalSearcher, no pre-pass) is the
        shape where sharing pays and stays on by default."""
        import pyspark.sql.functions as F

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        tstats = self.global_term_stats(terms)
        stats = self._global_stats(tstats)
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        if direct:
            seeds = (
                self._champion_seeds(
                    {"q": q}, scorers, k, dtype, total_hits_threshold
                )
                if share_theta and pruned
                else {}
            )
            return self._search_many_direct(
                {"q": q}, terms, scorers, k, pruned, dtype,
                total_hits_threshold, seeds,
            ).select("doc_id", "score", "url")
        seed = -np.inf
        if share_theta and pruned:
            seed = self._champion_seeds(
                {"q": q}, scorers, k, dtype, total_hits_threshold
            ).get("q", -np.inf)
        kq, kk, kp, kd, kt, ks = q, k, pruned, dtype, total_hits_threshold, seed

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            sid = str(key[0])
            seg = _load_segment_view(index_dir, sid, pdf)
            docs, scores = kernels.search_segment(
                seg, kq, scorers, kk, pruned=kp, dtype=kd,
                total_hits_threshold=kt, seed_theta=ks,
            )
            return pd.DataFrame(
                {
                    "doc_id": (docs + seg.doc_base).astype("int64"),
                    "score": np.asarray(scores, dtype=np.float64),
                }
            )

        per_seg = self._per_segment(
            terms, kernel, "doc_id long, score double",
            term_pred=self._scan_pred([q], terms),
            ensure_segments=ast_mod.has_termless_match(q),
        )
        topk = per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        out = (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        return out

    def search_many(
        self,
        queries,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
        share_theta: bool = False,
        direct: bool = True,
    ):
        """Batched query evaluation: ONE stats job + ONE per-segment
        stage answers the whole query set — the Spark-native shape for
        query THROUGHPUT (per-query jobs are driver-scheduling-bound; a
        batch amortizes the scan and runs every (segment, query) kernel
        in the same stage). Returns DataFrame (query_id, doc_id, score,
        url) with per-query rank contract identical to ``search``.

        ``queries``: list of query strings/ASTs, or {query_id: query}.
        ``share_theta`` is opt-in here too: the interleaved A/B
        (BENCH.md round 3) measured the champion pre-pass ~20% slower
        for the batch — the per-query pre-passes run serially on the
        driver while the batch stage would have amortized them anyway.

        ``direct=True`` (default): one stage of segment tasks that read
        their own term-pruned postings row groups and docmap rows with
        pyarrow (the serving plane's access pattern, distributed), then
        one tiny shuffle of <= S*Q*k hit rows for the global per-query
        rank. The opt-out (``direct=False``) is the round-3 shape —
        Catalyst postings scan -> repartition(S) -> kernel -> window ->
        broadcast docmap join — kept for A/B; it shuffles every matched
        postings BLOCK through the exchange and scans the full docmap to
        resolve k urls, both of which cost fixed wall time per batch and
        capped the 2->8-core batched scaling at 0.71 (BENCH.md round 4).
        """
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        if not isinstance(queries, dict):
            queries = {str(i): q for i, q in enumerate(queries)}
        parsed = {
            qid: (self.parse(q) if isinstance(q, str) else ast_mod.rewrite(q))
            for qid, q in queries.items()
        }
        all_terms: set = set()
        for q in parsed.values():
            all_terms |= ast_mod.query_terms(q)
        tstats = self.global_term_stats(all_terms)
        stats = self._global_stats(tstats)
        scorers: dict = {}
        for q in parsed.values():
            scorers.update(build_scorers(q, stats, dtype=dtype))
        index_dir = self.index_dir
        seeds: dict = {}
        if share_theta and pruned:
            seeds = self._champion_seeds(
                parsed, scorers, k, dtype, total_hits_threshold
            )
        kqs, kk, kp, kd, kt = parsed, k, pruned, dtype, total_hits_threshold
        kseeds = seeds

        if direct:
            return self._search_many_direct(
                parsed, all_terms, scorers, k, pruned, dtype,
                total_hits_threshold, seeds,
            )

        def kernel(key, pdf):
            import pandas as pd

            out_q, out_d, out_s = [], [], []
            if not pdf.empty:
                seg = _load_segment_view(index_dir, str(key[0]), pdf)
                for qid, q in kqs.items():
                    docs, scores = kernels.search_segment(
                        seg, q, scorers, kk, pruned=kp, dtype=kd,
                        total_hits_threshold=kt,
                        seed_theta=kseeds.get(qid, -np.inf),
                    )
                    out_q.extend([qid] * docs.size)
                    out_d.append((docs + seg.doc_base).astype("int64"))
                    out_s.append(np.asarray(scores, dtype=np.float64))
            return pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="object"),
                    "doc_id": np.concatenate(out_d) if out_d else np.empty(0, "int64"),
                    "score": np.concatenate(out_s) if out_s else np.empty(0, "float64"),
                }
            )

        per_seg = self._per_segment(
            all_terms, kernel, "query_id string, doc_id long, score double",
            term_pred=self._scan_pred(parsed.values(), all_terms),
            ensure_segments=any(
                ast_mod.has_termless_match(q) for q in parsed.values()
            ),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        topk = (
            per_seg.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )
        return (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("query_id", "doc_id", "score", "url")
            .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
        )

    def _search_many_direct(
        self, parsed, all_terms, scorers, k, pruned, dtype, threshold,
        seeds,
    ):
        """One-stage batched execution: a seed row per live segment is
        hashed to its own task; each task reads its segment's
        term-pruned postings row groups, term dictionary (MultiTermQuery
        rewrites via ``multiterm.arrow_filters`` + the shared Python
        matcher) and docmap hit rows directly with pyarrow — the same
        storage access pattern the Catalyst scan compiles to, without
        shipping postings blocks through an exchange. The only shuffle
        is the final per-query rank over <= S*Q*k hit rows. At cluster
        scale this is strictly less data movement than the scan shape:
        postings stay on the (shared-storage) read path, never on the
        shuffle path, and the docmap is probed per segment instead of
        scanned per batch."""
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        index_dir = self.index_dir
        kqs, kk, kp, kd, kt, kseeds = (
            parsed, k, pruned, dtype, threshold, seeds,
        )
        terms_list = sorted(all_terms)
        # split multi-term leaves by what the task needs: interval
        # sources get full postings in the view (positions for
        # iterator-build expansion); constant-score leaves get only a
        # doc UNION, computed task-side in bounded chunks (the spill
        # guard — a wide `a*` expansion never sits in one frame)
        mt_full: list = []
        mt_union: list = []
        seen: set = set()
        for q in parsed.values():
            cs, iv = ast_mod.multi_term_leaves_split(q)
            for leaf in iv:
                key = (leaf.mode, tuple(leaf.args), leaf.field)
                if ("f", key) not in seen:
                    seen.add(("f", key))
                    mt_full.append(key)
            for leaf in cs:
                key = (leaf.mode, tuple(leaf.args), leaf.field)
                if ("u", key) not in seen:
                    seen.add(("u", key))
                    mt_union.append(key)
        # a leaf used BOTH ways keeps the full-postings treatment (its
        # union then derives from the view like the scan plane)
        mt_union = [k for k in mt_union if k not in set(mt_full)]
        kmt = mt_full
        kmtu = mt_union
        kbudget = int(DIRECT_MT_CHUNK_POSTINGS)
        pcols = [
            "term", "block_id", "num_docs", "first_doc", "last_doc",
            "docs_bin", "tfs_bin", "pos_bin", "impact_tfs", "impact_norms",
        ]
        if "pay_bin" in self.postings.columns:
            pcols.append("pay_bin")
        if "off_bin" in self.postings.columns:
            pcols.append("off_bin")

        def one_segment(sid: str):
            import pandas as pd
            import pyarrow.parquet as pq

            from lucene_spark.search import multiterm

            need = set(terms_list)
            for mode, margs, mfield in kmt:
                filt = multiterm.arrow_filters(mode, margs, mfield)
                t = pq.read_table(
                    os.path.join(index_dir, "term_stats", f"segment_id={sid}"),
                    columns=["term"],
                    filters=filt,
                )
                pred = multiterm.term_key_matcher(mode, margs, mfield)
                need.update(x for x in t["term"].to_pylist() if pred(x))
            mt_docs = {
                (mode, margs, mfield): _mt_union_docs_chunked(
                    index_dir, sid, mode, margs, mfield, kbudget
                )
                for mode, margs, mfield in kmtu
            }
            if need:
                tbl = pq.read_table(
                    os.path.join(index_dir, "postings", f"segment_id={sid}"),
                    columns=pcols,
                    filters=[("term", "in", sorted(need))],
                )
                pp = tbl.to_pandas()
            else:
                pp = pd.DataFrame(columns=pcols)
            seg = _load_segment_view(index_dir, sid, pp)
            if mt_docs:
                seg.mt_docs = mt_docs
            out_q, out_d, out_s = [], [], []
            for qid, q in kqs.items():
                docs, scores = kernels.search_segment(
                    seg, q, scorers, kk, pruned=kp, dtype=kd,
                    total_hits_threshold=kt,
                    seed_theta=kseeds.get(qid, -np.inf),
                )
                out_q.extend([qid] * docs.size)
                out_d.append((docs + seg.doc_base).astype("int64"))
                out_s.append(np.asarray(scores, dtype=np.float64))
            gd = np.concatenate(out_d) if out_d else np.empty(0, "int64")
            gs = np.concatenate(out_s) if out_s else np.empty(0, "float64")
            if gd.size:
                t = pq.read_table(
                    os.path.join(index_dir, "docmap", f"segment_id={sid}"),
                    columns=["doc_id", "url"],
                    filters=[("doc_id", "in", np.unique(gd).tolist())],
                )
                did = t["doc_id"].to_numpy()
                uarr = np.asarray(t["url"].to_pylist(), dtype=object)
                order = np.argsort(did)
                urls = uarr[order][np.searchsorted(did[order], gd)]
            else:
                urls = np.empty(0, dtype=object)
            return pd.DataFrame(
                {
                    "query_id": pd.Series(out_q, dtype="object"),
                    "doc_id": gd,
                    "score": gs,
                    "url": pd.Series(urls, dtype="object"),
                }
            )

        def kernel(batches):
            # mapInPandas over an EXACTLY-partitioned seed RDD (one
            # segment per partition, below): no shuffle, and no
            # hash-collision skew — repartition(n, segment_id) buckets
            # ~36% of partitions empty and some with 3-4 segments,
            # which made the straggler task ~4x the median and capped
            # batched scaling (BENCH.md round 4)
            for pdf in batches:
                for sid in pdf["segment_id"]:
                    yield one_segment(str(sid))

        seg_ids = sorted(self.live_segments)
        n = max(1, len(seg_ids))
        seed_df = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(
                [(sid,) for sid in seg_ids], n
            ),
            "segment_id string",
        )
        per_seg = seed_df.mapInPandas(
            kernel, "query_id string, doc_id long, score double, url string"
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            per_seg.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
            .select("query_id", "doc_id", "score", "url")
            .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
        )

    def count(self, query) -> int:
        """TotalHitCountCollector analog: number of matching docs."""
        import pyspark.sql.functions as F

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        ensure = ast_mod.has_termless_match(q)
        scan_pred = self._scan_pred([q], terms)
        if not terms and not ensure and scan_pred is None:
            return 0
        tstats = self.global_term_stats(terms)
        stats = self._global_stats(tstats)
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

        per_seg = self._per_segment(terms, kernel, "n long",
                                    term_pred=scan_pred,
                                    ensure_segments=ensure)
        row = per_seg.agg(F.sum("n").alias("total")).collect()[0]
        return int(row["total"] or 0)

    # ---- generic per-segment kernel scaffolding -------------------------
    def _per_segment(self, terms, kernel, schema, term_pred=None,
                     ensure_segments=False):
        """Term-pruned postings scan -> groupBy(segment) -> kernel rows.
        The scan's ``term IN (...)`` predicate is pushed to Parquet
        row-group stats; ``segment_id IN (live)`` prunes dead (merged-
        away) segment directories at the partition level. ``term_pred``
        filters by an arbitrary term predicate instead (MultiTermQuery
        rewrites) — sargable predicates (prefix/range) still push down.
        ``ensure_segments=True`` unions one null-term skeleton row per
        live segment so the kernel runs even where the term filter
        matches nothing — required for term-less matching leaves
        (FieldExistsQuery / MatchAllDocsQuery evaluate off norms, not
        postings)."""
        import pyspark.sql.functions as F

        filtered = self.postings.where(
            F.col("segment_id").isin(list(self.live_segments))
        )
        if term_pred is not None:
            filtered = filtered.where(term_pred)
        elif terms is not None:
            if not terms:
                filtered = filtered.where(F.lit(False))
            else:
                filtered = filtered.where(F.col("term").isin(list(terms)))
        if ensure_segments:
            skel = self.spark.createDataFrame(
                [(sid,) for sid in sorted(self.live_segments)],
                "segment_id string",
            )
            for f_ in filtered.schema.fields:
                if f_.name != "segment_id":
                    skel = skel.withColumn(
                        f_.name, F.lit(None).cast(f_.dataType)
                    )
            filtered = filtered.unionByName(skel.select(filtered.columns))
        # explicit-count repartition: one kernel task per segment (AQE
        # would otherwise coalesce the small term-pruned block rows into
        # one task and serialize the per-segment kernels)
        n = max(1, len(self.live_segments))
        return (
            filtered.repartition(n, "segment_id")
            .groupBy("segment_id")
            .applyInPandas(kernel, schema=schema)
        )

    def _with_url(self, df, cols):
        """Join internal doc ids back to urls (broadcast the small hit
        side into the docmap scan)."""
        import pyspark.sql.functions as F

        return self.docmap.join(F.broadcast(df), "doc_id").select(*cols)

    def _global_stats(self, tstats: dict) -> GlobalStats:
        """Frozen global stats: legacy totals plus per-field
        CollectionStatistics from the commit (multi-field indexes)."""
        fields = self.commit.get("fields") or None
        field_stats = (
            {f: (int(st["doc_count"]), int(st["sum_total_tf"])) for f, st in fields.items()}
            if fields
            else None
        )
        return GlobalStats(
            doc_count=int(self.commit["doc_count"]),
            sum_total_tf=int(self.commit["sum_total_tf"]),
            doc_freq={t: v[0] for t, v in tstats.items()},
            field_stats=field_stats,
        )

    def _stats_for(self, q):
        terms = ast_mod.query_terms(q)
        tstats = self.global_term_stats(terms)
        return self._global_stats(tstats), terms

    # ---- match sets / postings access (driver-correctness surface) ------
    def match_docs(self, query):
        """All docs matching ``query`` (membership only): DataFrame
        (doc_id, url). The exhaustive-matching analog of
        ConstantScoreQuery + a collector that keeps every doc."""
        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        stats, terms = self._stats_for(q)
        scorers = build_scorers(q, stats, dtype="f64")
        index_dir = self.index_dir
        kq = q

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, _ = kernels.score_exhaustive(seg, kq, scorers, "f64")
            return pd.DataFrame({"doc_id": (docs + seg.doc_base).astype("int64")})

        per_seg = self._per_segment(
            terms, kernel, "doc_id long",
            term_pred=self._scan_pred([q], terms),
            ensure_segments=ast_mod.has_termless_match(q),
        )
        return self._with_url(per_seg, ["doc_id", "url"])

    def score_docs_df(self, query, dtype: str = "f64"):
        """ALL matching docs with scores (exhaustive): DataFrame
        (doc_id, url, score) — the unscored-limit collector analog for
        arbitrary query trees (incl. Boost/ConstantScore/MultiPhrase)."""
        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        stats, terms = self._stats_for(q)
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        kq, kd = q, dtype

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, scores = kernels.score_exhaustive(seg, kq, scorers, kd)
            if kd == "f32":
                scores = scores.astype(np.float32).astype(np.float64)
            return pd.DataFrame(
                {"doc_id": (docs + seg.doc_base).astype("int64"),
                 "score": np.asarray(scores, dtype=np.float64)}
            )

        per_seg = self._per_segment(
            terms, kernel, "doc_id long, score double",
            term_pred=self._scan_pred([q], terms),
            ensure_segments=ast_mod.has_termless_match(q),
        )
        return self._with_url(per_seg, ["doc_id", "url", "score"])

    def group_topk(
        self,
        query,
        group_df,
        group_col: str = "group",
        n_groups: int = 10,
        k: int = 3,
        dtype: str = "f64",
    ):
        """Grouping-module analog (``lucene/grouping``
        FirstPassGroupingCollector + TopGroupsCollector two-pass
        search): the top ``n_groups`` groups ranked by their BEST doc
        score (tie: smaller doc id, then group value), then the top
        ``k`` docs within each selected group (score desc, doc asc).
        ``group_df``: DataFrame (doc_id, <group_col>) supplying each
        doc's group value (the reference reads it from doc values; here
        any doc-keyed column works). Matching docs with NO row in
        ``group_df`` form one NULL group — the reference's null-group
        behavior for docs missing the grouping value — rather than
        silently disappearing.

        Spark-native single pass: score the match set, join the group
        column, two window ranks — no driver collection; returns
        DataFrame (group, group_rank, rank, doc_id, url, score)."""
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        scored = self.score_docs_df(query, dtype=dtype)
        joined = scored.join(group_df, "doc_id", "left")
        wg = Window.partitionBy(group_col).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = joined.withColumn("rank", F.row_number().over(wg))
        # the unpartitioned row_number window runs AFTER the limit — it
        # numbers at most n_groups rows on one task, never the corpus
        heads = (
            ranked.where(F.col("rank") == 1)
            .orderBy(F.desc("score"), F.asc("doc_id"), F.asc(group_col))
            .limit(int(n_groups))
            .select(
                F.col(group_col),
                F.row_number()
                .over(
                    Window.orderBy(
                        F.desc("score"), F.asc("doc_id"), F.asc(group_col)
                    )
                )
                .alias("group_rank"),
            )
        )
        # null-SAFE join: the null group must survive selection (a
        # plain equi-join drops NULL keys)
        h = heads.withColumnRenamed(group_col, "__head_group")
        return (
            ranked.where(F.col("rank") <= int(k))
            .join(
                F.broadcast(h),
                F.col(group_col).eqNullSafe(F.col("__head_group")),
            )
            .select(group_col, "group_rank", "rank", "doc_id", "url", "score")
            .orderBy("group_rank", "rank")
        )

    def facet_ranges(self, query, value_df, value_col: str, ranges):
        """Range facets (``facet/range/LongRangeFacetCounts.java`` /
        ``DoubleRangeFacetCounts``): per-range match counts over the
        query's result set. ``ranges``: list of (label, lo, hi[,
        min_inclusive, max_inclusive]) — ranges MAY overlap (each doc
        counts in every range containing its value, like the
        reference), so this is one conditional-sum aggregation over the
        matched rows, not a bucketing GROUP BY. ``value_df``: DataFrame
        (doc_id, <value_col>). Returns DataFrame (label, count) in the
        given range order."""
        import pyspark.sql.functions as F

        if not ranges:
            return self.spark.createDataFrame([], "label string, count long")
        matched = self.match_docs(query).join(value_df, "doc_id")
        v = F.col(value_col)
        aggs = []
        for i, r in enumerate(ranges):
            label, lo, hi = r[0], r[1], r[2]
            inc_lo = bool(r[3]) if len(r) > 3 else True
            inc_hi = bool(r[4]) if len(r) > 4 else False
            cond = F.lit(True)
            if lo is not None:
                cond = cond & ((v >= lo) if inc_lo else (v > lo))
            if hi is not None:
                cond = cond & ((v <= hi) if inc_hi else (v < hi))
            aggs.append(
                F.count(F.when(cond, F.lit(1))).alias(f"c{i}")
            )
        row = matched.agg(*aggs).collect()[0]
        return self.spark.createDataFrame(
            [(r[0], int(row[f"c{i}"])) for i, r in enumerate(ranges)],
            "label string, count long",
        )

    def term_postings_df(self, term: str):
        """One term's full postings: DataFrame (doc_id, url, tf) — the
        PostingsEnum(FREQS) analog, decoded distributed."""
        term = self.analyzer.normalize(term)
        index_dir = self.index_dir

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "tf": pd.Series([], dtype="int64")}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            tb = seg.term_blocks(term)
            if tb is None:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "tf": pd.Series([], dtype="int64")}
                )
            docs, tfs = tb.decode_all()
            m = seg.live_mask(docs)
            docs, tfs = docs[m], tfs[m]
            return pd.DataFrame(
                {"doc_id": (docs + seg.doc_base).astype("int64"),
                 "tf": tfs.astype("int64")}
            )

        per_seg = self._per_segment({term}, kernel, "doc_id long, tf long")
        return self._with_url(per_seg, ["doc_id", "url", "tf"])

    def phrase_freqs_df(self, query):
        """Exact-phrase occurrences: DataFrame (doc_id, url, freq) for
        every doc where phraseFreq > 0 (two-phase: doc AND + position
        verify)."""
        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        if isinstance(q, ast_mod.PhraseQuery):
            matcher = kernels._phrase_doc_freqs
            terms = set(q.terms)
        elif isinstance(q, ast_mod.MultiPhraseQuery):
            matcher = kernels._multi_phrase_doc_freqs
            terms = ast_mod.query_terms(q)
        else:
            raise TypeError(f"not a phrase query: {query!r}")
        index_dir = self.index_dir
        kq = q

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "freq": pd.Series([], dtype="int64")}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, freqs = matcher(seg, kq)
            return pd.DataFrame(
                {"doc_id": (docs + seg.doc_base).astype("int64"),
                 "freq": freqs.astype("int64")}
            )

        per_seg = self._per_segment(terms, kernel, "doc_id long, freq long")
        return self._with_url(per_seg, ["doc_id", "url", "freq"])

    # ---- term dictionary / multi-term expansion -------------------------
    def term_dictionary(self):
        """Global (term, doc_freq, total_tf) — TermsEnum over all live
        segments, aggregated (Catalyst does the partial aggregation
        map-side)."""
        import pyspark.sql.functions as F

        return (
            self.term_stats.where(
                F.col("segment_id").isin(list(self.live_segments))
            )
            .groupBy("term")
            .agg(
                F.sum("doc_freq").alias("doc_freq"),
                F.sum("total_tf").alias("total_tf"),
            )
        )

    def _term_predicate(self, mode: str, *args, field: str = ""):
        """Spark Column predicate selecting a MultiTermQuery family's
        matching terms, applicable to ANY table with a ``term`` column —
        including the postings scan itself (so prefix/range rewrites
        push down to parquet row-group min/max stats on the term-sorted
        postings; term-sorted files are the .tip/FST pruning analog).
        Modes: prefix(p) | wildcard(pat) | regexp(r) | range(lo, hi) |
        in_set(terms) | fuzzy(term, max_edits)."""
        import pyspark.sql.functions as F

        from lucene_spark.search.ast import FIELD_SEP, fielded

        bare = F.col("term")
        scope = None
        if field:
            prefix = field + FIELD_SEP
            scope = F.col("term").startswith(prefix)
            bare = F.substring(F.col("term"), len(prefix) + 1, 1 << 20)
        else:
            scope = ~F.col("term").contains(FIELD_SEP)
        if mode == "prefix":
            # sargable on the raw fielded key -> parquet pushdown (the
            # scope conjunct is a cheap residual filter on top)
            return scope & F.col("term").startswith(fielded(field, args[0]))
        if mode == "wildcard":
            # WildcardQuery pattern -> anchored regex, shared translation
            # (search/WildcardQuery.java:30-63 via multiterm.wildcard_regex
            # so the scan matches the kernel/serving predicate exactly)
            from lucene_spark.search.multiterm import wildcard_regex

            return scope & bare.rlike(wildcard_regex(args[0]))
        if mode == "regexp":
            return scope & bare.rlike(args[0])
        if mode == "lregexp":
            # Lucene-dialect regexp: Spark cannot evaluate the dialect,
            # so the scan screen is the SARGABLE literal prefix every
            # match must start with (the Operations.getCommonPrefix
            # analog; empty prefix = field scope only) — the shared
            # Python automaton decides membership downstream
            from lucene_spark.search.lregexp import literal_prefix

            p = literal_prefix(args[0])
            if p:
                return scope & F.col("term").startswith(fielded(field, p))
            return scope
        if mode == "range":
            # (lo, hi[, include_lo, include_hi]); 2-arg form keeps the
            # historical half-open [lo, hi) contract
            lo, hi = args[0], args[1]
            inc_lo = bool(args[2]) if len(args) > 2 else True
            inc_hi = bool(args[3]) if len(args) > 3 else False
            pred = scope
            if lo is not None:
                flo = fielded(field, lo)
                pred = pred & (
                    (F.col("term") >= flo) if inc_lo else (F.col("term") > flo)
                )
            if hi is not None:
                fhi = fielded(field, hi)
                pred = pred & (
                    (F.col("term") <= fhi) if inc_hi else (F.col("term") < fhi)
                )
            return pred
        if mode == "in_set":
            return F.col("term").isin([fielded(field, t) for t in args[0]])
        if mode == "fuzzy":
            base, max_edits = args[0], int(args[1])
            transpositions = bool(args[2]) if len(args) > 2 else True
            # Spark has no Damerau function; a transposition costs 1
            # under DL but <= 2 plain-Levenshtein ops, so lev <= 2n is
            # a SUPERSET of dl <= n — the scan predicate only prunes,
            # the Python matcher (multiterm.term_key_matcher) decides
            # membership in the kernels / expansion post-filter
            cap = 2 * max_edits if transpositions else max_edits
            lenscreen = (
                F.abs(F.length(bare) - F.lit(len(base))) <= max_edits
            )  # every DL op changes length by <= 1
            return scope & lenscreen & (F.levenshtein(bare, F.lit(base)) <= cap)
        raise ValueError(f"unknown expansion mode {mode!r}")

    def expand_terms(
        self, mode: str, *args, field: str = "", max_expansions: "int | None" = None
    ) -> list:
        """MultiTermQuery term expansion against the term dictionary
        (``search/MultiTermQuery.java`` rewrite): returns the sorted
        matching terms. ``max_expansions`` caps the rewrite like
        ``TopTermsRewrite`` (``search/TopTermsRewrite.java:38-66`` —
        keep the highest-docFreq terms, like the rewrite priority
        queue): only then is a driver collect bounded; leave it None
        only when the expansion is known small."""
        import pyspark.sql.functions as F

        from lucene_spark.search.multiterm import term_key_matcher

        td = self.term_dictionary().where(
            self._term_predicate(mode, *args, field=field)
        )
        # fuzzy-with-transpositions has a SUPERSET scan predicate
        # (Spark lacks a Damerau function), so its TopTermsRewrite cap
        # must apply AFTER the exact Python post-filter — else superset
        # terms crowd out true matches; every other mode's predicate is
        # exact, so the cap stays Spark-side (bounded driver collect)
        superset = (
            mode == "fuzzy" and (len(args) < 3 or bool(args[2]))
        ) or mode == "lregexp"
        if max_expansions is not None and not superset:
            td = td.orderBy(F.desc("doc_freq"), F.asc("term")).limit(
                int(max_expansions)
            )
        pred = term_key_matcher(mode, tuple(args), field)
        rows = [
            r
            for r in td.select("term", "doc_freq").collect()
            if pred(r["term"])
        ]
        if max_expansions is not None and superset:
            rows.sort(key=lambda r: (-int(r["doc_freq"]), r["term"]))
            rows = rows[: int(max_expansions)]
        return sorted(r["term"] for r in rows)

    def explain(self, query, doc_id: int, dtype: str = "f32") -> dict:
        """IndexSearcher.explain analog (driver-side over the owning
        segment's term-filtered blocks — explain is a one-doc
        diagnostic, not a distributed job). Root value is bit-identical
        to ``search``'s score for the doc."""
        from lucene_spark.search.explain import explain as _explain
        from lucene_spark.search.serve import LocalSearcher

        gen = self.commit["generation"]
        cached = getattr(self, "_explain_ls", None)
        if cached is None or cached[0] != gen:
            ls = LocalSearcher(self.index_dir, preload_stats=False, workers=1)
            if ls.commit["generation"] != gen:
                # a writer has advanced the index past this Searcher's
                # pinned snapshot — explain must stay bit-identical to
                # THIS searcher's search(), so pin the reader to the
                # same commit (segments are immutable; only the
                # generation metadata differs)
                ls._open(self.commit)
            self._explain_ls = (gen, ls)
        # parse with THIS searcher's analyzers (the serving-side
        # reconstruction may differ when a custom analyzer was passed)
        q = self.parse(query) if isinstance(query, str) else query
        return _explain(self._explain_ls[1], q, doc_id, dtype=dtype)

    def scoring_rewrite(self, query, max_expansions: "int | None" = None):
        """``MultiTermQuery.SCORING_BOOLEAN_REWRITE`` (with
        ``max_expansions`` = the ``TopTermsRewrite(size)`` cap, keeping
        the highest-docFreq terms): every MultiTermQuery leaf becomes a
        BooleanQuery of SHOULD TermQuery clauses over its expanded
        terms, so matches are BM25-scored like explicit terms instead
        of constant-scored. Per-term boosts (FuzzyQuery's blended
        similarity boosts) are out of scope — every expanded clause
        gets boost 1 like ``ScoringRewrite.SCORING_BOOLEAN_REWRITE``.
        Expansion collects terms to the driver — cap it on wide
        patterns (the reference throws TooManyClauses past 1024)."""
        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        return ast_mod.scoring_boolean_rewrite(
            q,
            lambda n: self.expand_terms(
                n.mode, *n.args, field=n.field, max_expansions=max_expansions
            ),
        )

    def multi_term_docs(self, mode: str, *args, field: str = ""):
        """Docs matching ANY term of the expansion (the constant-score
        rewrite, ``MultiTermQuery.CONSTANT_SCORE_BLENDED_REWRITE``):
        DataFrame (doc_id, url).

        FULLY distributed: the term predicate is applied directly to
        the postings scan (no dictionary collect, no IN-list, no
        driver materialization — a single-letter prefix on a web corpus
        never touches the driver); each segment task decodes its
        matched postings and emits distinct doc ids."""
        import pyspark.sql.functions as F

        index_dir = self.index_dir

        mt_mode, mt_args, mt_field = mode, tuple(args), field

        def kernel(key, pdf):
            import pandas as pd

            from lucene_spark.search.multiterm import term_key_matcher

            if pdf.empty:
                return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            # the scan predicate is a SUPERSET for fuzzy (levenshtein
            # cap stands in for Damerau); membership is decided by the
            # one-source-of-truth Python matcher, like the kernels
            pred = term_key_matcher(mt_mode, mt_args, mt_field)
            parts = [
                tb.decode_all()[0] for t, tb in seg.terms.items() if pred(t)
            ]
            docs = np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
            docs = docs[seg.live_mask(docs)]
            return pd.DataFrame({"doc_id": (docs + seg.doc_base).astype("int64")})

        per_seg = self._per_segment(
            None,
            kernel,
            "doc_id long",
            term_pred=self._term_predicate(mode, *args, field=field),
        )
        return self._with_url(per_seg, ["doc_id", "url"])

    def field_exists_docs(self, field: str = ""):
        """FieldExistsQuery (``search/FieldExistsQuery.java``): docs
        with >=1 indexed token of ``field`` — evaluated off the
        per-field NORMS blobs (a doc has a norm iff the field produced
        terms), one mapInPandas over the norms table, no postings
        touched. DataFrame (doc_id, url)."""
        import os as _os

        import pyspark.sql.functions as F

        index_dir = self.index_dir
        kfield = field
        norms = self.spark.read.parquet(_os.path.join(index_dir, "norms")).where(
            F.col("segment_id").isin(list(self.live_segments))
        )
        if "field" in norms.columns:
            norms = norms.where(F.col("field") == kfield)
        elif kfield:
            norms = norms.where(F.lit(False))

        def gen(iterator):
            import pandas as pd
            import pyarrow.parquet as pq

            for pdf in iterator:
                for rec in pdf.itertuples(index=False):
                    arr = np.frombuffer(rec.norms_bin, dtype=np.uint8)
                    docs = np.flatnonzero(arr > 0).astype(np.int64)
                    # honor liveDocs tombstones
                    del_path = _os.path.join(
                        index_dir, "deletes", f"segment_id={rec.segment_id}",
                        "data.parquet",
                    )
                    if _os.path.exists(del_path):
                        dead = np.asarray(
                            pq.read_table(del_path)["local_id"].to_pylist(),
                            dtype=np.int64,
                        )
                        live = np.ones(arr.size, dtype=bool)
                        live[dead] = False
                        docs = docs[live[docs]]
                    yield pd.DataFrame(
                        {"doc_id": (docs + int(rec.doc_base)).astype("int64")}
                    )

        per_seg = norms.select("segment_id", "doc_base", "norms_bin").mapInPandas(
            gen, schema="doc_id long"
        )
        return self._with_url(per_seg, ["doc_id", "url"])

    def multi_term_topk(
        self,
        mode: str,
        *args,
        k: int = 10,
        field: str = "",
        max_expansions: int = 1024,
        dtype: str = "f32",
    ):
        """Scored MultiTermQuery rewrite (``TopTermsRewrite`` +
        ``IndexSearcher.maxClauseCount=1024``): expand to at most
        ``max_expansions`` highest-docFreq terms, score as a boolean
        SHOULD of TermQueries, return top-k (doc_id, score, url)."""
        terms = self.expand_terms(
            mode, *args, field=field, max_expansions=max_expansions
        )
        if not terms:
            q: "ast_mod.Query" = ast_mod.MatchNoDocsQuery()
        else:
            q = ast_mod.BooleanQuery(
                should=tuple(ast_mod.TermQuery(t) for t in terms),
                min_should_match=1,
            )
        return self.search(q, k=k, pruned=True, dtype=dtype)

    # ---- knn vector search ----------------------------------------------
    def knn(
        self,
        qvec,
        k: int = 10,
        ef_search: int = 128,
        quantized: bool = False,
    ):
        """KnnFloatVectorQuery over the index's per-segment HNSW graphs
        (``search/KnnFloatVectorQuery.java`` / ``AbstractKnnVectorQuery``
        fan-out-and-merge; graphs built at flush by
        ``IndexConfig.knn_vector_col``): one task per live segment
        loads its graph, applies the segment's liveDocs tombstones as
        the acceptOrds mask (deleted docs never enter results; the
        graph still routes through them — ``HnswGraphSearcher``'s
        filtered contract), beams, re-scores hits from raw floats with
        the sequential f64 fold, and emits its local top-k; the only
        exchange is the ``<= segments*k``-row global rank, resolved to
        urls by a broadcast docmap probe.

        Returns (doc_id, score, url), score = cosine, ties by doc_id.
        """
        import math as _math

        import pyspark.sql.functions as F

        from lucene_spark.index.deletes import _read_deletes
        from lucene_spark.ops import hnsw
        from lucene_spark.ops.ann import py_sq_norm

        if self.commit.get("knn_vector_col") is None:
            raise ValueError("index was not built with knn_vector_col")
        index_dir = self.index_dir
        seg_meta = {
            s["segment_id"]: int(s["doc_base"])
            for s in self.commit["segments"]
        }
        kq = [float(x) for x in qvec]
        qn = _math.sqrt(py_sq_norm(kq))
        kk, kef, kquant = int(k), int(ef_search), bool(quantized)

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                for sid, base in zip(pdf["segment_id"], pdf["doc_base"]):
                    g = hnsw._load_graph(
                        os.path.join(index_dir, "knn", f"segment_id={sid}")
                    )
                    if kquant:
                        g.quantize()
                    dead = _read_deletes(index_dir, str(sid))
                    mask = None
                    if dead.size:
                        mask = ~np.isin(g.ids - int(base), dead)
                    slots = hnsw.search_np(g, kq, kef, allowed=mask)
                    rows = []
                    for s in slots:
                        emb = g.vecs[int(s)]
                        cos = hnsw.py_dot(emb, kq) / (
                            _math.sqrt(py_sq_norm(emb)) * qn
                        )
                        rows.append((int(g.ids[int(s)]), cos))
                    rows.sort(key=lambda r: (-r[1], r[0]))
                    yield pd.DataFrame(
                        rows[:kk], columns=["doc_id", "score"]
                    ).astype({"doc_id": "int64", "score": "float64"})

        segs = sorted(self.live_segments)
        seed = self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(
                [(sid, seg_meta[sid]) for sid in segs], max(1, len(segs))
            ),
            "segment_id string, doc_base long",
        )
        topk = (
            seed.mapInPandas(kernel, "doc_id long, score double")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(kk)
        )
        return (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    # ---- suggest ---------------------------------------------------------
    def suggest(self, prefix: str, k: int = 10, field: str = ""):
        """Prefix completion from the term dictionary — the
        ``suggest`` module's dictionary-backed role
        (``lucene/suggest/.../FreqTermsEnum`` over the index terms,
        weight = docFreq): top-k terms starting with the normalized
        prefix, ranked (doc_freq desc, term asc).

        Plan shape: the sargable ``term >= p AND term < p+1`` range
        pushes to the parquet term-dictionary row-group stats
        (BlockTree seek analog), one partial-aggregated groupBy over
        the matching dictionary rows, TakeOrdered(k). No postings are
        touched."""
        import pyspark.sql.functions as F

        p = self.analyzer.normalize(prefix)
        key_pref = (field + ast_mod.FIELD_SEP + p) if field else p
        rows = self.term_stats.where(
            F.col("segment_id").isin(list(self.live_segments))
        )
        if key_pref:
            hi = key_pref[:-1] + chr(ord(key_pref[-1]) + 1)
            rows = rows.where(
                (F.col("term") >= key_pref) & (F.col("term") < hi)
            )
        if not field:
            # default-field keys carry no separator; a bare-prefix range
            # may sweep in "<fieldname>\x1f..." keys of a field whose
            # NAME shares the prefix
            rows = rows.where(~F.col("term").contains(ast_mod.FIELD_SEP))
        out = (
            rows.groupBy("term")
            .agg(F.sum("doc_freq").alias("doc_freq"))
            .orderBy(F.desc("doc_freq"), F.asc("term"))
            .limit(k)
        )
        if field:
            out = out.select(
                F.expr(f"substring(term, {len(field) + 2})").alias("term"),
                "doc_freq",
            )
        return out

    # ---- more-like-this --------------------------------------------------
    def more_like_this_terms(
        self,
        text: str,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
    ):
        """Interesting-term selection of ``queries/mlt/MoreLikeThis.java``
        (``retrieveTerms``/``createQueue``): analyze the source text,
        keep terms with tf >= minTermFreq and corpus df >= minDocFreq,
        score tf * idf with the ClassicSimilarity idf
        ``ln((docCount+1)/(df+1)) + 1`` (``TFIDFSimilarity.idf``), and
        return the top ``maxQueryTerms`` as [(term, score)].

        Determinism contract (divergence from the reference, by
        design): scores are float64 and ties break (score desc, term
        asc) — the reference's float32 PriorityQueue breaks ties by
        hash-map iteration order, which is not reproducible; this
        engine's rule is total and oracle-mirrorable."""
        import math as _math

        toks, _pos = self.analyzer.tokenize_one(text)
        tf: dict = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        cand = {t: f for t, f in tf.items() if f >= min_term_freq}
        if not cand:
            return []
        stats = self.global_term_stats(set(cand))
        n = int(self.commit["doc_count"])
        scored = []
        for t, f in cand.items():
            df = int(stats.get(t, (0, 0))[0])
            if df < min_doc_freq:
                continue
            idf = _math.log((n + 1) / (df + 1.0)) + 1.0
            scored.append((t, float(f) * idf))
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:max_query_terms]

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        boost: bool = False,
        dtype: str = "f64",
    ):
        """MoreLikeThis ``like(Reader)``: interesting-term selection →
        boolean SHOULD of TermQueries in selection order (clause order
        fixes the score accumulation order, the engine's standing
        float contract) → BM25 top-k. ``boost=True`` boosts each
        clause by score/bestScore (``MoreLikeThis.setBoost``)."""
        sel = self.more_like_this_terms(
            text, max_query_terms, min_term_freq, min_doc_freq
        )
        if not sel:
            return self.spark.createDataFrame(
                [], "doc_id long, score double, url string"
            )
        if boost:
            best = sel[0][1]
            clauses = tuple(
                ast_mod.BoostQuery(ast_mod.TermQuery(t), s / best)
                for t, s in sel
            )
        else:
            clauses = tuple(ast_mod.TermQuery(t) for t, _ in sel)
        q = ast_mod.BooleanQuery(should=clauses, min_should_match=1)
        return self.search(q, k=k, pruned=True, dtype=dtype)

    # ---- combined fields (BM25F) ------------------------------------------
    def combined_field_scores_df(self, term: str, fields):
        """CombinedFieldQuery (``search/CombinedFieldQuery.java`` +
        ``MultiNormsLeafSimScorer.java``): score a term across several
        weighted fields as if they were ONE field (BM25F).

        Pseudo term stats: df = max over fields, ttf = long-accumulated
        sum of weight*ttf (``CombinedFieldQuery.java:274-291``). Pseudo
        collection stats: docCount = max over fields, sumTotalTermFreq
        = long-accumulated sum of weight*fieldSum
        (``mergeCollectionStatistics``). Per doc: freq = sum of
        weight*tf in field order (``CombinedFieldScorer.freq``), norm =
        intToByte4(floor(sum of weight*LENGTH_TABLE[norm_f] + 0.5))
        (``MultiFieldNormValues.advanceExact`` — Math.round). Float64
        mirror throughout (the oracle-parity dtype).

        ``fields``: [(field_name, weight), ...] — '' = default field.
        Returns (doc_id, url, score) for every matching live doc."""
        import pyspark.sql.functions as F

        from lucene_spark.search.scoring import ScorerF64, idf_f64
        from lucene_spark.similarity.bm25 import LENGTH_TABLE
        from lucene_spark.util.smallfloat import int_to_byte4_np

        t = self.analyzer.normalize(term)
        keys = [ast_mod.fielded(f, t) for f, _ in fields]
        weights = [float(w) for _, w in fields]
        tstats = self.global_term_stats(set(keys))
        gs = self._global_stats(tstats)
        df = 0
        ttf = 0
        for key, w in zip(keys, weights):
            if key in tstats:
                df = max(df, tstats[key][0])
                ttf = int(ttf + w * tstats[key][1])  # Java long += double
        if df == 0:
            return self.spark.createDataFrame(
                [], "doc_id long, url string, score double"
            )
        doc_count = 0
        sum_ttf = 0
        for (f, w) in fields:
            fs = (gs.field_stats or {}).get(
                f, (gs.doc_count, gs.sum_total_tf)
            )
            doc_count = max(doc_count, int(fs[0]))
            sum_ttf = int(sum_ttf + w * fs[1])
        scorer = ScorerF64(idf_f64(df, doc_count), sum_ttf / float(doc_count))
        index_dir = self.index_dir
        kk, kw = keys, weights

        def kernel(key, pdf):
            import pandas as pd

            empty = pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
            if pdf.empty:
                return empty
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            per_field = []
            for fkey in kk:
                tb = seg.term_blocks(fkey)
                per_field.append(
                    tb.decode_all() if tb is not None else None
                )
            if all(x is None for x in per_field):
                return empty
            uniq = np.unique(
                np.concatenate([d for x in per_field if x is not None for d in [x[0]]])
            )
            freq = np.zeros(uniq.size, dtype=np.float64)
            raw_len = np.zeros(uniq.size, dtype=np.float64)
            lt = LENGTH_TABLE.astype(np.float64)
            for fkey, w, x in zip(kk, kw, per_field):
                nb = seg.norms_for_term(fkey)
                raw_len += w * lt[nb[uniq].astype(np.uint8)]
                if x is None:
                    continue
                d, f = x
                pos = np.searchsorted(uniq, d)
                freq[pos] += w * f.astype(np.float64)
            comb_byte = int_to_byte4_np(
                np.floor(raw_len + 0.5).astype(np.int64)
            )
            lm = seg.live_mask(uniq)
            uniq, freq, comb_byte = uniq[lm], freq[lm], comb_byte[lm]
            s = scorer.score(freq, comb_byte)
            return pd.DataFrame(
                {
                    "doc_id": (uniq + seg.doc_base).astype("int64"),
                    "score": np.asarray(s, dtype=np.float64),
                }
            )

        per_seg = self._per_segment(
            set(keys), kernel, "doc_id long, score double"
        )
        return (
            self.docmap.join(F.broadcast(per_seg), "doc_id")
            .select("doc_id", "url", "score")
            .orderBy("doc_id")
        )

    # ---- pagination -------------------------------------------------------
    def search_after(self, query, after, k: int = 10, dtype: str = "f64"):
        """``IndexSearcher.searchAfter(ScoreDoc, Query, n)`` — keyset
        pagination by the total (score desc, doc asc) rank cursor.
        ``after`` = (score, doc_id) of the previous page's last hit;
        returns the next ``k`` (doc_id, score, url).

        v1 scores the inner matches exhaustively (the function-score
        cost class): the pruned kernels' heaps carry no cursor
        predicate, and a per-segment top-k WITHOUT the cursor can hide
        after-cursor hits behind before-cursor ones. The cursor filter
        applies before rank truncation, so pages compose exactly:
        page2 == rows k+1..2k of the unpaginated rank
        (``TopScoreDocCollector.java`` PagingTopScoreDocCollector
        semantics)."""
        import pyspark.sql.functions as F

        s_after, d_after = float(after[0]), int(after[1])
        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        tstats = self.global_term_stats(terms)
        stats = self._global_stats(tstats)
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        kq, kd = q, dtype

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, acc = kernels.score_exhaustive(seg, kq, scorers, kd)
            return pd.DataFrame(
                {
                    "doc_id": (docs + seg.doc_base).astype("int64"),
                    "score": np.asarray(
                        kernels._final_scores(acc, kd), dtype=np.float64
                    ),
                }
            )

        per_seg = self._per_segment(
            terms, kernel, "doc_id long, score double",
            term_pred=self._scan_pred([q], terms),
            ensure_segments=ast_mod.has_termless_match(q),
        )
        nxt = per_seg.where(
            (F.col("score") < F.lit(s_after))
            | (
                (F.col("score") == F.lit(s_after))
                & (F.col("doc_id") > F.lit(d_after))
            )
        )
        topk = nxt.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    # ---- function scoring ------------------------------------------------
    def function_score_df(
        self, query, values, k: int = 10, mode: str = "boost",
        dtype: str = "f64",
    ):
        """FunctionScoreQuery (``queries/function/FunctionScoreQuery.java``).

        ``mode="boost"``: score = inner_score * value — the
        ``FunctionScoreQuery.boostByValue`` composition; ``"replace"``:
        score = value over the inner MATCH SET (the base constructor —
        the wrapped query contributes iteration only,
        ``FunctionScoreQuery.java:58-66``).

        ``values``: DataFrame (doc_id, value) — doc values ARE plain
        columns in this engine (SURVEY §2 DocValues stance), typically
        a two-column pruned scan of the source parquet.

        Scale shape: the reference's FunctionScoreWeight exposes no
        impacts/max-score either, so inner matches are scored
        EXHAUSTIVELY and rank truncation happens after the value
        composition. Per-segment kernels emit the full inner match
        set; the value join runs before the global top-k. At cluster
        scale pass a ``values`` table bucketed on doc_id so the join
        co-locates with the hit exchange."""
        import pyspark.sql.functions as F

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        terms = ast_mod.query_terms(q)
        tstats = self.global_term_stats(terms)
        stats = self._global_stats(tstats)
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        kq, kd = q, dtype

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            docs, acc = kernels.score_exhaustive(seg, kq, scorers, kd)
            return pd.DataFrame(
                {
                    "doc_id": (docs + seg.doc_base).astype("int64"),
                    "score": np.asarray(
                        kernels._final_scores(acc, kd), dtype=np.float64
                    ),
                }
            )

        per_seg = self._per_segment(
            terms, kernel, "doc_id long, score double",
            term_pred=self._scan_pred([q], terms),
            ensure_segments=ast_mod.has_termless_match(q),
        )
        vals = values.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.col("value").cast("double").alias("value"),
        )
        joined = per_seg.join(vals, "doc_id")
        if mode == "boost":
            scored = joined.select(
                "doc_id", (F.col("score") * F.col("value")).alias("score")
            )
        else:
            scored = joined.select("doc_id", F.col("value").alias("score"))
        topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return (
            self.docmap.join(F.broadcast(topk), "doc_id")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    # ---- synonym / dismax scoring ---------------------------------------
    def synonym_scores_df(self, terms, dtype: str = "f64"):
        """SynonymQuery semantics (``search/SynonymQuery.java:211-228``):
        pseudo-term stats df=max(df_i), ttf=sum(ttf_i); per-doc tf = sum
        of member tfs; one BM25 scorer. DataFrame (doc_id, url, score)."""
        from lucene_spark.search.scoring import ScorerF64, idf_f64
        from lucene_spark.similarity import bm25

        terms = [self.analyzer.normalize(t) for t in terms]
        tstats = self.global_term_stats(set(terms))
        if not tstats:
            return self.spark.createDataFrame([], "doc_id long, url string, score double")
        df_max = max(v[0] for v in tstats.values())
        doc_count = int(self.commit["doc_count"])
        sum_total_tf = int(self.commit["sum_total_tf"])
        if dtype == "f32":
            scorer = bm25.BM25Scorer.build(
                bm25.idf(df_max, doc_count), bm25.avgdl(sum_total_tf, doc_count)
            )
        else:
            scorer = ScorerF64(
                idf_f64(df_max, doc_count), sum_total_tf / float(doc_count)
            )
        index_dir = self.index_dir
        kterms = list(terms)

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            agg: dict = {}
            all_docs = []
            all_tfs = []
            for t in kterms:
                tb = seg.term_blocks(t)
                if tb is None:
                    continue
                d, f = tb.decode_all()
                all_docs.append(d)
                all_tfs.append(f)
            if not all_docs:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            d = np.concatenate(all_docs)
            f = np.concatenate(all_tfs)
            uniq, inv = np.unique(d, return_inverse=True)
            tf_sum = np.bincount(inv, weights=f.astype(np.float64)).astype(np.int64)
            lm = seg.live_mask(uniq)
            uniq, tf_sum = uniq[lm], tf_sum[lm]
            s = scorer.score(tf_sum, seg.norms[uniq]).astype(np.float64)
            return pd.DataFrame(
                {"doc_id": (uniq + seg.doc_base).astype("int64"), "score": s}
            )

        per_seg = self._per_segment(set(terms), kernel, "doc_id long, score double")
        return self._with_url(per_seg, ["doc_id", "url", "score"])

    def term_scores_df(self, terms, dtype: str = "f64"):
        """Per (doc, term) BM25 scores for a term set — the building
        block for DataFrame-native score combiners (DisjunctionMax).
        DataFrame (doc_id, term, score)."""
        terms = [self.analyzer.normalize(t) for t in terms]
        q = ast_mod.BooleanQuery(
            should=tuple(ast_mod.TermQuery(t) for t in terms), min_should_match=1
        )
        stats, tset = self._stats_for(q)
        scorers = build_scorers(q, stats, dtype=dtype)
        index_dir = self.index_dir
        kterms = list(dict.fromkeys(terms))

        def kernel(key, pdf):
            import pandas as pd

            out_d, out_t, out_s = [], [], []
            if not pdf.empty:
                seg = _load_segment_view(index_dir, str(key[0]), pdf)
                for t in kterms:
                    tb = seg.term_blocks(t)
                    if tb is None:
                        continue
                    d, f = tb.decode_all()
                    lm = seg.live_mask(d)
                    d, f = d[lm], f[lm]
                    s = scorers[("t", t)].score(f, seg.norms[d]).astype(np.float64)
                    out_d.append((d + seg.doc_base).astype("int64"))
                    out_t.extend([t] * d.size)
                    out_s.append(s)
            import numpy as _np

            return pd.DataFrame(
                {
                    "doc_id": _np.concatenate(out_d) if out_d else _np.empty(0, "int64"),
                    "term": pd.Series(out_t, dtype="object"),
                    "score": _np.concatenate(out_s) if out_s else _np.empty(0, "float64"),
                }
            )

        return self._per_segment(tset, kernel, "doc_id long, term string, score double")

    def similarity_scores_df(self, term: str, make_scorer):
        """Pluggable-Similarity extension point (SURVEY §2.11,
        ``search/similarities/Similarity.java``): scores one term's
        postings with a user-supplied scorer. ``make_scorer(doc_freq,
        doc_count, sum_total_tf)`` must return an object with
        ``score(freqs, norm_bytes)``; rank-safety of block-max pruning
        holds for any monotone similarity because impacts store
        (tf, norm) pairs, not scores. DataFrame (doc_id, url, score)."""
        term = self.analyzer.normalize(term)
        tstats = self.global_term_stats({term})
        df_, _ = tstats.get(term, (0, 0))
        scorer = make_scorer(
            df_, int(self.commit["doc_count"]), int(self.commit["sum_total_tf"])
        )
        index_dir = self.index_dir

        def kernel(key, pdf):
            import pandas as pd

            if pdf.empty:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            seg = _load_segment_view(index_dir, str(key[0]), pdf)
            tb = seg.term_blocks(term)
            if tb is None:
                return pd.DataFrame(
                    {"doc_id": pd.Series([], dtype="int64"),
                     "score": pd.Series([], dtype="float64")}
                )
            docs, tfs = tb.decode_all()
            lm = seg.live_mask(docs)
            docs, tfs = docs[lm], tfs[lm]
            s = np.asarray(scorer.score(tfs, seg.norms[docs]), dtype=np.float64)
            return pd.DataFrame(
                {"doc_id": (docs + seg.doc_base).astype("int64"), "score": s}
            )

        per_seg = self._per_segment({term}, kernel, "doc_id long, score double")
        return self._with_url(per_seg, ["doc_id", "url", "score"])

    def dismax_scores_df(self, terms, tie_breaker: float = 0.0, dtype: str = "f64"):
        """DisjunctionMaxQuery (``search/DisjunctionMaxQuery.java:30-59``):
        score = max(clauses) + tie * sum(non-max clauses). DataFrame
        (doc_id, url, score). With tie=0 the result is float-order-free."""
        import pyspark.sql.functions as F

        per = self.term_scores_df(terms, dtype=dtype)
        agg = per.groupBy("doc_id").agg(
            F.max("score").alias("mx"),
            F.sum("score").alias("sm"),
        )
        score = F.col("mx") + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx"))
        out = agg.select("doc_id", score.alias("score"))
        return self._with_url(out, ["doc_id", "url", "score"])

    # ---- stored fields + highlighting -----------------------------------

    def stored(self):
        """The stored-fields table (``StoredFields`` reader analog) as a
        live-segment-pruned DataFrame, or None when the index was built
        without ``IndexConfig.stored_cols``."""
        import pyspark.sql.functions as F

        path = os.path.join(self.index_dir, "stored")
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path).where(
            F.col("segment_id").isin(list(self.live_segments))
        )

    def get_documents(self, doc_ids):
        """``IndexSearcher.storedFields().document(docID)`` analog for a
        batch of ids: DataFrame of the stored columns for ``doc_ids``.
        The ``doc_id IN (...)`` predicate pushes to parquet row-group
        stats (stored files are doc_id-sorted with 1024-row groups), so
        a top-k fetch reads k-sized byte ranges, never a scan."""
        import pyspark.sql.functions as F

        st = self.stored()
        if st is None:
            raise ValueError(
                "index has no stored fields (IndexConfig.stored_cols)"
            )
        ids = [int(d) for d in doc_ids]
        return st.where(F.col("doc_id").isin(ids)).drop("segment_id")

    def vectors(self):
        """The term-vectors table (``TermVectors`` reader analog,
        ``index/TermVectorsFormat`` role) as a live-segment-pruned
        DataFrame, or None when the index was built without
        ``IndexConfig.vector_fields``. One row per (doc_id, field):
        the analyzed token stream as aligned arrays (terms, positions,
        starts, ends) in stream order."""
        import pyspark.sql.functions as F

        path = os.path.join(self.index_dir, "vectors")
        if not os.path.isdir(path):
            return None
        return self.spark.read.parquet(path).where(
            F.col("segment_id").isin(list(self.live_segments))
        )

    def term_vectors(self, doc_ids, field: str = ""):
        """``TermVectors.get(docID, field)`` analog for a batch of ids:
        DataFrame (doc_id, terms, positions, starts, ends). Docs whose
        field produced no tokens have no row (empty vector). The
        ``doc_id IN (...)`` predicate pushes to the 1024-doc row groups
        — a top-k fetch reads k-sized byte ranges, never a scan."""
        import pyspark.sql.functions as F

        vec = self.vectors()
        if vec is None:
            raise ValueError(
                "index has no term vectors (IndexConfig.vector_fields)"
            )
        ids = [int(d) for d in doc_ids]
        return (
            vec.where(F.col("doc_id").isin(ids))
            .where(F.col("field") == field)
            .select("doc_id", "terms", "positions", "starts", "ends")
        )

    def _postings_token_streams(self, ids, q, field: str) -> dict:
        """doc_id -> (toks, positions, starts, ends, pay_of): reduced
        per-hit token streams of the query's (dictionary-expanded)
        terms, read from offsets-in-postings — the POSTINGS offset
        source of the Matches API (``MatchesIterator.startOffset`` from
        ``PostingsEnum.OFFSETS``; no stored text, no re-analysis).
        k-sized work: one term-pruned pyarrow read per HIT segment."""
        import pyarrow.parquet as pq

        from lucene_spark.search import kernels
        from lucene_spark.search import multiterm as mt

        by_sid: dict = {}
        segs = self.commit["segments"]
        for gid in ids:
            smeta = next(
                (
                    s
                    for s in segs
                    if s["doc_base"] <= gid < s["doc_base"] + s["num_docs"]
                ),
                None,
            )
            if smeta is None:
                raise KeyError(f"doc {gid} is in no live segment")
            by_sid.setdefault(smeta["segment_id"], (smeta, []))[1].append(gid)
        term_keys = sorted(ast_mod.query_terms(q))
        mt_leaves = ast_mod.multi_term_leaves(q)
        pcols = [
            "term", "block_id", "num_docs", "first_doc", "last_doc",
            "docs_bin", "tfs_bin", "pos_bin", "impact_tfs", "impact_norms",
            "off_bin",
        ]
        if "off_bin" not in self.postings.columns:
            raise ValueError(
                "offset_source='postings' needs offsets-in-postings "
                "(IndexConfig.store_offsets)"
            )
        if "pay_bin" in self.postings.columns:
            pcols.append("pay_bin")
        out: dict = {}
        for sid, (smeta, gids) in by_sid.items():
            need = set(term_keys)
            for leaf in mt_leaves:
                filt = mt.arrow_filters(leaf.mode, leaf.args, leaf.field)
                t = pq.read_table(
                    os.path.join(
                        self.index_dir, "term_stats", f"segment_id={sid}"
                    ),
                    columns=["term"],
                    filters=filt,
                )
                pred = mt.term_key_matcher(leaf.mode, leaf.args, leaf.field)
                need.update(x for x in t["term"].to_pylist() if pred(x))
            tbl = pq.read_table(
                os.path.join(self.index_dir, "postings", f"segment_id={sid}"),
                columns=pcols,
                filters=[("term", "in", sorted(need))],
            )
            seg = _load_segment_view(self.index_dir, sid, tbl.to_pandas())
            for gid in gids:
                loc = int(gid - smeta["doc_base"])
                entries: list = []
                pay_of: dict = {}
                for key, tb in seg.terms.items():
                    if ast_mod.field_of(key) != field:
                        continue
                    bare = ast_mod.bare_term(key)
                    d_all, _ = tb.decode_all()
                    j = int(np.searchsorted(d_all, loc))
                    if j >= d_all.size or d_all[j] != loc:
                        continue
                    docs_arr = np.asarray([loc], dtype=np.int64)
                    pos = kernels._positions_for_docs(tb, docs_arr)[0]
                    st, en = kernels._offsets_for_docs(tb, docs_arr)[0]
                    entries.extend(
                        (int(p), bare, int(s), int(e))
                        for p, s, e in zip(pos, st, en)
                    )
                    if tb.has_payloads:
                        pay_of[("pay", bare)] = kernels._payloads_for_docs(
                            tb, docs_arr
                        )[0]
                entries.sort()
                out[int(gid)] = (
                    [t for _, t, _, _ in entries],
                    [p for p, _, _, _ in entries],
                    [s for _, _, s, _ in entries],
                    [e for _, _, _, e in entries],
                    pay_of,
                )
        return out

    def matches(
        self,
        query,
        k: int = 10,
        field: str = "",
        dtype: str = "f32",
        offset_source: str = "analysis",
    ):
        """Structured match spans of the top-k hits — the
        ``Weight.matches`` / ``MatchesIterator`` surface
        (``search/Matches.java``; see ``lucene_spark/search/matches.py``
        for per-family parity notes).  DataFrame (doc_id, url, score,
        matches) in rank order, where ``matches`` is an array of
        structs (start_pos, end_pos, start_off, end_off, label) in
        (startPosition, endPosition) emission order.  The engine's
        kernels decide WHICH docs match (same gate as search); this
        explains WHERE — O(k) work, the corpus is never touched.

        ``offset_source``: "analysis" re-analyzes each hit's stored
        text with the field's chain; "postings" reads positions AND
        character offsets straight from the index's offsets-in-postings
        streams (IndexConfig.store_offsets — the 4th IndexOptions
        level), needing neither stored text nor re-analysis: the
        reference's ``MatchesIterator.startOffset`` over
        ``PostingsEnum.OFFSETS``."""
        import pyspark.sql.functions as F

        from lucene_spark.search.matches import match_spans, match_spans_stream

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        specs = dict(
            (f, s) for f, s in (self.commit.get("field_specs") or [["", self.commit.get("text_col", "text")]])
        )
        if field not in specs:
            raise KeyError(f"unknown field {field!r}; indexed: {sorted(specs)}")
        src_col = specs[field]
        analyzer = self.field_analyzers.get(field, self.analyzer)
        top = self.search(query, k=k, pruned=True, dtype=dtype).collect()
        out_schema = (
            "doc_id long, url string, score double, matches array<struct<"
            "start_pos: int, end_pos: int, start_off: int, end_off: int, "
            "label: string>>"
        )
        if not top:
            return self.spark.createDataFrame([], out_schema)
        ids = [int(r["doc_id"]) for r in top]
        if offset_source not in ("analysis", "postings"):
            raise ValueError(f"unknown offset_source {offset_source!r}")
        if offset_source == "postings":
            streams = self._postings_token_streams(ids, q, field)
            data = []
            for r in top:
                toks, poss, sts, ens, pay_of = streams[int(r["doc_id"])]
                spans = match_spans_stream(
                    toks, poss, sts, ens, q, field=field, pay_of=pay_of
                )
                data.append(
                    (int(r["doc_id"]), r["url"], float(r["score"]), spans)
                )
            return self.spark.createDataFrame(data, out_schema).orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            )
        stored = self.get_documents(ids).select("doc_id", src_col)
        kq, kf, kcol, kan = q, field, src_col, analyzer

        def mt(iterator):
            import pandas as pd

            for pdf in iterator:
                rows = [
                    match_spans(str(t), kq, kan, field=kf)
                    for t in pdf[kcol].astype(str)
                ]
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "matches": rows})

        span_df = stored.mapInPandas(
            mt,
            "doc_id long, matches array<struct<start_pos: int, end_pos: int, "
            "start_off: int, end_off: int, label: string>>",
        )
        hits = self.spark.createDataFrame(
            [(int(r["doc_id"]), r["url"], float(r["score"])) for r in top],
            "doc_id long, url string, score double",
        )
        return (
            hits
            .join(F.broadcast(span_df), "doc_id", "left")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )

    def highlight(
        self,
        query,
        k: int = 10,
        field: str = "",
        max_passages: int = 2,
        passage_tokens: int = 24,
        pre: str = "<b>",
        post: str = "</b>",
        dtype: str = "f32",
        offset_source: str = "auto",
    ):
        """Top-k search + best-passage snippets over the stored source
        column of ``field`` (see ``lucene_spark/search/highlight.py``;
        the ``uhighlight/UnifiedHighlighter.java`` deployment shape).
        DataFrame (doc_id, url, score, snippet), rank order preserved;
        snippet is NULL when no query term occurs in the stored text
        (callers show a document prefix). O(k) work: one top-k search,
        one k-sized stored fetch, k snippet extractions in one Arrow
        batch.

        ``offset_source`` mirrors ``UnifiedHighlighter.OffsetSource``:
        "analysis" re-tokenizes the stored text; "vectors" reads the
        index-time stream from the term-vectors table (k-sized fetch,
        no re-analysis — the win on long docs); "auto" uses vectors
        when the field was indexed with them. Both sources produce
        byte-identical snippets (the vector store IS the analysis-time
        stream)."""
        import pyspark.sql.functions as F

        from lucene_spark.search.highlight import (
            highlight_stream,
            highlight_text,
        )

        q = self.parse(query) if isinstance(query, str) else ast_mod.rewrite(query)
        specs = dict(
            (f, s) for f, s in (self.commit.get("field_specs") or [["", self.commit.get("text_col", "text")]])
        )
        if field not in specs:
            raise KeyError(f"unknown field {field!r}; indexed: {sorted(specs)}")
        src_col = specs[field]
        analyzer = self.field_analyzers.get(field, self.analyzer)
        top = self.search(query, k=k, pruned=True, dtype=dtype).collect()
        if not top:
            return self.spark.createDataFrame(
                [], "doc_id long, url string, score double, snippet string"
            )
        ids = [int(r["doc_id"]) for r in top]
        if offset_source not in ("auto", "analysis", "vectors"):
            raise ValueError(f"unknown offset_source {offset_source!r}")
        use_vec = offset_source == "vectors" or (
            offset_source == "auto"
            and field in (self.commit.get("vector_fields") or ())
            and self.vectors() is not None
        )
        if use_vec and (
            self.vectors() is None
            or field not in (self.commit.get("vector_fields") or ())
        ):
            raise ValueError(
                f"field {field!r} has no term vectors "
                "(IndexConfig.vector_fields)"
            )
        stored = self.get_documents(ids).select("doc_id", src_col)
        if use_vec:
            stored = stored.join(
                self.term_vectors(ids, field=field), "doc_id", "left"
            )
        kq, kf, kcol = q, field, src_col
        kmax, ktok, kpre, kpost = max_passages, passage_tokens, pre, post

        def hl(iterator):
            import pandas as pd

            for pdf in iterator:
                if use_vec:
                    def _lst(v, conv=None):
                        # left-join nulls arrive as None (object) or NaN
                        if v is None or (isinstance(v, float) and v != v):
                            return []
                        return list(v) if conv is None else [conv(x) for x in v]

                    snips = [
                        highlight_stream(
                            str(t),
                            _lst(tv, str),
                            _lst(pv, int),
                            _lst(sv, int),
                            _lst(ev, int),
                            kq, field=kf, max_passages=kmax,
                            passage_tokens=ktok, pre=kpre, post=kpost,
                        )
                        for t, tv, pv, sv, ev in zip(
                            pdf[kcol], pdf["terms"], pdf["positions"],
                            pdf["starts"], pdf["ends"],
                        )
                    ]
                else:
                    snips = [
                        highlight_text(
                            t, kq, analyzer, field=kf, max_passages=kmax,
                            passage_tokens=ktok, pre=kpre, post=kpost,
                        )
                        for t in pdf[kcol].astype(str)
                    ]
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "snippet": snips}
                )

        snip_df = stored.mapInPandas(hl, "doc_id long, snippet string")
        hits = self.spark.createDataFrame(
            [(int(r["doc_id"]), r["url"], float(r["score"])) for r in top],
            "doc_id long, url string, score double",
        )
        return (
            hits
            .join(F.broadcast(snip_df), "doc_id", "left")
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        )
