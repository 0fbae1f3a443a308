"""Serving mode: low-latency per-query search without Spark jobs.

``LocalSearcher`` answers queries over a committed index directory with
the SAME parser, scorers, and pruned kernels as the Spark ``Searcher``,
but reads postings through pyarrow with term filters (row-group
min/max pruning over the term-sorted parquet — the BlockTree-seek
analog) instead of launching a Spark job per query. This is the
reference's own deployment model for query serving: one node owns a
shard that fits its storage, opens the immutable segment files, and
seeks terms on demand (``search/IndexSearcher.java`` over a local
``Directory``); Spark remains the build/merge/refresh plane and the
throughput plane (``Searcher.search_many`` for batched query sets).

Latency model: the per-query Spark floor (~0.3-0.5 s of job
scheduling, measured in BENCH.md) drops to the cost of a few pruned
parquet reads (cold) or pure kernel time (warm — term blocks are
cached per segment, the LRUQueryCache analog). Memory: term stats
dictionary + norms (1 byte/doc/field) + cached blocks for queried
terms; the corpus itself is never resident.

Scale note: a 100-TB index is served by MANY LocalSearcher shards
behind a router (doc-partitioned, like Lucene/Solr/ES); each node's
index_dir is one shard's directory. This module is the per-shard
server; sharding/routing is deployment topology, not engine code.
"""

from __future__ import annotations

import os
import threading

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.index.builder import read_latest_commit
from lucene_spark.search import ast as ast_mod
from lucene_spark.search import kernels
from lucene_spark.search.parser import parse
from lucene_spark.search.scoring import GlobalStats, build_scorers
from lucene_spark.search.searcher import _load_segment_view


# ---- process-sharded serving (one node, K worker processes) ----------

_WORKER: "LocalSearcher | None" = None


def _shard_init(index_dir: str, seg_ids: list) -> None:
    # workers do NOT preload the whole-index stats dictionary (K
    # duplicate vocab dicts + K full term_stats scans at open); the
    # parent owns the single preloaded copy and ships each query's
    # k-term stats with the task
    global _WORKER
    _WORKER = LocalSearcher(
        index_dir, segment_ids=seg_ids, workers=1, preload_stats=False
    )


def _shard_search(args):
    q, k, pruned, dtype, threshold, tstats, seed = args
    return _WORKER.search(
        q, k=k, pruned=pruned, dtype=dtype, total_hits_threshold=threshold,
        tstats=tstats, seed_theta=seed,
    )


def _shard_reopen(seg_ids: list) -> int:
    """Re-point the resident worker at the latest commit with a
    (possibly updated) segment assignment, WITHOUT respawning the
    process — warm term-block caches survive for segments whose
    postings + liveDocs are unchanged (LocalSearcher._open retains
    views keyed on (segment_id, del_count))."""
    _WORKER._segment_ids = set(seg_ids)
    _WORKER._open(read_latest_commit(_WORKER.index_dir))
    return os.getpid()


def _shard_count(args):
    q, tstats = args
    return _WORKER.count(q, tstats=tstats)


def _shard_search_many(args):
    """Evaluate a WHOLE query batch against the resident worker — one
    IPC round-trip per pool per batch instead of one per query."""
    items, k, pruned, dtype, threshold, tstats_by_qid = args
    return {
        qid: _WORKER.search(
            q, k=k, pruned=pruned, dtype=dtype,
            total_hits_threshold=threshold, tstats=tstats_by_qid[qid],
        )
        for qid, q in items
    }


def _use_vectors(commit: dict, field: str, offset_source: str) -> bool:
    """Resolve the highlight offset source against the commit's
    ``vector_fields`` (UnifiedHighlighter.getOffsetSource analog)."""
    if offset_source not in ("auto", "analysis", "vectors"):
        raise ValueError(f"unknown offset_source {offset_source!r}")
    has = field in (commit.get("vector_fields") or ())
    if offset_source == "vectors" and not has:
        raise ValueError(
            f"field {field!r} has no term vectors (IndexConfig.vector_fields)"
        )
    return offset_source == "vectors" or (offset_source == "auto" and has)


def _snippet(
    text, q, analyzer, field, use_vec, vec_row, **kw
) -> "str | None":
    """One doc's snippet via the selected offset source. ``vec_row``:
    (terms, positions, starts, ends) from the vectors table, or None
    for an empty vector (doc produced no tokens -> no snippet, same as
    an empty re-analyzed stream)."""
    from lucene_spark.search.highlight import highlight_stream, highlight_text

    if use_vec:
        toks, poss, st, en = vec_row if vec_row is not None else ([], [], [], [])
        return highlight_stream(text, toks, poss, st, en, q, field=field, **kw)
    return highlight_text(text, q, analyzer, field=field, **kw)


class ShardedSearcher:
    """One-node serving across K worker PROCESSES, each owning a
    disjoint subset of the index's segments — the in-miniature form of
    the shard-router deployment (Lucene behind Solr/ES: doc-partitioned
    shards, scatter-gather top-k). Python threads cannot parallelize
    the block kernels (GIL), so heavy queries (dense-term phrases) get
    real CPU scaling only across processes; per-query latency scales
    ~1/K for kernel-bound queries while the merge stays k-sized.

    Same answer contract as LocalSearcher/Searcher: per-shard top-k are
    merged by (score desc, doc asc) — identical to Spark's reduce."""

    def __init__(self, index_dir: str, shards: int | None = None):
        self.index_dir = index_dir
        self._shards = shards
        self._pools: list = []
        # generation-swap lock (SearcherManager acquire/release analog,
        # ``search/SearcherManager.java``): a query's scatter submits
        # to every pool inside one lock window, and refresh() holds the
        # same lock across stats reopen + pool re-pointing, so every
        # query sees ONE commit generation — never a mix of pre- and
        # post-merge segments (which would double-count swapped docs).
        # Workers execute serially (max_workers=1), so a scatter
        # submitted before the reopen batch runs wholly on the old
        # view, one submitted after runs wholly on the new view.
        # Results are gathered OUTSIDE the lock — serving latency only
        # pays the submission window, not shard execution.
        self._swap_lock = threading.RLock()
        # stats-only searcher: whole-index term dictionary, no segments
        self._stats_ls = LocalSearcher(index_dir, segment_ids=[], workers=1)
        self._open(self._stats_ls.commit)

    def _open(self, commit) -> None:
        from concurrent.futures import ProcessPoolExecutor

        self.close()
        segs = sorted(commit["segments"], key=lambda s: s["doc_base"])
        n = min(self._shards or (os.cpu_count() or 4), len(segs)) or 1
        self.commit = commit
        self._pools = []
        self._assign = [
            [s["segment_id"] for s in segs[i::n]] for i in range(n)
        ]
        self._set_champ()
        for ids in self._assign:
            pool = ProcessPoolExecutor(
                max_workers=1,
                initializer=_shard_init,
                initargs=(self.index_dir, ids),
            )
            pool.submit(os.getpid).result()  # force worker start + init
            self._pools.append(pool)

    def _set_champ(self) -> None:
        segs = self.commit["segments"]
        champ = (
            max(segs, key=lambda s: (int(s["num_docs"]), s["segment_id"]))[
                "segment_id"
            ]
            if segs
            else None
        )
        self._champ_pool = 0
        for i, ids in enumerate(self._assign):
            if champ in ids:
                self._champ_pool = i

    def refresh(self) -> bool:
        """Re-open on a new commit generation IN PLACE: worker
        processes are kept alive and re-pointed (``_shard_reopen``)
        rather than respawned. Surviving segments stay on their pool
        (warm caches intact — the NRT-append-every-10s case costs one
        metadata reopen, no process churn); vanished segments (merges)
        drop off; new segments go to the least-loaded pool by resident
        doc count. The pool COUNT rescales too: when a force-merge
        collapses the segment count below the pool count, surplus
        workers fold their surviving segments onto the kept pools and
        shut down; when appends raise the segment count back toward the
        requested shard count, fresh pools spawn and the new segments
        land on them (least-loaded placement finds the empty pools
        first). Kept pools never lose warm segments to a rebalance."""
        with self._swap_lock:
            return self._refresh_locked()

    def _refresh_locked(self) -> bool:
        if not self._stats_ls.refresh():
            return False
        commit = self._stats_ls.commit
        if not self._pools:
            self._open(commit)
            return True
        by_id = {s["segment_id"]: s for s in commit["segments"]}
        n_target = (
            min(self._shards or (os.cpu_count() or 4), len(by_id)) or 1
        )
        assign = [[sid for sid in ids if sid in by_id] for ids in self._assign]
        if n_target < len(assign):
            # fold surplus pools' survivors onto the kept pools
            dropped = [sid for ids in assign[n_target:] for sid in ids]
            assign = assign[:n_target]
            loads = [
                sum(int(by_id[sid]["num_docs"]) for sid in ids)
                for ids in assign
            ]
            for sid in sorted(
                dropped, key=lambda s: (-int(by_id[s]["num_docs"]), s)
            ):
                i = min(range(len(loads)), key=lambda j: (loads[j], j))
                assign[i].append(sid)
                loads[i] += int(by_id[sid]["num_docs"])
        elif n_target > len(assign):
            assign += [[] for _ in range(n_target - len(assign))]
        placed = {sid for ids in assign for sid in ids}
        loads = [
            sum(int(by_id[sid]["num_docs"]) for sid in ids) for ids in assign
        ]
        fresh = sorted(
            (s for s in commit["segments"] if s["segment_id"] not in placed),
            key=lambda s: (-int(s["num_docs"]), s["segment_id"]),
        )
        for s in fresh:
            i = min(range(len(loads)), key=lambda j: (loads[j], j))
            assign[i].append(s["segment_id"])
            loads[i] += int(s["num_docs"])
        self.commit = commit
        self._assign = assign
        self._set_champ()
        # reconcile the pool list with the target count
        from concurrent.futures import ProcessPoolExecutor

        while len(self._pools) > n_target:
            self._pools.pop().shutdown()
        futs = [
            p.submit(_shard_reopen, ids)
            for p, ids in zip(self._pools, assign)
        ]
        for f in futs:
            f.result()
        for ids in assign[len(self._pools):]:
            pool = ProcessPoolExecutor(
                max_workers=1,
                initializer=_shard_init,
                initargs=(self.index_dir, ids),
            )
            pool.submit(os.getpid).result()
            self._pools.append(pool)
        return True

    def worker_pids(self) -> list:
        """Resident worker process ids, pool order (observability +
        the refresh-reuse test hook)."""
        return [p.submit(os.getpid).result() for p in self._pools]

    def search(
        self,
        query,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
        share_theta: bool = False,
    ) -> list:
        """``share_theta=True`` runs the champion shard (the one owning
        the largest segment) first and publishes its kth score as the
        other shards' theta seed (``MaxScoreAccumulator`` across
        processes). Trades one shard's latency for less decode work in
        the rest — right for throughput-bound fleets; the default
        all-parallel mode stays optimal for single-query latency."""
        with self._swap_lock:
            tstats = self._query_stats(query)
            base = (query, k, pruned, dtype, total_hits_threshold, tstats)
            if share_theta and pruned and len(self._pools) > 1:
                rows0 = self._pools[self._champ_pool].submit(
                    _shard_search, base + (-np.inf,)
                ).result()
                seed = (
                    kernels.seed_below(float(rows0[k - 1][1]), dtype)
                    if k > 0 and len(rows0) >= k
                    else -np.inf
                )
                futs = [
                    p.submit(_shard_search, base + (seed,))
                    for i, p in enumerate(self._pools)
                    if i != self._champ_pool
                ]
            else:
                rows0 = []
                futs = [
                    p.submit(_shard_search, base + (-np.inf,))
                    for p in self._pools
                ]
        rows = rows0 + [r for f in futs for r in f.result()]
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def count(self, query) -> int:
        with self._swap_lock:
            args = (query, self._query_stats(query))
            futs = [p.submit(_shard_count, args) for p in self._pools]
        return sum(f.result() for f in futs)

    def search_many(
        self,
        queries,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
    ) -> dict:
        """Batched serving: the whole query set ships to each pool in
        ONE submit (per-query scatter costs an IPC round-trip each; a
        batch amortizes it — the serving analog of
        ``Searcher.search_many``). Returns {query_id: [(doc_id, score,
        url)]} with the per-query contract identical to ``search``.
        ``queries``: list of query strings/ASTs, or {query_id: query}."""
        if not isinstance(queries, dict):
            queries = {str(i): q for i, q in enumerate(queries)}
        with self._swap_lock:
            tstats = {
                qid: self._query_stats(q) for qid, q in queries.items()
            }
            args = (
                list(queries.items()), k, pruned, dtype,
                total_hits_threshold, tstats,
            )
            futs = [p.submit(_shard_search_many, args) for p in self._pools]
        per_pool = [f.result() for f in futs]
        out: dict = {}
        for qid in queries:
            rows = [r for d in per_pool for r in d[qid]]
            rows.sort(key=lambda r: (-r[1], r[0]))
            out[qid] = rows[:k]
        return out

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
    ) -> list:
        """[(doc_id, score, url, snippet)] — scatter-gather top-k, then
        snippets extracted in the parent over k stored-field reads (the
        stored table is shared storage; snippet work is O(k), no reason
        to ship it to shard workers). Same signature and contract as
        ``LocalSearcher.highlight`` (incl. ``offset_source``)."""
        ls = self._stats_ls
        q = (
            ls.parse(query)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        specs = dict(
            (f, s)
            for f, s in (
                ls.commit.get("field_specs")
                or [["", ls.commit.get("text_col", "text")]]
            )
        )
        if field not in specs:
            raise KeyError(f"unknown field {field!r}; indexed: {sorted(specs)}")
        src_col = specs[field]
        analyzer = ls.field_analyzers.get(field, ls.analyzer)
        top = self.search(query, k=k, dtype=dtype)
        if not top:
            return []
        # the stats searcher owns NO segments; read stored fields across
        # all live segments explicitly (no shared-state mutation)
        ids = [d for d, _, _ in top]
        docs = {
            r["doc_id"]: r
            for r in ls.documents(ids, segments=ls.all_segments)
        }
        use_vec = _use_vectors(ls.commit, field, offset_source)
        vecs = (
            ls.term_vectors(ids, field=field, segments=ls.all_segments)
            if use_vec
            else {}
        )
        return [
            (
                d,
                sc,
                url,
                _snippet(
                    str(docs[d][src_col]), q, analyzer, field,
                    use_vec, vecs.get(d),
                    max_passages=max_passages,
                    passage_tokens=passage_tokens, pre=pre, post=post,
                )
                if d in docs
                else None,
            )
            for d, sc, url in top
        ]

    def _query_stats(self, query) -> dict:
        q = (
            self._stats_ls.parse(query)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        return self._stats_ls.global_term_stats(ast_mod.query_terms(q))

    def close(self) -> None:
        with getattr(self, "_swap_lock", threading.RLock()):
            for p in self._pools:
                p.shutdown()


class LocalSearcher:
    """Per-shard query server over an index directory (no Spark)."""

    def __init__(
        self,
        index_dir: str,
        analyzer: Analyzer | None = None,
        preload_stats: bool = True,
        workers: int | None = None,
        segment_ids: "list | None" = None,
    ):
        """``workers``: segment-level thread parallelism per query —
        overlaps the pyarrow I/O of cold term loads, but NOT the block
        kernels (pure-Python loops hold the GIL); use ShardedSearcher
        for CPU scaling. ``segment_ids``: restrict this searcher to a
        subset of the commit's segments (a ShardedSearcher worker's
        slice); global stats stay whole-index (scores must not depend
        on the sharding)."""
        self.index_dir = index_dir
        self.workers = int(workers) if workers else (os.cpu_count() or 4)
        self._segment_ids = (
            set(segment_ids) if segment_ids is not None else None
        )
        self._views: dict = {}  # sid -> SegmentView (terms fill lazily)
        self._missing: set = set()  # (sid, term) negative cache
        self._has_payloads: "bool | None" = None  # lazy schema probe
        self._has_offsets: bool = False
        self._stats: dict | None = None
        self._analyzer = analyzer
        self._preload = preload_stats
        self._open(read_latest_commit(index_dir))

    def _open(self, commit) -> None:
        self.commit = commit
        if self._analyzer is None:
            sw = frozenset(commit.get("stopwords", []))
            self.analyzer = Analyzer(stopwords=sw)
        else:
            self.analyzer = self._analyzer
        self.field_analyzers = {
            f: Analyzer(stopwords=frozenset(sw))
            for f, sw in (commit.get("field_stopwords") or {}).items()
        }
        self.all_segments = sorted(
            commit["segments"], key=lambda s: s["doc_base"]
        )
        self.segments = [
            s
            for s in self.all_segments
            if self._segment_ids is None or s["segment_id"] in self._segment_ids
        ]
        # warm-cache retention across refresh: a segment's postings are
        # immutable once written and its liveDocs state is summarized by
        # the commit's del_count, so views keyed on an unchanged
        # (segment_id, del_count) stay valid — only segments with new
        # deletes (or merged-away ids) drop their cached term blocks
        prev_keys = getattr(self, "_seg_keys", {})
        keys = {
            s["segment_id"]: int(s.get("del_count", 0))
            for s in self.segments
        }
        keep = {sid for sid, dc in keys.items() if prev_keys.get(sid) == dc}
        self._seg_keys = keys
        self._views = {
            sid: v for sid, v in self._views.items() if sid in keep
        }
        self._missing = {
            (sid, t) for (sid, t) in self._missing if sid in keep
        }
        # multi-term expansions are per-segment-dictionary facts; a
        # segment's dictionary is immutable once written, so retain by
        # surviving segment id (deletes don't change the dictionary)
        self._mt_cache = {
            k: v
            for k, v in getattr(self, "_mt_cache", {}).items()
            if k[0] in keys
        }
        # knn graphs are immutable per segment id (deletes are a
        # per-query mask, not graph state) — retain by surviving id
        self._knn_cache = {
            k: v
            for k, v in getattr(self, "_knn_cache", {}).items()
            if k[0] in keys
        }
        self._stats = self._load_stats() if self._preload else None

    def refresh(self) -> bool:
        """SearcherManager.maybeRefresh: re-open the latest commit."""
        latest = read_latest_commit(self.index_dir)
        if latest["generation"] == self.commit["generation"]:
            return False
        self._open(latest)
        return True

    # ---- stats --------------------------------------------------------
    def _load_stats(self) -> dict:
        import pyarrow.parquet as pq

        out: dict = {}
        for s in self.all_segments:
            t = pq.read_table(
                os.path.join(
                    self.index_dir, "term_stats",
                    f"segment_id={s['segment_id']}",
                ),
                columns=["term", "doc_freq", "total_tf"],
            )
            terms = t["term"].to_pylist()
            dfs = t["doc_freq"].to_numpy()
            tfs = t["total_tf"].to_numpy()
            for term, df, ttf in zip(terms, dfs, tfs):
                cur = out.get(term)
                if cur is None:
                    out[term] = [int(df), int(ttf)]
                else:
                    cur[0] += int(df)
                    cur[1] += int(ttf)
        return out

    def global_term_stats(self, terms) -> dict:
        if self._stats is not None:
            return {
                t: tuple(self._stats[t]) for t in terms if t in self._stats
            }
        import pyarrow.parquet as pq

        out: dict = {}
        tl = list(terms)
        if not tl:
            return out
        for s in self.all_segments:
            t = pq.read_table(
                os.path.join(
                    self.index_dir, "term_stats",
                    f"segment_id={s['segment_id']}",
                ),
                columns=["term", "doc_freq", "total_tf"],
                filters=[("term", "in", tl)],
            )
            for term, df, ttf in zip(
                t["term"].to_pylist(),
                t["doc_freq"].to_numpy(),
                t["total_tf"].to_numpy(),
            ):
                cur = out.setdefault(term, [0, 0])
                cur[0] += int(df)
                cur[1] += int(ttf)
        return {t: tuple(v) for t, v in out.items()}

    def _global_stats(self, tstats: dict) -> GlobalStats:
        fields = self.commit.get("fields") or None
        field_stats = (
            {
                f: (int(st["doc_count"]), int(st["sum_total_tf"]))
                for f, st in fields.items()
            }
            if fields
            else None
        )
        return GlobalStats(
            doc_count=int(self.commit["doc_count"]),
            sum_total_tf=int(self.commit["sum_total_tf"]),
            doc_freq={t: v[0] for t, v in tstats.items()},
            field_stats=field_stats,
        )

    # ---- segment views (lazy, cached term blocks) ---------------------
    def _view(self, seg: dict, terms):
        import pandas as pd
        import pyarrow.parquet as pq

        sid = seg["segment_id"]
        view = self._views.get(sid)
        need = [
            t
            for t in terms
            if (view is None or t not in view.terms)
            and (sid, t) not in self._missing
        ]
        if view is None or need:
            cols = [
                "term", "block_id", "num_docs", "first_doc", "last_doc",
                "docs_bin", "tfs_bin", "pos_bin", "impact_tfs",
                "impact_norms",
            ]
            if need:
                pdir = os.path.join(
                    self.index_dir, "postings", f"segment_id={sid}"
                )
                if self._has_payloads is None:
                    names = {f.name for f in pq.ParquetDataset(pdir).schema}
                    self._has_payloads = "pay_bin" in names
                    self._has_offsets = "off_bin" in names
                if self._has_payloads:
                    cols.append("pay_bin")
                if self._has_offsets:
                    cols.append("off_bin")
                tbl = pq.read_table(
                    pdir,
                    columns=cols,
                    filters=[("term", "in", need)],
                )
                pdf = tbl.to_pandas()
            else:
                pdf = pd.DataFrame(columns=cols)
            fresh = _load_segment_view(self.index_dir, sid, pdf)
            if view is None:
                view = fresh
                self._views[sid] = view
            else:
                view.terms.update(fresh.terms)
            for t in need:
                if t not in view.terms:
                    self._missing.add((sid, t))
        return view

    def _expand_multi_term(self, seg: dict, leaves) -> set:
        """Terms of one segment's dictionary matching any MultiTermQuery
        leaf (the rewrite step of ``MultiTermQuery.java``, against the
        per-segment term_stats parquet — the term dictionary file).
        Sargable modes (prefix/range/in_set) prune the read with
        pyarrow row-group filters; others read the term column and
        post-filter. Cached per (segment, leaf) — the dictionary is
        immutable once the segment is written."""
        import pyarrow.parquet as pq

        from lucene_spark.search import multiterm

        sid = seg["segment_id"]
        out: set = set()
        for leaf in leaves:
            key = (sid, leaf)
            hit = self._mt_cache.get(key)
            if hit is None:
                filt = multiterm.arrow_filters(
                    leaf.mode, leaf.args, leaf.field
                )
                t = pq.read_table(
                    os.path.join(
                        self.index_dir, "term_stats", f"segment_id={sid}"
                    ),
                    columns=["term"],
                    filters=filt,
                )
                pred = multiterm.term_key_matcher(
                    leaf.mode, leaf.args, leaf.field
                )
                hit = frozenset(
                    t for t in t["term"].to_pylist() if pred(t)
                )
                self._mt_cache[key] = hit
            out |= hit
        return out

    def expand_terms(
        self,
        mode: str,
        *args,
        field: str = "",
        max_expansions: "int | None" = None,
    ) -> list:
        """MultiTermQuery expansion against the per-segment term
        dictionaries (union) — the serving mirror of
        ``Searcher.expand_terms``. ``max_expansions`` keeps the
        highest-GLOBAL-docFreq terms (TopTermsRewrite order)."""
        from lucene_spark.search import ast as _ast

        leaf = _ast.MultiTermQuery(mode, tuple(args), field)
        out: set = set()
        for seg in self.segments:
            out |= self._expand_multi_term(seg, (leaf,))
        if max_expansions is not None and len(out) > int(max_expansions):
            stats = self.global_term_stats(out)
            ranked = sorted(
                out, key=lambda t: (-stats.get(t, (0, 0))[0], t)
            )
            out = set(ranked[: int(max_expansions)])
        return sorted(out)

    def scoring_rewrite(self, query, max_expansions: "int | None" = None):
        """SCORING_BOOLEAN_REWRITE on the serving plane — same contract
        as ``Searcher.scoring_rewrite`` (shared core in ast.py)."""
        q = (
            self.parse(query)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        return ast_mod.scoring_boolean_rewrite(
            q,
            lambda n: self.expand_terms(
                n.mode, *n.args, field=n.field, max_expansions=max_expansions
            ),
        )

    def explain(self, query, doc_id: int, dtype: str = "f32") -> dict:
        """IndexSearcher.explain analog: nested score breakdown whose
        root value is bit-identical to ``search``'s score for the doc
        (see search/explain.py)."""
        from lucene_spark.search.explain import explain as _explain

        return _explain(self, query, doc_id, dtype=dtype)

    # ---- query surface ------------------------------------------------
    def parse(self, query: str):
        return parse(query, self.analyzer, self.field_analyzers)

    def search(
        self,
        query,
        k: int = 10,
        pruned: bool = True,
        dtype: str = "f32",
        total_hits_threshold: int = kernels.TOTAL_HITS_THRESHOLD,
        tstats: "dict | None" = None,
        share_theta: bool = True,
        seed_theta: float = -np.inf,
    ) -> list:
        """[(global doc_id, score, url)] — identical contract (values,
        tie-breaks) to ``Searcher.search`` and ``LocalIndex.search``.
        ``tstats``: pre-computed term stats (a ShardedSearcher parent
        ships them so workers skip the stats lookup).

        ``share_theta``: sequential mode visits segments largest-first
        and carries the running kth score into each next segment's
        kernel as a rank-safe theta seed — exactly the reference's
        single-threaded leaf loop, where each ``LeafCollector`` starts
        at the PQ's current minCompetitiveScore
        (``TopScoreDocCollector.java`` + ``IndexSearcher.search``
        sequential leaf order). Results are bit-identical either way.
        ``seed_theta``: an externally supplied starting floor (a
        ShardedSearcher parent publishes the champion shard's kth)."""
        q = (
            parse(query, self.analyzer, self.field_analyzers)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        terms = ast_mod.query_terms(q)
        mt_leaves = ast_mod.multi_term_leaves(q)
        stats = self._global_stats(
            tstats if tstats is not None else self.global_term_stats(terms)
        )
        scorers = build_scorers(q, stats, dtype=dtype)
        shared = {"seed": float(seed_theta)}

        def seg_terms(seg):
            if not mt_leaves:
                return terms
            return terms | self._expand_multi_term(seg, mt_leaves)

        def one(seg):
            view = self._view(seg, seg_terms(seg))
            docs, scores = kernels.search_segment(
                view, q, scorers, k, pruned=pruned, dtype=dtype,
                total_hits_threshold=total_hits_threshold,
                seed_theta=shared["seed"],
            )
            return docs + view.doc_base, np.asarray(scores, dtype=np.float64)

        all_docs = [np.empty(0, np.int64)]
        all_scores = [np.empty(0, np.float64)]
        if self.workers > 1 and len(self.segments) > 1:
            from concurrent.futures import ThreadPoolExecutor

            # views are populated serially first (the cache dict is not
            # thread-safe to MUTATE concurrently); kernels then run in
            # parallel over the immutable views. Theta is read at task
            # start, so concurrent tasks only benefit from seed_theta.
            for seg in self.segments:
                self._view(seg, seg_terms(seg))
            with ThreadPoolExecutor(max_workers=self.workers) as ex:
                for d, s in ex.map(one, self.segments):
                    all_docs.append(d)
                    all_scores.append(s)
        else:
            order = self.segments
            if share_theta and pruned:
                order = sorted(
                    self.segments,
                    key=lambda s: (-int(s["num_docs"]), s["segment_id"]),
                )
            run_docs = np.empty(0, np.int64)
            run_scores = np.empty(0, np.float64)
            for seg in order:
                d, s = one(seg)
                all_docs.append(d)
                all_scores.append(s)
                if share_theta and pruned:
                    run_docs = np.concatenate([run_docs, d])
                    run_scores = np.concatenate([run_scores, s])
                    run_docs, run_scores = kernels.top_k_select(
                        run_docs, run_scores, k
                    )
                    if k > 0 and run_docs.size >= k:
                        shared["seed"] = max(
                            shared["seed"],
                            kernels.seed_below(float(run_scores[-1]), dtype),
                        )
        docs = np.concatenate(all_docs)
        scores = np.concatenate(all_scores)
        docs, scores = kernels.top_k_select(docs, scores, k)
        urls = self._urls_of(docs)
        return [
            (
                int(d),
                float(np.float32(s)) if dtype == "f32" else float(s),
                urls[int(d)],
            )
            for d, s in zip(docs, scores)
        ]

    def knn(
        self,
        qvec,
        k: int = 10,
        ef_search: int = 128,
        quantized: bool = False,
    ) -> list:
        """Serving-plane KnnFloatVectorQuery (no Spark job): the
        sequential leaf loop over this searcher's segments — graphs
        cached across queries (immutable per segment id), tombstones
        applied per query as the acceptOrds mask, hits re-scored from
        raw floats. [(doc_id, score, url)], bit-identical to
        ``Searcher.knn``."""
        import math as _math

        from lucene_spark.index.deletes import _read_deletes
        from lucene_spark.ops import hnsw
        from lucene_spark.ops.ann import py_sq_norm

        if self.commit.get("knn_vector_col") is None:
            raise ValueError("index was not built with knn_vector_col")
        cache = getattr(self, "_knn_cache", None)
        if cache is None:
            cache = self._knn_cache = {}
        q = [float(x) for x in qvec]
        qn = _math.sqrt(py_sq_norm(q))
        rows: list = []
        for s in self.segments:
            sid = s["segment_id"]
            ck = (sid, bool(quantized))
            g = cache.get(ck)
            if g is None:
                g = hnsw._load_graph(
                    os.path.join(self.index_dir, "knn", f"segment_id={sid}")
                )
                if quantized:
                    g.quantize()
                cache[ck] = g
            dead = _read_deletes(self.index_dir, sid)
            mask = None
            if dead.size:
                mask = ~np.isin(g.ids - int(s["doc_base"]), dead)
            slots = hnsw.search_np(g, q, int(ef_search), allowed=mask)
            seg_rows = []
            for sl in slots:
                emb = g.vecs[int(sl)]
                cos = hnsw.py_dot(emb, q) / (
                    _math.sqrt(py_sq_norm(emb)) * qn
                )
                seg_rows.append((int(g.ids[int(sl)]), cos))
            seg_rows.sort(key=lambda r: (-r[1], r[0]))
            rows.extend(seg_rows[:k])
        rows.sort(key=lambda r: (-r[1], r[0]))
        rows = rows[:k]
        urls = self._urls_of(np.asarray([d for d, _ in rows], dtype=np.int64))
        return [(d, sc, urls[d]) for d, sc in rows]

    def count(self, query, tstats: "dict | None" = None) -> int:
        q = (
            parse(query, self.analyzer, self.field_analyzers)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        terms = ast_mod.query_terms(q)
        mt_leaves = ast_mod.multi_term_leaves(q)
        if not terms and not mt_leaves and not ast_mod.has_termless_match(q):
            return 0  # nothing can match: same contract as Searcher.count
        scorers = build_scorers(
            q,
            self._global_stats(
                tstats if tstats is not None else self.global_term_stats(terms)
            ),
            dtype="f32",
        )
        n = 0
        for seg in self.segments:
            tset = (
                terms | self._expand_multi_term(seg, mt_leaves)
                if mt_leaves
                else terms
            )
            view = self._view(seg, tset)
            # score_exhaustive already applies the live mask per leaf
            docs, _ = kernels.score_exhaustive(view, q, scorers, "f32")
            n += int(docs.size)
        return n

    def documents(self, doc_ids, segments=None) -> "list[dict]":
        """Stored-fields retrieval (``StoredFields.document`` analog):
        one dict per found id, doc_id ascending. k pyarrow reads with
        doc_id row-group pruning per owning segment — never a scan.
        ``segments``: optional segment-meta list overriding this
        searcher's (possibly sharded) view — a parent reading on behalf
        of shard workers passes ``all_segments``."""
        import pyarrow.parquet as pq

        ids = sorted(int(d) for d in doc_ids)
        out: list = []
        for s in segments if segments is not None else self.segments:
            lo, hi = int(s["doc_base"]), int(s["doc_base"] + s["num_docs"])
            mine = [d for d in ids if lo <= d < hi]
            if not mine:
                continue
            p = os.path.join(
                self.index_dir, "stored", f"segment_id={s['segment_id']}"
            )
            if not os.path.isdir(p):
                raise ValueError(
                    "index has no stored fields (IndexConfig.stored_cols)"
                )
            t = pq.read_table(p, filters=[("doc_id", "in", mine)])
            out.extend(t.to_pylist())
        out.sort(key=lambda r: r["doc_id"])
        return out

    def term_vectors(self, doc_ids, field: str = "", segments=None) -> dict:
        """Term-vectors retrieval (``TermVectors.get(docID, field)``
        analog): doc_id -> (terms, positions, starts, ends) for docs
        that have a vector of ``field``; docs with an empty stream are
        absent. Same k-sized doc_id row-group-pruned pyarrow reads as
        ``documents``."""
        import pyarrow.parquet as pq

        ids = sorted(int(d) for d in doc_ids)
        out: dict = {}
        for s in segments if segments is not None else self.segments:
            lo, hi = int(s["doc_base"]), int(s["doc_base"] + s["num_docs"])
            mine = [d for d in ids if lo <= d < hi]
            if not mine:
                continue
            p = os.path.join(
                self.index_dir, "vectors", f"segment_id={s['segment_id']}"
            )
            if not os.path.isdir(p):
                raise ValueError(
                    "index has no term vectors (IndexConfig.vector_fields)"
                )
            t = pq.read_table(
                p, filters=[("doc_id", "in", mine), ("field", "=", field)]
            )
            for r in t.to_pylist():
                out[int(r["doc_id"])] = (
                    r["terms"], r["positions"], r["starts"], r["ends"]
                )
        return out

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
    ) -> list:
        """[(doc_id, score, url, snippet)] — the serving-plane mirror of
        ``Searcher.highlight`` (same passage selection; snippet None
        when no stored-text match). ``offset_source``: "analysis"
        re-tokenizes stored text, "vectors" reads the index-time stream
        (k-sized pyarrow fetch, no re-analysis), "auto" prefers vectors
        when the field has them — both byte-identical."""
        q = (
            parse(query, self.analyzer, self.field_analyzers)
            if isinstance(query, str)
            else ast_mod.rewrite(query)
        )
        specs = dict(
            (f, s)
            for f, s in (
                self.commit.get("field_specs")
                or [["", self.commit.get("text_col", "text")]]
            )
        )
        if field not in specs:
            raise KeyError(f"unknown field {field!r}; indexed: {sorted(specs)}")
        src_col = specs[field]
        analyzer = self.field_analyzers.get(field, self.analyzer)
        top = self.search(query, k=k, dtype=dtype)
        if not top:
            return []
        ids = [d for d, _, _ in top]
        docs = {r["doc_id"]: r for r in self.documents(ids)}
        use_vec = _use_vectors(self.commit, field, offset_source)
        vecs = self.term_vectors(ids, field=field) if use_vec else {}
        return [
            (
                d,
                sc,
                url,
                _snippet(
                    str(docs[d][src_col]), q, analyzer, field,
                    use_vec, vecs.get(d),
                    max_passages=max_passages,
                    passage_tokens=passage_tokens, pre=pre, post=post,
                )
                if d in docs
                else None,
            )
            for d, sc, url in top
        ]

    def _urls_of(self, docs: np.ndarray) -> dict:
        """doc_id -> url via per-segment doc_id-filtered docmap reads
        (row groups are doc_id-sorted; k lookups, not a table scan)."""
        import pyarrow.parquet as pq

        out: dict = {}
        if docs.size == 0:
            return out
        ids = np.sort(docs.astype(np.int64))
        for s in self.segments:
            lo, hi = int(s["doc_base"]), int(s["doc_base"] + s["num_docs"])
            mine = ids[(ids >= lo) & (ids < hi)]
            if mine.size == 0:
                continue
            t = pq.read_table(
                os.path.join(
                    self.index_dir, "docmap", f"segment_id={s['segment_id']}"
                ),
                columns=["doc_id", "url"],
                filters=[("doc_id", "in", mine.tolist())],
            )
            for d, u in zip(t["doc_id"].to_numpy(), t["url"].to_pylist()):
                out[int(d)] = u
        return out
