"""Merge-under-serve soak (VERDICT r4 #7).

The 32-generation NRT soak (test_serve.py) appends only; this soak
runs the FULL index lifecycle against a live ShardedSearcher:
appends, deletes (both the key and the distributed predicate path),
reclaiming (squeeze) tiered merges, and vacuum — while a background
thread queries continuously. The generation swap must be atomic
versus in-flight scatters (the ``_swap_lock`` SearcherManager-acquire
analog): a count observed mid-swap must equal the live-doc count of
SOME single published generation — never a pre/post-merge mix, which
would double-count the swapped docs. Exact doc accounting and bounded
worker RSS across >= 8 merge generations.
"""

import threading
import time

import pytest

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages, make_queries
from lucene_spark.index.builder import IndexConfig, build_index, read_latest_commit
from lucene_spark.index.deletes import delete_docs
from lucene_spark.index.merge import merge_segments, vacuum
from lucene_spark.search.serve import LocalSearcher, ShardedSearcher
from lucene_spark.streaming.nrt import append_batch

QUERIES = [q["query"] for q in make_queries()[::7]]


def _rss_kb(pid: int) -> int:
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    return 0


def _smallest_adjacent_pair(commit):
    """The doc_base-adjacent segment pair with the fewest docs — a
    deterministic stand-in for the tiered pick (find_merge is
    unit-tested separately; the soak needs a merge EVERY generation)."""
    segs = sorted(commit["segments"], key=lambda s: s["doc_base"])
    if len(segs) < 2:
        return None
    i = min(
        range(len(segs) - 1),
        key=lambda j: (
            int(segs[j]["num_docs"]) + int(segs[j + 1]["num_docs"]),
            j,
        ),
    )
    return [segs[i]["segment_id"], segs[i + 1]["segment_id"]]


def test_merge_under_serve_soak(spark, tmp_path_factory):
    corpus = make_pages(420)
    base, feed = corpus[:180], corpus[180:]
    d = str(tmp_path_factory.mktemp("mus_idx"))
    build_index(
        spark,
        spark.createDataFrame(
            [(r["url"], r["text"]) for r in base], ["url", "text"]
        ),
        d,
        IndexConfig(num_segments=3, analyzer=ENGLISH),
    )
    gens = 12
    batch = len(feed) // gens

    ss = ShardedSearcher(d, shards=2)
    live_urls = [r["url"] for r in base]
    expected = len(base)
    valid_counts = {expected}  # every published generation's live count
    stop = threading.Event()
    errors: list = []
    observed: list = []

    def hammer():
        i = 0
        while not stop.is_set():
            try:
                q = QUERIES[i % len(QUERIES)]
                rows = ss.search(q, k=10)
                for doc, score, url in rows:
                    assert isinstance(doc, int) and url
                observed.append(ss.count("*"))
                if i % 3 == 0:
                    ss.search_many({q: q}, k=5)
                i += 1
            except Exception:  # pragma: no cover - failure capture
                import traceback

                errors.append(traceback.format_exc())
                return

    t = threading.Thread(target=hammer, daemon=True)
    try:
        ss.search(QUERIES[0], k=10)  # warm
        pids0 = set(ss.worker_pids())
        rss0 = sum(_rss_kb(p) for p in pids0)
        t.start()
        merges = 0
        for g in range(gens):
            rows = feed[g * batch : (g + 1) * batch]
            append_batch(
                spark,
                spark.createDataFrame(
                    [(r["url"], r["text"]) for r in rows], ["url", "text"]
                ),
                d,
                IndexConfig(num_segments=1, analyzer=ENGLISH),
            )
            live_urls.extend(r["url"] for r in rows)
            expected += len(rows)
            # deletes: key path on even generations, the distributed
            # predicate path on odd ones
            victims = [live_urls.pop(0), live_urls.pop(0)]
            if g % 2 == 0:
                delete_docs(spark, d, keys=victims)
            else:
                pred = " OR ".join(f"url = '{u}'" for u in victims)
                delete_docs(spark, d, predicate=pred)
            expected -= len(victims)
            # a reclaiming merge EVERY generation (>= 8 required)
            grp = _smallest_adjacent_pair(read_latest_commit(d))
            if grp:
                gen = read_latest_commit(d)["generation"] + 1
                merge_segments(spark, d, grp, generation=gen, squeeze=True)
                merges += 1
            valid_counts.add(expected)
            assert ss.refresh() is True
            # exact doc accounting at every published generation
            assert ss.count("*") == expected, g
            assert not (set(ss.worker_pids()) - pids0), f"drift at {g}"
            # old-generation files removable once workers re-pointed
            vacuum(d)
            assert not errors, errors
            time.sleep(0.02)  # give the hammer a slice on the new gen
        stop.set()
        t.join(timeout=30)
        assert not t.is_alive()
        assert not errors, errors
        assert merges >= 8
        # atomic swap: every concurrently observed count equals the
        # live count of a single published generation
        assert observed, "hammer thread never ran"
        bad = [c for c in observed if c not in valid_counts]
        assert not bad, (sorted(set(bad)), sorted(valid_counts))
        # bounded worker memory across the full lifecycle
        rss1 = sum(_rss_kb(p) for p in ss.worker_pids())
        assert rss1 - rss0 < 200_000, (rss0, rss1)  # < 200 MB growth
        # final answers match a fresh searcher on the final commit
        fresh = LocalSearcher(d, workers=1)
        assert fresh.count("*") == expected
        for q in QUERIES[:6]:
            assert ss.search(q, k=10) == fresh.search(q, k=10), q
            assert ss.count(q) == fresh.count(q), q
        # full structural invariants after the whole lifecycle —
        # includes the doc-range disjointness that catches the
        # append-after-squeeze id overlap this soak originally found
        from lucene_spark.index.check import check_index

        totals = check_index(spark, d)
        assert totals["segments"] == len(read_latest_commit(d)["segments"])
    finally:
        stop.set()
        ss.close()
