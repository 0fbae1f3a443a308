"""Perf evidence for the round-5 tree-sweep vectorization of nested
interval combinators (VERDICT item #3).

Builds a dense synthetic postings layout (N docs, 3 terms with several
occurrences each — the same shape as the round-4 480k-doc Zipf-head
measurements in NOTES.md) and times the headline nested shape

    maxgaps(n, ordered(unordered(a, b), c))

through (a) the generic per-doc iterators (``interval_freq`` — what ran
before round 5) and (b) the across-docs tree sweep
(``kernels._interval_tree_batch``).  Also cross-checks bit-identical
scores between the two paths before timing.

Usage: PYTHONPATH=/root/repo python scripts/interval_tree_bench.py [ndocs]
"""

import sys
import time

import numpy as np

from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search import kernels as K

N = int(sys.argv[1]) if len(sys.argv) > 1 else 480_000
rng = np.random.default_rng(7)

# dense corpus: every doc holds all three terms, 2-6 occurrences each
# over a 120-position body (matches the round-4 dense-term setup).
# Positions are striped mod 3 per term — distinct terms never share a
# position, exactly as in tokenized text (one term per position).
terms = ("a", "b", "c")
occ = {}
for ti, t in enumerate(terms):
    counts = rng.integers(2, 7, size=N)
    total = int(counts.sum())
    pos = rng.integers(0, 40, size=total) * 3 + ti
    doc = np.repeat(np.arange(N, dtype=np.int64), counts)
    key = np.unique((doc << 32) | pos)  # sort + dedupe per doc
    occ[t] = key

SRC = iv.maxgaps(6, iv.ordered(iv.unordered(iv.term("a"), iv.term("b")), iv.term("c")))
Q = ast.IntervalQuery("", SRC)
SPEC = iv.tree_shape(SRC)
assert SPEC is not None


def sub_plist(ts):
    ks = np.sort(np.concatenate([occ[t] for t in ts])) if len(ts) > 1 else occ[ts[0]]
    return ks >> 32, ks & 0xFFFFFFFF


def run_tree():
    return K._interval_tree_batch(SPEC, sub_plist, SRC.min_extent(), Q, "f32", 1.0)


def run_generic(limit=None):
    docs = np.arange(N if limit is None else limit, dtype=np.int64)
    out_d, out_s = [], []
    pos_by_term = {
        t: (occ[t] >> 32, occ[t] & 0xFFFFFFFF) for t in terms
    }
    bounds = {
        t: np.searchsorted(pos_by_term[t][0], np.arange((limit or N) + 1))
        for t in terms
    }
    for d in docs:
        pos_of = {
            t: pos_by_term[t][1][bounds[t][d] : bounds[t][d + 1]]
            for t in terms
        }
        f = iv.interval_freq(SRC, pos_of)
        if f > 0.0:
            out_d.append(int(d))
            out_s.append(iv.saturation_score(f, 1.0, Q.pivot))
    return np.asarray(out_d, np.int64), np.asarray(out_s, np.float64)


# correctness cross-check on a 20k-doc prefix
limit = min(20_000, N)
gd, gs = run_generic(limit)
td, ts_ = run_tree()
m = td < limit
assert np.array_equal(td[m], gd), "doc mismatch"
assert np.array_equal(ts_[m], gs), "score mismatch"
print(f"cross-check OK: {gd.size} matching docs on the first {limit}")

t0 = time.perf_counter()
gd, _ = run_generic()
t_gen = time.perf_counter() - t0
print(f"generic per-doc iterators: {t_gen:.2f}s ({gd.size} matches / {N} docs)")

best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    td, _ = run_tree()
    best = min(best, time.perf_counter() - t0)
print(f"tree sweep (best of 3):    {best:.2f}s ({td.size} matches)")
print(f"speedup: {t_gen / best:.1f}x")
