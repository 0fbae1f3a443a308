"""HNSW approximate-nearest-neighbor index over the embeddings table.

Reference parity: Lucene builds ONE HNSW GRAPH PER SEGMENT at flush
(`lucene/core/src/java/org/apache/lucene/codecs/lucene99/Lucene99HnswVectorsFormat.java:33-120`,
`lucene/core/src/java/org/apache/lucene/util/hnsw/HnswGraphBuilder.java:38-360`)
and a KNN query fans out per segment, merging k-sized per-segment
results (`search/KnnFloatVectorQuery.java` / `AbstractKnnVectorQuery`).
This module mirrors that shape Spark-first:

- build: shard the table deterministically (``vec_id % shards`` — the
  DWPT-per-partition analog), build each shard's graph inside its own
  ``applyInPandas`` task with pure numpy, write graph+vectors as
  parquet partitioned by shard. No driver-side iteration; shards scale
  out like segments.
- search: an exactly-partitioned seed (one shard per task — the direct
  executor pattern, ``search/searcher.py _search_many_direct``) where
  each task pyarrow-reads only its shard file, runs the beam search,
  and emits its LOCAL top-k; the only exchange is the final
  ``<= shards*k``-row rank. Postings-for-vectors (the graph) never
  crosses a shuffle.

Algorithm: Malkov & Yashunin, "Efficient and robust approximate
nearest neighbor search using Hierarchical Navigable Small World
graphs" (IEEE TPAMI 2018), Algorithms 1-5, with Lucene's diversity
neighbor-selection heuristic (``HnswGraphBuilder#diversityCheck``,
i.e. Alg. 4 with extendCandidates=false, keepPrunedConnections=false).
Fully deterministic: insertion in ascending vec_id order and level
assignment from a splitmix64 hash of the vec_id — no RNG state, so a
rebuild (or a re-run of the correctness gate) reproduces the graph
bit-for-bit.

Similarity: cosine, maximized. Graph NAVIGATION uses vectorized
float64 numpy dot products over unit-normalized vectors (fast path);
the FINAL returned scores re-compute the sequential float64 fold of
``ops/ann.py`` (``_dot`` / ``_sq_norm`` contract) over the beam
candidates only (k-sized work), so whenever the beam covers the true
top-k (ef_search high enough — asserted in tests at gate scale) the
output is bitwise identical to the brute-force DuckDB oracle
(``ann.cosine_topk_sql``).
"""

from __future__ import annotations

import heapq
import math
import os

import numpy as np

from lucene_spark.ops.ann import py_sq_norm

_M64 = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    z = (x + 0x9E3779B97F4A7C15) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return (z ^ (z >> 31)) & _M64


def assign_level(vec_id: int, m: int) -> int:
    """Deterministic HNSW level: ``floor(-ln(u) * mL)`` with
    ``mL = 1/ln(M)`` (paper §4.1) and ``u`` drawn from a splitmix64
    hash of the vec_id instead of an RNG — same geometric law, no
    state."""
    u = ((_splitmix64(int(vec_id)) >> 11) + 1) * (2.0 ** -53)
    return int(-math.log(u) / math.log(m))


def py_dot(a, b) -> float:
    """Sequential float64 dot — the Python mirror of ``ann._dot``'s
    ffold (same accumulation order, bitwise)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


class Graph:
    """One shard's HNSW graph: parallel arrays indexed by node slot.

    ``nbrs[slot]`` is a list (one entry per level 0..levels[slot]) of
    int64 numpy arrays of neighbor SLOTS.
    """

    __slots__ = (
        "ids", "vecs", "unit", "levels", "nbrs", "entry",
        "qvecs", "qsum", "qmin", "qscale",
    )

    def __init__(self, ids, vecs):
        self.ids = np.asarray(ids, dtype=np.int64)
        self.vecs = np.asarray(vecs, dtype=np.float64)
        nrm = np.sqrt((self.vecs * self.vecs).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        self.unit = self.vecs / nrm[:, None]
        self.levels = np.zeros(len(self.ids), dtype=np.int64)
        self.nbrs: list = [None] * len(self.ids)
        self.entry = -1
        self.qvecs = None  # int8 navigation plane (quantized mode)
        self.qsum = None
        self.qmin = 0.0
        self.qscale = 1.0

    # -- scalar quantization (Lucene99ScalarQuantizedVectorsFormat
    # role, `codecs/lucene99/Lucene99ScalarQuantizedVectorsFormat.java`
    # + `util/quantization/ScalarQuantizer.java`): unit vectors are
    # quantized to 7-bit ints over a per-shard confidence-interval
    # value range (CI = 1 - 1/(dim+1), the reference default).
    # NAVIGATION uses integer dot products reconstructed affinely;
    # final hits are always re-scored from the raw floats, so
    # quantization affects recall only, never returned scores.
    def quantize(self) -> None:
        d = self.unit.shape[1] if self.unit.size else 0
        if not len(self.ids):
            self.qvecs = np.zeros((0, d), dtype=np.uint8)
            self.qsum = np.zeros(0, dtype=np.int64)
            return
        ci = 1.0 - 1.0 / (d + 1)
        lo = (1.0 - ci) / 2.0
        vals = self.unit.ravel()
        self.qmin = float(np.quantile(vals, lo))
        qmax = float(np.quantile(vals, 1.0 - lo))
        rng = qmax - self.qmin
        self.qscale = (127.0 / rng) if rng > 0 else 1.0
        q = np.clip(self.unit, self.qmin, qmax)
        self.qvecs = np.round((q - self.qmin) * self.qscale).astype(np.uint8)
        self.qsum = self.qvecs.sum(axis=1, dtype=np.int64)

    def _quantize_query(self, q: np.ndarray):
        qq = np.clip(q, self.qmin, self.qmin + 127.0 / self.qscale)
        qi = np.round((qq - self.qmin) * self.qscale).astype(np.int64)
        return qi, int(qi.sum())

    def nav_dots(self, slots, qprep) -> np.ndarray:
        """Approximate (quantized) or exact (float) dot of ``slots``
        against the prepared query — the navigation ordering."""
        if self.qvecs is None:
            return self.unit[slots] @ qprep
        qi, qs = qprep
        d = self.qvecs.shape[1]
        qdot = self.qvecs[slots].astype(np.int64) @ qi
        m, s = self.qmin, self.qscale
        return (
            qdot / (s * s)
            + (m / s) * (self.qsum[slots] + qs)
            + d * m * m
        )

    def nav_prep(self, q: np.ndarray):
        return q if self.qvecs is None else self._quantize_query(q)


def _search_layer(
    g: Graph, q: np.ndarray, eps: list, ef: int, lc: int, allowed=None
):
    """Paper Alg. 2: best-first beam over layer ``lc`` from entry
    points ``eps``; returns up to ``ef`` (dist, slot) pairs, dist
    ascending. dist = -cosine over unit vectors (minimized).

    ``allowed`` (bool mask per slot, layer-0 filtered search) gates
    entry into the RESULT set only — traversal still routes through
    non-accepted nodes, exactly ``HnswGraphSearcher#searchLevel``'s
    acceptOrds contract (`util/hnsw/HnswGraphSearcher.java`)."""
    visited = set(eps)
    ep_d = -g.nav_dots(np.asarray(eps, dtype=np.int64), q)
    cand = [(float(d), e) for d, e in zip(ep_d, eps)]
    heapq.heapify(cand)
    best = [
        (-d, e)
        for d, e in cand
        if allowed is None or allowed[e]
    ]  # max-heap of the current W
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        d, c = heapq.heappop(cand)
        if len(best) >= ef and d > -best[0][0]:
            break
        lst = g.nbrs[c]
        if lst is None or lc >= len(lst):
            continue
        frontier = [e for e in lst[lc] if e not in visited]
        if not frontier:
            continue
        visited.update(frontier)
        fd = -g.nav_dots(np.asarray(frontier, dtype=np.int64), q)
        for e, de in zip(frontier, fd):
            de = float(de)
            if len(best) < ef or de < -best[0][0]:
                heapq.heappush(cand, (de, e))
                if allowed is None or allowed[e]:
                    heapq.heappush(best, (-de, e))
                    if len(best) > ef:
                        heapq.heappop(best)
    return sorted((-nd, e) for nd, e in best)


def _select_diverse(g: Graph, cands: list, m: int) -> np.ndarray:
    """Lucene's diversity heuristic (paper Alg. 4, extend=false,
    keepPruned=false): scan candidates distance-ascending, keep c iff
    c is closer to the base than to every already-kept neighbor."""
    kept: list = []
    for d, c in cands:
        if len(kept) >= m:
            break
        ok = True
        for s in kept:
            if -float(np.dot(g.unit[c], g.unit[s])) < d:
                ok = False
                break
        if ok:
            kept.append(c)
    return np.asarray(kept, dtype=np.int64)


def _shrink(g: Graph, slot: int, lc: int, mmax: int) -> None:
    arr = g.nbrs[slot][lc]
    if arr.size <= mmax:
        return
    base = g.unit[slot]
    d = -(g.unit[arr] @ base)
    order = np.argsort(d, kind="stable")
    cands = [(float(d[i]), int(arr[i])) for i in order]
    g.nbrs[slot][lc] = _select_diverse(g, cands, mmax)


def build_np(ids, vecs, m: int = 16, ef_construction: int = 100) -> Graph:
    """Build one shard's graph (paper Alg. 1), inserting in ascending
    vec_id order. Degree caps: M above layer 0, 2M at layer 0
    (``HnswGraphBuilder`` M / M*2 defaults)."""
    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    g = Graph(ids[order], np.asarray(vecs, dtype=np.float64)[order])
    mmax0 = 2 * m
    for i in range(len(g.ids)):
        lvl = assign_level(int(g.ids[i]), m)
        g.levels[i] = lvl
        g.nbrs[i] = [np.empty(0, dtype=np.int64) for _ in range(lvl + 1)]
        if g.entry < 0:
            g.entry = i
            continue
        q = g.unit[i]
        top = int(g.levels[g.entry])
        eps = [g.entry]
        for lc in range(top, lvl, -1):
            w = _search_layer(g, q, eps, 1, lc)
            eps = [w[0][1]]
        for lc in range(min(lvl, top), -1, -1):
            w = _search_layer(g, q, eps, ef_construction, lc)
            mmax = mmax0 if lc == 0 else m
            sel = _select_diverse(g, w, m)
            g.nbrs[i][lc] = sel
            for s in sel:
                g.nbrs[s][lc] = np.append(g.nbrs[s][lc], np.int64(i))
                _shrink(g, int(s), lc, mmax)
            eps = [e for _, e in w]
        if lvl > top:
            g.entry = i
    return g


def search_np(g: Graph, qvec, ef: int, allowed=None) -> np.ndarray:
    """Paper Alg. 5: greedy descent through the upper layers, then an
    ef-beam at layer 0. Returns candidate SLOTS (unordered coverage
    set — callers re-score).

    ``allowed``: optional bool mask per slot — filtered KNN
    (``KnnFloatVectorQuery(field, target, k, filter)``). When the
    accepted set is no larger than ``ef`` the graph walk cannot beat
    scanning it, so this returns the accepted slots directly — the
    analog of ``AbstractKnnVectorQuery``'s exact-search fallback for
    selective filters (`search/AbstractKnnVectorQuery.java:79-132`)."""
    if g.entry < 0:
        return np.empty(0, dtype=np.int64)
    if allowed is not None:
        acc = np.nonzero(allowed)[0]
        if acc.size <= ef:
            return acc.astype(np.int64)
    q = np.asarray(qvec, dtype=np.float64)
    qn = math.sqrt(float(np.dot(q, q)))
    if qn > 0.0:
        q = q / qn
    qp = g.nav_prep(q)
    eps = [g.entry]
    for lc in range(int(g.levels[g.entry]), 0, -1):
        w = _search_layer(g, qp, eps, 1, lc)
        eps = [w[0][1]]
    w = _search_layer(g, qp, eps, ef, 0, allowed=allowed)
    return np.asarray([e for _, e in w], dtype=np.int64)


# ------------------------------------------------------------ spark plane

_GRAPH_SCHEMA = (
    "shard int, vec_id long, embedding array<double>, level int, "
    "nbr_ids array<array<long>>"
)


def _graph_rows(shard: int, g: Graph, meta=None):
    import pandas as pd

    out = pd.DataFrame(
        {
            "shard": np.full(len(g.ids), shard, dtype=np.int32),
            "vec_id": g.ids,
            "embedding": [v.tolist() for v in g.vecs],
            "level": g.levels.astype(np.int32),
            # store neighbor VEC IDS (portable across rebuilds), one
            # array per layer
            "nbr_ids": [
                [g.ids[arr].tolist() for arr in lst] for lst in g.nbrs
            ],
        }
    )
    if meta is not None:
        for c in meta.columns:
            out[c] = meta[c].to_numpy()
    return out


def build_df(
    spark,
    df,
    out_dir: str,
    shards: int = 4,
    m: int = 16,
    ef_construction: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_cols: tuple = (),
) -> None:
    """Distributed graph build: one ``applyInPandas`` task per shard
    (deterministic ``vec_id % shards``), graph+vectors written as
    parquet partitioned by shard. The shuffle is the shard
    hash-exchange of the raw vectors — the same single exchange the
    index builder pays; graph construction itself is task-local.

    ``meta_cols`` ride along per node (vec_id order) so filtered
    searches evaluate their accept predicate SHARD-LOCALLY — the
    per-segment filter-bitset shape of ``KnnFloatVectorQuery``'s
    filter argument, with no driver-side id list."""
    import pyspark.sql.functions as F

    km, kefc = int(m), int(ef_construction)
    kid, kvec, kmeta = id_col, vec_col, tuple(meta_cols)
    schema = _GRAPH_SCHEMA
    for c in kmeta:
        schema += f", {c} {dict(df.dtypes)[c]}"

    def one(key, pdf):
        ids = pdf[kid].to_numpy(np.int64)
        g = build_np(
            ids,
            np.asarray(pdf[kvec].tolist(), dtype=np.float64),
            m=km,
            ef_construction=kefc,
        )
        meta = None
        if kmeta:
            order = np.argsort(ids, kind="stable")
            meta = pdf.iloc[order][list(kmeta)].reset_index(drop=True)
        return _graph_rows(int(key[0]), g, meta)

    (
        df.select(
            (F.col(kid).cast("long") % F.lit(int(shards))).alias("shard"),
            F.col(kid).cast("long").alias(kid),
            F.col(kvec),
            *[F.col(c) for c in kmeta],
        )
        .groupBy("shard")
        .applyInPandas(one, schema)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )


def _load_graph(path: str, meta_cols: tuple = ()):
    import pyarrow.parquet as pq

    t = pq.read_table(
        path,
        columns=["vec_id", "embedding", "level", "nbr_ids", *meta_cols],
    )
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)[order]
    g = Graph(ids[order], vecs)
    g.levels = np.asarray(t["level"].to_pylist(), dtype=np.int64)[order]
    slot_of = {int(v): i for i, v in enumerate(g.ids)}
    raw = t["nbr_ids"].to_pylist()
    nbrs: list = [None] * len(ids)
    for sorted_pos, orig in enumerate(order):
        nbrs[sorted_pos] = [
            np.asarray([slot_of[x] for x in layer], dtype=np.int64)
            for layer in raw[orig]
        ]
    g.nbrs = nbrs
    if len(ids):
        top = int(g.levels.max())
        g.entry = int(np.nonzero(g.levels == top)[0][0])
    if meta_cols:
        meta = {
            c: np.asarray(t[c].to_pylist(), dtype=object)[order]
            for c in meta_cols
        }
        return g, meta
    return g


def topk_df(
    spark,
    index_dir: str,
    qvec: list,
    k: int = 10,
    ef_search: int = 128,
    accept=None,
    quantized: bool = False,
):
    """(vec_id, cos): global top-k via per-shard beam searches.

    ``quantized=True``: navigate with the 7-bit scalar-quantized plane
    (Lucene99ScalarQuantizedVectorsFormat role — int dot products over
    a 4x-smaller working set); hits are still re-scored from raw
    floats, so returned scores are identical and only recall is
    quantization-sensitive.

    One task per shard (exactly-partitioned seed — no shuffle on the
    graph side); each task re-scores its beam with the sequential
    float64 fold and emits only its local top-k, so the final rank
    exchange is ``<= shards*k`` rows.

    ``accept``: optional ``(meta_col, values)`` filter — the
    ``KnnFloatVectorQuery(field, target, k, filter)`` surface. The
    predicate is evaluated SHARD-LOCALLY on the ride-along metadata
    (per-segment filter bitset, never a driver id list); selective
    filters fall back to exact per-shard scans inside ``search_np``."""
    import pyspark.sql.functions as F

    shards = sorted(
        d for d in os.listdir(index_dir) if d.startswith("shard=")
    )
    kq = [float(x) for x in qvec]
    qn = math.sqrt(py_sq_norm(kq))
    kk, kef = int(k), int(ef_search)
    kdir = index_dir
    kacc = None if accept is None else (accept[0], set(accept[1]))
    kquant = bool(quantized)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for sh in pdf["shard_dir"]:
                if kacc is None:
                    g = _load_graph(os.path.join(kdir, str(sh)))
                    mask = None
                else:
                    g, meta = _load_graph(
                        os.path.join(kdir, str(sh)), meta_cols=(kacc[0],)
                    )
                    mask = np.asarray(
                        [v in kacc[1] for v in meta[kacc[0]]], dtype=bool
                    )
                if kquant:
                    g.quantize()
                slots = search_np(g, kq, kef, allowed=mask)
                rows = []
                for s in slots:
                    emb = g.vecs[int(s)]
                    cos = py_dot(emb, kq) / (
                        math.sqrt(py_sq_norm(emb)) * qn
                    )
                    rows.append((int(g.ids[int(s)]), cos))
                rows.sort(key=lambda r: (-r[1], r[0]))
                yield pd.DataFrame(
                    rows[:kk], columns=["vec_id", "cos"]
                ).astype({"vec_id": "int64", "cos": "float64"})

    n = max(1, len(shards))
    seed = spark.createDataFrame(
        spark.sparkContext.parallelize([(s,) for s in shards], n),
        "shard_dir string",
    )
    return (
        seed.mapInPandas(kernel, "vec_id long, cos double")
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(kk)
    )


def topk_many_df(
    spark, index_dir: str, qvecs: dict, k: int = 10, ef_search: int = 128
):
    """(query_id, vec_id, cos): BATCHED KNN — the whole query set in
    ONE per-shard stage (the ``search_many`` shape): each task loads
    its shard graph once and runs every beam over it, so graph-load
    and job-scheduling costs amortize across the set; the only
    exchange is the final per-query rank over ``<= shards*Q*k`` rows.
    This is the throughput shape for query fleets at cluster scale —
    per-query jobs are driver-scheduling-bound exactly like the text
    engine's single-query plane (see ``Searcher.search_many``).

    ``qvecs``: {query_id: vector} (or a list, ids = list index)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    if not isinstance(qvecs, dict):
        qvecs = {str(i): q for i, q in enumerate(qvecs)}
    shards = sorted(
        d for d in os.listdir(index_dir) if d.startswith("shard=")
    )
    kqs = {
        qid: ([float(x) for x in q], math.sqrt(py_sq_norm(q)))
        for qid, q in qvecs.items()
    }
    kk, kef = int(k), int(ef_search)
    kdir = index_dir

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for sh in pdf["shard_dir"]:
                g = _load_graph(os.path.join(kdir, str(sh)))
                out = []
                for qid, (q, qn) in kqs.items():
                    slots = search_np(g, q, kef)
                    rows = []
                    for s in slots:
                        emb = g.vecs[int(s)]
                        cos = py_dot(emb, q) / (
                            math.sqrt(py_sq_norm(emb)) * qn
                        )
                        rows.append((qid, int(g.ids[int(s)]), cos))
                    rows.sort(key=lambda r: (-r[2], r[1]))
                    out.extend(rows[:kk])
                yield pd.DataFrame(
                    out, columns=["query_id", "vec_id", "cos"]
                ).astype(
                    {"query_id": "object", "vec_id": "int64", "cos": "float64"}
                )

    n = max(1, len(shards))
    seed = spark.createDataFrame(
        spark.sparkContext.parallelize([(s,) for s in shards], n),
        "shard_dir string",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        seed.mapInPandas(kernel, "query_id string, vec_id long, cos double")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= kk)
        .drop("rn")
        .orderBy("query_id", F.desc("cos"), F.asc("vec_id"))
    )
