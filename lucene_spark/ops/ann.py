"""Similarity search over the ``embeddings`` table (vec_id, embedding
array<float>, label).

- Brute-force cosine top-k: the exactness baseline. One shuffle-free
  scan + a TakeOrdered(k) — at 100 TB this is the map-side-combine
  top-k pattern (each partition keeps k, driver merges P*k).
- IVF (inverted-file) partition + probe: the scale path. Centroids are
  fixed, deterministic vectors (the first C vectors of the table —
  a placeholder for a k-means job, which would be iterative); assignment
  is a per-row argmin (broadcast-sized centroid list baked into the
  plan), probing scans only the query's cluster — the ANN analog of
  postings pruning.

Float contract: every reduction is an explicit sequential float64 left
fold in both dialects, so Spark and the DuckDB oracle agree bitwise.
Query/centroid vectors are embedded as 17-significant-digit literals
(exact double round-trip).
"""

from __future__ import annotations

import math

from lucene_spark.ops import dialect as dl


def _lit_vec(d: str, vec: list) -> str:
    # string->double casts: bare decimal literals parse as DECIMAL in
    # both engines (precision-lossy); string parsing is correctly
    # rounded IEEE, so repr round-trips exactly.
    vals = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vec)
    return f"array({vals})" if d == dl.SPARK else f"[{vals}]"


def _dot(d: str, a: str, b: str, dim: int) -> str:
    """Sequential float64 dot product of two 1-based-indexed vectors."""
    prod = f"{dl.cast_double(d, dl.elem(d, a, 'i'))} * {dl.elem(d, b, 'i')}"
    return dl.ffold_sum(d, dl.transform(d, dl.seq_incl(d, "1", str(dim)), "i", prod))


def _sq_norm(d: str, a: str, dim: int) -> str:
    sq = f"{dl.cast_double(d, dl.elem(d, a, 'i'))} * {dl.cast_double(d, dl.elem(d, a, 'i'))}"
    return dl.ffold_sum(d, dl.transform(d, dl.seq_incl(d, "1", str(dim)), "i", sq))


def py_sq_norm(vec: list) -> float:
    """Python mirror of ``_sq_norm`` (same sequential fold)."""
    acc = 0.0
    for v in vec:
        acc = acc + float(v) * float(v)
    return acc


def py_sq_dist(a: list, b: list) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        dxy = float(x) - float(y)
        acc = acc + dxy * dxy
    return acc


def cosine_topk_sql(
    d: str, qvec: list, k: int = 10, dim: int = 64, table: str = "embeddings"
) -> str:
    """(vec_id, cos): top-k by cosine(q, embedding), tie-break vec_id."""
    q = _lit_vec(d, qvec)
    qn = math.sqrt(py_sq_norm(qvec))
    dot = _dot(d, "embedding", q, dim)
    nrm = _sq_norm(d, "embedding", dim)
    return f"""
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       {dot} / (sqrt({nrm}) * CAST('{qn!r}' AS DOUBLE)) AS cos
FROM {table}
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def _assign_expr(d: str, centroids: list, dim: int) -> tuple:
    """(cte_cols, case_expr): per-centroid squared-L2 distance columns +
    the argmin CASE (first minimum wins => smallest centroid id)."""
    cols = []
    for c, cv in enumerate(centroids):
        cl = _lit_vec(d, cv)
        diff = f"({dl.cast_double(d, dl.elem(d, 'embedding', 'i'))} - {dl.elem(d, cl, 'i')})"
        dist = dl.ffold_sum(
            d, dl.transform(d, dl.seq_incl(d, "1", str(dim)), "i", f"{diff} * {diff}")
        )
        cols.append(f"{dist} AS d_{c}")
    names = [f"d_{c}" for c in range(len(centroids))]
    m = f"least({', '.join(names)})"
    cases = " ".join(
        f"WHEN d_{c} = m THEN {c}" for c in range(len(centroids))
    )
    return ",\n       ".join(cols), f"(CASE {cases} END)", m


def ivf_assign_sql(
    d: str, centroids: list, dim: int = 64, table: str = "embeddings"
) -> str:
    """(vec_id, centroid_id): nearest-centroid partition assignment."""
    cols, case, m = _assign_expr(d, centroids, dim)
    return f"""
WITH dists AS (
  SELECT vec_id,
       {cols}
  FROM {table}
),
mm AS (SELECT *, {m} AS m FROM dists)
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST({case} AS INT) AS centroid_id
FROM mm ORDER BY vec_id
"""


def py_assign(vec: list, centroids: list) -> int:
    """Python mirror of the argmin assignment (same fold, same
    tie-break) — used to pick the probe cluster for a query vector."""
    dists = [py_sq_dist(vec, c) for c in centroids]
    m = min(dists)
    return dists.index(m)


def py_probe(vec: list, centroids: list, nprobe: int) -> list:
    """The ``nprobe`` nearest centroid ids to the query (distance
    ascending, id tie-break) — the multi-probe list of a real IVF
    search."""
    dists = [(py_sq_dist(vec, c), j) for j, c in enumerate(centroids)]
    dists.sort()
    return [j for _, j in dists[:nprobe]]


def ivf_topk_sql(
    d: str,
    qvec: list,
    centroids: list,
    k: int = 5,
    dim: int = 64,
    table: str = "embeddings",
    nprobe: int = 1,
) -> str:
    """(vec_id, cos): top-k cosine within the query's ``nprobe``
    nearest IVF clusters — identical contract to brute force restricted
    to the probed partitions (recall grows with nprobe; at nprobe=C it
    IS brute force)."""
    probes = py_probe(qvec, centroids, nprobe)
    cols, case, m = _assign_expr(d, centroids, dim)
    q = _lit_vec(d, qvec)
    qn = math.sqrt(py_sq_norm(qvec))
    dot = _dot(d, "embedding", q, dim)
    nrm = _sq_norm(d, "embedding", dim)
    plist = ", ".join(str(p) for p in probes)
    return f"""
WITH dists AS (
  SELECT vec_id, embedding,
       {cols}
  FROM {table}
),
mm AS (SELECT *, {m} AS m FROM dists),
assigned AS (
  SELECT vec_id, embedding FROM mm WHERE {case} IN ({plist})
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       {dot} / (sqrt({nrm}) * CAST('{qn!r}' AS DOUBLE)) AS cos
FROM assigned
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def near_dup_pairs_sql(
    d: str,
    centroids: list,
    dim: int = 64,
    threshold: float = 0.4,
    table: str = "embeddings",
) -> str:
    """(a, b, cos): embedding near-duplicate candidate pairs — vectors
    in the SAME nearest-centroid bucket with cosine >= threshold.

    This is the IVF-blocked near-dup join, the scale shape for
    embedding dedup over 10^12 rows: the quadratic all-pairs cosine is
    confined to each centroid bucket (an equijoin on centroid_id that
    Spark shuffles once), so cost is sum of per-bucket squares instead
    of corpus^2, and skewed buckets split further by raising C. Recall
    vs the unblocked join is bounded by cluster quality exactly like
    IVF search recall at nprobe=1; the driver gate runs this same
    blocked definition in DuckDB, so the comparison is exact."""
    cols, case, m = _assign_expr(d, centroids, dim)
    dot = _dot(d, "x.embedding", "y.embedding", dim)
    nx = _sq_norm(d, "x.embedding", dim)
    ny = _sq_norm(d, "y.embedding", dim)
    cos = f"({dot}) / (sqrt({nx}) * sqrt({ny}))"
    thr = f"CAST('{float(threshold)!r}' AS DOUBLE)"
    return f"""
WITH dists AS (
  SELECT vec_id, embedding,
       {cols}
  FROM {table}
),
mm AS (SELECT *, {m} AS m FROM dists),
assigned AS (SELECT vec_id, embedding, CAST({case} AS INT) AS cid FROM mm)
SELECT CAST(x.vec_id AS BIGINT) AS a, CAST(y.vec_id AS BIGINT) AS b,
       {cos} AS cos
FROM assigned x JOIN assigned y
  ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE {cos} >= {thr}
ORDER BY a, b
"""
