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


def _cents_cte(d: str, centroids: list) -> str:
    """Centroids as a VALUES relation ``cents(cid, cvec)`` — DATA, not
    per-centroid expression columns. The old column-per-centroid form
    made the optimizer re-inline every distance C times (DuckDB took
    minutes at C=64); this join form is O(C) rows and scales."""
    rows = ", ".join(
        f"({j}, {_lit_vec(d, cv)})" for j, cv in enumerate(centroids)
    )
    if d == dl.SPARK:
        return f"cents AS (SELECT * FROM VALUES {rows} AS t(cid, cvec))"
    return f"cents(cid, cvec) AS (VALUES {rows})"


def _dist_expr(d: str, dim: int, emb: str = "embedding", cv: str = "cvec") -> str:
    """Squared-L2 between an embedding column and a centroid-vector
    column — the same sequential float64 fold as the engine's
    zip_with/aggregate path (bitwise)."""
    diff = f"({dl.cast_double(d, dl.elem(d, emb, 'i'))} - {dl.elem(d, cv, 'i')})"
    return dl.ffold_sum(
        d, dl.transform(d, dl.seq_incl(d, "1", str(dim)), "i", f"{diff} * {diff}")
    )


def _best_cte(d: str, dim: int, table: str, extra_cols: str = "") -> str:
    """dists + best CTEs: per (vector, centroid) distance rows and the
    argmin by (dist, cid) window rank — equal-dist ties resolve to the
    smallest centroid id (the numpy argmin / struct-min rule)."""
    return f"""dists AS (
  SELECT e.vec_id{extra_cols}, c.cid, {_dist_expr(d, dim)} AS dist
  FROM {table} e CROSS JOIN cents c
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM dists
)"""


def ivf_assign_sql(
    d: str, centroids: list, dim: int = 64, table: str = "embeddings"
) -> str:
    """(vec_id, centroid_id): nearest-centroid partition assignment."""
    return f"""
WITH {_cents_cte(d, centroids)},
{_best_cte(d, dim, table)}
SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cid AS INT) AS centroid_id
FROM best WHERE rn = 1 ORDER BY vec_id
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
    q = _lit_vec(d, qvec)
    qn = math.sqrt(py_sq_norm(qvec))
    dot = _dot(d, "embedding", q, dim)
    nrm = _sq_norm(d, "embedding", dim)
    plist = ", ".join(str(p) for p in probes)
    return f"""
WITH {_cents_cte(d, centroids)},
{_best_cte(d, dim, table, extra_cols=", e.embedding")}
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       {dot} / (sqrt({nrm}) * CAST('{qn!r}' AS DOUBLE)) AS cos
FROM best
WHERE rn = 1 AND cid IN ({plist})
ORDER BY cos DESC, vec_id ASC
LIMIT {k}
"""


def _df_dot(a_col, b_col):
    """Sequential float64 dot of two array columns — the zip_with fold
    mirror of the SQL ``_dot`` (same accumulation order, bitwise)."""
    import pyspark.sql.functions as F

    prods = F.zip_with(
        a_col.cast("array<double>"), b_col.cast("array<double>"),
        lambda x, y: x * y,
    )
    return F.aggregate(prods, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def _df_sq_norm(a_col):
    import pyspark.sql.functions as F

    sq = F.zip_with(
        a_col.cast("array<double>"), a_col.cast("array<double>"),
        lambda x, y: x * y,
    )
    return F.aggregate(sq, F.lit(0.0).cast("double"), lambda acc, x: acc + x)


def ivf_topk_df(spark, df, qvec: list, centroids: list, k: int = 5, nprobe: int = 1):
    """ARRAY-NATIVE IVF top-k (the scale shape of ``ivf_topk_sql``):
    assignment by broadcast centroid join (plan O(1) in C — the literal
    SQL form is kept only as the DuckDB oracle), probe filter on the
    query's nprobe nearest cells, cosine as a zip_with float64 fold.
    Bitwise-identical contract to the SQL form."""
    import pyspark.sql.functions as F

    from lucene_spark.ops import kmeans

    probes = py_probe(qvec, centroids, nprobe)
    assigned = kmeans._join_assigned(spark, df, centroids, keep_embedding=True)
    sel = assigned.where(F.col("best.centroid_id").isin([int(p) for p in probes]))
    qlit = F.array(*[F.lit(float(x)).cast("double") for x in qvec])
    qn = math.sqrt(py_sq_norm(qvec))
    cos = _df_dot(F.col("embedding"), qlit) / (
        F.sqrt(_df_sq_norm(F.col("embedding"))) * F.lit(qn).cast("double")
    )
    return (
        sel.select(F.col("vec_id").cast("long").alias("vec_id"), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def near_dup_pairs_df(spark, df, centroids: list, threshold: float = 0.4):
    """ARRAY-NATIVE IVF-blocked near-dup pairs (the scale shape of
    ``near_dup_pairs_sql``): broadcast-join assignment, then a bucket
    equijoin on centroid_id confines the quadratic to per-bucket
    squares; cosine is the zip_with float64 fold. One shuffle for the
    assignment reduce + one for the bucket join — plan size O(1) in C."""
    import pyspark.sql.functions as F

    from lucene_spark.ops import kmeans

    assigned = (
        kmeans._join_assigned(spark, df, centroids, keep_embedding=True)
        .select(
            F.col("vec_id"),
            F.col("embedding"),
            F.col("best.centroid_id").alias("cid"),
        )
    )
    x = assigned.alias("x")
    y = assigned.alias("y")
    cos = _df_dot(F.col("x.embedding"), F.col("y.embedding")) / (
        F.sqrt(_df_sq_norm(F.col("x.embedding")))
        * F.sqrt(_df_sq_norm(F.col("y.embedding")))
    )
    return (
        x.join(
            y,
            (F.col("x.cid") == F.col("y.cid"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(
            F.col("x.vec_id").cast("long").alias("a"),
            F.col("y.vec_id").cast("long").alias("b"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= F.lit(float(threshold)).cast("double"))
        .orderBy("a", "b")
    )


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
    dot = _dot(d, "x.embedding", "y.embedding", dim)
    nx = _sq_norm(d, "x.embedding", dim)
    ny = _sq_norm(d, "y.embedding", dim)
    cos = f"({dot}) / (sqrt({nx}) * sqrt({ny}))"
    thr = f"CAST('{float(threshold)!r}' AS DOUBLE)"
    return f"""
WITH {_cents_cte(d, centroids)},
{_best_cte(d, dim, table, extra_cols=", e.embedding")},
assigned AS (SELECT vec_id, embedding, CAST(cid AS INT) AS cid FROM best WHERE rn = 1)
SELECT CAST(x.vec_id AS BIGINT) AS a, CAST(y.vec_id AS BIGINT) AS b,
       {cos} AS cos
FROM assigned x JOIN assigned y
  ON x.cid = y.cid AND x.vec_id < y.vec_id
WHERE {cos} >= {thr}
ORDER BY a, b
"""
