"""Deterministic k-means (Lloyd's) for IVF centroid training.

Two implementations with identical semantics:

- ``train_df``: the DISTRIBUTED training job (the 100-TB shape): per
  iteration one broadcast-join assignment pass (array-native squared-L2
  via ``zip_with`` + sequential ``aggregate`` fold) and one
  groupBy(cluster) centroid update over posexploded dimensions — the
  classic Spark k-means; centroids (C x dim doubles) are the only
  driver-side data.
- ``train_np``: the numpy mirror used by the driver-correctness gate
  (bitwise-stable: the distributed sum's reassociation makes float64
  centroid coordinates differ in the last ulps run-to-run, so the gate
  trains via the mirror and feeds the SAME centroid literals to both
  engines; ``tests/test_ops.py`` asserts the two trainings agree on
  cluster ASSIGNMENTS).

Init is deterministic and data-derived: the first C vectors in vec_id
order (no RNG — reproducible builds).
"""

from __future__ import annotations

import numpy as np


def train_np(vectors: np.ndarray, c: int, iters: int = 5) -> list:
    """Lloyd's k-means on an (n, dim) float array; returns C centroid
    lists (float64). Empty clusters keep their previous centroid."""
    v = np.asarray(vectors, dtype=np.float64)
    cents = v[:c].copy()
    for _ in range(iters):
        d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)  # first minimum wins
        for j in range(c):
            sel = assign == j
            if sel.any():
                cents[j] = v[sel].mean(axis=0)
    return [row.tolist() for row in cents]


def assign_np(vectors: np.ndarray, centroids) -> np.ndarray:
    v = np.asarray(vectors, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    d2 = ((v[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _assign_cols(df, centroids, dim: int):
    """embedding -> (dist to nearest centroid, centroid_id) columns via
    array-native ops: zip_with squared diffs + sequential float64 fold,
    argmin by struct-min (dist, id) — ties resolve to the smallest id,
    matching the SQL CASE first-minimum."""
    import pyspark.sql.functions as F

    structs = []
    for j, cv in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)).cast("double") for x in cv])
        sq = F.zip_with(
            F.col("embedding").cast("array<double>"),
            lit,
            lambda x, y: (x - y) * (x - y),
        )
        dist = F.aggregate(sq, F.lit(0.0).cast("double"), lambda acc, x: acc + x)
        structs.append(F.struct(dist.alias("dist"), F.lit(j).alias("centroid_id")))
    best = F.array_min(F.array(*structs))
    return best["dist"].alias("dist"), best["centroid_id"].alias("centroid_id")


def ivf_assign_df(df, centroids, dim: int = 64):
    """(vec_id, centroid_id) DataFrame — the array-native assignment
    operator (no per-centroid SQL literal columns; whole-stage codegen
    over array expressions). Broadcast-sized centroids are baked into
    the plan; the scan stays shuffle-free."""
    dist, cid = _assign_cols(df, centroids, dim)
    import pyspark.sql.functions as F

    return df.select(
        F.col("vec_id").cast("long").alias("vec_id"), cid
    ).orderBy("vec_id")


def centroids_df(spark, centroids):
    """Centroids as a DataFrame (centroid_id, cvec) — DATA, not plan
    literals. At production C (1k-64k cells) this is the only shape
    whose plan compiles: the literal-column form grows O(C*dim)."""
    rows = [(j, [float(x) for x in cv]) for j, cv in enumerate(centroids)]
    return spark.createDataFrame(rows, "centroid_id int, cvec array<double>")


def _join_assigned(spark, df, centroids, keep_embedding: bool):
    """embedding rows x BROADCAST centroids -> per-vector argmin via
    partial-aggregated struct-min: map-side combine reduces the N*C
    scored rows to N (dist, centroid_id) structs before the shuffle, so
    the plan is O(1) in C and the shuffle is O(N)."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import broadcast

    cdf = broadcast(centroids_df(spark, centroids))
    sq = F.zip_with(
        F.col("embedding").cast("array<double>"),
        F.col("cvec"),
        lambda x, y: (x - y) * (x - y),
    )
    dist = F.aggregate(sq, F.lit(0.0).cast("double"), lambda acc, x: acc + x)
    cols = [
        F.col("vec_id").cast("long").alias("vec_id"),
        # struct-min tie-break: equal dist -> smallest centroid_id (the
        # SQL CASE first-minimum / numpy argmin rule)
        F.struct(dist.alias("dist"), F.col("centroid_id").alias("centroid_id")).alias("s"),
    ]
    aggs = [F.min("s").alias("best")]
    if keep_embedding:
        cols.append(F.col("embedding"))
        aggs.append(F.first("embedding").alias("embedding"))
    scored = df.crossJoin(cdf).select(*cols)
    return scored.groupBy("vec_id").agg(*aggs)


def ivf_assign_join_df(spark, df, centroids):
    """(vec_id, centroid_id) via the broadcast-join assignment — the
    C>=1k scale shape (centroids as data; see _join_assigned)."""
    import pyspark.sql.functions as F

    return (
        _join_assigned(spark, df, centroids, keep_embedding=False)
        .select("vec_id", F.col("best.centroid_id").alias("centroid_id"))
        .orderBy("vec_id")
    )


def train_df(spark, df, c: int, iters: int = 5, dim: int = 64) -> list:
    """Distributed Lloyd's: returns C centroids (lists of float64).

    Per iteration: assignment (map-only, array-native) then centroid
    update as ONE aggregation — posexplode the embedding and average
    per (cluster, dimension); only the C*dim averaged coordinates come
    back to the driver."""
    import pyspark.sql.functions as F

    first = df.orderBy("vec_id").limit(c).select("embedding").collect()
    cents = [[float(x) for x in r["embedding"]] for r in first]
    for _ in range(iters):
        assigned = _join_assigned(spark, df, cents, keep_embedding=True).select(
            "embedding", F.col("best.centroid_id").alias("centroid_id")
        )
        upd = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "d", "x"
                ),
            )
            .groupBy("centroid_id", "d")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new = {j: list(cents[j]) for j in range(c)}
        got: dict = {}
        for r in upd:
            got.setdefault(int(r["centroid_id"]), {})[int(r["d"])] = float(r["m"])
        for j, dims in got.items():
            new[j] = [dims[i] for i in range(dim)]
        cents = [new[j] for j in range(c)]
    return cents
