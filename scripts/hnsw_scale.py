"""HNSW scaling evidence: same graph-build + search job at two
parallelism levels (north-rule methodology — identical input, fixed
shard count, only executor threads vary).

Usage:
  python scripts/hnsw_scale.py gen  <n> <dim> <parquet>   # deterministic corpus
  python scripts/hnsw_scale.py run  <cpus> <parquet> <out.json>

The corpus is hash-seeded per row (splitmix64 over vec_id), so both
levels read byte-identical data and any two runs agree exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = int(os.environ.get("HNSW_SCALE_SHARDS", "64"))
# fixed across levels: the work is identical, only parallelism varies


def gen(n: int, dim: int, path: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lucene_spark.ops.hnsw import _splitmix64

    ids = np.arange(n, dtype=np.int64)
    # per-row deterministic gaussian-ish vectors: sum of 4 hashed
    # uniforms per component (no RNG state, reproducible anywhere)
    out = np.empty((n, dim), dtype=np.float32)
    for j in range(dim):
        acc = np.zeros(n, dtype=np.float64)
        for r in range(4):
            h = np.asarray(
                [_splitmix64(int(i) * 1_000_003 + j * 7919 + r) for i in ids],
                dtype=np.uint64,
            )
            acc += (h >> np.uint64(11)).astype(np.float64) * 2.0**-53
        out[:, j] = (acc - 2.0).astype(np.float32)
    pq.write_table(
        pa.table({"vec_id": ids, "embedding": list(out)}), path
    )
    print(f"wrote {n} x {dim} -> {path}")


def run(cpus: int, path: str, out_json: str) -> None:
    import shutil
    import tempfile

    from pyspark.sql import SparkSession

    from lucene_spark.ops import hnsw

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, SHARDS)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("hnsw_scale")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(path)
    n = df.count()
    idx = tempfile.mkdtemp(prefix="hnsw_scale_")
    try:
        t0 = time.time()
        hnsw.build_df(spark, df, idx, shards=SHARDS, m=16, ef_construction=100)
        build_s = time.time() - t0
        import pyarrow.parquet as pq

        nq = int(os.environ.get("HNSW_SCALE_QUERIES", "32"))
        qvecs = [
            r
            for r in pq.read_table(path, columns=["embedding"])["embedding"][
                :nq
            ].to_pylist()
        ]
        # warm the mapInPandas workers
        hnsw.topk_df(spark, idx, qvecs[0], k=10, ef_search=128).collect()
        t0 = time.time()
        for q in qvecs[:8]:
            hnsw.topk_df(spark, idx, q, k=10, ef_search=128).collect()
        q_s = time.time() - t0
        # batched: the whole set in ONE per-shard stage (the
        # throughput shape — per-query jobs are driver-bound)
        hnsw.topk_many_df(spark, idx, qvecs[:2], k=10, ef_search=128).collect()
        t0 = time.time()
        hnsw.topk_many_df(spark, idx, qvecs, k=10, ef_search=128).collect()
        qb_s = time.time() - t0
        res = {
            "cpus": cpus,
            "vectors": n,
            "shards": SHARDS,
            "build_secs": round(build_s, 3),
            "vecs_per_sec": round(n / build_s, 1),
            "qps_warm": round(len(qvecs[:8]) / q_s, 3),
            "qps_batched": round(len(qvecs) / qb_s, 3),
        }
        print(json.dumps(res))
        with open(out_json, "w") as f:
            json.dump(res, f)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        run(int(sys.argv[2]), sys.argv[3], sys.argv[4])
