"""Serving-mode latency benchmark: LocalSearcher per-query latency over
the scaling corpus index (no Spark job per query).

Usage: python scripts/serve_latency.py <corpus.parquet> <out.json> [cpus]

Builds (or resumes) the 64-segment index with Spark once, then answers
the 40-query reference mix through ``LocalSearcher`` — cold (first
touch of each term's blocks) and warm (cached) — and prints one JSON
line with p50/p95/mean latencies and QPS. This is the per-node serving
plane of BASELINE.json's "top-k BM25 query latency" metric; the Spark
planes (batched ``search_many``, concurrent clients) are measured by
``scaling_worker.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_SEGMENTS = 64
INDEX_DIR = "/tmp/ls_serve_idx"


def main(corpus: str, out_path: str, cpus: int = 8) -> None:
    from pyspark.sql import SparkSession

    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.fixtures import make_queries
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.serve import LocalSearcher

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .appName("serve_latency_build")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(corpus)
    n_docs = df.count()
    t0 = time.time()
    build_index(
        spark, df, INDEX_DIR,
        IndexConfig(num_segments=NUM_SEGMENTS, analyzer=ENGLISH),
    )
    build_s = time.time() - t0
    spark.stop()

    from lucene_spark.search.serve import ShardedSearcher

    queries = [q["query"] for q in make_queries()]
    t0 = time.time()
    ls = ShardedSearcher(INDEX_DIR, shards=cpus)
    open_s = time.time() - t0

    def run(tag, searcher):
        lat = []
        hits = 0
        for q in queries:
            t1 = time.time()
            res = searcher.search(q, k=10)
            lat.append(time.time() - t1)
            hits += len(res)
        lat.sort()
        n = len(lat)
        return {
            f"{tag}_p50_ms": round(1000 * lat[n // 2], 2),
            f"{tag}_p95_ms": round(1000 * lat[int(n * 0.95)], 2),
            f"{tag}_mean_ms": round(1000 * sum(lat) / n, 2),
            f"{tag}_qps": round(n / sum(lat), 1),
        }, hits

    cold, hits = run("cold", ls)
    warm, _ = run("warm", ls)
    ls.close()
    single = LocalSearcher(INDEX_DIR, workers=1)
    light = [q for q in queries if not q.startswith('"')][:20]

    def run_light():
        lat = []
        for q in light:
            single.search(q, k=10)  # cold pass
        for q in light:
            t1 = time.time()
            single.search(q, k=10)
            lat.append(time.time() - t1)
        lat.sort()
        return {
            "single_warm_term_p50_ms": round(1000 * lat[len(lat) // 2], 2)
        }

    out = {
        "docs": int(n_docs),
        "segments": NUM_SEGMENTS,
        "shards": cpus,
        "build_secs": round(build_s, 2),
        "open_secs": round(open_s, 2),
        "num_queries": len(queries),
        "total_hits": hits,
        **cold,
        **warm,
        **run_light(),
    }
    line = json.dumps(out)
    print(line)
    with open(out_path, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main(
        sys.argv[1],
        sys.argv[2],
        int(sys.argv[3]) if len(sys.argv) > 3 else 8,
    )
