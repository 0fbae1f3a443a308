"""Benchmark: distributed index build + reference-query-set latency.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line:
``{"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...}, "sf": ...}``.

Query classes mirror the reference benchmark harness
(``lucene/benchmark/conf/query-terms.txt`` / ``query-phrases.txt``):
term, boolean AND / OR, phrase — all pruned f32 kernels (the Lucene
rank-identity path) — plus the training-pipeline ops (minhash-LSH
dedup, brute-force cosine top-k).

For the two-cluster-size scaling evidence (north rule), run this twice:
``SPARK_GRAFT_CPUS=8`` and ``SPARK_GRAFT_CPUS=32`` — see
scripts/scaling_bench.py which automates it and writes BENCH/BASELINE
numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

QUERY_SET = [
    ("q_term", "merge"),
    ("q_term_rare", "dup"),
    ("q_and", "key AND order"),
    ("q_and3", "key AND order AND batch"),
    ("q_or", "merge OR window OR scan"),
    ("q_or_wide", "merge OR window OR scan OR batch OR join OR table"),
    ("q_phrase", '"key order"'),
    ("q_phrase2", '"table scan"'),
]


def main() -> None:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher
    from lucene_spark.ops import ann, dedup
    from lucene_spark.ops.dialect import SPARK

    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("lucene_spark_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries: dict = {}
    t_all = time.time()

    # ---- index build (fresh dir; no resume) -> docs/sec ----
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    pages = docs.select(
        F.format_string("%012d", F.col("doc_id")).alias("url"), F.col("text")
    )
    n_docs = pages.count()
    index_dir = tempfile.mkdtemp(prefix="lucene_spark_bench_")
    try:
        t0 = time.time()
        cfg = IndexConfig(
            num_segments=CPUS, analyzer=ENGLISH, doc_base_mode="strided"
        )
        commit = build_index(spark, pages, index_dir, cfg)
        build_s = time.time() - t0
        queries["index_build"] = round(build_s, 4)
        docs_per_sec = n_docs / build_s

        searcher = Searcher(spark, index_dir, cache_stats=True, preload_stats=True)
        searcher.search("merge", k=10).collect()  # warm JVM/py workers
        # the direct batched shape runs mapInPandas workers distinct
        # from search()'s applyInPandas pool — warm those too so
        # batched_set measures steady state like the per-query classes
        searcher.search_many(["merge"], k=10).collect()

        for name, q in QUERY_SET:
            t0 = time.time()
            searcher.search(q, k=10, pruned=True, dtype="f32").collect()
            queries[name] = round(time.time() - t0, 4)

        # interval query (queries/intervals): maxgaps-filtered ordered
        # pair through the same pruned kernel path
        from lucene_spark.search import ast as ast_mod
        from lucene_spark.search import intervals as iv

        q_iv = ast_mod.IntervalQuery(
            "", iv.maxgaps(4, iv.ordered(iv.term("merge"), iv.term("window")))
        )
        t0 = time.time()
        searcher.search(q_iv, k=10, pruned=True, dtype="f32").collect()
        queries["q_interval"] = round(time.time() - t0, 4)

        # batched evaluation: the whole set in one scan
        t0 = time.time()
        searcher.search_many([q for _, q in QUERY_SET], k=10).collect()
        queries["batched_set"] = round(time.time() - t0, 4)

        # serving mode: LocalSearcher (no Spark job per query) — warm
        # per-query latency for the whole set, the per-node serving
        # plane (search/serve.py)
        from lucene_spark.search.serve import LocalSearcher

        ls = LocalSearcher(index_dir)
        for _, q in QUERY_SET:
            ls.search(q, k=10)  # cold pass populates block caches
        t0 = time.time()
        for _, q in QUERY_SET:
            ls.search(q, k=10)
        queries["serve_warm_set"] = round(time.time() - t0, 4)

        # ---- training-pipeline ops ----
        docs.createOrReplaceTempView("documents")
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")) \
            .createOrReplaceTempView("embeddings")
        t0 = time.time()
        dedup.minhash_pairs_df(spark).collect()
        queries["dedup_minhash_lsh"] = round(time.time() - t0, 4)

        import pyarrow.parquet as pq

        et = pq.read_table(
            os.path.join(SF_DIR, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        qvec = et["embedding"][0].as_py()
        t0 = time.time()
        spark.sql(ann.cosine_topk_sql(SPARK, qvec, k=10)).collect()
        queries["ann_cosine_topk"] = round(time.time() - t0, 4)

        # HNSW (round 5): per-shard graph build + fan-out beam search
        from lucene_spark.ops import hnsw

        hnsw_dir = os.path.join(index_dir, "hnsw")
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        t0 = time.time()
        hnsw.build_df(spark, emb, hnsw_dir, shards=CPUS // 4 or 1)
        queries["hnsw_build"] = round(time.time() - t0, 4)
        t0 = time.time()
        hnsw.topk_df(spark, hnsw_dir, qvec, k=10, ef_search=64).collect()
        queries["ann_hnsw_topk"] = round(time.time() - t0, 4)

        total = time.time() - t_all
        print(
            json.dumps(
                {
                    "metric": "index build + BM25 query set + pipeline ops wall time",
                    "value": round(total, 4),
                    "unit": "sec",
                    "queries": queries,
                    "sf": sf,
                    "docs": n_docs,
                    "docs_per_sec": round(docs_per_sec, 1),
                    "cpus": CPUS,
                    "segments": commit["num_segments"],
                }
            )
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
