"""Interleaved A/B of cross-segment theta sharing (champion pre-pass).

Measures `Searcher.search_many` and sequential `Searcher.search` with
share_theta on/off (interleaved to cancel drift) over the 960k-doc
scaling corpus — the evidence behind the share_theta defaults
(BENCH.md round 3). Results are bit-identical either way
(tests/test_theta_sharing.py); this measures only wall time.

Usage: PYTHONPATH=/root/repo python scripts/theta_ab.py [corpus.parquet]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaling_corpus_1m.parquet"


def main() -> None:
    from pyspark.sql import SparkSession

    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.fixtures import make_queries
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(CORPUS)
    d = tempfile.mkdtemp(prefix="theta_ab_")
    try:
        t0 = time.time()
        build_index(
            spark, df, d,
            IndexConfig(
                num_segments=64, analyzer=ENGLISH, doc_base_mode="strided"
            ),
        )
        print("build", round(time.time() - t0, 1))
        s = Searcher(spark, d, cache_stats=True)
        s.search("w0000", k=10).collect()  # warm
        qset = [q["query"] for q in make_queries()][::2]
        for share in (True, False, True, False):  # interleaved
            t0 = time.time()
            s.search_many(qset, k=10, share_theta=share).collect()
            dt = time.time() - t0
            print(
                f"batched share_theta={share}: {dt:.2f}s "
                f"qps={len(qset) / dt:.2f}"
            )
        for share in (True, False):
            t0 = time.time()
            for q in qset[:10]:
                s.search(q, k=10, share_theta=share).collect()
            dt = time.time() - t0
            print(f"seq10 share_theta={share}: {dt:.2f}s p_mean={dt/10:.2f}")
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
