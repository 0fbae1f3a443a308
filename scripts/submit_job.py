"""spark-submit entry point: build an index over a pages parquet and
run the reference query set — the north rule's deployment shape.

    zip -r /tmp/lucene_spark.zip lucene_spark
    spark-submit --master local[8] --py-files /tmp/lucene_spark.zip \
        scripts/submit_job.py <pages.parquet> <index_dir> [num_segments]

Prints one JSON line with build + query metrics.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    from lucene_spark.analysis.analyzer import ENGLISH
    from lucene_spark.fixtures import make_queries
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.searcher import Searcher

    pages_path, index_dir = sys.argv[1], sys.argv[2]
    num_segments = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    spark = SparkSession.builder.appName("lucene_spark_submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(pages_path)
    doc_table = "url" not in df.columns
    if doc_table:
        df = df.select(
            F.format_string("%012d", F.col("doc_id")).alias("url"), "text"
        )
    t0 = time.time()
    commit = build_index(
        spark, df, index_dir, IndexConfig(num_segments=num_segments, analyzer=ENGLISH)
    )
    build_s = time.time() - t0
    searcher = Searcher(spark, index_dir, cache_stats=True)
    if doc_table:  # the testdata `documents` vocabulary
        qset = ["merge", "dup", "key AND order", "merge OR window OR scan",
                '"key order"', '"table scan"', "merge^2.5 OR window"]
    else:
        qset = [q["query"] for q in make_queries()][::8]
    t0 = time.time()
    hits = {q: searcher.search(q, k=10).count() for q in qset}
    query_s = time.time() - t0
    print(
        json.dumps(
            {
                "docs": commit["doc_count"],
                "segments": commit["num_segments"],
                "build_secs": round(build_s, 2),
                "queries": len(qset),
                "query_secs": round(query_s, 2),
                "nonzero_hits": sum(1 for v in hits.values() if v),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
